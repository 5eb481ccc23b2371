"""3-way tokenizer benchmark with correctness cross-check.

Capability parity with the reference's scripts/benchmark.py (bytes/s for
hutoken vs tiktoken vs Hugging Face, exact-id cross-check,
--thread-number chunked batch mode) — adapted to run offline: the
engines are built from the same fixture tables instead of downloaded
vocabularies.

Usage:
    python scripts/benchmark.py --mb 16 [--thread-number 8] [--backend device|host|native]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def split_document(document: str, num_parts: int) -> list[str]:
    """Cut a document into ~equal whitespace-aligned pieces whose
    concatenation is the original (for batch-vs-whole comparisons)."""
    n = len(document)
    if num_parts <= 1 or n == 0:
        return [document] if document else []
    target = -(-n // num_parts)
    cuts = [0]
    while cuts[-1] < n and len(cuts) <= num_parts:
        at = min(cuts[-1] + target, n)
        while at < n and document[at] not in " \t\n":
            at += 1
        cuts.append(at)
    cuts[-1] = n  # any remainder joins the final piece
    return [document[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=float, default=8.0)
    parser.add_argument("--thread-number", type=int, default=1)
    parser.add_argument(
        "--backend", default="device", choices=["device", "host", "native"]
    )
    parser.add_argument("--no-crosscheck", action="store_true")
    args = parser.parse_args()

    import fixture_tools as ft
    from bench import build_corpus
    from hutoken_tpu.context import TokenizerContext

    vocab_path, special_path = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(vocab_path, special_path, is_byte_encoder=True)
    document = " ".join(build_corpus(args.mb))
    num_bytes = len(document.encode())
    chunks = (
        [document]
        if args.thread_number == 1
        else split_document(document, args.thread_number)
    )

    # --- ours ---
    if args.backend == "device":
        from hutoken_tpu.engine import TpuTokenizer

        eng = TpuTokenizer(ctx)
        eng.encode_batch(chunks[:1])  # warmup
        eng._word_cache.clear()
        t0 = time.perf_counter_ns()
        ours = eng.encode_batch(chunks)
        dt = time.perf_counter_ns() - t0
    elif args.backend == "native":
        from hutoken_tpu.native import NativeEngine

        eng = NativeEngine(ctx)
        eng.encode_batch(chunks[:1], args.thread_number)
        t0 = time.perf_counter_ns()
        ours = eng.encode_batch(chunks, args.thread_number)
        dt = time.perf_counter_ns() - t0
    else:
        from hutoken_tpu import oracle

        t0 = time.perf_counter_ns()
        ours = [oracle.encode(ctx, c) for c in chunks]
        dt = time.perf_counter_ns() - t0
    ours_flat = [t for sub in ours for t in sub]
    print(f"hutoken-tpu[{args.backend}]: {num_bytes / dt * 1e9 / 1e6:.2f} MB/s")

    # --- tiktoken ---
    try:
        enc = ft.tiktoken_encoding()
        t0 = time.perf_counter_ns()
        tt = enc.encode_ordinary_batch(chunks, num_threads=args.thread_number)
        dt = time.perf_counter_ns() - t0
        tt_flat = [t for sub in tt for t in sub]
        print(f"tiktoken:           {num_bytes / dt * 1e9 / 1e6:.2f} MB/s")
        if not args.no_crosscheck:
            assert ours_flat == tt_flat, "token-id mismatch vs tiktoken!"
            print("cross-check vs tiktoken: EXACT")
    except ImportError:
        print("tiktoken unavailable; skipping")

    # --- HF tokenizers ---
    try:
        from tokenizers import Tokenizer, models

        hf_vocab = {
            ft.remapped_spelling(tok): idx for tok, idx in ft.build_ranks().items()
        }
        merges_path = ft.write_merges_fixture()
        merges = []
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                if not line.startswith("#"):
                    left, right = line.rstrip("\n").split(" ")
                    merges.append((left, right))
        hf = Tokenizer(models.BPE(vocab=hf_vocab, merges=merges))
        t0 = time.perf_counter_ns()
        for c in chunks:
            hf.encode(c)
        dt = time.perf_counter_ns() - t0
        print(f"hf tokenizers:      {num_bytes / dt * 1e9 / 1e6:.2f} MB/s (no pre-tokenizer)")
    except ImportError:
        print("tokenizers unavailable; skipping")


if __name__ == "__main__":
    main()
