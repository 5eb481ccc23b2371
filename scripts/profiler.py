"""Profiling driver: loop encode under jax.profiler (or plain wall clock).

Capability parity with the reference's scripts/profiler.py (a loop driver
for external profilers), upgraded with jax.profiler traces for TPU work.

    python scripts/profiler.py --mb 4 --trace /tmp/ht-trace
    # then: tensorboard --logdir /tmp/ht-trace
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=float, default=4.0)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--trace", default=None, help="jax.profiler trace dir")
    args = parser.parse_args()

    import fixture_tools as ft
    from bench import build_corpus
    from hutoken_tpu.context import TokenizerContext
    from hutoken_tpu.engine import TpuTokenizer

    vocab_path, special_path = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(vocab_path, special_path, is_byte_encoder=True)
    eng = TpuTokenizer(ctx)
    docs = build_corpus(args.mb)
    total = sum(len(d.encode()) for d in docs)

    eng.encode_batch(docs[:8])  # warmup/compile

    if args.trace:
        import jax

        with jax.profiler.trace(args.trace):
            for _ in range(args.iters):
                eng._word_cache.clear()
                eng.encode_batch(docs)
        print(f"trace written to {args.trace}")
    for i in range(args.iters):
        eng._word_cache.clear()
        t0 = time.perf_counter()
        eng.encode_batch(docs)
        dt = time.perf_counter() - t0
        print(f"iter {i}: {total / dt / 1e6:.2f} MB/s")


if __name__ == "__main__":
    main()
