"""Profile the raw TPU-resident encode path vs the legacy pipeline on
the unique-heavy corpus (VERDICT r4 #1).  Run on the real chip:

    python scripts/profile_raw.py [--mb 8] [--mode raw|legacy|both]
"""

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=8.0)
    ap.add_argument("--mode", default="both")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--timing", action="store_true")
    args = ap.parse_args()
    if args.timing:
        os.environ["HUTOKEN_TPU_TIMING"] = "1"

    from bench import build_unique_corpus, _load_ctx
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu import oracle

    docs = build_unique_corpus(args.mb)
    total = sum(len(d.encode()) for d in docs)
    print(f"corpus: {total/1e6:.2f} MB, {len(docs)} docs", flush=True)

    modes = ["raw", "legacy"] if args.mode == "both" else [args.mode]
    for mode in modes:
        os.environ["HUTOKEN_TPU_RAW"] = "1" if mode == "raw" else "0"
        ctx = _load_ctx("small")
        eng = TpuTokenizer(ctx)
        t0 = time.perf_counter()
        flat, offs = eng.encode_batch_arrays(docs)  # warmup + compile
        print(f"[{mode}] warmup (incl compile): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        # spot-check exactness
        for i in (0, len(docs) // 2, len(docs) - 1):
            want = oracle.encode(ctx, docs[i])
            got = flat[offs[i]:offs[i+1]].tolist()
            assert got == want, f"mismatch doc {i}"
        for r in range(args.runs):
            eng.reset_cache()
            d0 = eng.stat_device_bytes
            t0 = time.perf_counter()
            eng.encode_batch_arrays(docs)
            dt = time.perf_counter() - t0
            share = (eng.stat_device_bytes - d0) / total
            print(
                f"[{mode}] run {r}: {dt:.3f}s = {total/dt/1e6:.2f} MB/s "
                f"device_byte_share={share:.3f} "
                f"cause={eng.stat_host_cause}",
                flush=True,
            )


if __name__ == "__main__":
    main()
