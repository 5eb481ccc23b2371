"""Distributed BPE training benchmark (BASELINE config: learn a
5000-merge vocab from a Hungarian corpus with distributed pair-counting).

    python scripts/benchmark_train.py --merges 5000 --mb 4 [--devices 8]

On a single chip the mesh is 1-wide (the psum is a no-op); on pods the
same program shards the corpus across chips and psums histograms over
ICI.  Reports merges/s and total wall time, and cross-checks the first
merges against the host trainer.
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
    parser.add_argument("--merges", type=int, default=5000)
    parser.add_argument("--mb", type=float, default=4.0)
    parser.add_argument("--devices", type=int, default=None)
    parser.add_argument("--cpu", action="store_true", help="force CPU mesh")
    parser.add_argument("--json", default=None, help="write results JSON")
    parser.add_argument(
        "--mode", default="bbpe", choices=("bbpe", "string"),
        help="bbpe (id-keyed, the scaled workload) or string "
        "(spelling-group-keyed, scan-batched speculative driver)",
    )
    parser.add_argument(
        "--seed", type=int, default=None,
        help="corpus seed; default time-salted so repeated runs can "
        "never be served from any result-dedup layer",
    )
    parser.add_argument(
        "--no-warmup", action="store_true",
        help="skip the compile warmup (include jit compile in the "
        "timed window)",
    )
    args = parser.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import build_corpus
    from hutoken_tpu.parallel.mesh import data_mesh
    from hutoken_tpu.parallel.train import (
        distributed_bbpe_train, distributed_bpe_train,
    )

    # time-salted seed: the corpus content differs per run, so neither
    # a caching transport layer (the tunneled backend deduplicates
    # byte-identical dispatches) nor stale results can fake the number;
    # the SHAPE (trimmed byte count) stays identical so the warmup's
    # compiled executable is reused by the timed run.
    seed = args.seed if args.seed is not None else int(time.time()) % 100000
    target_bytes = int(args.mb * 1e6)

    def corpus_with(s: int) -> bytes:
        c = " ".join(build_corpus(args.mb + 0.2, seed=s)).encode("utf-8")
        return c[:target_bytes]

    corpus = corpus_with(seed)
    vocab_size = 256 + args.merges
    mesh = data_mesh(args.devices)
    n_dev = int(mesh.devices.size)
    print(f"corpus {len(corpus)/1e6:.1f} MB, {n_dev} device(s), target {vocab_size}")

    def write_json(payload: dict) -> None:
        if not args.json:
            return
        import json

        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)

    base_payload = {
        "metric": (
            "distributed BBPE training throughput"
            if args.mode == "bbpe"
            else "distributed string (spelling-group) training throughput"
        ),
        "mode": args.mode,
        "backend": jax.default_backend(),
        "devices": n_dev,
        "corpus_mb": round(len(corpus) / 1e6, 2),
        "corpus_seed": seed,
    }

    warmup_s = 0.0
    if not args.no_warmup:
        # compile warmup with the EXACT executable the timed run uses:
        # same K, same shapes, different corpus content.  Calling
        # make_scan_train_step directly guarantees a _SCAN_STEP_CACHE
        # hit for the timed run on every path (the dense multi-device
        # path keys by K, so warming up via a small throwaway vocab
        # would miss there).  The JSON is written incrementally so an
        # outer timeout mid-run still leaves a truthful artifact.
        import jax
        import jax.numpy as jnp
        import numpy as np

        from hutoken_tpu.parallel.mesh import shard_batch
        from hutoken_tpu.parallel.train import (
            _use_candidates, make_scan_train_step,
        )

        write_json({**base_payload, "status": "compiling"})
        t0 = time.perf_counter()
        w_np = np.frombuffer(corpus_with(seed + 1), np.uint8).astype(
            np.int32
        )
        pad = (-len(w_np)) % n_dev
        if pad:
            w_np = np.concatenate([w_np, np.full(pad, -1, np.int32)])
        ids_w = shard_batch(mesh, jnp.asarray(w_np))
        if args.mode == "string":
            # the string trainer compiles several executables on demand
            # (scan chunk, probe, fused deep-tail step — the tail only
            # appears past ~650 merges), so the only warmup that covers
            # them all is a full same-shape throwaway training run; the
            # timed run below then measures pure steady-state
            import contextlib
            import io

            with contextlib.redirect_stdout(io.StringIO()):
                distributed_bpe_train(
                    corpus_with(seed + 1)[: len(corpus)], vocab_size,
                    mesh=mesh,
                )
            out = (jnp.zeros(1),)
        else:
            K = vocab_size + 1
            scan_step, _f, _m = make_scan_train_step(
                K, mesh, 2, 32,
                use_candidates=_use_candidates(K, n_dev, len(corpus)),
            )
            out = scan_step(ids_w, 256)
        jax.block_until_ready(out[0])
        warmup_s = time.perf_counter() - t0
        print(f"warmup (compile) {warmup_s:.1f}s")
        write_json({
            **base_payload,
            "status": "warmup-complete, timed run in progress",
            "warmup_compile_s": round(warmup_s, 1),
        })

    t0 = time.perf_counter()
    train_fn = (
        distributed_bpe_train if args.mode == "string"
        else distributed_bbpe_train
    )
    str2id = train_fn(corpus, vocab_size, mesh=mesh, verbose=False)
    dt = time.perf_counter() - t0
    n_merges = len([1 for v in str2id.values() if v >= 256])
    print(
        f"trained {n_merges} merges in {dt:.1f}s "
        f"({n_merges/dt:.1f} merges/s, {len(corpus)/1e6*n_merges/dt:.1f} MB*merges/s)"
    )
    write_json({
        **base_payload,
        "merges": n_merges,
        "wall_s": round(dt, 1),
        "merges_per_s": round(n_merges / dt, 2),
        "warmup_compile_s": round(warmup_s, 1),
    })
    if args.json:
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
