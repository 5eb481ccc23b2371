"""Sharded-encode scaling benchmark (BASELINE config 5).

Runs the device merge fixed point on a padded unique-word block sharded
over 1, 2, 4, ... devices of the mesh (weak scaling: constant rows per
device) and reports scaling efficiency.  On a pod slice it spans real
chips (one process per host under jax.distributed).  With --cpu it runs
on virtual devices that SHARE the host's cores — that validates the
sharded program's mechanics, not scaling (efficiency numbers are only
meaningful on real multi-chip hardware).

    python scripts/benchmark_sharded.py --cpu --rows 16384
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
    parser.add_argument("--rows", type=int, default=16384)
    parser.add_argument("--lanes", type=int, default=32)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--json", default=None, help="write results JSON")
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
    import jax.numpy as jnp
    import numpy as np

    import fixture_tools as ft
    from hutoken_tpu.context import TokenizerContext
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu.parallel.mesh import data_mesh
    from hutoken_tpu.parallel.sharded import sharded_merge_words

    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    eng = TpuTokenizer(ctx)
    rng = np.random.RandomState(0)

    n_total = len(jax.devices())
    results = {}
    n = 1
    while n <= n_total:
        mesh = data_mesh(n)
        rows = args.rows * n  # weak scaling: constant rows per device
        block = rng.randint(0, 256, size=(rows, args.lanes)).astype(np.int32)
        out = sharded_merge_words(eng.table_arrays, mesh, jnp.asarray(block))
        np.asarray(out)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = sharded_merge_words(
                eng.table_arrays, mesh, jnp.asarray(block)
            )
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        rate = rows / dt
        results[n] = rate
        eff = rate / (results[1] * n) if n > 1 else 1.0
        print(
            f"{n} device(s): {rate/1e6:.2f}M words/s "
            f"(scaling efficiency {eff:.0%})"
        )
        n *= 2

    if args.json:
        import json

        top = max(results)
        payload = {
            "metric": "sharded merge weak scaling (words/s by mesh size)",
            "backend": jax.default_backend(),
            "devices_virtual_shared_cores": bool(args.cpu),
            "rows_per_device": args.rows,
            "rates_words_per_s": {str(k): round(v) for k, v in results.items()},
            "weak_scaling_efficiency_at_top": round(
                results[top] / (results[1] * top), 4
            ),
            "note": (
                "virtual CPU devices share the host's vCPUs: wall-clock "
                "efficiency there measures the VM, not the program; the "
                "program-level weak-scaling property (flat per-device "
                "compiled cost, exact outputs at every mesh size) is "
                "asserted in tests/test_scaling.py"
                if args.cpu
                else "real devices"
            ),
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
