"""Can Mosaic do fast per-lane gathers from a VMEM-resident table?

Tests jnp.take / take_along_axis / one-hot matmul inside a Pallas kernel
at merge-kernel-relevant sizes.  If any of these runs at >500M lookups/s
the whole merge fixed point can live in one Pallas kernel.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=20):
    fn(); fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    for C in (8192, 262144):
        for N in (8192, 131072):
            table = jnp.asarray(rng.integers(0, 1 << 20, C).astype(np.int32))
            idx_np = rng.integers(0, C, N).astype(np.int32)
            idx2d = jnp.asarray(idx_np.reshape(N // 128, 128))

            def k_take(table_ref, idx_ref, out_ref):
                out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

            @jax.jit
            def run_take(idx2d, table=table):
                return pl.pallas_call(
                    k_take,
                    out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(table, idx2d)

            try:
                out = np.asarray(run_take(idx2d))
                ok = bool((out.reshape(-1) == np.asarray(table)[idx_np]).all())
                dt = timeit(lambda: run_take(idx2d))
                print(f"pallas take C={C} N={N}: ok={ok} {dt*1e6:.0f}us ({N/dt/1e6:.0f}M/s)")
            except Exception as e:
                print(f"pallas take C={C} N={N}: FAIL {type(e).__name__}: {str(e)[:200]}")

    # dynamic_gather via take_along_axis on 2D: rows of a [8, C] table?
    C = 8192
    N = 131072
    table = jnp.asarray(rng.integers(0, 1 << 20, C).astype(np.int32))
    idx_np = rng.integers(0, C, N).astype(np.int32)
    idx2d = jnp.asarray(idx_np.reshape(-1, 128))

    def k_taa(table_ref, idx_ref, out_ref):
        # broadcast table to rows then take_along_axis per row
        t = table_ref[:].reshape(1, -1)
        out_ref[:] = jnp.take_along_axis(
            jnp.broadcast_to(t, (idx_ref.shape[0], t.shape[1])), idx_ref[:], axis=1
        )

    @jax.jit
    def run_taa(idx2d, table=table):
        return pl.pallas_call(
            k_taa,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx2d)

    try:
        out = np.asarray(run_taa(idx2d))
        ok = bool((out.reshape(-1) == np.asarray(table)[idx_np]).all())
        dt = timeit(lambda: run_taa(idx2d))
        print(f"pallas take_along_axis C={C} N={N}: ok={ok} {dt*1e6:.0f}us ({N/dt/1e6:.0f}M/s)")
    except Exception as e:
        print(f"pallas take_along_axis: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
