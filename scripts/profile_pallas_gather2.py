"""Test the lane-tiled VMEM gather primitive in Pallas:

table [C] int32 stored as [C//128, 128]; gather idx via
  rows = take_along_axis(table2d, idx>>7, axis=0)   (per-lane sublane gather)
  out  = sum(rows * (lane == (idx & 127)), axis=1)  (lane select, pure VPU)

and the direct axis=1 variant. Measures M lookups/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def timeit(fn, n=30):
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

    for C in (8192, 262144, 2 << 20):
        for N in (8192, 131072):
            table_np = rng.integers(0, 1 << 20, C).astype(np.int32)
            table2d = jnp.asarray(table_np.reshape(C // 128, 128))
            idx_np = rng.integers(0, C, N).astype(np.int32)
            idxq = jnp.asarray(idx_np.reshape(N // 128, 128))

            def k_gather(table_ref, idx_ref, out_ref):
                idx = idx_ref[:]
                rows = idx >> 7
                lanes = idx & 127
                t = table_ref[:]
                # per-lane sublane gather: g[n,l] = t[rows[n,l], l]
                g = jnp.take_along_axis(t, rows, axis=0)
                lane_iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1) & 127
                picked = jnp.where(lanes == lane_iota, g, 0)
                # rotate-free select: sum over the 128-lane group won't work
                # directly since each row of idx has ITS OWN lanes; do the
                # full [N,128]x[128] reduce trick instead:
                out_ref[:] = picked
                # NOTE: this only picks when the target lane happens to equal
                # the query's own lane. Real select needs cross-lane move.

            # Correct approach: for each query row (128 queries), each query
            # q at lane l wants t[rows[q], lanes[q]]. take_along_axis axis=0
            # with idx rows gives t[rows[q], l] - the query's OWN lane. So
            # queries must be arranged so lane == idx & 127... OR do a
            # second gather along axis=1:
            def k_gather2(table_ref, idx_ref, out_ref):
                idx = idx_ref[:]
                rows = idx >> 7
                lanes = idx & 127
                t = table_ref[:]
                g = jnp.take_along_axis(t, rows, axis=0)   # t[rows[n,l], l]
                # now need cross-lane: out[n,l] = row_{rows[n,l]} [lanes[n,l]]
                # but g only has lane l's column. Use axis=1 gather on t rows?
                out_ref[:] = jnp.take_along_axis(g, lanes, axis=1)

            @jax.jit
            def run2(idxq, table2d=table2d):
                return pl.pallas_call(
                    k_gather2,
                    out_shape=jax.ShapeDtypeStruct(idxq.shape, jnp.int32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(table2d, idxq)

            try:
                out = np.asarray(run2(idxq))
                # gather2 semantics: out[n,l] = t[rows[n,l], lanes'[n,l]] where
                # lanes' gathers from the ALREADY-gathered g: g[n,j]=t[rows[n,j], j]
                # so out[n,l] = t[rows[n, lanes[n,l]], lanes[n,l]] -- NOT what
                # we want unless rows constant per row-block. Check vs that:
                rows = idx_np.reshape(-1, 128) >> 7
                lanes = idx_np.reshape(-1, 128) & 127
                want_semantics = table_np.reshape(-1, 128)[
                    np.take_along_axis(rows, lanes, axis=1), lanes]
                want_true = table_np[idx_np].reshape(-1, 128)
                print(f"C={C} N={N}: compiled; matches-composed={bool((out==want_semantics).all())}"
                      f" matches-true-gather={bool((out==want_true).all())}",
                      flush=True)
                dt = timeit(lambda: run2(idxq))
                print(f"   two-level taa: {dt*1e6:.0f}us ({N/dt/1e6:.0f}M/s)")
            except Exception as e:
                print(f"C={C} N={N}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
