"""Second round of primitive measurements for the merge-kernel redesign.

Questions:
 1. Is the ~2.7ms gather cost fixed overhead or per-element?  (N sweep)
 2. How fast is a small-C one-hot row-gather via batched MXU matmul
    (iota-compare one-hot, bf16 inputs, f32 accum, byte-decomposed
    values)?  This is the candidate replacement for every in-loop gather.
 3. How fast is jax.lax.sort at the sizes a bulk span-resolve needs?
 4. Large-N one-hot probe against a big table (C=131072) on MXU.
Run:  python scripts/profile_prims2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=10):
    fn()
    fn()
    t0 = time.perf_counter()
    rs = [fn() for _ in range(n)]
    try:
        jax.block_until_ready(rs[-1])
    except Exception:
        pass
    return (time.perf_counter() - t0) / n


def main():
    global jax
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # 1. gather N sweep, fixed C
    C = 131072
    table = jnp.arange(C, dtype=jnp.int32)
    for N in (8192, 131072, 1 << 20, 1 << 22, 1 << 24):
        idx = jnp.asarray(rng.integers(0, C, N).astype(np.int32))

        @jax.jit
        def g(idx, table=table):
            return table[idx]

        dt = timeit(lambda: g(idx))
        print(f"gather[] C={C} N={N}: {dt*1e3:.2f}ms ({N/dt/1e6:.0f}M/s)")

    # 2. batched small-C one-hot row gather on MXU
    # R rows: [W, C2] values; want out[w, l] = R[w, idx[w, l]]
    for (W, L, C2) in ((4096, 32, 512), (4096, 32, 128), (16384, 32, 512)):
        Rlo = jnp.asarray(rng.integers(0, 256, (W, C2)).astype(np.float32))
        Rhi = jnp.asarray(rng.integers(0, 256, (W, C2)).astype(np.float32))
        Rb = jnp.stack([Rlo, Rhi], axis=2)  # [W, C2, 2]
        idx = jnp.asarray(rng.integers(0, C2, (W, L)).astype(np.int32))

        @jax.jit
        def rowgather_mxu(idx, Rb=Rb, C2=C2):
            # one-hot via iota compare in bf16
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, L, C2), 2)
            oh = (iota == idx[:, :, None]).astype(jnp.bfloat16)
            vals = jax.lax.dot_general(
                oh, Rb.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [W, L, 2]
            return vals[..., 0].astype(jnp.int32) + (
                vals[..., 1].astype(jnp.int32) << 8)

        dt = timeit(lambda: rowgather_mxu(idx))
        print(f"rowgather-MXU W={W} L={L} C2={C2}: {dt*1e3:.3f}ms "
              f"({W*L/dt/1e6:.0f}M lookups/s)")

        # compare: vmap-of-vmap dynamic slice (current _row_gather)
        Ri = jnp.asarray(rng.integers(0, 1 << 16, (W, C2)).astype(np.int32))

        @jax.jit
        def rowgather_ds(idx, Ri=Ri):
            def per_row(row, ix):
                return jax.vmap(
                    lambda j: jax.lax.dynamic_slice(row, (j,), (1,))[0]
                )(ix)
            return jax.vmap(per_row)(Ri, idx)

        dt = timeit(lambda: rowgather_ds(idx))
        print(f"rowgather-ds  W={W} L={L} C2={C2}: {dt*1e3:.3f}ms "
              f"({W*L/dt/1e6:.0f}M lookups/s)")

        # take_along_axis
        @jax.jit
        def rowgather_taa(idx, Ri=Ri):
            return jnp.take_along_axis(Ri, idx, axis=1)

        dt = timeit(lambda: rowgather_taa(idx))
        print(f"rowgather-taa W={W} L={L} C2={C2}: {dt*1e3:.3f}ms "
              f"({W*L/dt/1e6:.0f}M lookups/s)")

    # 3. sort costs
    for N in (1 << 20, 1 << 21, 1 << 22):
        keys = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.int32))
        vals = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.int32))

        @jax.jit
        def s2(keys, vals):
            return jax.lax.sort((keys, vals), num_keys=1)

        dt = timeit(lambda: s2(keys, vals))
        print(f"sort-pair N={N}: {dt*1e3:.2f}ms ({N/dt/1e6:.0f}M/s)")

    # 4. big-C one-hot probe on MXU: N keys against C slots, 1 probe step
    for (N, Cb) in ((131072, 131072),):
        packed = jnp.asarray(
            rng.integers(0, 256, (Cb, 12)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, Cb, N).astype(np.int32))

        @jax.jit
        def onehot_big(idx, packed=packed):
            oh_i = jax.lax.broadcasted_iota(jnp.int32, (N, Cb), 1)
            oh = (oh_i == idx[:, None]).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, packed.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dt = timeit(lambda: onehot_big(idx))
        print(f"onehot-probe-MXU N={N} C={Cb}: {dt*1e3:.2f}ms "
              f"({N/dt/1e6:.0f}M lookups/s)")


if __name__ == "__main__":
    main()
