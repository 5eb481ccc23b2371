"""Third primitive probe: small-row gathers.

 1. XLA take_along_axis [W, C2] idx [W, L] for C2 in {32, 128, 256, 512}
 2. XLA shared-table gather with small C (256, 1024, 8192) at N=4M
 3. Pallas kernel using jnp.take_along_axis along lanes (C2=128) —
    does it lower to tpu.dynamic_gather, and how fast?
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def timed(f, inputs, n=8):
    for a in inputs[:2]:
        jax.device_get(f(*a))
    t0 = time.perf_counter()
    rs = [f(*inputs[i % len(inputs)]) for i in range(n)]
    jax.device_get(rs)
    return (time.perf_counter() - t0) / n


def main():
    global jax
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    def dev(x):
        return jax.block_until_ready(jnp.asarray(x))

    # 1. take_along_axis row gathers
    W = 1 << 20
    for C2 in (32, 128, 256, 512):
        Ri = dev(rng.integers(0, 1 << 16, (W, C2)).astype(np.int32))
        L = 32
        ins = [(dev(rng.integers(0, C2, (W, L)).astype(np.int32)),)
               for _ in range(3)]
        f = jax.jit(lambda idx, Ri=Ri: jnp.sum(jnp.take_along_axis(Ri, idx, axis=1)))
        dt = timed(f, ins)
        print(f"taa W={W} C2={C2} L={L}: {dt*1e3:.3f}ms ({W*L/dt/1e6:.0f}M/s)")

    # 2. shared-table gather, small C
    N = 1 << 22
    for C in (256, 1024, 8192):
        table = dev(rng.integers(0, 1 << 30, C).astype(np.int32))
        ins = [(dev(rng.integers(0, C, N).astype(np.int32)),) for _ in range(3)]
        f = jax.jit(lambda idx, table=table: jnp.sum(table[idx]))
        dt = timed(f, ins)
        print(f"gather C={C} N={N}: {dt*1e3:.3f}ms ({N/dt/1e6:.0f}M/s)")

    # 3. Pallas take_along_axis along lanes
    for C2 in (128, 256, 512):
        Wp = 1 << 17
        BLK = 1024
        Rp = dev(rng.integers(0, 1 << 16, (Wp, C2)).astype(np.int32))
        L = 32

        def kernel(r_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(r_ref[:], i_ref[:], axis=1)

        @jax.jit
        def pallas_taa(idx, Rp=Rp):
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Wp, L), jnp.int32),
                grid=(Wp // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK, C2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, L), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, L), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(Rp, idx)
            return jnp.sum(out)

        ins = [(dev(rng.integers(0, C2, (Wp, L)).astype(np.int32)),)
               for _ in range(3)]
        try:
            dt = timed(pallas_taa, ins)
            print(f"pallas-taa W={Wp} C2={C2}: {dt*1e3:.3f}ms "
                  f"({Wp*L/dt/1e6:.0f}M/s)")
        except Exception as e:
            print(f"pallas-taa C2={C2} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # 3b. pallas gather along sublanes (axis=0): shared table in VMEM,
    # table [C, 128] column-replicated; idx [BLK, 128]
    for C in (512, 2048, 8192):
        N2 = 1 << 20
        BLK = 2048
        tbl = dev(np.broadcast_to(
            rng.integers(0, 1 << 16, (C, 1)).astype(np.int32), (C, 128)).copy())

        def kernel0(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

        @jax.jit
        def pallas_g0(idx, tbl=tbl):
            out = pl.pallas_call(
                kernel0,
                out_shape=jax.ShapeDtypeStruct((N2 // 128, 128), jnp.int32),
                grid=(N2 // 128 // BLK * 128 // 128,),
                in_specs=[
                    pl.BlockSpec((C, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(tbl, idx)
            return jnp.sum(out)

        ins = [(dev(rng.integers(0, C, (N2 // 128, 128)).astype(np.int32)),)
               for _ in range(3)]
        try:
            dt = timed(pallas_g0, ins)
            print(f"pallas-g0 (axis0) C={C} N={N2}: {dt*1e3:.3f}ms "
                  f"({N2/dt/1e6:.0f}M/s)")
        except Exception as e:
            print(f"pallas-g0 C={C} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
