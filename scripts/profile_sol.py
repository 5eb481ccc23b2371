"""Speed-of-light check, forcing real execution.

On the axon tunnel, block_until_ready appears to complete before the
work is genuinely done (or identical dispatches are deduplicated), so
every timed function reduces to a scalar inside jit and the timing loop
device_gets all scalars at the end — that forces n real executions and
adds only one tail RTT, which is measured separately and negligible at
n>=8.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def timed(f, inputs, n=8):
    for a in inputs[:2]:
        jax.device_get(f(*a))
    t0 = time.perf_counter()
    rs = [f(*inputs[i % len(inputs)]) for i in range(n)]
    out = jax.device_get(rs)
    dt = (time.perf_counter() - t0) / n
    return dt, out


def main():
    global jax
    import jax, jax.numpy as jnp
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    def dev(x):
        return jax.block_until_ready(jnp.asarray(x))

    # RTT floor
    x0 = dev(np.zeros(8, np.float32))
    f = jax.jit(lambda x: jnp.sum(x))
    dt, _ = timed(f, [(x0,)], n=16)
    print(f"tiny dispatch+sum: {dt*1e6:.0f}us")

    # matmul FLOPs — sum result to scalar
    for M in (2048, 4096):
        ins = []
        for _ in range(4):
            a = dev(rng.standard_normal((M, M)).astype(np.float32))
            b = dev(rng.standard_normal((M, M)).astype(np.float32))
            ins.append((jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16)))
        f = jax.jit(lambda a, b: jnp.sum(jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)))
        dt, _ = timed(f, ins)
        print(f"matmul bf16 {M}: {dt*1e3:.3f}ms = {2*M**3/dt/1e12:.1f} TFLOP/s")

    # HBM copy bandwidth — x*2 then sum
    for MB in (256,):
        N = MB * 1024 * 1024 // 4
        ins = [(dev(rng.standard_normal(N).astype(np.float32)),) for _ in range(3)]
        f = jax.jit(lambda x: jnp.sum(x * 2.0))
        dt, _ = timed(f, ins)
        print(f"mul+reduce {MB}MB: {dt*1e3:.3f}ms = {MB/1024/dt:.0f} GB/s read")

    # gather
    C = 131072
    table = dev(rng.integers(0, 1 << 30, C).astype(np.int32))
    for N in (131072, 1 << 20, 1 << 22):
        ins = [(dev(rng.integers(0, C, N).astype(np.int32)),) for _ in range(3)]
        f = jax.jit(lambda idx, table=table: jnp.sum(table[idx]))
        dt, _ = timed(f, ins)
        print(f"gather[] C={C} N={N}: {dt*1e3:.3f}ms ({N/dt/1e6:.0f}M/s)")

    # rowgather variants
    W, L, C2 = 4096, 32, 512
    Rb16 = jnp.asarray(dev(rng.integers(0, 256, (W, C2, 2)).astype(np.float32)),
                       jnp.bfloat16)
    Ri = dev(rng.integers(0, 1 << 16, (W, C2)).astype(np.int32))
    idx_ins = [(dev(rng.integers(0, C2, (W, L)).astype(np.int32)),)
               for _ in range(3)]

    @jax.jit
    def rowgather_mxu(idx):
        iota = jax.lax.broadcasted_iota(jnp.int32, (W, L, C2), 2)
        oh = (iota == idx[:, :, None]).astype(jnp.bfloat16)
        vals = jax.lax.dot_general(
            oh, Rb16, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        v = vals[..., 0].astype(jnp.int32) + (vals[..., 1].astype(jnp.int32) << 8)
        return jnp.sum(v)

    dt, _ = timed(rowgather_mxu, idx_ins)
    print(f"rowgather-MXU: {dt*1e3:.3f}ms ({W*L/dt/1e6:.1f}M lookups/s)")

    @jax.jit
    def rowgather_taa(idx):
        return jnp.sum(jnp.take_along_axis(Ri, idx, axis=1))

    dt, _ = timed(rowgather_taa, idx_ins)
    print(f"rowgather-taa: {dt*1e3:.3f}ms ({W*L/dt/1e6:.1f}M lookups/s)")

    # sort
    for N in (1 << 20, 1 << 22):
        ins = [(dev(rng.integers(0, 1 << 31, N).astype(np.int32)),
                dev(rng.integers(0, 1 << 31, N).astype(np.int32)))
               for _ in range(3)]
        f = jax.jit(lambda k, v: jnp.sum(jax.lax.sort((k, v), num_keys=1)[1]))
        dt, _ = timed(f, ins)
        print(f"sort-pair N={N}: {dt*1e3:.3f}ms ({N/dt/1e6:.0f}M/s)")


if __name__ == "__main__":
    main()
