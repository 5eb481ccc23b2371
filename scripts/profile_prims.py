"""Measure primitive costs on the real chip: dispatch floor, gather
throughput (vmap-dynamic-slice vs take vs one-hot matmul), at sizes the
merge kernel uses."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=20):
    fn()
    fn()
    t0 = time.perf_counter()
    rs = [fn() for _ in range(n)]
    try:
        rs[-1].block_until_ready()
    except AttributeError:
        pass
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())

    x = jnp.zeros((4096, 32), jnp.int32)

    @jax.jit
    def trivial(x):
        return x + 1

    print(f"dispatch floor (x+1 on [4096,32]): {timeit(lambda: trivial(x))*1e6:.0f} us")

    @jax.jit
    def chain(x):
        for _ in range(30):
            x = x + 1
        return x

    print(f"30-op elementwise chain: {timeit(lambda: chain(x))*1e6:.0f} us")

    # gather: table[idx] for N indices into capacity-C table
    for C in (8192, 262144):
        table = jnp.arange(C, dtype=jnp.int32)
        for N in (8192, 131072):
            idx = jnp.asarray(np.random.default_rng(0).integers(0, C, N).astype(np.int32))

            @jax.jit
            def g_vmapds(idx, table=table):
                return jax.vmap(lambda j: jax.lax.dynamic_slice(table, (j,), (1,))[0])(idx)

            @jax.jit
            def g_take(idx, table=table):
                return jnp.take(table, idx)

            @jax.jit
            def g_bracket(idx, table=table):
                return table[idx]

            r = []
            for name, fn in (("vmap-ds", g_vmapds), ("take", g_take), ("[]", g_bracket)):
                dt = timeit(lambda fn=fn: fn(idx))
                r.append(f"{name} {dt*1e6:.0f}us ({N/dt/1e6:.0f}M/s)")
            print(f"gather C={C} N={N}: " + "  ".join(r))

    # one-hot matmul probe: [N, C] x [C, 12]
    for C, N in ((8192, 8192), (8192, 131072)):
        packed = jnp.zeros((C, 12), jnp.float32)
        idx = jnp.asarray(np.random.default_rng(0).integers(0, C, N).astype(np.int32))

        @jax.jit
        def onehot_mm(idx, packed=packed):
            oh = jax.nn.one_hot(idx, C, dtype=jnp.float32)
            return jax.lax.dot_general(oh, packed, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        dt = timeit(lambda: onehot_mm(idx))
        print(f"one-hot mm C={C} N={N}: {dt*1e6:.0f}us ({N/dt/1e6:.0f}M lookups/s)")

    # iota-compare "matmul-free onehot" : segment-sum style
    # scatter-add test (for histograms)
    N = 131072
    C = 8192
    idx = jnp.asarray(np.random.default_rng(0).integers(0, C, N).astype(np.int32))
    vals = jnp.ones(N, jnp.int32)

    @jax.jit
    def scat(idx, vals):
        return jnp.zeros(C, jnp.int32).at[idx].add(vals)

    print(f"scatter-add C={C} N={N}: {timeit(lambda: scat(idx, vals))*1e6:.0f}us")

    # D2H of a small result
    y = jnp.zeros(32768, jnp.int32)
    print(f"device_get 128KB: {timeit(lambda: jax.device_get(y), 10)*1e6:.0f}us")


if __name__ == "__main__":
    main()
