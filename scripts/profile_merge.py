"""Profile the device merge kernel on the real chip: where do the ms go?

Times a [4096, 32] block through _merge_fixed_point under each table
mode, plus component costs (seed gather, initial probe, per-round cost).
Run on the TPU:  python scripts/profile_merge.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def timeit(fn, n=10):
    fn()  # warm/compile
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    try:
        r.block_until_ready()
    except AttributeError:
        pass
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    import fixture_tools as ft
    from hutoken_tpu.context import TokenizerContext
    from hutoken_tpu.tables import build_encoder_tables, build_pair_table
    from hutoken_tpu.ops import merge as M

    print("backend:", jax.default_backend(), jax.devices())

    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    tables = build_encoder_tables(ctx)
    pt = tables.pair_table
    print(f"vocab={tables.vocab_size} pairs={len(tables.pairs)} "
          f"cap={pt.capacity} probe_len={pt.probe_len} onehot_ok={pt.onehot_ok} "
          f"packed_ok={pt.packed_ok}")

    # build a realistic unique-word block: random word forms 4-16 bytes
    rng = np.random.default_rng(0)
    W, L = 4096, 32
    lens = rng.integers(4, 17, W).astype(np.int32)
    lens.sort()
    raw = np.zeros((W, L), dtype=np.uint8)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    for i in range(W):
        raw[i, : lens[i]] = letters[rng.integers(0, 26, lens[i])]
    word_bytes = int(lens.sum())
    print(f"block: [{W},{L}] real bytes={word_bytes}")

    byte_seed = jnp.asarray(tables.byte_seed_ids)
    raw_j = jnp.asarray(raw)
    lens_j = jnp.asarray(lens)

    def table_mode(mode):
        if mode == M.MODE_PACKED:
            pt2 = build_pair_table(tables.pairs, max_probe_len=2)
            pkey, pval = pt2.packed_arrays()
            z = jnp.zeros(1, jnp.int32)
            return (jnp.asarray(pkey), jnp.asarray(pval), z, z,
                    pt2.probe_len, pt2.capacity - 1, M.MODE_PACKED)
        return (jnp.asarray(pt.left), jnp.asarray(pt.right),
                jnp.asarray(pt.rank), jnp.asarray(pt.merged),
                pt.probe_len, pt.capacity - 1, mode)

    for name, mode in (("ONEHOT", M.MODE_ONEHOT), ("PACKED", M.MODE_PACKED),
                       ("PROBE", M.MODE_PROBE)):
        ta = table_mode(mode)

        def full():
            return M.merge_words_from_bytes(ta, byte_seed, raw_j, lens_j, True)

        dt = timeit(full)
        print(f"mode {name}: full fixed point {dt*1e3:.2f} ms  "
              f"-> {word_bytes/dt/1e6:.1f} MB/s word bytes")

        # initial probe only
        @jax.jit
        def probe_only(raw_j, lens_j):
            ids = M._seed_from_bytes(byte_seed, raw_j, lens_j)
            r, m = M._initial_ranks(ta, ids)
            return r.sum() + m.sum()

        dt = timeit(lambda: probe_only(raw_j, lens_j))
        print(f"  initial probe+seed: {dt*1e3:.2f} ms")

        # N fixed rounds (no cond) to get per-round cost
        from functools import partial

        @partial(jax.jit, static_argnames=("nrounds",))
        def rounds_only(raw_j, lens_j, nrounds):
            ids = M._seed_from_bytes(byte_seed, raw_j, lens_j)
            table = ta
            Wd, Ld = ids.shape
            col = jax.lax.broadcasted_iota(jnp.int32, (Wd, Ld), 1)
            ranks, merged = M._initial_ranks(table, ids)

            def body(i, state):
                ids, ranks, merged = state
                min_rank = jnp.min(ranks, axis=1)
                active = min_rank < M.INF_RANK
                p = jnp.min(jnp.where(ranks == min_rank[:, None], col, Ld),
                            axis=1).astype(jnp.int32)
                p = jnp.where(active, p, 0)
                p_col = p[:, None]
                m = M.row_gather(merged, p)
                ids_shift = jnp.concatenate(
                    [ids[:, 1:], jnp.full((Wd, 1), -1, ids.dtype)], axis=1)
                new_ids = jnp.where(col == p_col, m[:, None], ids)
                new_ids = jnp.where(col >= p_col + 1, ids_shift, new_ids)
                new_ids = jnp.where(active[:, None], new_ids, ids)
                ranks_shift = jnp.concatenate(
                    [ranks[:, 1:], jnp.full((Wd, 1), M.INF_RANK, ranks.dtype)], axis=1)
                merged_shift = jnp.concatenate(
                    [merged[:, 1:], jnp.full((Wd, 1), -1, merged.dtype)], axis=1)
                new_ranks = jnp.where(col >= p_col + 1, ranks_shift, ranks)
                new_merged = jnp.where(col >= p_col + 1, merged_shift, merged)
                left_a = M.row_gather(new_ids, jnp.maximum(p - 1, 0))
                right_b = M.row_gather(new_ids, jnp.minimum(p + 1, Ld - 1))
                pa = jnp.stack([jnp.where(p > 0, left_a, -1), m], axis=0)
                pb = jnp.stack([m, jnp.where(p + 1 <= Ld - 1, right_b, -1)], axis=0)
                r2, m2 = M.probe_pairs(table, pa, pb)
                new_ranks = jnp.where((col == p_col - 1) & active[:, None],
                                      r2[0][:, None], new_ranks)
                new_merged = jnp.where((col == p_col - 1) & active[:, None],
                                       m2[0][:, None], new_merged)
                new_ranks = jnp.where((col == p_col) & active[:, None],
                                      r2[1][:, None], new_ranks)
                new_merged = jnp.where((col == p_col) & active[:, None],
                                       m2[1][:, None], new_merged)
                new_ranks = jnp.where(active[:, None], new_ranks, ranks)
                new_merged = jnp.where(active[:, None], new_merged, merged)
                return new_ids, new_ranks, new_merged

            ids, ranks, merged = jax.lax.fori_loop(
                0, nrounds, body, (ids, ranks, merged))
            return ids.sum()

        for nr in (8, 16):
            dt = timeit(lambda: rounds_only(raw_j, lens_j, nr))
            print(f"  {nr} fixed rounds: {dt*1e3:.2f} ms")

    # how many rounds does this block actually need?
    ta = table_mode(M.MODE_PACKED)

    @jax.jit
    def count_rounds(raw_j, lens_j):
        ids = M._seed_from_bytes(byte_seed, raw_j, lens_j)
        ranks, merged = M._initial_ranks(ta, ids)
        n_mergeable = (ranks < M.INF_RANK).sum()
        return n_mergeable

    print("initially mergeable pairs:", int(count_rounds(raw_j, lens_j)))
    out = M.merge_words_from_bytes(ta, byte_seed, raw_j, lens_j, False)
    out = np.asarray(out)
    n_out = (out >= 0).sum()
    print(f"seed tokens={word_bytes} out tokens={n_out} merges={word_bytes-n_out}"
          f" max merges/word={int((lens - (out >= 0).sum(axis=1)).max())}")


if __name__ == "__main__":
    main()
