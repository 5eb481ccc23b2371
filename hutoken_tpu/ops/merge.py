"""The BPE greedy-merge fixed-point kernel (XLA/jnp formulation).

Recasts the reference's per-word min-heap loop (src/core.c:66-209,
211-337) as a vectorized fixed point over a padded block of words:

    state: ids [W, L] int32 (PAD = -1), n [W], ranks/merged [W, L]
    round: per word, pick the pair minimizing (rank, index); apply that
    single merge (set merged id, shift the suffix left); re-probe the two
    ranks adjacent to the merge; repeat until no word has a valid pair.

Per word this is *exactly* the sequential greedy order — the heap with
stale-candidate skipping reduces to "merge the (rank, left_idx)-minimum
valid pair" (see oracle.py docstring for the proof) — and words progress
in lockstep, so all parallelism is across the word axis, which is the
axis that is huge in practice.

Why not merge many pairs per word per round?  Batched "local minimum"
merging (merge every pair whose rank beats both neighbors) is NOT
faithful: with vocab ids  s2s3=3, s1s2s3=4, s1s2=5  over elements
[s1,s2,s3], sequential greedy merges (s2,s3) then (s1,s2s3) -> [s1s2s3],
while local-min batching also merges the (s1,s2) "local min" in round
one -> [s1s2, s2s3].  Ranks produced by real BPE training make this rare
but not impossible, and the contract here is byte-for-byte parity.

The rank table lives in HBM as four int32 arrays; probing is a
build-time-bounded unrolled linear scan of gathers (tables.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain Python int (weak-typed in jnp ops, so results stay int32): a
# module-level jnp scalar would initialize the XLA backend at import,
# which breaks jax.distributed.initialize (must run before any backend
# use — see parallel/multihost.py)
INF_RANK = 0x7FFFFFFF


def fast_gather(table_1d: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather that avoids XLA's slow fused-gather path on TPU.

    A plain ``table[idx]`` where ``idx`` is computed inside the program
    lowers to a gather fusion that runs ~100x slower than hardware speed
    (measured ~37M elem/s vs ~5G elem/s on v5e).  ``vmap(dynamic_slice)``
    lowers to a fast dynamic-gather instead.
    """
    flat = idx.reshape(-1)
    out = jax.vmap(lambda j: jax.lax.dynamic_slice(table_1d, (j,), (1,))[0])(flat)
    return out.reshape(idx.shape)


def row_gather(mat: jnp.ndarray, col_idx: jnp.ndarray) -> jnp.ndarray:
    """mat[w, col_idx[w]] for each row w (fast take_along_axis)."""
    return jax.vmap(lambda row, j: jax.lax.dynamic_slice(row, (j,), (1,))[0])(
        mat, col_idx
    )


# capacity at or below which the one-hot MXU probe is used (XLA executes
# the one_hot @ table contraction orders of magnitude faster than its
# scalar-core gather lowering; measured ~14G vs ~0.07G lookups/s on v5e)
ONEHOT_MAX_CAPACITY = 16384

# table modes (the last element of a table_arrays tuple)
MODE_PROBE = 0   # 4 parallel arrays, gather-probe
MODE_ONEHOT = 1  # 4 parallel arrays, one-hot MXU probe
MODE_PACKED = 2  # arrays[0] = (left<<16|right), arrays[1] = (rank<<16|merged)


def _probe_pairs_packed(table, a, b):
    """Big-table probe with 16-bit-packed keys and values: ONE gather
    per probe step (slot key) plus one value gather at the hit slot —
    vs 4 gathers/step for the parallel-array layout.  Requires every
    id and rank < 0xFFFF (tables.build_pair_table checks)."""
    pkey, pval, _unused2, _unused3, probe_len, cap_mask, _mode = table
    shape = a.shape
    af = a.reshape(-1)
    bf = b.reshape(-1)
    h = _hash_slots(af, bf, cap_mask)
    key = ((af.astype(jnp.uint32) << 16) | (bf.astype(jnp.uint32) & 0xFFFF))
    key = key.astype(jnp.int32)

    def body(i, state):
        found, slot_hit = state
        slot = (h + i) & cap_mask
        hit = (~found) & (fast_gather(pkey, slot) == key)
        return found | hit, jnp.where(hit, slot, slot_hit)

    found, slot_hit = jax.lax.fori_loop(
        0, probe_len, body,
        (jnp.zeros(af.shape, dtype=bool), jnp.zeros(af.shape, jnp.int32)),
    )
    v = fast_gather(pval, slot_hit)
    valid = found & (af >= 0) & (bf >= 0)
    rank = jnp.where(valid, (v >> 16) & 0xFFFF, INF_RANK)
    merged = jnp.where(valid, v & 0xFFFF, -1)
    return rank.reshape(shape), merged.reshape(shape)


def probe_pairs(table, a: jnp.ndarray, b: jnp.ndarray):
    """Vectorized open-addressing lookup: (rank, merged) for id pairs.

    ``table`` is a tuple (left, right, rank, merged, probe_len, cap_mask,
    mode) of device arrays / static ints (see MODE_*; for MODE_PACKED the
    first two arrays are the packed key/value tables).
    """
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot = table
    if use_onehot == MODE_PACKED:
        return _probe_pairs_packed(table, a, b)
    if use_onehot:
        return _probe_pairs_onehot(table, a, b)
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)
    h = au * jnp.uint32(0x85EBCA6B)
    h = h ^ (bu * jnp.uint32(0xC2B2AE35))
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> jnp.uint32(15))
    h = (h & jnp.uint32(cap_mask)).astype(jnp.int32)

    def body(i, state):
        rank, merged, found = state
        slot = (h + i) & cap_mask
        hit = (
            (~found)
            & (fast_gather(t_left, slot) == a)
            & (fast_gather(t_right, slot) == b)
        )
        rank = jnp.where(hit, fast_gather(t_rank, slot), rank)
        merged = jnp.where(hit, fast_gather(t_merged, slot), merged)
        return rank, merged, found | hit

    rank, merged, _found = jax.lax.fori_loop(
        0,
        probe_len,
        body,
        (
            jnp.full(a.shape, INF_RANK, dtype=jnp.int32),
            jnp.full(a.shape, -1, dtype=jnp.int32),
            jnp.zeros(a.shape, dtype=bool),
        ),
    )
    valid = (a >= 0) & (b >= 0)
    rank = jnp.where(valid, rank, INF_RANK)
    merged = jnp.where(valid, merged, -1)
    return rank, merged


def _hash_slots(a, b, cap_mask):
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)
    h = au * jnp.uint32(0x85EBCA6B)
    h = h ^ (bu * jnp.uint32(0xC2B2AE35))
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> jnp.uint32(15))
    return (h & jnp.uint32(cap_mask)).astype(jnp.int32)


def _probe_pairs_onehot(table, a, b):
    """Probe via one-hot f32 contraction on the MXU.

    All four slot fields are fetched with a single [N, C] x [C, 12]
    contraction per probe step.  TPU matmuls may run at bf16 precision,
    so each int32 field is decomposed into three bytes before the
    contraction: one-hot weights are 0/1 and byte values are < 256, so
    every product and the single nonzero accumulation term are exact in
    ANY float precision; fields are recombined in int32 afterwards.
    (A plain f32 contraction silently rounds values >= 512 — measured.)
    """
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, _use_onehot = table
    C = cap_mask + 1
    # sentinel handling: empty-slot left/right are -1, map to byte
    # pattern of 2^24-1 so they can't collide with real ids (< 2^24)
    mask24 = jnp.int32((1 << 24) - 1)
    fields = [
        t_left & mask24,
        t_right & mask24,
        jnp.minimum(t_rank, mask24),
        t_merged & mask24,
    ]
    parts = []
    for fvals in fields:
        parts.append((fvals & 0xFF).astype(jnp.float32))
        parts.append(((fvals >> 8) & 0xFF).astype(jnp.float32))
        parts.append(((fvals >> 16) & 0xFF).astype(jnp.float32))
    packed = jnp.stack(parts, axis=1)  # [C, 12]

    shape = a.shape
    af = a.reshape(-1)
    bf = b.reshape(-1)
    h = _hash_slots(af, bf, cap_mask)
    rank = jnp.full(af.shape, INF_RANK, dtype=jnp.int32)
    merged = jnp.full(af.shape, -1, dtype=jnp.int32)
    found = jnp.zeros(af.shape, dtype=bool)

    def recombine(v0, v1, v2):
        return (
            v0.astype(jnp.int32)
            + (v1.astype(jnp.int32) << 8)
            + (v2.astype(jnp.int32) << 16)
        )

    def body(i, state):
        rank, merged, found = state
        slot = (h + i) & cap_mask
        oh = jax.nn.one_hot(slot, C, dtype=jnp.float32)  # fused by XLA
        vals = jax.lax.dot_general(
            oh, packed, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, 12]
        s_left = recombine(vals[:, 0], vals[:, 1], vals[:, 2])
        s_right = recombine(vals[:, 3], vals[:, 4], vals[:, 5])
        hit = (
            (~found)
            & (s_left == (af & mask24))
            & (s_right == (bf & mask24))
            & (s_left != mask24)
        )
        rank = jnp.where(hit, recombine(vals[:, 6], vals[:, 7], vals[:, 8]), rank)
        merged = jnp.where(
            hit, recombine(vals[:, 9], vals[:, 10], vals[:, 11]), merged
        )
        return rank, merged, found | hit

    rank, merged, found = jax.lax.fori_loop(
        0, probe_len, body, (rank, merged, found)
    )
    valid = (af >= 0) & (bf >= 0)
    rank = jnp.where(valid, rank, INF_RANK)
    merged = jnp.where(valid, merged, -1)
    return rank.reshape(shape), merged.reshape(shape)


def _initial_ranks(table, ids: jnp.ndarray):
    """ranks[:, i] = rank of pair (ids[:,i], ids[:,i+1]); INF at tail."""
    a = ids
    b = jnp.concatenate([ids[:, 1:], jnp.full_like(ids[:, :1], -1)], axis=1)
    return probe_pairs(table, a, b)


@functools.partial(jax.jit, static_argnames=("probe_len", "cap_mask", "use_onehot"))
def _merge_fixed_point(
    t_left, t_right, t_rank, t_merged, ids, probe_len, cap_mask, use_onehot
):
    table = (t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot)
    W, L = ids.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)

    ranks, merged = _initial_ranks(table, ids)

    def cond(state):
        ids, ranks, merged = state
        return jnp.any(jnp.min(ranks, axis=1) < INF_RANK)

    def body(state):
        ids, ranks, merged = state
        min_rank = jnp.min(ranks, axis=1)  # [W]
        active = min_rank < INF_RANK
        # leftmost position attaining the min rank
        p = jnp.min(
            jnp.where(ranks == min_rank[:, None], col, L), axis=1
        ).astype(jnp.int32)
        p = jnp.where(active, p, 0)
        p_col = p[:, None]

        m = row_gather(merged, p)  # [W]

        # apply: ids[p] = merged, suffix shifts left, tail becomes PAD
        ids_shift = jnp.concatenate(
            [ids[:, 1:], jnp.full((W, 1), -1, dtype=ids.dtype)], axis=1
        )
        new_ids = jnp.where(col == p_col, m[:, None], ids)
        new_ids = jnp.where(col >= p_col + 1, ids_shift, new_ids)
        new_ids = jnp.where(active[:, None], new_ids, ids)

        # ranks/merged shift for positions >= p+1
        ranks_shift = jnp.concatenate(
            [ranks[:, 1:], jnp.full((W, 1), INF_RANK, dtype=ranks.dtype)], axis=1
        )
        merged_shift = jnp.concatenate(
            [merged[:, 1:], jnp.full((W, 1), -1, dtype=merged.dtype)], axis=1
        )
        new_ranks = jnp.where(col >= p_col + 1, ranks_shift, ranks)
        new_merged = jnp.where(col >= p_col + 1, merged_shift, merged)

        # re-probe the two affected pairs: (p-1, p) and (p, p+1)
        left_a = row_gather(new_ids, jnp.maximum(p - 1, 0))
        left_b = m
        right_b = row_gather(new_ids, jnp.minimum(p + 1, L - 1))
        pa = jnp.stack([left_a, m], axis=0)  # [2, W]
        pb = jnp.stack([left_b, right_b], axis=0)
        pa = pa.at[0].set(jnp.where(p > 0, left_a, -1))
        pb = pb.at[1].set(jnp.where(p + 1 <= L - 1, right_b, -1))
        r2, m2 = probe_pairs(table, pa, pb)

        # scatter the two recomputed entries
        new_ranks = jnp.where(
            (col == p_col - 1) & active[:, None], r2[0][:, None], new_ranks
        )
        new_merged = jnp.where(
            (col == p_col - 1) & active[:, None], m2[0][:, None], new_merged
        )
        new_ranks = jnp.where(
            (col == p_col) & active[:, None], r2[1][:, None], new_ranks
        )
        new_merged = jnp.where(
            (col == p_col) & active[:, None], m2[1][:, None], new_merged
        )

        new_ranks = jnp.where(active[:, None], new_ranks, ranks)
        new_merged = jnp.where(active[:, None], new_merged, merged)
        return new_ids, new_ranks, new_merged

    ids, ranks, merged = jax.lax.while_loop(cond, body, (ids, ranks, merged))
    return ids


def merge_words(table_arrays, ids: jnp.ndarray) -> jnp.ndarray:
    """Run the fixed point on a padded [W, L] block; returns merged ids
    (PAD = -1 fills the freed tail positions)."""
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot = table_arrays
    return _merge_fixed_point(
        t_left, t_right, t_rank, t_merged, ids,
        probe_len=probe_len, cap_mask=cap_mask, use_onehot=use_onehot,
    )


def _compact_output(out_ids: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """Pack merge results for a minimal host transfer.

    ``out_ids`` is [W, L] with PAD = -1 scattered at the tail of each
    row.  Returns ONE 1-D array ``[W + W*L]``: per-row token counts
    first, then all valid tokens compacted row-major (row r's tokens at
    ``flat[W + cumsum_excl(counts)[r] : ... + counts[r]]``).  The host
    downloads only a prefix of this (token count is bounded by the seed
    count, known host-side), so the d2h transfer scales with real
    output bytes instead of the padded block — on tunneled links the
    transfer otherwise dominates the whole device phase.
    """
    W, L = out_ids.shape
    valid = out_ids >= 0
    counts = jnp.sum(valid, axis=1, dtype=jnp.int32)  # [W]
    row_base = jnp.cumsum(counts) - counts  # exclusive prefix [W]
    pos = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1  # within-row index
    dest = row_base[:, None] + pos
    dest = jnp.where(valid, dest, W * L)  # out-of-bounds => dropped
    flat = jnp.zeros((W * L,), dtype=out_dtype)
    flat = flat.at[dest.reshape(-1)].set(
        out_ids.astype(out_dtype).reshape(-1), mode="drop", unique_indices=True
    )
    return jnp.concatenate([counts.astype(out_dtype), flat])


@functools.partial(jax.jit, static_argnames=("n",))
def slice_prefix(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Device-side prefix slice (download less; one compile per n)."""
    return jax.lax.slice(x, (0,), (n,))


@functools.partial(
    jax.jit, static_argnames=("probe_len", "cap_mask", "use_onehot", "u16_out")
)
def _merge_ids_packed(
    t_left, t_right, t_rank, t_merged, ids, probe_len, cap_mask, use_onehot, u16_out
):
    out = _merge_fixed_point.__wrapped__(
        t_left, t_right, t_rank, t_merged, ids, probe_len, cap_mask, use_onehot
    )
    return _compact_output(out, jnp.uint16 if u16_out else jnp.int32)


def merge_words_packed(table_arrays, ids: jnp.ndarray, u16_out: bool):
    """Like merge_words but returns the compact packed layout
    (see _compact_output)."""
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot = table_arrays
    return _merge_ids_packed(
        t_left, t_right, t_rank, t_merged, ids,
        probe_len=probe_len, cap_mask=cap_mask, use_onehot=use_onehot,
        u16_out=u16_out,
    )


@functools.partial(
    jax.jit, static_argnames=("probe_len", "cap_mask", "use_onehot", "u16_out")
)
def _merge_bytes_packed(
    t_left, t_right, t_rank, t_merged, byte_seed, raw, lens,
    probe_len, cap_mask, use_onehot, u16_out,
):
    ids = _seed_from_bytes(byte_seed, raw, lens)
    out = _merge_fixed_point.__wrapped__(
        t_left, t_right, t_rank, t_merged, ids, probe_len, cap_mask, use_onehot
    )
    return _compact_output(out, jnp.uint16 if u16_out else jnp.int32)


def merge_words_from_bytes_packed(
    table_arrays, byte_seed, raw: jnp.ndarray, lens: jnp.ndarray, u16_out: bool
):
    """Byte-mode fast path with the compact packed output layout."""
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot = table_arrays
    return _merge_bytes_packed(
        t_left, t_right, t_rank, t_merged, byte_seed, raw, lens,
        probe_len=probe_len, cap_mask=cap_mask, use_onehot=use_onehot,
        u16_out=u16_out,
    )


def _seed_from_bytes(byte_seed, raw: jnp.ndarray, lens: jnp.ndarray):
    """uint8 word bytes [W, L] + lens [W] -> seed ids int32 (PAD = -1).

    The byte -> initial-id composition (reference: src/pretokenizer.c:56-73
    + per-char vocab lookup) runs on device so the host ships 1 byte per
    input byte instead of 4-byte id lanes.
    """
    W, L = raw.shape
    ids = fast_gather(byte_seed, raw.astype(jnp.int32))
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
    return jnp.where(col < lens[:, None], ids, -1)


@functools.partial(
    jax.jit,
    static_argnames=("probe_len", "cap_mask", "use_onehot", "u16_out"),
)
def _merge_bytes_fixed_point(
    t_left, t_right, t_rank, t_merged, byte_seed, raw, lens,
    probe_len, cap_mask, use_onehot, u16_out,
):
    ids = _seed_from_bytes(byte_seed, raw, lens)
    out = _merge_fixed_point.__wrapped__(
        t_left, t_right, t_rank, t_merged, ids, probe_len, cap_mask, use_onehot
    )
    if u16_out:
        # 0xFFFF marks PAD; requires vocab ids < 65535 (checked host-side)
        return jnp.where(out < 0, 0xFFFF, out).astype(jnp.uint16)
    return out


def merge_words_from_bytes(
    table_arrays, byte_seed, raw: jnp.ndarray, lens: jnp.ndarray, u16_out: bool
):
    """Byte-mode fast path: uint8 in, uint16 (or int32) out — minimizes
    host<->device traffic, which dominates on tunneled links."""
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot = table_arrays
    return _merge_bytes_fixed_point(
        t_left, t_right, t_rank, t_merged, byte_seed, raw, lens,
        probe_len=probe_len, cap_mask=cap_mask, use_onehot=use_onehot,
        u16_out=u16_out,
    )
