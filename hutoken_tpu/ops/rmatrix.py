"""Lookup-free string-path merge kernel (the "R-matrix" kernel).

In the string path the rank of an adjacent pair is the vocab id of the
concatenated spelling (reference: src/core.c:700-722), and every span
the merge loop can ever create is a contiguous run of the word's seed
elements.  So ALL ranks the loop can need live in one per-word matrix

    R[w, i, d] = vocab id of the spelling of elements i..i+d of word w
                 (INF when that spelling is not a token)

built ONCE per block:

1. double 32-bit rolling hashes of every span (elementwise; an element
   appends as ``h' = h * pmul[e] + ehash[e]`` with per-element constants
   gathered from 256-entry tables),
2. one sort-merge join of all span hashes against the vocab's spelling
   hashes (``jax.lax.sort`` + an associative forward-fill scan — the
   only bulk-lookup primitive that runs at hardware speed on TPU for
   large tables; one-hot MXU probes stop paying past ~16K slots and
   XLA's native gather lowers to the slow scalar core),
3. scatter of matched ids into R.

The merge fixed point then needs NO shared-table lookups: per round it
recomputes all pair ranks with per-row dynamic-slice gathers from the
word's own R row (VPU-speed), picks the (rank, leftmost) minimum, and
applies one merge per word — byte-for-byte the reference's greedy order
(see ops/merge.py for the equivalence argument).  The merged id IS the
rank, so no separate merged-id bookkeeping exists at all.

This kernel serves big vocabularies (GPT-2 scale), where the
open-addressed probe kernel in ops/merge.py is gather-bound; the
one-hot probe kernel remains the fast path for small tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .merge import INF_RANK, _compact_output, _hash_slots, fast_gather


def _shift_left(x: jnp.ndarray, k: int, fill=0) -> jnp.ndarray:
    """x[:, i+k] with `fill` padding on the right."""
    if k == 0:
        return x
    return jnp.pad(
        x[:, k:], ((0, 0), (0, k)), constant_values=fill
    )


def _row_gather(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """mat[w, idx[w, j]] for each row w — per-row dynamic-slice gathers
    (the fast in-row lowering; computed-index shared gathers are slow)."""

    def per_row(row, ix):
        return jax.vmap(
            lambda j: jax.lax.dynamic_slice(row, (j,), (1,))[0]
        )(ix)

    return jax.vmap(per_row)(mat, idx)


def _resolve_spans(
    sh1, sh2, stid, k1, k2, probe_len: int, cap_mask: int, scut=None
):
    """Open-addressed lookup of span double-hashes -> token id (-1 miss).

    Same bounded linear probing as ops.merge.probe_pairs; slot index is
    the pair-mix of the two hashes (must match tables._mix_hash).  A
    sort-merge join resolve was exact but took minutes to compile on
    the remote compiler; this probe compiles like the proven kernels.

    With ``scut`` also gathers the merges-path cut value of the hit slot
    (0 on miss); returns (tid, cut) then, tid alone otherwise.
    """
    shape = k1.shape
    k1f = k1.reshape(-1)
    k2f = k2.reshape(-1)
    h = _hash_slots(k1f, k2f, cap_mask)

    def body(i, state):
        found, slot_hit = state
        slot = (h + i) & cap_mask
        hit = (
            (~found)
            & (fast_gather(sh1, slot) == k1f)
            & (fast_gather(sh2, slot) == k2f)
        )
        return found | hit, jnp.where(hit, slot, slot_hit)

    found, slot_hit = jax.lax.fori_loop(
        0,
        probe_len,
        body,
        (
            jnp.zeros(k1f.shape, dtype=bool),
            jnp.zeros(k1f.shape, dtype=jnp.int32),
        ),
    )
    # empty slots carry stid = -1, so a (0,0)-hash span that "hits" an
    # empty slot still resolves to miss
    tid = fast_gather(stid, slot_hit)
    tid = jnp.where(found, tid, -1).reshape(shape)
    if scut is None:
        return tid
    cut = fast_gather(scut, slot_hit)
    cut = jnp.where(found, cut, 0).reshape(shape)
    return tid, cut


def _build_r(
    sh1, sh2, stid, eh1, pm1, eh2, pm2, ids, lens,
    D: int, probe_len: int, cap_mask: int, scut=None,
):
    """Build R (flattened to [W, L*D]) for one block.

    eh*/pm* are the per-element hash constants [W, L]; ids are the seed
    ids (d=1 diagonal); lens the element counts.  Span hashes stay in
    span order, so R assembles with a stack — no scatter needed.

    With ``scut`` (merges path), also returns CUT [W, L*D]: the
    producing rule's left-side element count for each span's token
    (0 = that token is not any rule's output; d = 1 plane is 0).
    """
    W, L = ids.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)

    # d = 1 plane: the seed ids themselves (INF at padding)
    planes = [jnp.where(col < lens[:, None], ids, INF_RANK)]
    cut_planes = [jnp.zeros((W, L), dtype=jnp.int32)]

    h1 = eh1
    h2 = eh2
    ch1 = []
    ch2 = []
    for d in range(2, D + 1):
        h1 = h1 * _shift_left(pm1, d - 1, 1) + _shift_left(eh1, d - 1)
        h2 = h2 * _shift_left(pm2, d - 1, 1) + _shift_left(eh2, d - 1)
        ch1.append(h1)
        ch2.append(h2)
    if ch1:
        K1 = jnp.stack(ch1)  # [D-1, W, L]
        K2 = jnp.stack(ch2)
        if scut is None:
            tid = _resolve_spans(sh1, sh2, stid, K1, K2, probe_len, cap_mask)
            cut = None
        else:
            tid, cut = _resolve_spans(
                sh1, sh2, stid, K1, K2, probe_len, cap_mask, scut
            )
        dvec = jnp.arange(2, D + 1, dtype=jnp.int32)[:, None, None]
        validc = (col[None] + dvec) <= lens[None, :, None]
        rank = jnp.where(validc & (tid >= 0), tid, INF_RANK)
        planes.extend(rank[i] for i in range(D - 1))
        if scut is not None:
            cutv = jnp.where(validc & (tid >= 0), cut, 0)
            cut_planes.extend(cutv[i] for i in range(D - 1))

    R = jnp.stack(planes, axis=2).reshape(W, L * D)
    if scut is None:
        return R
    return R, jnp.stack(cut_planes, axis=2).reshape(W, L * D)


def _merge_fixed_point_r(R: jnp.ndarray, lens: jnp.ndarray, D: int, CUT=None):
    """Greedy merge over spans (start, count) with ranks from R.

    With ``CUT`` (merges path) a boundary is mergeable only when the
    combined span's token is produced by a rule whose left side is
    exactly the left span (CUT[st, d] == left count) — see
    tables.SubstrMergesTable for why this characterizes rule existence.
    """
    W = R.shape[0]
    L = R.shape[1] // D
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
    st0 = col
    ln0 = jnp.where(col < lens[:, None], 1, 0).astype(jnp.int32)

    def ranks_of(st, ln):
        ln_r = _shift_left(ln, 1)
        d = ln + ln_r
        valid = (ln > 0) & (ln_r > 0) & (d <= D)
        idx = jnp.clip(st * D + d - 1, 0, L * D - 1)
        r = _row_gather(R, idx)
        if CUT is not None:
            valid = valid & (_row_gather(CUT, idx) == ln)
        return jnp.where(valid, r, INF_RANK)

    def cond(state):
        _st, _ln, ranks = state
        return jnp.any(jnp.min(ranks, axis=1) < INF_RANK)

    def body(state):
        st, ln, ranks = state
        min_rank = jnp.min(ranks, axis=1)
        active = min_rank < INF_RANK
        p = jnp.min(
            jnp.where(ranks == min_rank[:, None], col, L), axis=1
        ).astype(jnp.int32)
        p = jnp.where(active, p, 0)
        p_col = p[:, None]

        ln_at_p = _row_gather(ln, p[:, None])[:, 0]
        ln_right = _row_gather(ln, jnp.minimum(p + 1, L - 1)[:, None])[:, 0]
        merged_ln = ln_at_p + ln_right

        ln_shift = _shift_left(ln, 1)
        st_shift = _shift_left(st, 1)
        new_ln = jnp.where(col == p_col, merged_ln[:, None], ln)
        new_ln = jnp.where(col >= p_col + 1, ln_shift, new_ln)
        new_st = jnp.where(col >= p_col + 1, st_shift, st)
        new_ln = jnp.where(active[:, None], new_ln, ln)
        new_st = jnp.where(active[:, None], new_st, st)
        return new_st, new_ln, ranks_of(new_st, new_ln)

    st, ln, _ranks = jax.lax.while_loop(
        cond, body, (st0, ln0, ranks_of(st0, ln0))
    )
    # final ids: R[st, ln] (d=1 diagonal covers unmerged seeds)
    idx = jnp.clip(st * D + ln - 1, 0, R.shape[1] - 1)
    out = _row_gather(R, idx)
    return jnp.where(ln > 0, out, -1)


@functools.partial(
    jax.jit, static_argnames=("D", "probe_len", "cap_mask", "u16_out")
)
def _merge_bytes_rmatrix(
    sh1, sh2, stid, byte_seed, b_eh1, b_pm1, b_eh2, b_pm2,
    raw, lens, D, probe_len, cap_mask, u16_out,
):
    W, L = raw.shape
    rawi = raw.astype(jnp.int32)
    ids = fast_gather(byte_seed, rawi)
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
    ids = jnp.where(col < lens[:, None], ids, -1)
    eh1 = fast_gather(b_eh1, rawi)
    pm1 = fast_gather(b_pm1, rawi)
    eh2 = fast_gather(b_eh2, rawi)
    pm2 = fast_gather(b_pm2, rawi)
    R = _build_r(
        sh1, sh2, stid, eh1, pm1, eh2, pm2, ids, lens,
        D, probe_len, cap_mask,
    )
    out = _merge_fixed_point_r(R, lens, D)
    return _compact_output(out, jnp.uint16 if u16_out else jnp.int32)


def merge_words_from_bytes_rmatrix(
    substr_arrays, byte_seed, raw, lens, D: int, u16_out: bool
):
    """Byte-mode R-matrix path; same packed output contract as
    ops.merge.merge_words_from_bytes_packed."""
    sh1, sh2, stid, b_eh1, b_pm1, b_eh2, b_pm2, probe_len = substr_arrays
    return _merge_bytes_rmatrix(
        sh1, sh2, stid, byte_seed, b_eh1, b_pm1, b_eh2, b_pm2,
        raw, lens, D=D, probe_len=probe_len,
        cap_mask=sh1.shape[0] - 1, u16_out=u16_out,
    )


@functools.partial(
    jax.jit, static_argnames=("D", "probe_len", "cap_mask", "u16_out")
)
def _merge_bytes_rmatrix_merges(
    sh1, sh2, stid, scut, byte_seed, b_eh1, b_pm1, b_eh2, b_pm2,
    raw, lens, D, probe_len, cap_mask, u16_out,
):
    W, L = raw.shape
    rawi = raw.astype(jnp.int32)
    ids = fast_gather(byte_seed, rawi)
    col = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
    ids = jnp.where(col < lens[:, None], ids, -1)
    eh1 = fast_gather(b_eh1, rawi)
    pm1 = fast_gather(b_pm1, rawi)
    eh2 = fast_gather(b_eh2, rawi)
    pm2 = fast_gather(b_pm2, rawi)
    R, CUT = _build_r(
        sh1, sh2, stid, eh1, pm1, eh2, pm2, ids, lens,
        D, probe_len, cap_mask, scut=scut,
    )
    out = _merge_fixed_point_r(R, lens, D, CUT=CUT)
    return _compact_output(out, jnp.uint16 if u16_out else jnp.int32)


def merge_words_from_bytes_rmatrix_merges(
    substr_arrays, byte_seed, raw, lens, D: int, u16_out: bool
):
    """Merges/id-path R-matrix kernel (GPT-2-scale rule tables); same
    packed output contract as ops.merge.merge_words_from_bytes_packed.
    Reference semantics: src/core.c:211-337 (greedy by (rule rank,
    leftmost)); rank order is represented by merged-id order, which
    tables.build_substr_table_merges verifies is equivalent."""
    (sh1, sh2, stid, scut, b_eh1, b_pm1, b_eh2, b_pm2, probe_len) = (
        substr_arrays
    )
    return _merge_bytes_rmatrix_merges(
        sh1, sh2, stid, scut, byte_seed, b_eh1, b_pm1, b_eh2, b_pm2,
        raw, lens, D=D, probe_len=probe_len,
        cap_mask=sh1.shape[0] - 1, u16_out=u16_out,
    )
