"""Fused Pallas merge kernel for small/mid pair tables (the TPU-native
hot path for unique-word byte-level BPE).

Why this kernel exists: XLA's gather lowering on TPU runs at a flat
~130M lookups/s regardless of table size, which caps any probe-per-round
merge loop near ~20 MB/s of word bytes.  Mosaic's ``tpu.dynamic_gather``
(``jnp.take_along_axis`` along lanes inside a Pallas kernel) runs at
tens of billions of lane-lookups/s, so this kernel keeps the ENTIRE
greedy fixed point on-chip in VMEM/registers:

* the pair table hashes each key to one of 128 lanes; the bucket's
  entries sit at that lane across ``depth`` static pages, so a probe is
  ``depth`` lane-gathers with zero per-lane page selection,
* ``128/GROUP_W`` words share one 128-lane row (GROUP_W = 8 or 16
  lanes per word, picked per length bucket); all per-word reductions
  (leftmost min-rank pair) are masked prefix-min lane gathers within
  the group,
* merges apply in place over a doubly-linked alive list (lane holes
  instead of suffix shifts — the Pallas analog of the reference's
  linked-list splice, src/core.c:139-148); survivors compact at the
  end inside the kernel via a monotone fixed-point gather,
* every *provably safe* local-minimum pair merges in the same round as
  the per-word argmin, cutting round count ~2x with byte-exact output;
  safety is certified per pair through a precomputed ``minsuper`` bound
  carried inside the table value word, so the guard costs two lane
  gathers per round.

Safety argument for the multi-merge: let pair j have rank r_j, and let
each neighbor pair (j-1, j+1) be either absent, or finite-ranked with
rank > r_j AND ``minsuper[rank] > r_j``, where ``minsuper[r]`` = the
minimum rank over all pairs whose concatenated spelling STRICTLY
contains the spelling of a rank-r pair (build_minsuper).  Every future
version of neighbor pair j-1 (as merges land further left) spans a
superstring of its current spelling, so its rank is either INF
(unmergeable — it can never consume j's constituent) or >= minsuper of
the current rank > r_j.  Neighbors therefore never undercut r_j, so
sequential greedy (src/core.c:66-209 order: min rank, leftmost) merges
pair j with exactly its current constituents at some point — applying
it early is output-invariant.  Neighbors with INF rank are NOT safe
(their future versions are unbounded) and block the fast path for pair
j.  Safe pairs are pairwise non-adjacent (strict local minima), and
the per-word leftmost argmin is also non-adjacent to every safe pair
(a neighbor of a safe pair has strictly larger rank than the group
minimum), so the whole applied set commutes.  Without a certified
minsuper the safe set is empty and the kernel degrades to the plain
one-merge-per-word-per-round lockstep, the proven-exact baseline.

Value-word layouts (static ``rank_in_val`` flag):

* string path (pair rank == merged id, src/core.c:700-722):
  ``tv = minsuper16 | merged16`` and rank is read as the merged id —
  the safety bound rides along with every probe for free;
* merges path (explicit rule ranks, src/core.c:724-736):
  ``tv = rank16 | merged16`` plus a second value plane ``tv2`` holding
  ``minsuper16`` at the same bucket slot.

Reference semantics: src/core.c:66-209.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

# rank sentinel INSIDE the kernel (fits the rank*GROUP_W+pos argmin
# packing; real ranks are < 0xFFFF by the build-time check)
_INFS = 0x10000
_INFKEY = 0x7FFFFFFF

ROW_TILE = 256  # rows per grid step


class PallasTable:
    """Bucketed pair table + byte LUT, kernel-ready (see module doc)."""

    def __init__(self, tk, tv, tv2, lut, depth, rank_in_val, multi_ok,
                 partial=False):
        self.tk = tk  # np.int32 [8, depth*128] (row-replicated pages)
        self.tv = tv
        self.tv2 = tv2  # np.int32 [8, depth*128] (merges path) or [8,128]
        self.lut = lut  # np.int32 [8, 256]
        self.depth = int(depth)
        self.rank_in_val = bool(rank_in_val)
        self.multi_ok = bool(multi_ok)
        # partial tables hold only a rank prefix of the rules; results
        # need the final-state full-table check (see build_pallas_table)
        self.partial = bool(partial)


def build_minsuper(
    pairs: dict[tuple[int, int], tuple[int, int]],
    id2str: dict[int, bytes],
) -> "np.ndarray | None":
    """minsuper[r] = min rank over pairs whose concatenated spelling
    strictly contains the spelling of any rank-r pair (0xFFFF if none).

    This certifies the multi-merge safety bound (module docstring): a
    neighbor pair of current rank r can, in any future version, only
    take ranks >= minsuper[r] (or INF).  Works for both rank semantics
    — string path (rank = merged id) and merges path (rule ranks) —
    because in both, a pair's spelling is the concatenation of its
    sides' spellings.
    """
    if not pairs:
        return np.full(1, 0xFFFF, dtype=np.int32)
    max_rank = max(r for r, _m in pairs.values())
    if max_rank >= 0xFFFF:
        return None
    ms = np.full(max_rank + 1, 0xFFFF, dtype=np.int32)
    by_str: dict[bytes, list[int]] = {}
    str_minrank: dict[bytes, int] = {}
    for (a, b), (r, _m) in pairs.items():
        sa = id2str.get(a)
        sb = id2str.get(b)
        if sa is None or sb is None:
            return None  # cannot certify spellings: disable multi-merge
        s = sa + sb
        by_str.setdefault(s, []).append(r)
        prev = str_minrank.get(s)
        if prev is None or r < prev:
            str_minrank[s] = r
    for t, minrank_t in str_minrank.items():
        n = len(t)
        for ln in range(2, n):  # pair spellings have length >= 2
            for st in range(0, n - ln + 1):
                rs = by_str.get(t[st : st + ln])
                if rs:
                    for r in rs:
                        if minrank_t < ms[r]:
                            ms[r] = minrank_t
    return ms


MAX_DEPTH = 40  # bucket-depth budget (~up to ≈3000 pairs exactly)


def build_pallas_table(pairs, byte_seed_ids, id2str=None) -> "PallasTable | None":
    """Build the bucketed kernel table from the raw pair dict.

    When the full rule set does not fit the depth budget, the table is
    built PARTIAL: the longest rank-contiguous prefix of rules (rank
    order) that fits.  Partial tables are exact-with-detection: let
    R_cut be the first excluded rank.  Greedy with the partial table
    applies the same merges as true greedy while the true minimum rank
    is < R_cut (identical states by induction); at the first state
    whose true minimum rank is >= R_cut, the partial table sees no
    applicable pair at all (its rules are exactly those < R_cut) and
    stops in that state — where the skipped rule's pair is still
    adjacent.  So a word's partial result is the true result IFF no
    adjacent pair of the final state has a rule in the FULL table; the
    caller probes that (one batched lookup) and re-encodes flagged
    words on the exact host path.

    Returns None when ids/ranks overflow 16 bits or spellings are
    unavailable.  With ``id2str`` the multi-merge guard is built too
    (safe to omit: single-merge rounds result).
    """
    from ..tables import _mix_hash

    if byte_seed_ids is None:
        return None
    rank_in_val = True
    for (a, b), (r, m) in pairs.items():
        if a >= 0xFFFF or b >= 0xFFFF or r >= 0xFFFF or m >= 0xFFFF:
            return None
        if r != m:
            rank_in_val = False
    ms = None
    if id2str is not None:
        ms = build_minsuper(pairs, id2str)
    multi_ok = ms is not None
    partial = False
    if pairs:
        keys = np.array(list(pairs.keys()), dtype=np.int64)
        vals = np.array(list(pairs.values()), dtype=np.int64)
        lanes = (
            _mix_hash(
                keys[:, 0].astype(np.uint32), keys[:, 1].astype(np.uint32)
            )
            & 127
        ).astype(np.int64)
        counts = np.bincount(lanes, minlength=128)
        depth = int(counts.max())
        if depth > MAX_DEPTH:
            # partial build: rank-ascending prefix until a bucket fills
            order = np.argsort(vals[:, 0], kind="stable")
            fill_cnt = np.zeros(128, dtype=np.int64)
            take = []
            for i in order:
                ln = lanes[i]
                if fill_cnt[ln] >= MAX_DEPTH:
                    break  # first overflow ends the rank prefix
                fill_cnt[ln] += 1
                take.append(i)
            take = np.array(take, dtype=np.int64)
            if take.shape[0] < 256:
                return None  # not worth a kernel launch
            keys = keys[take]
            vals = vals[take]
            lanes = lanes[take]
            depth = int(np.bincount(lanes, minlength=128).max())
            partial = True
    else:
        depth = 1
    tk1 = np.full(depth * 128, -1, dtype=np.int32)
    tv1 = np.zeros(depth * 128, dtype=np.int32)
    tw1 = np.zeros(depth * 128, dtype=np.int32)
    if pairs:
        pk = (
            (keys[:, 0].astype(np.uint32) << np.uint32(16))
            | keys[:, 1].astype(np.uint32)
        ).view(np.int32)
        ranks = vals[:, 0]
        msv = (
            ms[ranks].astype(np.int64)
            if multi_ok
            else np.zeros(len(ranks), dtype=np.int64)
        )
        if rank_in_val:
            hi = msv  # rank recoverable from merged; carry the bound
        else:
            hi = ranks
        pv = (
            (hi.astype(np.uint32) << np.uint32(16))
            | vals[:, 1].astype(np.uint32)
        ).view(np.int32)
        pw = msv.astype(np.int32)
        fill = np.zeros(128, dtype=np.int64)
        for i in range(keys.shape[0]):
            ln = lanes[i]
            s = fill[ln]
            fill[ln] = s + 1
            tk1[s * 128 + ln] = pk[i]
            tv1[s * 128 + ln] = pv[i]
            tw1[s * 128 + ln] = pw[i]
    tk = np.tile(tk1[None, :], (8, 1))
    tv = np.tile(tv1[None, :], (8, 1))
    lut = np.tile(
        np.asarray(byte_seed_ids, dtype=np.int32)[None, :], (8, 1)
    )
    if rank_in_val or not multi_ok:
        tv2 = np.zeros((8, 128), dtype=np.int32)  # unused dummy
    else:
        tv2 = np.tile(tw1[None, :], (8, 1))
    return PallasTable(
        tk, tv, tv2, lut, depth, rank_in_val, multi_ok, partial=partial
    )


def _kernel(tk_ref, tv_ref, tv2_ref, lut_ref, raw_ref, len_ref,
            out_ref, cnt_ref, *, depth, group_w, rank_in_val, multi_ok,
            debug_rounds=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    blk = out_ref.shape[0]
    shape = (blk, 128)

    # all-empty tiles (padding rows of the raw-path block, ops/split.py)
    # skip the whole fixed point + compaction: one reduction, two fills
    has_work = jnp.any(len_ref[:] > 0)

    @pl.when(jnp.logical_not(has_work))
    def _empty_tile():
        out_ref[:] = jnp.full(shape, -1, jnp.int32)
        cnt_ref[:] = jnp.zeros(shape, jnp.int32)

    @pl.when(has_work)
    def _full_tile():
        _kernel_body(
            tk_ref, tv_ref, tv2_ref, lut_ref, raw_ref, len_ref,
            out_ref, cnt_ref, depth=depth, group_w=group_w,
            rank_in_val=rank_in_val, multi_ok=multi_ok,
            debug_rounds=debug_rounds,
        )


def _kernel_body(tk_ref, tv_ref, tv2_ref, lut_ref, raw_ref, len_ref,
                 out_ref, cnt_ref, *, depth, group_w, rank_in_val, multi_ok,
                 debug_rounds=None):
    import jax
    import jax.numpy as jnp

    blk = out_ref.shape[0]
    shape = (blk, 128)

    def bcast_row(row):
        return jax.lax.broadcast_in_dim(row, shape, (1,))

    def gat(x, idx):
        return jnp.take_along_axis(x, idx, axis=1)

    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    pos = lane & (group_w - 1)
    gend = lane | (group_w - 1)

    raw = raw_ref[:].astype(jnp.int32)
    lens = len_ref[:].astype(jnp.int32)

    # byte -> seed id via the 256-entry LUT (2 pages)
    lo = gat(bcast_row(lut_ref[0, 0:128]), raw & 127)
    hi = gat(bcast_row(lut_ref[0, 128:256]), raw & 127)
    ids0 = jnp.where(raw < 128, lo, hi)
    ids0 = jnp.where(pos < lens, ids0, -1)

    def srl(x, k):
        return jax.lax.shift_right_logical(x, jnp.int32(k))

    def probe(a, b, validp):
        """(rank, merged, msup) of pair (a, b); rank = _INFS when
        absent/invalid.  Bucket layout: the key's lane is its hash
        (identical to tables._mix_hash) & 127; the bucket's entries sit
        at that lane across ``depth`` static pages.  Bucket keys are
        distinct, so at most one page matches."""
        key = (a << 16) | (b & 0xFFFF)
        h = a * jnp.int32(np.int32(np.uint32(0x85EBCA6B)))
        h = h ^ (b * jnp.int32(np.int32(np.uint32(0xC2B2AE35))))
        h = h ^ srl(h, 13)
        h = h * jnp.int32(np.int32(np.uint32(0x27D4EB2F)))
        h = h ^ srl(h, 15)
        ln = h & 127
        # init -1 == (0xFFFF, 0xFFFF): unreachable, both fields < 0xFFFF
        val = jnp.full(shape, -1, jnp.int32)
        for s in range(depth):
            kp = gat(bcast_row(tk_ref[0, s * 128:(s + 1) * 128]), ln)
            vp = gat(bcast_row(tv_ref[0, s * 128:(s + 1) * 128]), ln)
            val = jnp.where(kp == key, vp, val)
        hit = (val != -1) & validp
        merged = val & 0xFFFF
        if rank_in_val:
            rank = jnp.where(hit, merged, _INFS)
            msup = srl(val, 16)
        elif multi_ok:
            rank = jnp.where(hit, srl(val, 16) & 0xFFFF, _INFS)
            w = jnp.zeros(shape, jnp.int32)
            for s in range(depth):
                wp = gat(bcast_row(tv2_ref[0, s * 128:(s + 1) * 128]), ln)
                kp = gat(bcast_row(tk_ref[0, s * 128:(s + 1) * 128]), ln)
                w = jnp.where(kp == key, wp, w)
            msup = w
        else:
            rank = jnp.where(hit, srl(val, 16) & 0xFFFF, _INFS)
            msup = jnp.zeros(shape, jnp.int32)
        merged = jnp.where(hit, merged, -1)
        return rank, merged, msup

    # doubly-linked alive list over lanes (self-pointer = boundary)
    nxt0 = jnp.where(pos + 1 < lens, jnp.minimum(lane + 1, 127), lane)
    prv0 = jnp.where((pos >= 1) & (pos < lens), lane - 1, lane)

    def body(state):
        ids, nxt, prv, _go = state
        alive = ids >= 0
        b = gat(ids, nxt)
        validp = alive & (nxt != lane)
        rank, merged, msup = probe(ids, b, validp)

        # leftmost min-rank pair per group: prefix-min of
        # rank*group_w+pos, broadcast from the group-end lane
        pkey = jnp.where(rank < _INFS, rank * group_w + pos, _INFKEY)
        m = pkey
        k = 1
        while k < group_w:
            sh = gat(m, jnp.maximum(lane - k, 0))
            m = jnp.minimum(m, jnp.where(pos >= k, sh, _INFKEY))
            k *= 2
        gmin = gat(m, gend)
        has = gmin < _INFKEY
        p_ = gmin & (group_w - 1)
        applied = has & (pos == p_)

        if multi_ok:
            # provably safe local minima (module docstring): the
            # neighbor must outrank this pair now AND in all futures
            rprev = gat(rank, prv)
            rnext = gat(rank, nxt)
            msl = gat(msup, prv)
            msr = gat(msup, nxt)
            last_pair = gat(nxt, nxt) == nxt
            first_pair = prv == lane
            safe_l = first_pair | (
                (rprev < _INFS) & (rprev > rank) & (msl > rank)
            )
            safe_r = last_pair | (
                (rnext < _INFS) & (rnext > rank) & (msr > rank)
            )
            applied = applied | (
                validp & (rank < _INFS) & safe_l & safe_r
            )

        new_ids = jnp.where(applied, merged, ids)
        applied_i = applied.astype(jnp.int32)  # i1 gathers unsupported
        consumed = (gat(applied_i, prv) != 0) & (prv != lane)
        new_ids = jnp.where(consumed, -1, new_ids)
        consumed_i = consumed.astype(jnp.int32)
        cnext = gat(consumed_i, nxt) != 0
        nxt2 = jnp.where(cnext, gat(nxt, nxt), nxt)
        cprev = gat(consumed_i, prv) != 0
        prv2 = jnp.where(cprev, gat(prv, prv), prv)
        return new_ids, nxt2, prv2, jnp.any(applied)

    def cond(state):
        return state[3]

    if debug_rounds is None:
        ids, _nxt, _prv, _go = jax.lax.while_loop(
            cond, body, (ids0, nxt0, prv0, jnp.bool_(True))
        )
    else:  # fixed round count: for profiling only (results may be wrong)
        st = (ids0, nxt0, prv0, jnp.bool_(True))
        for _ in range(debug_rounds):
            st = body(st)
        ids = st[0]

    # in-group left compaction: dst pos d pulls from the monotone fixed
    # point src = d + holes_before(src); iterating from above converges
    # (strictly decreasing, src is the largest fixed point) in at most
    # group_w steps
    dead = ((ids < 0) & (pos < lens)).astype(jnp.int32)
    hb = dead
    k = 1
    while k < group_w:
        sh = gat(hb, jnp.maximum(lane - k, 0))
        hb = hb + jnp.where(pos >= k, sh, 0)
        k *= 2
    # hb is now INCLUSIVE holes count; exclusive = hb - dead
    hbx = hb - dead
    gbase = lane & ~(group_w - 1)
    total_holes = gat(hb, gend)
    src = jnp.minimum(lane + total_holes, gend)
    for _ in range(group_w):
        src = jnp.minimum(lane + gat(hbx, src), gend)
    out = gat(ids, src)
    count = jnp.maximum(lens - total_holes, 0)
    out_ref[:] = jnp.where(pos < count, out, -1)
    cnt_ref[:] = count


SEGW = 32  # max word length in the segmented layout (lanes per segment)


def _kernel_seg(tk_ref, tv_ref, tv2_ref, lut_ref, raw_ref, aux_ref,
                out_ref, nxt_ref, *, depth, rank_in_val, multi_ok):
    """Segment-aware variant of the merge kernel for the windowed raw
    layout (ops/split.py): row r of the block is chunk[r*96 : r*96+128]
    verbatim, and each word (<= 32 bytes) lives wholly inside the row of
    its 96-byte start window.  Words therefore sit at ARBITRARY lane
    spans; ``aux`` encodes, per lane, pos (offset within its word, 5
    bits), gend (the word's last lane in this row, 7 bits, = lane for
    dead lanes) and a dead bit (bit 12).  The greedy fixed point is the
    proven `_kernel_body` loop with the fixed-width group reductions
    replaced by segment-relative ones; merges, consumption, linked-list
    splices and the multi-merge safety guard are identical.  No in-kernel
    compaction: survivors stay at their lanes (holes = -1) and the final
    ``nxt`` links come back for the partial-table divergence probe."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    blk = out_ref.shape[0]
    shape = (blk, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    aux = aux_ref[:]
    has_work = jnp.any((aux & (1 << 12)) == 0)

    @pl.when(jnp.logical_not(has_work))
    def _empty_tile():
        out_ref[:] = jnp.full(shape, -1, jnp.int32)
        nxt_ref[:] = lane

    @pl.when(has_work)
    def _full_tile():
        def bcast_row(row):
            return jax.lax.broadcast_in_dim(row, shape, (1,))

        def gat(x, idx):
            return jnp.take_along_axis(x, idx, axis=1)

        def srl(x, k):
            return jax.lax.shift_right_logical(x, jnp.int32(k))

        pos = aux & 31
        gend = srl(aux, 5) & 127
        dead = (aux & (1 << 12)) != 0

        raw = raw_ref[:].astype(jnp.int32)
        lo = gat(bcast_row(lut_ref[0, 0:128]), raw & 127)
        hi = gat(bcast_row(lut_ref[0, 128:256]), raw & 127)
        ids0 = jnp.where(dead, -1, jnp.where(raw < 128, lo, hi))

        def probe(a, b, validp):
            # identical bucket probe to _kernel_body (see its docstring)
            key = (a << 16) | (b & 0xFFFF)
            h = a * jnp.int32(np.int32(np.uint32(0x85EBCA6B)))
            h = h ^ (b * jnp.int32(np.int32(np.uint32(0xC2B2AE35))))
            h = h ^ srl(h, 13)
            h = h * jnp.int32(np.int32(np.uint32(0x27D4EB2F)))
            h = h ^ srl(h, 15)
            ln = h & 127
            val = jnp.full(shape, -1, jnp.int32)
            for s in range(depth):
                kp = gat(bcast_row(tk_ref[0, s * 128:(s + 1) * 128]), ln)
                vp = gat(bcast_row(tv_ref[0, s * 128:(s + 1) * 128]), ln)
                val = jnp.where(kp == key, vp, val)
            hit = (val != -1) & validp
            merged = val & 0xFFFF
            if rank_in_val:
                rank = jnp.where(hit, merged, _INFS)
                msup = srl(val, 16)
            elif multi_ok:
                rank = jnp.where(hit, srl(val, 16) & 0xFFFF, _INFS)
                w = jnp.zeros(shape, jnp.int32)
                for s in range(depth):
                    wp = gat(
                        bcast_row(tv2_ref[0, s * 128:(s + 1) * 128]), ln
                    )
                    kp = gat(
                        bcast_row(tk_ref[0, s * 128:(s + 1) * 128]), ln
                    )
                    w = jnp.where(kp == key, wp, w)
                msup = w
            else:
                rank = jnp.where(hit, srl(val, 16) & 0xFFFF, _INFS)
                msup = jnp.zeros(shape, jnp.int32)
            merged = jnp.where(hit, merged, -1)
            return rank, merged, msup

        nxt0 = jnp.where(lane < gend, lane + 1, lane)
        prv0 = jnp.where((pos > 0) & jnp.logical_not(dead), lane - 1, lane)

        def body(state):
            ids, nxt, prv, _go = state
            alive = ids >= 0
            b = gat(ids, nxt)
            validp = alive & (nxt != lane)
            rank, merged, msup = probe(ids, b, validp)

            # leftmost min-rank pair per SEGMENT: masked prefix-min of
            # rank*SEGW+pos (pos is segment-relative, so the window
            # never crosses a segment start), broadcast from gend
            pkey = jnp.where(rank < _INFS, rank * SEGW + pos, _INFKEY)
            m = pkey
            k = 1
            while k < SEGW:
                sh = gat(m, jnp.maximum(lane - k, 0))
                m = jnp.minimum(m, jnp.where(pos >= k, sh, _INFKEY))
                k *= 2
            gmin = gat(m, gend)
            has = gmin < _INFKEY
            p_ = gmin & (SEGW - 1)
            applied = has & (pos == p_)

            if multi_ok:
                rprev = gat(rank, prv)
                rnext = gat(rank, nxt)
                msl = gat(msup, prv)
                msr = gat(msup, nxt)
                last_pair = gat(nxt, nxt) == nxt
                first_pair = prv == lane
                safe_l = first_pair | (
                    (rprev < _INFS) & (rprev > rank) & (msl > rank)
                )
                safe_r = last_pair | (
                    (rnext < _INFS) & (rnext > rank) & (msr > rank)
                )
                applied = applied | (
                    validp & (rank < _INFS) & safe_l & safe_r
                )

            new_ids = jnp.where(applied, merged, ids)
            applied_i = applied.astype(jnp.int32)
            consumed = (gat(applied_i, prv) != 0) & (prv != lane)
            new_ids = jnp.where(consumed, -1, new_ids)
            consumed_i = consumed.astype(jnp.int32)
            cnext = gat(consumed_i, nxt) != 0
            nxt2 = jnp.where(cnext, gat(nxt, nxt), nxt)
            cprev = gat(consumed_i, prv) != 0
            prv2 = jnp.where(cprev, gat(prv, prv), prv)
            return new_ids, nxt2, prv2, jnp.any(applied)

        ids, nxt, _prv, _go = jax.lax.while_loop(
            lambda st: st[3], body, (ids0, nxt0, prv0, jnp.bool_(True))
        )
        out_ref[:] = ids
        nxt_ref[:] = nxt


def _pallas_merge_seg_call(tk, tv, tv2, lut, raw128, aux128,
                           *, depth, rank_in_val, multi_ok, interpret):
    """pallas_call wrapper for the segmented kernel: raw128 uint8
    [R, 128] (the windowed chunk view), aux128 int32 [R, 128]; returns
    (ids [R, 128] with -1 holes, final nxt links [R, 128])."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = raw128.shape[0]
    grid = R // ROW_TILE
    kern = functools.partial(
        _kernel_seg, depth=depth, rank_in_val=rank_in_val, multi_ok=multi_ok,
    )
    cap = depth * 128
    tv2_w = tv2.shape[1]
    blockspec_tile = pl.BlockSpec(
        (ROW_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tv2_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            blockspec_tile,
            blockspec_tile,
        ],
        out_specs=(blockspec_tile, blockspec_tile),
        interpret=interpret,
    )(tk, tv, tv2, lut, raw128, aux128)


def _pallas_merge_call(tk, tv, tv2, lut, raw128, len128,
                       *, depth, group_w, rank_in_val, multi_ok, interpret,
                       debug_rounds=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = raw128.shape[0]
    grid = R // ROW_TILE
    kern = functools.partial(
        _kernel, depth=depth, group_w=group_w, rank_in_val=rank_in_val,
        multi_ok=multi_ok, debug_rounds=debug_rounds,
    )
    cap = depth * 128
    tv2_w = tv2.shape[1]
    blockspec_tile = pl.BlockSpec(
        (ROW_TILE, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tv2_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            blockspec_tile,
            blockspec_tile,
        ],
        out_specs=(blockspec_tile, blockspec_tile),
        interpret=interpret,
    )(tk, tv, tv2, lut, raw128, len128)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "group_w", "rank_in_val", "multi_ok", "u16_out", "interpret",
        "debug_rounds",
    ),
)
def _merge_bytes_pallas_jit(
    tk, tv, tv2, lut, raw, lens,
    depth, group_w, rank_in_val, multi_ok, u16_out, interpret,
    debug_rounds=None,
):
    import jax.numpy as jnp

    W, L = raw.shape
    wpr = 128 // group_w
    R = W // wpr
    rawg = raw.reshape(R, wpr, L)
    if L < group_w:
        rawg = jnp.pad(rawg, ((0, 0), (0, 0), (0, group_w - L)))
    raw128 = rawg.reshape(R, 128)
    leng = jnp.repeat(
        lens.reshape(R, wpr).astype(jnp.int32), group_w, axis=1
    )
    out, _cnt = _pallas_merge_call(
        tk, tv, tv2, lut, raw128, leng,
        depth=depth, group_w=group_w, rank_in_val=rank_in_val,
        multi_ok=multi_ok, interpret=interpret, debug_rounds=debug_rounds,
    )
    out = out.reshape(W, group_w)
    # one packed array -> ONE d2h per launch; the tunnel's d2h path is
    # latency+bandwidth bound, so transfer bytes dominate e2e cost
    from .merge import _compact_output

    return _compact_output(out, jnp.uint16 if u16_out else jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "depth", "group_w", "rank_in_val", "multi_ok", "u16_out", "interpret",
        "full_probe_len", "full_cap_mask",
    ),
)
def _merge_bytes_pallas_partial_jit(
    tk, tv, tv2, lut, full_pkey, full_pval, raw, lens,
    depth, group_w, rank_in_val, multi_ok, u16_out, interpret,
    full_probe_len, full_cap_mask,
):
    """Partial-table variant: same as _merge_bytes_pallas_jit, plus the
    final-state check against the FULL packed pair table.  A word whose
    final adjacent pairs include any full-table rule diverged from true
    greedy exactly at its final state (see build_pallas_table) — its
    count gets the 0x8000 flag bit and the caller re-encodes it host-
    side."""
    import jax.numpy as jnp

    from .merge import (
        INF_RANK, MODE_PACKED, _compact_output, _probe_pairs_packed,
    )

    W, L = raw.shape
    wpr = 128 // group_w
    R = W // wpr
    rawg = raw.reshape(R, wpr, L)
    if L < group_w:
        rawg = jnp.pad(rawg, ((0, 0), (0, 0), (0, group_w - L)))
    raw128 = rawg.reshape(R, 128)
    leng = jnp.repeat(
        lens.reshape(R, wpr).astype(jnp.int32), group_w, axis=1
    )
    out, _cnt = _pallas_merge_call(
        tk, tv, tv2, lut, raw128, leng,
        depth=depth, group_w=group_w, rank_in_val=rank_in_val,
        multi_ok=multi_ok, interpret=interpret, debug_rounds=None,
    )
    out = out.reshape(W, group_w)
    a = out[:, :-1]
    b = out[:, 1:]
    zero = jnp.zeros(1, jnp.int32)
    full_table = (
        full_pkey, full_pval, zero, zero, full_probe_len, full_cap_mask,
        MODE_PACKED,
    )
    rank, _m = _probe_pairs_packed(full_table, a, b)
    flagged = jnp.any(rank < INF_RANK, axis=1)  # [W]
    packed = _compact_output(out, jnp.uint16 if u16_out else jnp.int32)
    flag_bits = jnp.where(flagged, 0x8000, 0).astype(packed.dtype)
    counts_flagged = packed[:W] | flag_bits
    return jnp.concatenate([counts_flagged, packed[W:]])


def merge_words_from_bytes_pallas(
    table: PallasTable, raw, lens, u16_out: bool,
    group_w: int = 16, interpret: bool = False, debug_rounds=None,
    full_table=None,
):
    """Byte-mode Pallas fast path for words of <= group_w bytes.

    ``raw`` is uint8 [W, L<=group_w] (W a multiple of
    (128//group_w)*ROW_TILE), ``lens`` int32 [W].  Returns the same
    packed (counts + compact tokens) device layout as
    ops.merge.merge_words_from_bytes_packed.

    For a PARTIAL table, ``full_table`` must be the engine's
    MODE_PACKED table tuple; flagged words carry the 0x8000 bit in
    their count entry and must be re-encoded by the caller.
    """
    import jax.numpy as jnp

    if table.partial:
        (pkey, pval, _z0, _z1, probe_len, cap_mask, _mode) = full_table
        return _merge_bytes_pallas_partial_jit(
            jnp.asarray(table.tk), jnp.asarray(table.tv),
            jnp.asarray(table.tv2), jnp.asarray(table.lut),
            pkey, pval, raw, lens,
            depth=table.depth, group_w=group_w,
            rank_in_val=table.rank_in_val,
            multi_ok=table.multi_ok, u16_out=u16_out, interpret=interpret,
            full_probe_len=probe_len, full_cap_mask=cap_mask,
        )
    return _merge_bytes_pallas_jit(
        jnp.asarray(table.tk), jnp.asarray(table.tv),
        jnp.asarray(table.tv2), jnp.asarray(table.lut),
        raw, lens,
        depth=table.depth, group_w=group_w, rank_in_val=table.rank_in_val,
        multi_ok=table.multi_ok, u16_out=u16_out, interpret=interpret,
        debug_rounds=debug_rounds,
    )
