"""Distributed BPE training: corpus-shard pair counting over ICI.

Device recast of the trainers in train/bpe.py / train/bbpe.py (reference:
src/bpe.c:108-231, src/bbpe.c:73-124): the corpus lives sharded across
chips as an id array; each merge step is

    1. per-chip pair counting over the live shard — dense [K*K] bincount
       for small vocabs, or (at GPT-2 scale and beyond, where a K^2
       table is impossible) sort-based per-shard segment counting with a
       top-k candidate union recounted EXACTLY across shards
       (``count_candidates``; exactness certified per step by a
       Fagin-style bound, with rollback to an exact host pick on the
       rare uncertifiable step),
    2. ``psum`` of histograms / candidate stats over the ``data`` mesh
       axis — the collectives of the workload,
    3. global argmax -> winning pair,
    4. vectorized left-to-right merge of the winning pair within each
       shard (run-parity mask, identical to the sequential two-pointer
       rewrite of src/bbpe.c:53-71).

The byte-level (bbpe) trainer is id-keyed like the reference; the
string (bpe) trainer is SPELLING-GROUP-keyed like the reference (all
compositions of the winning spelling count and merge together) and runs
a host-paced loop — see ``_distributed_train_string``.

Semantics are the *corrected* trainer semantics (``strict=False``):
array-reuse artifacts of the reference implementation are not emulated.
Shard boundaries are INVISIBLE: each shard fetches its successor's
first element over ICI (``ppermute`` halo) so boundary pairs are
counted and merged, with a tiny cross-shard carry chain resolving
left-to-right merge parity for runs that straddle shards.  The
tie-break is the host trainer's exact first-to-reach-the-max rule,
implemented as a scatter-max of global pair positions (the max-count
pair with the smallest LAST-occurrence index wins) — so on any corpus
``distributed_bbpe_train`` reproduces ``bbpe_train_core`` byte for
byte (tests/test_parallel.py).
"""

from __future__ import annotations

import os
import time

import numpy as np


def _merge_mask_device(match):
    """Left-to-right non-overlapping selection of matched pair positions
    (device version of train.common.left_to_right_merge_mask).

    take[i] = match[i] and i is at even offset within its run of
    consecutive matches.  Computed with a prefix-scan over run starts.
    """
    import jax
    import jax.numpy as jnp

    n = match.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), bool), match[:-1]])
    run_start = match & ~prev
    start_idx = jnp.where(run_start, idx, -1)
    start_idx = jax.lax.associative_scan(jnp.maximum, start_idx)
    pos_in_run = idx - start_idx
    return match & ((pos_in_run & 1) == 0)


def _compact(new):
    """Stable in-shard compaction: kept (!= -1) elements keep order, holes
    sink to the shard tail (so array adjacency = pair adjacency next step).

    ONE payload-carrying key sort: kept elements key by index, holes by
    n + index (stability by key uniqueness).  Measured faster in the
    scanned train step than both a stable argsort and the previous
    cumsum + scatter (TPU scatters run ~130M elem/s; the bitonic sort
    moves the same data in fewer passes)."""
    import jax
    import jax.numpy as jnp

    n = new.shape[0]
    idx = jax.lax.iota(jnp.int32, n)
    keys = jnp.where(new != -1, idx, n + idx)
    _k, out = jax.lax.sort((keys, new), num_keys=1)
    return out


# max merge compositions applied in one string-trainer step (splits of
# the winning spelling into two live spellings; realistically <= 4)
MAXC = 64


def _make_shard_ops(K: int, n_dev: int, k_top: int = 1024):
    """Shared per-shard count/merge ops with cross-shard halos.

    Pads (-1) live only at each shard's tail (the compaction
    invariant), so stream adjacency = in-shard consecutive pairs plus
    exactly one boundary pair (shard's last valid element, successor's
    first element) fetched with a ring ``ppermute``.
    """
    import jax
    import jax.numpy as jnp

    def _pair_operands(ids):
        # the stream successor of this shard's last valid element is the
        # first element of the NEAREST NON-EMPTY successor shard (shards
        # can empty out late in training), found on the all-gathered
        # first-element vector
        n = ids.shape[0]
        firsts = jax.lax.all_gather(ids[0], "data")  # [D]
        idx = jax.lax.axis_index("data")
        shard_ids = jnp.arange(n_dev, dtype=jnp.int32)
        cand = jnp.where(
            (shard_ids > idx) & (firsts >= 0), shard_ids, n_dev
        )
        nxt = jnp.min(cand)
        halo = jnp.where(
            nxt < n_dev, firsts[jnp.minimum(nxt, n_dev - 1)], jnp.int32(-1)
        )
        lastvalid = jnp.sum((ids >= 0).astype(jnp.int32)) - 1
        pos = jnp.arange(n, dtype=jnp.int32)
        b = jnp.concatenate([ids[1:], jnp.full((1,), -1, ids.dtype)])
        b = jnp.where(pos == lastvalid, halo, b)
        return ids, b, pos, lastvalid

    def count_shard(ids):
        """(histogram, last-occurrence position) over the global stream.

        The last-occurrence table serves the reference tie-break: the
        linear-scan counter keeps the FIRST pair to reach the maximum
        (src/bbpe.c:21-51 as resolved in train/bbpe.py), which equals
        the max-count pair whose LAST occurrence index is smallest.
        Positions here are shard-offset, order-isomorphic to compact
        stream positions, which is all the comparison needs.
        """
        a, b, pos, _lastvalid = _pair_operands(ids)
        valid = (a >= 0) & (b >= 0)
        keys = jnp.where(valid, a * K + b, 0)
        hist = jnp.zeros((K * K,), jnp.int32).at[keys].add(
            valid.astype(jnp.int32), mode="drop"
        )
        n = ids.shape[0]
        gpos = jax.lax.axis_index("data").astype(jnp.int32) * n + pos
        occ = jnp.full((K * K,), jnp.int32(-1))
        occ = occ.at[keys].max(jnp.where(valid, gpos, -1), mode="drop")
        return hist, occ

    def pick_best(hist, occ):
        m = jnp.max(hist)
        inf = jnp.int32(0x7FFFFFFF)
        cand = jnp.where(hist == m, occ, inf)
        best_key = jnp.argmin(cand).astype(jnp.int32)
        return (
            (best_key // K).astype(jnp.int32),
            (best_key % K).astype(jnp.int32),
            m.astype(jnp.int32),
        )

    def count_pick_sorted(ids):
        """Single-shard fused count+pick without the K^2 tables.

        Sorting the (id1, id2, position) stream (two sort keys — no
        a*K+b product, so any vocab size works without overflow) and
        reducing segments with associative scans is ~3x cheaper on TPU
        than two K^2 scatters + argmax (measured 11.6 vs 33.7 ms at
        2M / K=1257).  The pick rule is byte-identical to pick_best:
        max count, then minimal LAST-occurrence position (the stable
        sort keeps positions ascending inside a segment, so the
        segment-end position IS the pair's last occurrence), then the
        lowest (id1, id2).
        """
        a, b, pos, _lastvalid = _pair_operands(ids)
        valid = (a >= 0) & (b >= 0)
        # invalid pairs sort last: id values are < K <= 2^31-1
        hi = jnp.int32(0x7FFFFFFF)
        ka = jnp.where(valid, a, hi)
        kb = jnp.where(valid, b, hi)
        sa, sb, sp = jax.lax.sort((ka, kb, pos), num_keys=2)
        n = ids.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        diff = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
        segstart = jnp.concatenate([jnp.ones((1,), bool), diff])
        startpos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(segstart, idx, -1)
        )
        length = idx - startpos + 1
        segend = jnp.concatenate([diff, jnp.ones((1,), bool)])
        realend = segend & (sa < hi)
        m = jnp.max(jnp.where(realend, length, 0))
        inf = jnp.int32(0x7FFFFFFF)
        cand = jnp.where(realend & (length == m), sp, inf)
        # ties between different pairs: smaller last-occurrence wins
        # (positions are distinct, so cand has a unique minimum among
        # real candidates)
        j = jnp.argmin(cand)
        # single-shard results are trivially replicated; the pmax marks
        # them as such for shard_map's out_specs check (free at D=1)
        id1 = jax.lax.pmax(sa[j], "data")
        id2 = jax.lax.pmax(sb[j], "data")
        cnt = jax.lax.pmax(m.astype(jnp.int32), "data")
        return id1, id2, cnt

    def count_candidates(ids):
        """Exact global (count, last-occurrence) for the union of every
        shard's top-``k_top`` pairs, plus the exactness bound.

        No K^2 table anywhere (VERDICT r3 #3: the dense-histogram path
        capped multi-device training at vocab_size < 46,340).  Per
        shard: sort the (id1, id2, global-position) pair stream, reduce
        segments (count + last position per distinct pair), take the
        top-``k_top`` segments by count.  The all-gathered candidate
        union is then counted EXACTLY: each shard binary-searches every
        candidate in its own sorted segment list, and psum/pmax combine
        the per-shard results.

        Exactness bound (Fagin-style): a non-candidate pair is outside
        every shard's top-k, so its per-shard count is <= that shard's
        k-th-largest count t_s, hence its global count <= bound =
        psum(t_s).  A winner with count > bound is therefore the true
        global argmax, and no non-candidate can tie it (so the
        first-to-reach tie-break among candidates is exact too).  When
        a shard has fewer than k distinct pairs t_s = 0; once every
        shard fits, bound == 0 and the candidate set is COMPLETE.
        """
        a, b, pos, _lastvalid = _pair_operands(ids)
        n = ids.shape[0]
        hi = jnp.int32(0x7FFFFFFF)
        valid = (a >= 0) & (b >= 0)
        ka = jnp.where(valid, a, hi)
        kb = jnp.where(valid, b, hi)
        # positions stay shard-LOCAL int32 (a shard_idx*n+pos packing
        # overflows int32 past 2^31 global elements — exactly the scale
        # this path exists for); the global ordering is recovered as the
        # lexicographic pair (owning shard, local position) at the end
        # stable two-key sort keeps positions ascending per segment, so
        # the segment-end position IS the pair's shard-last occurrence
        sa, sb, sp = jax.lax.sort((ka, kb, pos), num_keys=2)
        idx = jnp.arange(n, dtype=jnp.int32)
        diff = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
        segstart = jnp.concatenate([jnp.ones((1,), bool), diff])
        startpos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(segstart, idx, -1)
        )
        length = idx - startpos + 1
        segend = jnp.concatenate([diff, jnp.ones((1,), bool)])
        realend = segend & (sa < hi)
        k = min(k_top, n)
        if n_dev == 1:
            # single-shard fast path: the shard's own top-k IS the
            # candidate union and its counts are already exact, so the
            # rank-compacted table (4 full-stream scatters) and the
            # cross-shard binary search are pure overhead — top_k
            # straight off the sorted stream's segment ends instead
            # (the scanned string trainer runs this 16x per dispatch)
            from ..ops.merge import fast_gather

            topv, topi = jax.lax.top_k(jnp.where(realend, length, 0), k)
            have = topv > 0
            ga = jnp.where(have, fast_gather(sa, topi), hi)
            gb = jnp.where(have, fast_gather(sb, topi), hi)
            lpos = jnp.where(have, fast_gather(sp, topi), -1)
            sh = jnp.where(have, 0, -1)
            # no-op collective on the 1-wide axis: satisfies shard_map's
            # replication (vma) check for the P() out_specs
            ga, gb, topv, sh, lpos = jax.lax.psum(
                (ga, gb, topv, sh, lpos), "data"
            )
            return ga, gb, topv, sh, lpos, topv[k - 1]
        # dense sorted segment table (rank-compacted): keys ascending,
        # padded with (hi, hi) — the binary-search target
        seg_rank = jnp.cumsum(segstart.astype(jnp.int32)) - 1
        tgt = jnp.where(realend, seg_rank, n)
        da = jnp.full((n,), hi, jnp.int32).at[tgt].set(sa, mode="drop")
        db = jnp.full((n,), hi, jnp.int32).at[tgt].set(sb, mode="drop")
        dcnt = jnp.zeros((n,), jnp.int32).at[tgt].set(length, mode="drop")
        dlast = jnp.full((n,), -1, jnp.int32).at[tgt].set(sp, mode="drop")
        topv, topi = jax.lax.top_k(dcnt, k)
        t_s = topv[k - 1]
        # replicated candidate union via scatter-into-own-slot + psum
        # (psum output is replication-inferred under shard_map's vma
        # check, unlike all_gather's)
        didx = jax.lax.axis_index("data")
        slot_a = jnp.zeros((n_dev, k), jnp.int32).at[didx].set(da[topi])
        slot_b = jnp.zeros((n_dev, k), jnp.int32).at[didx].set(db[topi])
        ga = jax.lax.psum(slot_a, "data").reshape(-1)  # [D*k]
        gb = jax.lax.psum(slot_b, "data").reshape(-1)
        J = ga.shape[0]
        # vectorized two-key lower_bound of all J candidates at once
        lo = jnp.zeros((J,), jnp.int32)
        up = jnp.full((J,), n, jnp.int32)
        for _ in range(max(int(n).bit_length(), 1)):
            mid = (lo + up) // 2
            midc = jnp.minimum(mid, n - 1)
            va = da[midc]
            vb = db[midc]
            less = ((va < ga) | ((va == ga) & (vb < gb))) & (mid < n)
            lo = jnp.where(less, mid + 1, lo)
            up = jnp.where(less, up, mid)
        f = jnp.minimum(lo, n - 1)
        hit = (da[f] == ga) & (db[f] == gb) & (ga < hi)
        cnt = jax.lax.psum(jnp.where(hit, dcnt[f], 0), "data")
        # global last occurrence = (highest shard containing the pair,
        # its local last position there) — compared lexicographically,
        # overflow-free at any corpus size
        sh = jax.lax.pmax(jnp.where(hit, didx.astype(jnp.int32), -1), "data")
        lpos = jax.lax.pmax(
            jnp.where(hit & (didx == sh), dlast[f], -1), "data"
        )
        bound = jax.lax.psum(t_s, "data")
        return ga, gb, cnt, sh, lpos, bound

    def pick_candidates(ga, gb, cnt, sh, lpos, bound):
        """(id1, id2, count, ok) — the bbpe pick rule over the candidate
        set: max count, tie-break min last-occurrence where "last" is
        the lexicographic (owning shard, local position) pair (distinct
        across distinct pairs; duplicated candidate rows carry identical
        stats).  ``ok`` certifies exactness: either the winner clears
        the bound or the candidate set is complete."""
        m = jnp.max(cnt)
        inf = jnp.int32(0x7FFFFFFF)
        is_m = cnt == m
        sh_min = jnp.min(jnp.where(is_m, sh, inf))
        cl = jnp.where(is_m & (sh == sh_min), lpos, inf)
        j = jnp.argmin(cl)
        ok = (m > bound) | (bound == 0)
        return ga[j], gb[j], m, ok

    def apply_merge(ids, id1, id2, new_id):
        a, b, pos, lastvalid = _pair_operands(ids)
        match = (a == id1) & (b == id2)
        return _apply_match(ids, match, lastvalid, new_id)

    def apply_merge_multi(ids, c1, c2, new_id):
        """Merge every composition (c1[j], c2[j]) of one winning
        spelling in a single left-to-right pass — the string trainer's
        semantics (src/bpe.c:181-215 compares the pair's concatenated
        SPELLING to the winner, so all compositions merge together).
        ``c1``/``c2`` are int32 [MAXC], -1-padded."""
        a, b, pos, lastvalid = _pair_operands(ids)
        match = jnp.any(
            (a[None, :] == c1[:, None])
            & (b[None, :] == c2[:, None])
            & (c1[:, None] >= 0),
            axis=0,
        )
        return _apply_match(ids, match, lastvalid, new_id)

    def _apply_match(ids, match, lastvalid, new_id):
        n = ids.shape[0]
        # two take-chains: in-carry 0 (element 0 alive) and 1 (consumed
        # by the predecessor's boundary merge, which flips the parity of
        # a run crossing the boundary)
        take0 = _merge_mask_device(match)
        take1 = jnp.concatenate(
            [jnp.zeros((1,), bool), _merge_mask_device(match[1:])]
        )
        safe_last = jnp.clip(lastvalid, 0, n - 1)
        # empty shards pass the consume-carry through unchanged: the
        # predecessor's boundary merge consumes the first element of the
        # nearest non-empty successor
        empty = lastvalid < 0
        out0 = ~empty & take0[safe_last]
        out1 = jnp.where(empty, True, take1[safe_last])
        # resolve the in-carry per shard: tiny redundant prefix chain
        # over the all-gathered (out0, out1) tables
        oo = jax.lax.all_gather(jnp.stack([out0, out1]), "data")  # [D, 2]
        c = jnp.zeros((), bool)
        carries = [c]
        for s in range(n_dev - 1):
            c = jnp.where(c, oo[s, 1], oo[s, 0])
            carries.append(c)
        cin = jnp.stack(carries)[jax.lax.axis_index("data")]
        take = jnp.where(cin, take1, take0)
        consumed = jnp.concatenate([cin[None], take[:-1]])
        new = jnp.where(take, new_id, ids)
        new = jnp.where(consumed, -1, new)
        return _compact(new)

    def probe_pairs(ids, qa, qb):
        """Exact global (count, last-shard, last-pos) for P specific
        query pairs (pad with -1).  O(P*n) elementwise compares — the
        resolver for near-tie certification failures (P <= ~64): when a
        competitor group is within ``missing * bound`` of the winner,
        querying just its uncounted compositions settles the pick
        exactly without the full-stream host download."""
        a, b, pos, _lv = _pair_operands(ids)
        valid = (a >= 0) & (b >= 0)
        m = (
            (a[None, :] == qa[:, None])
            & (b[None, :] == qb[:, None])
            & valid[None, :]
        )
        cnt = jax.lax.psum(jnp.sum(m.astype(jnp.int32), axis=1), "data")
        idxs = jax.lax.axis_index("data")
        lpos_sh = jnp.max(jnp.where(m, pos[None, :], -1), axis=1)
        has = lpos_sh >= 0
        sh = jax.lax.pmax(jnp.where(has, idxs, -1), "data")
        lp = jax.lax.pmax(
            jnp.where(has & (idxs == sh), lpos_sh, -1), "data"
        )
        return cnt, sh, lp

    return {
        "count_shard": count_shard,
        "pick_best": pick_best,
        "apply_merge": apply_merge,
        "apply_merge_multi": apply_merge_multi,
        "count_pick_sorted": count_pick_sorted,
        "count_candidates": count_candidates,
        "pick_candidates": pick_candidates,
        "probe_pairs": probe_pairs,
    }


def make_train_step(
    K: int, mesh, min_merge_count: int = 2, use_candidates: bool = False,
    k_top: int = 1024,
):
    """Build the jitted sharded train step.

    State per shard: ``ids`` int32 [n] (PAD = -1 for holes), scanned with
    shard_map over the ``data`` axis.  The pick runs sort-based fused on
    one device, dense-histogram + psum on small-K meshes, and the
    candidate machinery (``use_candidates``) at GPT-2 scale where a K^2
    table is impossible.  Every pick returns an ``ok`` exactness flag
    (constant True on the always-exact paths).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    _enable_cache()
    n_dev = mesh.devices.size
    ops = _make_shard_ops(K, n_dev, k_top=k_top)
    apply_merge = ops["apply_merge"]

    def step(ids):
        if n_dev == 1:
            id1, id2, cnt = ops["count_pick_sorted"](ids)
            return id1, id2, cnt, jnp.bool_(True)
        if use_candidates:
            return ops["pick_candidates"](*ops["count_candidates"](ids))
        hist, occ = ops["count_shard"](ids)
        hist = jax.lax.psum(hist, "data")
        occ = jax.lax.pmax(occ, "data")
        id1, id2, cnt = ops["pick_best"](hist, occ)
        return id1, id2, cnt, jnp.bool_(True)

    def fused(ids, new_id):
        """count + psum + argmax + conditional merge, one dispatch."""
        id1, id2, cnt, ok = step(ids)
        merged = apply_merge(ids, id1, id2, new_id[0])
        # byte-level training stops at count <= 1 (src/bbpe.c:83-84) so the
        # merge must not land then; the string trainer merges any best pair
        # (min_merge_count=1).  State untouched -> the caller's break is clean.
        new_ids = jnp.where((cnt >= min_merge_count) & ok, merged, ids)
        return id1, id2, cnt, ok, new_ids

    count_fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=(P(), P(), P(), P()),
    )

    merge_fn = shard_map(
        apply_merge,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=P("data"),
    )

    fused_fn = shard_map(
        fused,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=(P(), P(), P(), P(), P("data")),
    )

    @jax.jit
    def train_step(ids):
        return count_fn(ids)

    @jax.jit
    def merge_step(ids, id1, id2, new_id):
        return merge_fn(
            ids,
            jnp.asarray([id1], jnp.int32),
            jnp.asarray([id2], jnp.int32),
            jnp.asarray([new_id], jnp.int32),
        )

    @jax.jit
    def fused_step(ids, new_id):
        return fused_fn(ids, jnp.asarray([new_id], jnp.int32))

    return train_step, merge_step, fused_step


# jitted-step memoization across trainer calls: repeated trainings in
# one process (bench warmup + timed run, resumed runs, sweeps) reuse
# the compiled executable instead of re-tracing a fresh closure.  The
# scan HLO is K-independent on the single-device sort path and the
# candidate path (K only shapes the dense histogram), so those key K
# as a constant.
_SCAN_STEP_CACHE: dict = {}


def make_scan_train_step(
    K: int, mesh, min_merge_count: int, scan_steps: int,
    use_candidates: bool = False, k_top: int = 1024,
):
    _enable_cache()  # every entry point persists/reuses compiles
    n_dev_key = mesh.devices.size
    k_key = K if (n_dev_key > 1 and not use_candidates) else -1
    key = (k_key, mesh, min_merge_count, scan_steps, use_candidates, k_top)
    hit = _SCAN_STEP_CACHE.get(key)
    if hit is not None:
        return hit
    out = _make_scan_train_step(
        K, mesh, min_merge_count, scan_steps,
        use_candidates=use_candidates, k_top=k_top,
    )
    _SCAN_STEP_CACHE[key] = out
    return out


def _make_scan_train_step(
    K: int, mesh, min_merge_count: int, scan_steps: int,
    use_candidates: bool = False, k_top: int = 1024,
):
    """K-merge-per-dispatch training step: a lax.scan of the fused step.

    The device assigns ``new_id = start + i`` per scan step (the common
    case); the host replays the bookkeeping and falls back to single-step
    mode from the chunk-start state if a duplicate-spelling merge makes
    that assumption wrong (rare).  Stop conditions are handled by host
    truncation: freq<=min never applies its merge on device, and the
    repeat-pair stop ends training so post-stop device state is unused.
    On the candidate path each step also reports ``ok``; the host rolls
    back to the chunk start at the first uncertified step and re-does it
    with an exact fallback.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    _, merge_single, fused_single = make_train_step(
        K, mesh, min_merge_count, use_candidates=use_candidates, k_top=k_top
    )

    n_dev = mesh.devices.size
    ops = _make_shard_ops(K, n_dev, k_top=k_top)

    def chunk(ids, start_new_id):
        def body(carry, i):
            ids = carry
            if n_dev == 1:
                # sort-based fused count+pick: ~3x cheaper than the
                # K^2 scatter histograms (identical pick rule)
                id1, id2, cnt = ops["count_pick_sorted"](ids)
                ok = jnp.bool_(True)
            elif use_candidates:
                id1, id2, cnt, ok = ops["pick_candidates"](
                    *ops["count_candidates"](ids)
                )
            else:
                hist, occ = ops["count_shard"](ids)
                hist = jax.lax.psum(hist, "data")
                occ = jax.lax.pmax(occ, "data")
                id1, id2, cnt = ops["pick_best"](hist, occ)
                ok = jnp.bool_(True)
            merged = ops["apply_merge"](ids, id1, id2, start_new_id[0] + i)
            ids = jnp.where((cnt >= min_merge_count) & ok, merged, ids)
            return ids, (id1, id2, cnt, ok)

        ids, (id1s, id2s, cnts, oks) = jax.lax.scan(
            body, ids, jnp.arange(scan_steps, dtype=jnp.int32)
        )
        return ids, id1s, id2s, cnts, oks

    chunk_fn = shard_map(
        chunk,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=(P("data"), P(), P(), P(), P()),
    )

    @jax.jit
    def scan_step(ids, start_new_id):
        return chunk_fn(ids, jnp.asarray([start_new_id], jnp.int32))

    return scan_step, fused_single, merge_single


def make_string_step(mesh, k_top: int = 1024):
    """Jitted device ops for the spelling-group string trainer.

    ``string_step(ids, c1, c2, new_id)`` applies the PREVIOUS winner's
    multi-composition merge (a no-op when ``c1`` is all -1) and counts
    candidates for the next pick in ONE dispatch, returning the stats
    as ONE packed int32 array — on a high-latency link (the tunneled
    dev chip measures ~25 ms per transfer) the hot loop costs one
    dispatch + one download per merge instead of two + six.
    ``merge_multi_step`` stays standalone for checkpoint replay."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    _enable_cache()
    n_dev = mesh.devices.size
    ops = _make_shard_ops(2, n_dev, k_top=k_top)  # K unused by these ops

    def fused(ids, c1, c2, new_id):
        ids = ops["apply_merge_multi"](ids, c1, c2, new_id)
        ga, gb, cnt, sh, lpos, bound = ops["count_candidates"](ids)
        packed = jnp.concatenate(
            [ga, gb, cnt, sh, lpos, bound.reshape(1)]
        )
        return ids, packed

    fused_fn = shard_map(
        fused,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=(P("data"), P()),
    )
    multi_fn = shard_map(
        ops["apply_merge_multi"],
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=P("data"),
    )

    probe_fn = shard_map(
        ops["probe_pairs"],
        mesh=mesh,
        in_specs=(P("data"), P(), P()),
        out_specs=(P(), P(), P()),
    )

    @jax.jit
    def string_step(ids, c1, c2, new_id):
        return fused_fn(ids, c1, c2, jnp.asarray([new_id], jnp.int32))

    @jax.jit
    def merge_multi_step(ids, c1, c2, new_id):
        return multi_fn(ids, c1, c2, jnp.asarray([new_id], jnp.int32))

    @jax.jit
    def probe_step(ids, qa, qb):
        return probe_fn(ids, qa, qb)

    return string_step, merge_multi_step, probe_step


# scan-driver telemetry (tests + bench notes): chunks dispatched, fully
# committed chunks, divergent sub-steps (rollback + exact re-run), and
# certification fallbacks to the exact host pick
STRING_SCAN_STATS = {"chunks": 0, "committed": 0, "divergent": 0,
                     "exact_picks": 0, "probe_picks": 0, "deep_picks": 0}


def make_string_scan_step(mesh, S: int, k_top: int = 1024):
    """S-merge-per-dispatch SPECULATIVE step for the string trainer.

    Each scan sub-step counts candidates, applies the plain PAIR pick
    (max count, min last occurrence) with csid ``start + i``, and emits
    its full candidate stats.  The host then validates every sub-step
    against the exact spelling-group semantics (src/bpe.c:130-165): the
    group winner must equal the device's pair, have exactly that one
    live composition, be a NEW spelling, and clear the Fagin bound.
    Measured on real corpora the group pick and the pair pick coincide
    on ~100% of steps (multi-composition groups are rare early in
    training), so the hot loop pays one dispatch + one packed download
    per S merges; any divergent step rolls back to the chunk-start ids
    and re-runs exactly (`_distributed_train_string`)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    _enable_cache()
    n_dev = mesh.devices.size
    ops = _make_shard_ops(2, n_dev, k_top=k_top)

    def chunk(ids, start_csid, qa, qb):
        def body(carry, i):
            ids = carry
            ga, gb, cnt, sh, lpos, bound = ops["count_candidates"](ids)
            id1, id2, c, _ok = ops["pick_candidates"](
                ga, gb, cnt, sh, lpos, bound
            )
            # watch-list: exact per-sub-step counts for pairs the host
            # flagged as recurring near-tie contenders — resolves their
            # certification inline so the chunk commits instead of
            # rolling back (O(P*n) compares, noise next to the sorts)
            wc, wsh, wlp = ops["probe_pairs"](ids, qa, qb)
            merged = ops["apply_merge"](ids, id1, id2, start_csid[0] + i)
            ids = jnp.where(c > 0, merged, ids)
            step_out = jnp.concatenate(
                [ga, gb, cnt, sh, lpos, wc, wsh, wlp,
                 jnp.stack([bound, id1, id2, c])]
            )
            return ids, step_out
        ids, outs = jax.lax.scan(
            body, ids, jnp.arange(S, dtype=jnp.int32)
        )
        return ids, outs

    chunk_fn = shard_map(
        chunk, mesh=mesh, in_specs=(P("data"), P(), P(), P()),
        out_specs=(P("data"), P()),
    )

    @jax.jit
    def scan_fn(ids, start_csid, qa, qb):
        return chunk_fn(ids, jnp.asarray([start_csid], jnp.int32), qa, qb)

    return scan_fn


def _group_stats(pair_stats: dict, csid2spell: list):
    """Aggregate exact per-pair stats into per-spelling groups.

    A group's count is the sum over its compositions; its last
    occurrence is the max (the group reaches its final count at its
    last occurrence, so the first-to-reach tie-break is min group-last
    — same equivalence as for pairs)."""
    groups: dict[bytes, list] = {}
    for (a, b), (c, last) in pair_stats.items():
        s = csid2spell[a] + csid2spell[b]
        g = groups.get(s)
        if g is None:
            groups[s] = [c, last]
        else:
            g[0] += c
            g[1] = max(g[1], last)
    return groups


def _pick_group(groups: dict):
    """(spelling, [count, last]) winner: max count, tie-break min last
    occurrence.  ``last`` may be an int or a lexicographic (shard,
    position) tuple — both order correctly."""
    max_c = max(g[0] for g in groups.values())
    return min(
        ((s, g) for s, g in groups.items() if g[0] == max_c),
        key=lambda kv: kv[1][1],
    )


def _host_exact_string_pick(ids_np: np.ndarray, csid2spell: list):
    """Exact global spelling-group pick on the host (fallback when the
    candidate bound cannot certify)."""
    stream = _global_stream(ids_np)
    if stream.shape[0] < 2:
        return None
    keys = _pair_keys(stream)
    uniq, inverse, counts = np.unique(
        keys, return_inverse=True, return_counts=True
    )
    last_occ = np.empty(uniq.shape[0], dtype=np.int64)
    last_occ[inverse] = np.arange(keys.shape[0], dtype=np.int64)
    pair_stats = {
        (int(k) >> 31, int(k) & ((1 << 31) - 1)): (int(c), int(l))
        for k, c, l in zip(uniq, counts, last_occ)
    }
    groups = _group_stats(pair_stats, csid2spell)
    return _pick_group(groups)


def _host_apply_multi(
    ids_np: np.ndarray, comps: list, new_csid: int, n_dev: int
) -> np.ndarray:
    """Host-side multi-composition merge + reshard (only for winners
    with more than MAXC compositions — pathological)."""
    from ..train.common import left_to_right_merge_mask

    stream = _global_stream(ids_np)
    keys = _pair_keys(stream)
    ckeys = np.array(
        [(c1 << 31) | c2 for c1, c2 in comps], dtype=np.int64
    )
    match = np.isin(keys, ckeys)
    take = left_to_right_merge_mask(match)
    take_idx = np.flatnonzero(take)
    consumed = np.zeros(stream.shape[0], dtype=bool)
    consumed[take_idx + 1] = True
    new = stream.copy()
    new[take_idx] = new_csid
    kept = new[~consumed]
    # reshard: contiguous chunks in shard order, pads at shard tails
    n = ids_np.reshape(-1).shape[0] // n_dev
    per = -(-kept.shape[0] // n_dev)
    out = np.full((n_dev, n), -1, dtype=np.int32)
    for s in range(n_dev):
        chunk = kept[s * per : (s + 1) * per]
        out[s, : chunk.shape[0]] = chunk
    return out.reshape(-1)


def _distributed_train_string(
    data: bytes,
    vocab_size: int,
    mesh,
    *,
    verbose: bool,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 512,
    resume: bool = False,
    k_top: int = 1024,
) -> dict[bytes, int]:
    """Spelling-group-keyed distributed string training.

    Parity target: ``bpe_train_core(strict=False)`` (src/bpe.c semantics
    — the merge loop compares the pair's concatenated SPELLING against
    the winner, so every composition of the winning spelling counts and
    merges together, src/bpe.c:130-165, 181-215).

    Device elements are canonical spelling ids (csids, one per distinct
    spelling — the array analog of the host trainer's interning), which
    keeps "two live elements, same spelling, different ids" impossible
    even across duplicate-spelling re-wins.  Each merge step:

    1. device candidate stats (exact counts of the per-shard top-k
       union + the Fagin bound, see count_candidates),
    2. HOST aggregation of pairs into spelling groups + safety check:
       the winner must beat every other candidate group's upper bound
       (count + #uncounted-compositions x bound) and the unseen-group
       bound (2L-1) x bound; otherwise the step reruns with the exact
       host pick,
    3. device multi-composition merge (one left-to-right pass over all
       splits of the winning spelling, matching the host's single
       group mask).

    Vocab ids replay the reference quirks exactly: new id = count+1
    (id 256 never assigned, duplicate-spelling re-wins can alias ids —
    src/bpe.c:171); repeat-stop compares winning spellings.
    """
    import jax.numpy as jnp

    from ..parallel.mesh import shard_batch

    _enable_cache()
    n_dev = mesh.devices.size
    # the Fagin bound is (2L-1) * B with B = the k-th-largest per-shard
    # pair count; L (max spelling length) grows ~linearly with training,
    # so a small k leaves B ~70-80 on MB-scale corpora and certification
    # fails chronically past ~100 merges (measured: 311/314 chunks fell
    # to the full-ids host pick at k=1024 -> 1.1 merges/s).  A deeper
    # candidate table pushes B into the count tail; the extra candidate
    # rows only cost download + host-dict size.
    kv = os.environ.get("HUTOKEN_TPU_STRING_KTOP", "8192")
    try:
        k_top = max(int(kv), k_top)
    except ValueError:
        pass
    string_step, merge_multi_step, probe_step = make_string_step(
        mesh, k_top=k_top
    )

    # vocab bookkeeping (the returned artifact, with reference quirks)
    str2id: dict[bytes, int] = {}
    for i in range(256):
        str2id[b"" if i == 0 else bytes([i])] = i
    count = 256
    # csid interning: device element id -> spelling (csid 0 spells
    # b"\\x00" — the vocab's b"" key is a save-format quirk only)
    csid2spell: list[bytes] = [bytes([i]) for i in range(256)]
    # rolling-hash + length per csid (numpy-indexable), for the deep
    # pick's vectorized group aggregation: H(ab) = H(a) + P^len(a)*H(b)
    # mod 2^64.  Hash equality is VERIFIED by real concat on the few
    # groups that matter before any decision rides on it.
    _HP = np.uint64(1099511628211)
    _pows = [np.uint64(1)]

    def _pow_hp(k: int) -> np.uint64:
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the point
            while len(_pows) <= k:
                _pows.append(_pows[-1] * _HP)
        return _pows[k]

    def _hash_bytes(b: bytes) -> np.uint64:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for i, c in enumerate(b):
                h = h + _pow_hp(i) * np.uint64(c + 1)
        return h

    _sh_cap = 4096
    spell_h = np.zeros(_sh_cap, np.uint64)
    spell_l = np.zeros(_sh_cap, np.int64)
    for _i in range(256):
        spell_h[_i] = _hash_bytes(csid2spell[_i])
        spell_l[_i] = len(csid2spell[_i])
    _sh_state = {"n": 256, "h": spell_h, "l": spell_l}

    def _note_csid(s_: bytes) -> None:
        st = _sh_state
        if st["n"] == st["h"].shape[0]:
            st["h"] = np.concatenate([st["h"], np.zeros_like(st["h"])])
            st["l"] = np.concatenate([st["l"], np.zeros_like(st["l"])])
        st["h"][st["n"]] = _hash_bytes(s_)
        st["l"][st["n"]] = len(s_)
        st["n"] += 1
    spell2csid: dict[bytes, int] = {s: i for i, s in enumerate(csid2spell)}

    ids_np = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    pad = (-len(ids_np)) % n_dev
    if pad:
        ids_np = np.concatenate([ids_np, np.full(pad, -1, np.int32)])
    ids = shard_batch(mesh, jnp.asarray(ids_np))

    hi = 0x7FFFFFFF
    merge_log: list[bytes] = []
    prev_key: bytes | None = None
    merges_since_ckpt = 0

    def comps_of(s: bytes) -> list[tuple[int, int]]:
        out = []
        for i in range(1, len(s)):
            u = spell2csid.get(s[:i])
            v = spell2csid.get(s[i:])
            if u is not None and v is not None:
                out.append((u, v))
        return out

    def intern_winner(win_s: bytes):
        """csid assignment; returns (csid, composition list)."""
        g = spell2csid.get(win_s)
        if g is None:
            g = len(csid2spell)
            csid2spell.append(win_s)
            spell2csid[win_s] = g
            _note_csid(win_s)
        return g, comps_of(win_s)

    def comp_arrays(comps):
        c1 = np.full(MAXC, -1, np.int32)
        c2 = np.full(MAXC, -1, np.int32)
        for j, (u, v) in enumerate(comps):
            c1[j] = u
            c2[j] = v
        return c1, c2

    def host_merge(comps, g):
        # pragma-rare: a winning spelling with > MAXC compositions
        nonlocal ids
        import jax as _jax

        if _jax.process_count() > 1:  # pragma: no cover - real pod
            raise NotImplementedError(
                "a winning spelling with more than MAXC compositions "
                "requires the host merge path, which is single-process "
                "only"
            )
        new_np = _host_apply_multi(_fetch_global(ids), comps, g, n_dev)
        ids = shard_batch(mesh, jnp.asarray(new_np))

    def apply_winner(win_s: bytes):
        """Immediate csid assignment + merge (checkpoint replay)."""
        nonlocal ids
        g, comps = intern_winner(win_s)
        if len(comps) <= MAXC:
            c1, c2 = comp_arrays(comps)
            ids = merge_multi_step(
                ids, jnp.asarray(c1), jnp.asarray(c2), g
            )
        else:  # pragma: no cover - needs a >MAXC-way composable spelling
            host_merge(comps, g)
        return g

    def checkpoint() -> None:
        if checkpoint_path is None:
            return
        from ..train.common import save_checkpoint

        save_checkpoint(str2id, checkpoint_path)
        with open(
            checkpoint_path + ".merges.tmp", "w", encoding="utf-8"
        ) as f:
            for s in merge_log:
                f.write("s " + s.hex() + "\n")
        os.replace(
            checkpoint_path + ".merges.tmp", checkpoint_path + ".merges"
        )

    def bookkeep(win_s: bytes, win_c: int, replay: bool = False) -> None:
        """``replay=True`` during resume: no checkpoint writes (a
        mid-replay checkpoint would truncate the on-disk .merges log to
        the replayed prefix, destroying durable progress) and no
        progress prints."""
        nonlocal count, merges_since_ckpt
        merge_log.append(win_s)
        if not replay:
            merges_since_ckpt += 1
            if merges_since_ckpt >= checkpoint_every:
                merges_since_ckpt = 0
                checkpoint()
        new_id = count + 1  # reference id quirk (src/bpe.c:171)
        if win_s not in str2id:
            count += 1
        str2id[win_s] = new_id
        if verbose and not replay:
            print(
                f"Most common pair: '{win_s.decode('utf-8', 'replace')}',"
                f" rank: {win_c}"
            )
            print(
                f"New token '{win_s.decode('utf-8', 'replace')}',"
                f" value: {new_id}\n"
            )

    if resume and checkpoint_path is not None and os.path.exists(
        checkpoint_path + ".merges"
    ):
        with open(checkpoint_path + ".merges", encoding="utf-8") as f:
            replay = [
                bytes.fromhex(line.split()[1])
                for line in f
                if line.startswith("s ")
            ]
        for s in replay:
            bookkeep(s, -1, replay=True)
            apply_winner(s)
            prev_key = s
        merges_since_ckpt = 0
        if verbose:
            print(f"resumed {len(replay)} merges from {checkpoint_path}")

    PROBE_P = 64  # static probe width: one compiled executable
    # recurring near-tie contenders (see the scan driver): insertion-
    # ordered, oldest evicted beyond PROBE_P
    watch: dict[tuple[int, int], None] = {}

    def _nlen() -> int:
        """Distinct csid spelling lengths — the sharp unseen-group
        factor.  Any string has at most this many parses into two
        existing spellings: distinct parses have distinct LEFT lengths,
        and each left part must be a spelling, so its length lies in
        the spelling-length set.  (Replaces the looser 2L-1 split-count
        bound; the difference decides certification in the tail, where
        win counts approach the parse-count scale.)"""
        return len({len(s) for s in spell2csid})

    _deep = {"fn": None}

    def _deep_fn():
        """Jitted fused tail step: apply the pending multi-composition
        merge (no-op on -1 comps), run the DEEP candidate count
        (k = 32768 — the Fagin bound B lands in the count tail, usually
        0-1, so the nlen-guard certifies far past the scan's k_top) and
        probe the watch-list, all in ONE dispatch + ONE download."""
        import jax
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if _deep["fn"] is None:
            ops2 = _make_shard_ops(2, n_dev, k_top=32768)

            def fused(ids, c1, c2, new_id, qa, qb):
                ids = ops2["apply_merge_multi"](ids, c1, c2, new_id)
                ga, gb, cnt, sh, lpos, bound = ops2["count_candidates"](
                    ids
                )
                wc, wsh, wlp = ops2["probe_pairs"](ids, qa, qb)
                packed = jnp.concatenate(
                    [ga, gb, cnt, sh, lpos, wc, wsh, wlp,
                     bound.reshape(1)]
                )
                return ids, packed

            fn = shard_map(
                fused, mesh=mesh,
                in_specs=(P("data"), P(), P(), P(), P(), P()),
                out_specs=(P("data"), P()),
            )
            _deep["fn"] = jax.jit(
                lambda ids, c1, c2, g, qa, qb: fn(
                    ids, c1, c2, jnp.asarray([g], jnp.int32), qa, qb
                )
            )
        return _deep["fn"]

    def deep_exec(ids_now, pend):
        """Run the fused deep step (optionally applying ``pend`` =
        (c1, c2, g)) and return (new_ids, parse of the deep table).
        Parse result: (win_s, win_c) or None when even the deep bound
        cannot certify (caller falls back to the host pick)."""
        noc = np.full(MAXC, -1, np.int32)
        c1a, c2a, g = (noc, noc, 0) if pend is None else pend
        wlist = list(watch)[:PROBE_P]
        qa = np.full(PROBE_P, -1, np.int32)
        qb = np.full(PROBE_P, -1, np.int32)
        for i, (x, y) in enumerate(wlist):
            qa[i], qb[i] = x, y
        ids2, packed = _deep_fn()(
            ids_now, jnp.asarray(c1a), jnp.asarray(c2a), g,
            jnp.asarray(qa), jnp.asarray(qb)
        )
        arr = np.asarray(packed)
        K = (arr.shape[0] - 1 - 3 * PROBE_P) // 5
        ga, gb, cnt = arr[0:K], arr[K : 2 * K], arr[2 * K : 3 * K]
        sh, lpos = arr[3 * K : 4 * K], arr[4 * K : 5 * K]
        w0 = 5 * K
        wprobed = {
            pair: (int(arr[w0 + i]),
                   (int(arr[w0 + PROBE_P + i]) << 32)
                   | (int(arr[w0 + 2 * PROBE_P + i]) & 0xFFFFFFFF))
            for i, pair in enumerate(wlist)
        }
        B = int(arr[-1])
        return ids2, self_pick(ids2, ga, gb, cnt, sh, lpos, B, wprobed)

    def self_pick(ids_now, ga, gb, cnt, sh, lpos, B, wprobed):
        """Exact group pick over a deep candidate table.

        Group aggregation is vectorized: pair spellings compare by a
        64-bit rolling hash (H(ab) = H(a) + P^len(a)*H(b)), and the few
        groups within reach of the winner are re-verified by REAL
        concatenation before anything rides on the hash; their
        uncounted compositions come from the watch probe or one extra
        probe_pairs dispatch.  Groups further than nlen*B below the
        winner cannot win or tie (every uncounted pair counts <= B).
        Returns (win_s, win_c) or None (fall back to the host pick)."""
        hi_ = 0x7FFFFFFF
        vmask = (ga != hi_) & (cnt > 0)
        if not vmask.any():
            return None
        nlen = _nlen()
        cmax = int(cnt[vmask].max())
        # thr >= 1: count-1 pairs can only matter via the bound, and
        # folding them into B_eff keeps the aggregation at the count>=2
        # pair set (the whole point of the deep table is B_eff ~ 1)
        thr = max(1, cmax // (2 * nlen + 2))
        if thr > B and (cnt > thr).any():
            B = thr
            vmask &= cnt > thr
        idx = np.flatnonzero(vmask)
        a, b = ga[idx], gb[idx]
        c = cnt[idx].astype(np.int64)
        last = (sh[idx].astype(np.int64) << 32) | lpos[idx].astype(
            np.int64
        )
        st = _sh_state
        with np.errstate(over="ignore"):  # mod-2^64 rolling hash
            gkey = st["h"][a] + np.power(
                _HP, st["l"][a].astype(np.uint64)
            ) * st["h"][b]
        order = np.argsort(gkey, kind="stable")
        gk = gkey[order]
        newg = np.concatenate(([True], gk[1:] != gk[:-1]))
        gid = np.cumsum(newg) - 1
        ng = int(gid[-1]) + 1
        gcnt = np.zeros(ng, np.int64)
        np.add.at(gcnt, gid, c[order])
        glast = np.full(ng, -1, np.int64)
        np.maximum.at(glast, gid, last[order])
        # winner among groups: max count, tie-break min last
        wcnt = int(gcnt.max())
        wcand = np.flatnonzero(gcnt == wcnt)
        _wg = int(wcand[np.argmin(glast[wcand])])
        if B > 0 and wcnt <= nlen * B:
            return None  # even the deep bound cannot certify
        # contenders: only groups within nlen*B of the winner can reach
        # it via uncounted compositions (each <= B)
        cand = np.flatnonzero(gcnt >= wcnt - nlen * B)
        gstart = np.flatnonzero(newg)
        need: list[tuple[int, int]] = []
        metas = []
        for g in cand.tolist():
            lo = gstart[g]
            hi2 = gstart[g + 1] if g + 1 < ng else gk.shape[0]
            rows = order[lo:hi2].tolist()
            sp0 = (
                csid2spell[int(a[rows[0]])] + csid2spell[int(b[rows[0]])]
            )
            pairs_g = set()
            for r in rows:
                if csid2spell[int(a[r])] + csid2spell[int(b[r])] != sp0:
                    return None  # hash collision: punt to the host pick
                pairs_g.add((int(a[r]), int(b[r])))
            missing = [
                q for q in comps_of(sp0)
                if q not in pairs_g and q not in wprobed
            ]
            pre = [
                q for q in comps_of(sp0)
                if q not in pairs_g and q in wprobed
            ]
            need.extend(missing)
            metas.append((g, sp0, missing, pre))
        need = list(dict.fromkeys(need))
        for q in need:  # future deep steps probe these inline
            watch.pop(q, None)
            watch[q] = None
        while len(watch) > PROBE_P:
            watch.pop(next(iter(watch)))
        probed: dict[tuple[int, int], tuple[int, int]] = dict(wprobed)
        if need:
            if len(need) > PROBE_P:
                return None
            qa = np.full(PROBE_P, -1, np.int32)
            qb = np.full(PROBE_P, -1, np.int32)
            for i, (x, y) in enumerate(need):
                qa[i], qb[i] = x, y
            pc, psh, plp = (
                np.asarray(x)
                for x in probe_step(
                    ids_now, jnp.asarray(qa), jnp.asarray(qb)
                )
            )
            for i, q in enumerate(need):
                probed[q] = (
                    int(pc[i]),
                    (int(psh[i]) << 32) | (int(plp[i]) & 0xFFFFFFFF),
                )
        best = None
        for g, sp0, missing, pre in metas:
            tot = int(gcnt[g])
            lst = int(glast[g])
            for q in missing + pre:
                qc, ql = probed[q]
                tot += qc
                if qc > 0:
                    lst = max(lst, ql)
            key = (-tot, lst)
            if best is None or key < best[0]:
                best = (key, sp0, tot)
        if best is None:  # pragma: no cover
            return None
        return best[1], best[2]

    def deep_pick(ids_now):
        """Standalone exact pick (no pending merge) — the scan and
        classic loops' fallback when their k_top bound cannot certify."""
        _ids2, picked = deep_exec(ids_now, None)
        return picked

    def resolve_near_ties(ids_now, groups, ps, B):
        """Settle an uncertified pick by querying ONLY the uncounted
        compositions of the winner and every contending group
        (``probe_pairs``: one tiny dispatch), instead of downloading
        the full id stream for a host pick.  Caller must have verified
        the unseen-group guard (win_c > nlen * B).  Returns
        (win_s, win_c) or None when > PROBE_P queries would be needed.

        Exactness: after the probe every contender's count and
        last-occurrence are exact; non-contenders satisfy
        count <= cc + missing*B < win_c <= final winner count, so they
        can neither win nor tie."""
        win_s, (win_c, _wl) = _pick_group(groups)
        need: list[tuple[int, int]] = []
        for s, (cc, _l) in groups.items():
            missing = [c for c in comps_of(s) if c not in ps]
            if not missing:
                continue
            if s == win_s or win_c <= cc + len(missing) * B:
                need.extend(missing)
        need = list(dict.fromkeys(need))
        for p in need:  # future chunks probe these inline
            watch.pop(p, None)
            watch[p] = None
        while len(watch) > PROBE_P:
            watch.pop(next(iter(watch)))
        if not need:
            return win_s, win_c
        if len(need) > PROBE_P:
            return None
        qa = np.full(PROBE_P, -1, np.int32)
        qb = np.full(PROBE_P, -1, np.int32)
        for i, (x, y) in enumerate(need):
            qa[i], qb[i] = x, y
        cnt, sh, lp = probe_step(
            ids_now, jnp.asarray(qa), jnp.asarray(qb)
        )
        cnt, sh, lp = np.asarray(cnt), np.asarray(sh), np.asarray(lp)
        ps2 = dict(ps)
        for i, (x, y) in enumerate(need):
            if cnt[i] > 0:
                ps2[(x, y)] = (int(cnt[i]), (int(sh[i]), int(lp[i])))
        w2, (c2, _l2) = _pick_group(_group_stats(ps2, csid2spell))
        return w2, c2

    # ---- scan-batched speculative driver (default): S merges per
    # dispatch with host-side exact validation and rollback (see
    # make_string_scan_step).  HUTOKEN_TPU_STRING_SCAN=0 selects the
    # proven per-merge loop below.
    sv = os.environ.get("HUTOKEN_TPU_STRING_SCAN", "16")
    try:
        S = max(int(sv), 0)
    except ValueError:
        S = 16
    if S > 1:
        scan_fn = make_string_scan_step(mesh, S, k_top=k_top)

        def parse_step(row, wlist):
            """Candidate rows -> pair dict, numpy-filtered to the pairs
            that can still influence the group pick.

            Pairs with count <= thr are dropped and thr is FOLDED INTO
            the bound (B_eff = max(B, thr)), so the validator's
            missing-composition and unseen-group formulas stay exact —
            a dropped pair is indistinguishable from a non-candidate.
            Without this the host parses k_top entries per sub-step in
            interpreted Python (k_top * S dict inserts per chunk
            dominated the certified path).  Watch-list rows are exact
            and bypass the filter."""
            Jv = (row.shape[0] - 4 - 3 * PROBE_P) // 5
            ga, gb, cnt = row[0:Jv], row[Jv : 2 * Jv], row[2 * Jv : 3 * Jv]
            sh, lpos = row[3 * Jv : 4 * Jv], row[4 * Jv : 5 * Jv]
            w0 = 5 * Jv
            wc = row[w0 : w0 + PROBE_P]
            wsh = row[w0 + PROBE_P : w0 + 2 * PROBE_P]
            wlp = row[w0 + 2 * PROBE_P : w0 + 3 * PROBE_P]
            tail = w0 + 3 * PROBE_P
            B = int(row[tail])
            dev_pair = (int(row[tail + 1]), int(row[tail + 2]))
            vmask = (ga != hi) & (cnt > 0)
            if vmask.any():
                cmax = int(cnt[vmask].max())
                # keep thr low enough that the winner still clears the
                # nlen * B_eff unseen-group guard with 2x margin
                thr = cmax // (2 * _nlen() + 2)
                if thr > B:
                    B = thr
                    vmask &= cnt > thr
            idx = np.flatnonzero(vmask)
            ps: dict = {}
            for j in idx.tolist():
                ps[(int(ga[j]), int(gb[j]))] = (
                    int(cnt[j]), (int(sh[j]), int(lpos[j]))
                )
            for i, pair in enumerate(wlist):
                # count 0 is as load-bearing as a positive count: the
                # pair is then KNOWN absent, not "missing" — leaving it
                # out would keep its group uncertifiable forever
                ps[pair] = (int(wc[i]), (int(wsh[i]), int(wlp[i])))
            return ps, B, dev_pair

        stop_all = False
        demoted = False
        tail_streak = 0
        while count < vocab_size and not stop_all and not demoted:
            cs_start = len(csid2spell)
            saved = ids
            STRING_SCAN_STATS["chunks"] += 1
            wlist = list(watch)[:PROBE_P]
            qa = np.full(PROBE_P, -1, np.int32)
            qb = np.full(PROBE_P, -1, np.int32)
            for i, (x, y) in enumerate(wlist):
                qa[i], qb[i] = x, y
            ids2, packed = scan_fn(
                ids, cs_start, jnp.asarray(qa), jnp.asarray(qb)
            )
            arr = np.asarray(packed)
            n_valid = 0
            applied: list[tuple[int, int]] = []
            divergent: "tuple | None" = None
            for i in range(arr.shape[0]):
                if count >= vocab_size:
                    break
                ps, B, dev_pair = parse_step(arr[i], wlist)
                if not ps:
                    stop_all = True  # < two live elements (src/bpe.c:124)
                    break
                groups = _group_stats(ps, csid2spell)
                win_s, (win_c, _wl) = _pick_group(groups)
                safe = True
                can_query = False
                if B > 0:
                    safe = win_c > _nlen() * B
                    if safe:
                        for s, (cc, _l) in groups.items():
                            if s == win_s:
                                continue
                            missing = sum(
                                1 for comp in comps_of(s) if comp not in ps
                            )
                            # missing == 0 -> the competitor's count AND
                            # last-occurrence are exact, so an exact tie
                            # is already resolved by _pick_group's
                            # tie-break; only uncounted compositions
                            # make the comparison uncertain — and those
                            # resolve with a targeted probe after the
                            # rollback replay
                            if missing and win_c <= cc + missing * B:
                                safe = False
                                can_query = True
                                break
                if not safe:
                    if os.environ.get("HUTOKEN_TPU_STRING_DEBUG") == "1":
                        print(f"[sdbg] uncert win_c={win_c} B={B} "
                              f"guard={_nlen()*B} query={can_query}")
                    divergent = (
                        ("query", (groups, ps, B))
                        if can_query
                        else ("exact", None)
                    )
                    break
                comps = comps_of(win_s)
                if (
                    win_s in spell2csid
                    or len(comps) != 1
                    or comps[0] != dev_pair
                ):
                    # group semantics diverge from the device's pair
                    # speculation (multi-composition winner, different
                    # group winner, or a duplicate-spelling re-win)
                    divergent = ("apply", (win_s, win_c))
                    break
                bookkeep(win_s, win_c)
                intern_winner(win_s)  # assigns csid cs_start + i
                applied.append(dev_pair)
                n_valid += 1
                if prev_key is not None and prev_key == win_s:
                    stop_all = True  # repeat stop (src/bpe.c:221-224)
                    break
                prev_key = win_s
            else:
                ids = ids2  # every sub-step validated: commit the chunk
                STRING_SCAN_STATS["committed"] += 1
                continue
            if stop_all or count >= vocab_size:
                break
            # rollback to the chunk start, replay the validated prefix
            # (each a verified single-composition merge), then run the
            # divergent step exactly
            ids = saved
            for j in range(n_valid):
                c1, c2 = comp_arrays([applied[j]])
                ids = merge_multi_step(
                    ids, jnp.asarray(c1), jnp.asarray(c2), cs_start + j
                )
            kind, data = divergent
            STRING_SCAN_STATS["divergent"] += 1
            if kind == "query":
                # the replayed ids == the uncertified sub-step's state,
                # so its candidate stats are valid — settle the pick
                # with one tiny probe dispatch
                r = resolve_near_ties(ids, *data)
                if r is not None:
                    STRING_SCAN_STATS["probe_picks"] += 1
                    win_s, win_c = r
                else:
                    kind = "exact"
            if kind == "exact":
                # guard failures at the chunk's first sub-step mean the
                # tail regime has arrived (win counts at the parse-count
                # scale): every chunk dispatch would be wasted, so after
                # a short streak the per-merge classic loop (with the
                # same deep/probe fallbacks) takes over
                if n_valid == 0:
                    tail_streak += 1
                    if tail_streak >= 3:
                        demoted = True
                else:
                    tail_streak = 0
                dp = deep_pick(ids)
                if dp is not None:
                    STRING_SCAN_STATS["deep_picks"] += 1
                    win_s, win_c = dp
                else:
                    STRING_SCAN_STATS["exact_picks"] += 1
                    picked = _host_exact_string_pick(
                        _fetch_global(ids), csid2spell
                    )
                    if picked is None:
                        break
                    win_s, (win_c, _wl) = picked
            elif kind == "apply":
                win_s, win_c = data
            bookkeep(win_s, win_c)
            g, comps = intern_winner(win_s)
            if len(comps) <= MAXC:
                c1, c2 = comp_arrays(comps)
                ids = merge_multi_step(
                    ids, jnp.asarray(c1), jnp.asarray(c2), g
                )
            else:  # pragma: no cover - needs a >MAXC-way spelling
                host_merge(comps, g)
            if prev_key is not None and prev_key == win_s:
                break
            prev_key = win_s
        if not demoted:
            checkpoint()
            return str2id
        # lean tail loop: once certification needs the deep bound every
        # merge, scan chunks and k_top counts are pure waste — ONE fused
        # dispatch per merge applies the previous winner, deep-counts,
        # and probes the watch-list
        pend = None
        while count < vocab_size:
            ids, picked = deep_exec(ids, pend)
            pend = None
            if picked is None:
                picked = _host_exact_string_pick(
                    _fetch_global(ids), csid2spell
                )
                if picked is None:
                    break
                win_s, (win_c, _wl) = picked
            else:
                win_s, win_c = picked
            bookkeep(win_s, win_c)
            g, comps = intern_winner(win_s)
            if len(comps) <= MAXC:
                pend = (*comp_arrays(comps), g)
            else:  # pragma: no cover - needs a >MAXC-way spelling
                host_merge(comps, g)
            if prev_key is not None and prev_key == win_s:
                break
            prev_key = win_s
        if pend is not None:  # flush the deferred final merge
            c1a, c2a, g = pend
            ids = merge_multi_step(
                ids, jnp.asarray(c1a), jnp.asarray(c2a), g
            )
        checkpoint()
        return str2id

    # the winner's merge is DEFERRED into the next iteration's fused
    # string_step (merge + count = one dispatch, one packed download —
    # the hot loop previously paid 2 dispatches + 6 downloads per merge
    # on a ~25 ms-latency link); ``pending`` holds the comps to apply
    noc = np.full(MAXC, -1, np.int32)
    pending: "tuple | None" = None
    while count < vocab_size:
        if pending is None:
            c1a, c2a, gid = noc, noc, 0
        else:
            c1a, c2a, gid = pending
            pending = None
        ids, packed = string_step(
            ids, jnp.asarray(c1a), jnp.asarray(c2a), gid
        )
        arr = np.asarray(packed)
        J = (arr.shape[0] - 1) // 5
        ga, gb, cnt, sh, lpos = (
            arr[0:J], arr[J : 2 * J], arr[2 * J : 3 * J],
            arr[3 * J : 4 * J], arr[4 * J : 5 * J],
        )
        B = int(arr[-1])
        vmask = (ga != hi) & (cnt > 0)
        if vmask.any():
            # same exactness-preserving candidate filter as the scan
            # driver's parse_step: drop pairs <= thr and fold thr into
            # the bound (a dropped pair == a non-candidate)
            cmax = int(cnt[vmask].max())
            thr = cmax // (2 * _nlen() + 2)
            if thr > B:
                B = thr
                vmask &= cnt > thr
        pair_stats: dict[tuple[int, int], tuple[int, tuple[int, int]]] = {}
        for j in np.flatnonzero(vmask).tolist():
            # "last occurrence" is the lexicographic (shard, local pos)
            # pair — overflow-free global ordering
            pair_stats[(int(ga[j]), int(gb[j]))] = (
                int(cnt[j]), (int(sh[j]), int(lpos[j]))
            )
        if not pair_stats:
            break  # fewer than two live elements (src/bpe.c:124)
        groups = _group_stats(pair_stats, csid2spell)
        win_s, (win_c, _win_l) = _pick_group(groups)
        if os.environ.get("HUTOKEN_TPU_TRAIN_SELFCHECK") == "1":
            ref = _host_exact_string_pick(_fetch_global(ids), csid2spell)
            if ref is not None and (
                ref[0] != win_s or ref[1][0] != win_c
            ):
                print(
                    f"[selfcheck] device pick {win_s!r} {groups[win_s]} "
                    f"!= host pick {ref[0]!r} {ref[1]} (B={B}); "
                    f"device stats for host pick: {groups.get(ref[0])}"
                )
        if B > 0:
            # certify: the winner's exact lower bound must beat every
            # other candidate group's upper bound and the unseen-group
            # bound (a spelling has at most _nlen() parses, each
            # contributing at most B when uncounted)
            safe = win_c > _nlen() * B
            can_query = False
            if safe:
                for s, (c, _l) in groups.items():
                    if s == win_s:
                        continue
                    missing = sum(
                        1
                        for comp in comps_of(s)
                        if comp not in pair_stats
                    )
                    # missing == 0 -> exact count and last-occurrence,
                    # so exact ties are already resolved by
                    # _pick_group's tie-break (see scan driver)
                    if missing and win_c <= c + missing * B:
                        safe = False
                        can_query = True
                        break
            if not safe:
                picked = (
                    resolve_near_ties(ids, groups, pair_stats, B)
                    if can_query
                    else None
                )
                if picked is None:
                    picked = deep_pick(ids)
                if picked is not None:
                    win_s, win_c = picked
                else:
                    picked = _host_exact_string_pick(
                        _fetch_global(ids), csid2spell
                    )
                    if picked is None:
                        break
                    win_s, (win_c, _win_l) = picked
        bookkeep(win_s, win_c)
        g, comps = intern_winner(win_s)
        if len(comps) <= MAXC:
            pending = (*comp_arrays(comps), g)  # applied next iteration
        else:  # pragma: no cover - needs a >MAXC-way composable spelling
            host_merge(comps, g)
        if prev_key is not None and prev_key == win_s:
            break  # same spelling twice in a row (src/bpe.c:221-224)
        prev_key = win_s
    checkpoint()
    return str2id


def _fetch_global(ids) -> np.ndarray:
    """Materialize the full sharded array on this host.

    Multi-process safe: when shards live on other hosts' devices a
    plain np.asarray raises, so the array is allgathered first."""
    import jax

    if jax.process_count() > 1:  # pragma: no cover - needs a real pod
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(ids, tiled=True))
    return np.asarray(ids)


def _global_stream(ids_np: np.ndarray) -> np.ndarray:
    """Flatten shard-major and drop -1 pads: tail pads vanish and the
    shard streams concatenate into the exact global element stream."""
    stream = ids_np.reshape(-1)
    return stream[stream != -1]


def _pair_keys(stream: np.ndarray) -> np.ndarray:
    """Packed int64 adjacent-pair keys (ids are < 2^31, nonneg)."""
    a = stream[:-1].astype(np.int64)
    b = stream[1:].astype(np.int64)
    return (a << np.int64(31)) | b


def _host_exact_pick(ids_np: np.ndarray):
    """Exact global (id1, id2, count) bbpe pick on the host.

    The always-correct fallback when the candidate bound cannot certify
    a device pick (rare: very flat pair distributions mid-training).
    """
    from ..train.common import count_pairs, first_to_reach_winner

    stream = _global_stream(ids_np)
    if stream.shape[0] < 2:
        return None
    uniq, inverse, counts = count_pairs(_pair_keys(stream))
    win, maxc = first_to_reach_winner(inverse, counts)
    key = int(uniq[win])
    return key >> 31, key & ((1 << 31) - 1), int(maxc)


def _use_candidates(K: int, n_dev: int, n_total: int = 0) -> bool:
    """Dense K^2 histograms only for small vocabs on multi-device meshes;
    the candidate machinery covers GPT-2 scale and beyond."""
    if n_dev <= 1:
        return False
    if K * K >= 2**31:
        # the dense path's a*K+b int32 keys would overflow — candidates
        # are mandatory regardless of any env override
        return True
    if n_total >= 2**31:
        # the dense path's shard_idx*n+pos occ packing would overflow
        return True
    if os.environ.get("HUTOKEN_TPU_TRAIN_FORCE_CANDIDATES") == "1":
        return True
    dense_kmax = int(os.environ.get("HUTOKEN_TPU_TRAIN_DENSE_KMAX", "4096"))
    return K > dense_kmax


def _enable_cache() -> None:
    from ..engine import _enable_compilation_cache

    _enable_compilation_cache()


def _distributed_train(
    data: bytes,
    vocab_size: int,
    mesh,
    *,
    id_offset: int,
    min_merge_count: int,
    stop_on_pair: bool,
    verbose: bool,
    scan_steps: int = 32,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 512,
    resume: bool = False,
) -> dict[bytes, int]:
    """Shared driver: scanned device steps + host bookkeeping replay.

    ``id_offset`` is the reference id-assignment quirk (0 for bbpe,
    1 for bpe — src/bbpe.c:87 vs src/bpe.c:171); ``stop_on_pair`` selects
    the repeat-stop key (id pair for bbpe, merged spelling for bpe).
    """
    import jax.numpy as jnp

    from ..parallel.mesh import shard_batch

    if not stop_on_pair:
        # string-keyed training groups pairs by concatenated SPELLING
        # (src/bpe.c strcmp's the pair string against the winner), which
        # the id-keyed scan cannot express — dedicated driver below
        return _distributed_train_string(
            data, vocab_size, mesh,
            verbose=verbose,
            checkpoint_path=checkpoint_path,
            checkpoint_every=checkpoint_every,
            resume=resume,
        )

    _enable_cache()
    K = vocab_size + id_offset + 1
    n_dev = mesh.devices.size
    use_candidates = _use_candidates(K, n_dev, n_total=len(data))
    str2id: dict[bytes, int] = {}
    id2str: dict[int, bytes] = {}
    for i in range(256):
        key = b"" if i == 0 else bytes([i])
        str2id[key] = i
        id2str[i] = key
    count = 256

    ids_np = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    pad = (-len(ids_np)) % n_dev
    if pad:
        ids_np = np.concatenate([ids_np, np.full(pad, -1, np.int32)])
    scan_step, fused_single, merge_single = make_scan_train_step(
        K, mesh, min_merge_count, scan_steps, use_candidates=use_candidates
    )
    ids = shard_batch(mesh, jnp.asarray(ids_np))

    # resume: reload the checkpoint vocab + merge log, replay the merges
    # onto the sharded corpus, and continue training from there
    merge_log: list[tuple[int, int, int]] = []
    if resume and checkpoint_path is not None and os.path.exists(
        checkpoint_path + ".merges"
    ):
        from ..train.common import load_checkpoint

        str2id = load_checkpoint(checkpoint_path)
        id2str = {idx: tok for tok, idx in str2id.items()}
        count = len(str2id)  # hashmap-count semantics: distinct keys
        with open(checkpoint_path + ".merges", encoding="utf-8") as f:
            for line in f:
                id1, id2, new_id = (int(x) for x in line.split())
                merge_log.append((id1, id2, new_id))
                ids = merge_single(ids, id1, id2, new_id)
        if verbose:
            print(f"resumed {len(merge_log)} merges from {checkpoint_path}")

    def checkpoint() -> None:
        if checkpoint_path is None:
            return
        from ..train.common import save_checkpoint

        save_checkpoint(str2id, checkpoint_path)
        with open(checkpoint_path + ".merges.tmp", "w", encoding="utf-8") as f:
            for id1, id2, new_id in merge_log:
                f.write(f"{id1} {id2} {new_id}\n")
        os.replace(checkpoint_path + ".merges.tmp", checkpoint_path + ".merges")

    merges_since_ckpt = 0
    prev_stop_key = None
    timing = os.environ.get("HUTOKEN_TPU_TIMING") == "1"
    chunk_times: list[float] = []

    def bookkeep(id1: int, id2: int, cnt: int, expected_id: int):
        """Returns (stop, replacement, stop_key)."""
        nonlocal count, merges_since_ckpt
        merge_log.append((id1, id2, expected_id))
        merges_since_ckpt += 1
        if merges_since_ckpt >= checkpoint_every:
            merges_since_ckpt = 0
            checkpoint()
        merged = id2str.get(id1, b"") + id2str.get(id2, b"")
        replacement = merged in str2id
        if not replacement:
            count += 1
        str2id[merged] = expected_id
        id2str[expected_id] = merged
        if verbose:
            print(f"Most common pair: ({id1}, {id2}), freq: {cnt}")
            print(f"New token id: {expected_id}\n")
        stop_key = (id1, id2) if stop_on_pair else merged
        return replacement, stop_key

    while count < vocab_size:
        chunk_start_ids = ids
        chunk_start_count = count
        chunk_start_log = len(merge_log)
        chunk_added: list[bytes] = []
        start_id = count + id_offset
        t_chunk = time.perf_counter() if timing else 0.0
        new_ids, id1s, id2s, cnts, oks = scan_step(ids, start_id)
        id1s = np.asarray(id1s)
        id2s = np.asarray(id2s)
        cnts = np.asarray(cnts)
        oks = np.asarray(oks)
        if timing:
            chunk_times.append(time.perf_counter() - t_chunk)
            if len(chunk_times) in (1, 2) or len(chunk_times) % 16 == 0:
                print(
                    f"[ht-timing] train chunk {len(chunk_times)}: "
                    f"{chunk_times[-1]:.3f}s"
                )

        stopped = False
        diverged_at = -1
        for i in range(scan_steps):
            if not oks[i]:
                # the candidate bound could not certify this pick — the
                # step (and everything after it) is untrusted; redo it
                # single-step with the exact fallback
                diverged_at = i
                break
            cnt = int(cnts[i])
            if cnt < min_merge_count:
                stopped = True
                break
            expected_id = count + id_offset
            if expected_id != start_id + i:
                # a duplicate-spelling merge desynced device id assignment
                diverged_at = i
                break
            replacement, stop_key = bookkeep(
                int(id1s[i]), int(id2s[i]), cnt, expected_id
            )
            if not replacement:
                chunk_added.append(id2str[expected_id])
            if prev_stop_key is not None and stop_key == prev_stop_key:
                stopped = True
                break
            prev_stop_key = stop_key
            if count >= vocab_size:
                stopped = True
                break
        if stopped:
            break
        if diverged_at >= 0:
            if timing:
                print(f"[ht-timing] divergence at chunk step {diverged_at}")
            # rollback this chunk's bookkeeping and redo it single-step
            for added in chunk_added:
                del str2id[added]
            del merge_log[chunk_start_log:]
            # (ids overwritten below; id2str stale entries are harmless)
            count = chunk_start_count
            prev_stop_key = None  # conservatively recomputed below
            ids = chunk_start_ids
            done = False
            # single-step up to AND past the divergence point, then
            # resume scanning: stopping short of the duplicate would
            # make the next scan re-diverge at the same step and waste
            # a full chunk dispatch per cycle; finishing the whole chunk
            # single-step wastes ~15x the other way
            for _ in range(min(diverged_at + 2, scan_steps)):
                if count >= vocab_size:
                    done = True
                    break
                new_id = count + id_offset
                s_id1, s_id2, cnt, s_ok, stepped = fused_single(ids, new_id)
                if not bool(s_ok):
                    # uncertifiable even single-step: exact host pick
                    # (numpy over the downloaded stream), then the
                    # device applies the merge as usual
                    picked = _host_exact_pick(_fetch_global(ids))
                    if picked is None:
                        done = True
                        break
                    s_id1, s_id2, cnt = picked
                    if cnt >= min_merge_count:
                        stepped = merge_single(ids, s_id1, s_id2, new_id)
                cnt = int(cnt)
                if cnt < min_merge_count:
                    done = True
                    break
                ids = stepped
                replacement, stop_key = bookkeep(
                    int(s_id1), int(s_id2), cnt, new_id
                )
                if prev_stop_key is not None and stop_key == prev_stop_key:
                    done = True
                    break
                prev_stop_key = stop_key
            if done:
                break
            continue
        ids = new_ids
    checkpoint()
    return str2id


def distributed_bbpe_train(
    data: bytes,
    vocab_size: int,
    *,
    mesh,
    verbose: bool = True,
    scan_steps: int = 32,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 512,
    resume: bool = False,
) -> dict[bytes, int]:
    """Byte-level distributed training (device pair counting + psum,
    K merges per dispatch, optional checkpoint/resume)."""
    return _distributed_train(
        data, vocab_size, mesh,
        id_offset=0, min_merge_count=2, stop_on_pair=True,
        verbose=verbose, scan_steps=scan_steps,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        resume=resume,
    )


def distributed_bpe_train(
    data: bytes,
    vocab_size: int,
    *,
    mesh,
    verbose: bool = True,
    scan_steps: int = 32,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 512,
    resume: bool = False,
) -> dict[bytes, int]:
    """String-keyed distributed training.

    Reproduces ``bpe_train_core(strict=False)`` — pairs are grouped by
    concatenated SPELLING, so all compositions of the winning spelling
    count and merge together (src/bpe.c:130-165, 181-215); see
    ``_distributed_train_string``.  The id-assignment quirk (count+1,
    skipping 256) is preserved (src/bpe.c:171); repeat-stop compares
    merged spellings (src/bpe.c:221-224).  ``scan_steps`` is accepted
    for API symmetry but unused (the string trainer is host-paced).
    """
    return _distributed_train(
        data, vocab_size, mesh,
        id_offset=1, min_merge_count=1, stop_on_pair=False,
        verbose=verbose, scan_steps=scan_steps,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
        resume=resume,
    )
