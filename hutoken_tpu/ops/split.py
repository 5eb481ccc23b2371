"""Device pre-tokenizer: the TPU-resident cache-cold encode path.

This module turns the host-side split -> intern -> resolve -> pack ->
launch -> extract -> assemble pipeline (engine.py) into ONE fused device
program per fixed-size byte chunk, so a unique-heavy corpus (where the
word cache cannot help) never pays per-byte host work:

    chunk bytes u8 [C]  --h2d-->
      1. byte-class + token-START mask  (vectorized form of the native
         SIMD splitter's 3-byte-window rule, native/src/hutoken_host.cpp
         split_window_avx512; reference semantics src/parser.c:14-141)
      2. word starts via sort-compaction; lengths by differencing
      3. length-sort words; pack [Wcap, 32] u8 rows by vmap dynamic-slice
      4. the existing fused Pallas greedy-merge kernel
         (ops/pallas_merge.py) with the byte->seed LUT applied in-kernel
      5. flag words the kernel cannot serve exactly (length > 32,
         partial-table divergence) -- their token counts drop to zero and
         compact (byte-range, insert-position) records come back for the
         host's exact scalar re-encode
      6. stream compaction via one payload sort (mode-selected keys) +
         per-document cumulative token counts
    --d2h--> header + the cheapest of four stream encodings per chunk:
         plain u16/i32, escape-coded u8, bit-packed (ceil(log2 V))
         bits/token), or sparse merge records -- the last downloads
         ONLY multi-byte tokens (~6 B each) and the host rebuilds every
         single-byte token from the chunk bytes it already holds via
         the byte->seed LUT, cutting cache-cold d2h to ~0.3 B per
         corpus byte on the bandwidth-starved tunnel

The host keeps only: UTF-8 corpus prep, safe chunk-cut selection, the
supported-alphabet precheck, sparse-stream reconstruction, and splicing
of flagged words -- all O(1) passes with numpy, no per-word Python.

Byte-level start rule (derivation in native/src/hutoken_host.cpp:361-430;
classes A alpha / D digit / O other / W space 0x20 / S = {\t\n\v\f\r,
NUL}; multi-byte chars spread their class over lead+continuation bytes):

  * W: start iff the previous byte is not a space,
  * S: always a start,
  * A/D/O at a char-start byte: if the previous byte is a space, that
    space glued to this run iff it was single -- so start iff the byte
    two back is ALSO a space; otherwise start iff the previous byte's
    class differs.

Out-of-range bytes count as not-a-space / class-less, which makes
position 0 a start under the same formula.  Document boundaries reset
the 2-byte context (kill masks) so words never span documents.

The device alphabet is ASCII plus valid 2-byte sequences led by
0xC3/0xC5 (covers every Hungarian accented letter, src/parser.c:102-129,
and most Western European text); `supported_alphabet` prechecks a chunk
on the host in one vectorized pass and routes anything else to the
legacy engine path, mirroring the native splitter's own SIMD/scalar
split (hutoken_host.cpp:594-608).
"""

from __future__ import annotations

import functools

import numpy as np

# Hungarian accent continuation bytes per lead page (low 6 bits), same
# sets as native/src/hutoken_host.cpp HuAccentTables / src/parser.c:102-129.
_ACC_C3 = (0x81, 0x89, 0x8D, 0x93, 0x96, 0x9A, 0x9C,
           0xA1, 0xA9, 0xAD, 0xB3, 0xB6, 0xBA, 0xBC)
_ACC_C5 = (0x90, 0x91, 0xB0, 0xB1)

MAX_WORD = 32  # the Pallas kernel's widest group (group_w=32)


def _acc_mask_u64(acc: tuple) -> tuple[int, int]:
    lo = hi = 0
    for b in acc:
        i = b & 0x3F
        if i < 32:
            lo |= 1 << i
        else:
            hi |= 1 << (i - 32)
    return lo, hi


_ACC3_LO, _ACC3_HI = _acc_mask_u64(_ACC_C3)
_ACC5_LO, _ACC5_HI = _acc_mask_u64(_ACC_C5)


def _ascii_masks(b):
    """Shared elementwise classification for ASCII bytes (works for both
    numpy and jnp int32 arrays ``b``)."""
    is_sp = b == 0x20
    is_S = (b == 9) | ((b >= 10) & (b <= 13)) | (b == 0)
    is_dig = (b >= 0x30) & (b <= 0x39)
    low = b | 32
    is_al = (low >= 0x61) & (low <= 0x7A) & (b < 0x80)
    return is_sp, is_S, is_dig, is_al


def _i32(mask: int) -> int:
    """32-bit mask as a signed int32-range Python int."""
    return mask - (1 << 32) if mask >= (1 << 31) else mask


def _acc_member(cont_low6, lo_mask, hi_mask):
    """Membership of a continuation byte's low 6 bits in an accent set,
    via two 32-bit masks (no table gather)."""
    sel_hi = cont_low6 >= 32
    sh = cont_low6 & 31
    if isinstance(cont_low6, np.ndarray):
        word = np.where(sel_hi, np.int64(hi_mask), np.int64(lo_mask))
        return ((word >> sh) & 1) != 0
    import jax.numpy as jnp
    from jax import lax

    word = jnp.where(sel_hi, jnp.int32(_i32(hi_mask)), jnp.int32(_i32(lo_mask)))
    return (lax.shift_right_logical(word, sh) & 1) != 0


def _prev1(x, fill=False):
    xp = np if isinstance(x, np.ndarray) else _jnp()
    n = x.shape[0]
    return xp.concatenate([xp.full((1,), fill, dtype=x.dtype), x])[:n]


def _prev2(x, fill=False):
    xp = np if isinstance(x, np.ndarray) else _jnp()
    n = x.shape[0]
    return xp.concatenate([xp.full((2,), fill, dtype=x.dtype), x])[:n]


def _next1(x, fill=False):
    xp = np if isinstance(x, np.ndarray) else _jnp()
    n = x.shape[0]
    return xp.concatenate([x, xp.full((1,), fill, dtype=x.dtype)])[1 : n + 1]


def _jnp():
    import jax.numpy as jnp

    return jnp


def _start_mask_any(b, kill1, kill2, valid):
    """Token-start mask over a byte array; generic over numpy / jnp.

    ``b`` int32 byte values, ``kill1``/``kill2`` bool context resets
    (document/segment starts and the byte after), ``valid`` bool.
    Requires the supported alphabet (see `supported_alphabet`).
    """
    is_sp, is_S, is_dig, is_al = _ascii_masks(b)
    lead3 = b == 0xC3
    lead5 = b == 0xC5
    cont = (b & 0xC0) == 0x80
    low6 = b & 0x3F
    acc_cont = cont & (
        (_prev1(lead3) & _acc_member(low6, _ACC3_LO, _ACC3_HI))
        | (_prev1(lead5) & _acc_member(low6, _ACC5_LO, _ACC5_HI))
    )
    oth_cont = cont & ~acc_cont
    is_oth_ascii = (b < 0x80) & ~(is_sp | is_S | is_dig | is_al)
    mA = is_al | acc_cont | _next1(acc_cont)  # lead byte takes char class
    mO = is_oth_ascii | oth_cont | _next1(oth_cont)
    mD = is_dig

    psp = _prev1(is_sp) & ~kill1
    psp2 = _prev2(is_sp) & ~kill1 & ~kill2
    same = (
        (mA & _prev1(mA)) | (mD & _prev1(mD)) | (mO & _prev1(mO))
    ) & ~kill1
    content_start = (mA | mD | mO) & ~cont
    start = (
        (is_sp & ~psp)
        | is_S
        | (content_start & ((psp & psp2) | (~psp & ~same)))
    )
    return start & valid


def np_start_mask(chunk: np.ndarray, doc_starts: np.ndarray) -> np.ndarray:
    """Numpy reference of the device start rule (exactness oracle; also
    usable as a host fast path).  ``chunk`` uint8 [n]."""
    n = chunk.shape[0]
    b = chunk.astype(np.int32)
    kill1 = np.zeros(n, dtype=bool)
    kill2 = np.zeros(n, dtype=bool)
    ds = doc_starts[(doc_starts >= 0) & (doc_starts < n)]
    kill1[ds] = True
    ds2 = doc_starts[(doc_starts + 1 >= 0) & (doc_starts + 1 < n)] + 1
    kill2[ds2] = True
    if n:
        kill1[0] = True
    valid = np.ones(n, dtype=bool)
    return _start_mask_any(b, kill1, kill2, valid)


def supported_alphabet(chunk: np.ndarray) -> bool:
    """True when every byte >= 0x80 forms a valid 2-byte sequence led by
    0xC3/0xC5 (the native SIMD splitter's alphabet).  One vectorized
    pass; anything else routes to the legacy path."""
    high = chunk >= 0x80
    if not high.any():
        return True
    lead = (chunk == 0xC3) | (chunk == 0xC5)
    cont = (chunk & 0xC0) == 0x80
    if not ((lead | cont) == high).all():
        return False
    # every lead followed by a continuation; every continuation preceded
    # by a lead (no strays, no lead at the very end)
    nxt_cont = np.concatenate([cont[1:], [False]])
    prev_lead = np.concatenate([[False], lead[:-1]])
    return bool((~lead | nxt_cont).all() and (~cont | prev_lead).all())


_CUT_LUT = None


def _cut_lut() -> np.ndarray:
    """256-entry content-class LUT for safe-cut candidates: 1=A 2=D 3=O
    for ASCII content bytes, 0 for space/single/high bytes."""
    global _CUT_LUT
    if _CUT_LUT is None:
        t = np.zeros(256, dtype=np.uint8)
        for v in range(0x80):
            b = np.int32(v)
            is_sp, is_S, is_dig, is_al = _ascii_masks(b)
            if is_al:
                t[v] = 1
            elif is_dig:
                t[v] = 2
            elif not (is_sp or is_S):
                t[v] = 3
        _CUT_LUT = t
    return _CUT_LUT


def find_cut(chunk: np.ndarray, lo: int, hi: int) -> int:
    """Largest p in (lo, hi] that starts a new word regardless of any
    context before it: byte p-1 and byte p are both ASCII content bytes
    of DIFFERENT classes (then p is a `[ ]?class+` run start with no
    possible space glue; see the class cascade, src/parser.c:24-88).
    Returns -1 when the window has no such point."""
    if hi <= lo + 1:
        return -1
    t = _cut_lut()
    c = t[chunk[lo : hi]]
    ok = (c[1:] != 0) & (c[:-1] != 0) & (c[1:] != c[:-1])
    idx = np.flatnonzero(ok)
    if idx.size == 0:
        return -1
    return lo + 1 + int(idx[-1])


# ------------------------------------------------------------------ device


WINDOW = 96  # bytes of chunk per block row; words (<= 32 B) starting in
#              a row's window end within its 128 lanes by construction


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    __import__("jax").jit,
    static_argnames=(
        "C", "Fcap", "Dcap", "Tcap", "depth", "rank_in_val", "multi_ok",
        "partial", "probe_len", "cap_mask", "u16_out", "pack_bits",
        "interpret",
    ),
)
def _raw_encode_chunk_jit(
    chunk, meta_in,
    tk, tv, tv2, lut, full_pkey, full_pval,
    *, C, Fcap, Dcap, Tcap, depth, rank_in_val, multi_ok, partial,
    probe_len, cap_mask, u16_out, pack_bits, interpret,
):
    """The fused raw-chunk encode program (module docstring pipeline),
    in the WINDOWED layout: block row r is ``chunk[r*96 : r*96+128]``
    verbatim (two strided reshapes — no gather, no scatter, no sort), a
    word lives in the row of its 96-byte start window (words are <= 32
    bytes, so they always fit the row's 128 lanes, at ~75% occupancy),
    and the segment-aware Pallas kernel (`_kernel_seg`) runs the greedy
    fixed point in place.  Every remaining XLA op is elementwise, a
    scan, or scales with real tokens — the formulations XLA runs at HBM
    speed — because gathers/scatters over big domains measure a flat
    ~130M elem/s on this hardware and would dominate otherwise.

    ``meta_in`` int32 [2 + Dcap] = [n_valid, n_docs, doc_ends...] — ONE
    upload; returns (meta_out int32 [6 + Dcap + 3*Fcap], blob u8
    [BLOB]) — ONE small download plus one exact prefix slice of the
    blob, which holds whichever stream encoding the header marks
    cheapest (mode 0 = plain u16/i32, 1 = escape-coded, 2 = bit-packed,
    3 = sparse merge records; singles reconstructed host-side from the
    chunk bytes).  meta_out layout:

    * [0:6] = [W, T, F, mode, H, 0]: word count (stats), total device
      tokens (prefix length; T > Tcap = degenerate chunk, host
      re-encodes legacy-side), flagged words (F > Fcap likewise),
      token-stream encoding (0 = plain u16/i32, 1 = escape-coded u8,
      2 = bit-packed, 3 = sparse merge records), escaped-token count,
      multi-byte-token count,
    * [6 : 6+Dcap] doc_cum: device tokens in segments 0..d (flagged
      words excluded; the host adds them back while splicing),
    * [6+Dcap :] frecs flattened [(byte_start, byte_len,
      token_insert_pos), ...].

    Transfers per chunk are exactly: chunk bytes + meta up, meta_out +
    token prefix down — each extra array costs a tunnel round trip
    (~25-170 ms under load), which dominated the pipeline before the
    packing.
    """
    import jax.numpy as jnp
    from jax import lax

    from .merge import INF_RANK, MODE_PACKED, _probe_pairs_packed, fast_gather
    from .pallas_merge import _pallas_merge_seg_call

    n_valid = meta_in[0]
    doc_ends = meta_in[2 : 2 + Dcap]
    Rr = _round_up(-(-C // WINDOW), 256)  # block rows (ROW_TILE grid)
    Ce = Rr * WINDOW + MAX_WORD  # extended byte domain for the reshapes
    ext = jnp.zeros((Ce - C,), chunk.dtype)
    chunk_e = jnp.concatenate([chunk, ext])
    iota = lax.iota(jnp.int32, Ce)
    valid = iota < n_valid
    b = chunk_e.astype(jnp.int32)

    # --- context resets at segment starts (docs and chunk head)
    seg_starts = jnp.where(
        lax.iota(jnp.int32, Dcap) == 0,
        0,
        jnp.concatenate([jnp.zeros(1, jnp.int32), doc_ends[:-1]]),
    )
    kill1 = jnp.zeros(Ce, jnp.bool_).at[seg_starts].set(True, mode="drop")
    kill2 = jnp.zeros(Ce, jnp.bool_).at[seg_starts + 1].set(True, mode="drop")

    start = _start_mask_any(b, kill1, kill2, valid)

    # --- per-byte word geometry (scans + elementwise only)
    ws = lax.cummax(jnp.where(start, iota, 0))  # word start of byte i
    nstart = jnp.where(start, iota, jnp.int32(0x7FFFFFFF))
    ns = jnp.concatenate(
        [lax.cummin(nstart, reverse=True)[1:], jnp.full((1,), 0x7FFFFFFF,
                                                        jnp.int32)]
    )
    ns = jnp.minimum(ns, n_valid)  # next word start (or corpus end)
    wlen = ns - ws
    long_w = wlen > MAX_WORD
    row = ws // WINDOW  # the row owning byte i's word
    lane = iota - row * WINDOW
    pos = iota - ws
    gendlane = ws + wlen - 1 - row * WINDOW  # word's last lane (<= 127)
    owned = valid & jnp.logical_not(long_w)
    auxval = pos | (gendlane << 5)
    DEADAUX = jnp.int32(1 << 12)

    def windows(per_byte, fill):
        """[Ce] per-byte array -> [Rr, 128] block view: row r =
        values[r*96 : r*96+128]; pure reshapes + one concat."""
        A = per_byte[: Rr * WINDOW].reshape(Rr, WINDOW)
        Bv = jnp.concatenate(
            [per_byte[WINDOW : WINDOW + (Rr - 1) * WINDOW].reshape(
                Rr - 1, WINDOW)[:, :MAX_WORD],
             jnp.full((1, MAX_WORD), fill, per_byte.dtype)]
        )
        return jnp.concatenate([A, Bv], axis=1)

    # a byte is LIVE at its owning row only (A region: row == i//96;
    # B region of row r holds bytes (r+1)*96..+31, owned iff row == r)
    brow = iota // WINDOW
    auxA = jnp.where(owned & (row == brow), auxval, DEADAUX)
    auxB = jnp.where(owned & (row == brow - 1), auxval, DEADAUX)
    aux128 = jnp.concatenate(
        [auxA[: Rr * WINDOW].reshape(Rr, WINDOW),
         jnp.concatenate(
             [auxB[WINDOW : WINDOW + (Rr - 1) * WINDOW].reshape(
                 Rr - 1, WINDOW)[:, :MAX_WORD],
              jnp.full((1, MAX_WORD), DEADAUX, jnp.int32)]
         )],
        axis=1,
    )
    raw128 = windows(chunk_e, 0)

    # --- the segment-aware on-chip greedy merge (ops/pallas_merge.py)
    out, nxtf = _pallas_merge_seg_call(
        tk, tv, tv2, lut, raw128, aux128,
        depth=depth, rank_in_val=rank_in_val, multi_ok=multi_ok,
        interpret=interpret,
    )

    lane2 = lax.broadcasted_iota(jnp.int32, (Rr, 128), 1)
    seg_pos = aux128 & 31
    seg_gend = lax.shift_right_logical(aux128, 5) & 127
    seg_dead = (aux128 & (1 << 12)) != 0

    # --- partial-table divergence flags (build_pallas_table contract):
    # probe the FINAL adjacent pairs (the kernel's surviving links)
    # against the full rule table; any hit => that word re-encodes
    # host-side.  Segment-spread via masked lane shifts (static slices).
    if partial:
        zero = jnp.zeros(1, jnp.int32)
        full_table = (
            full_pkey, full_pval, zero, zero, probe_len, cap_mask,
            MODE_PACKED,
        )
        bpair = jnp.take_along_axis(out, nxtf, axis=1)
        prank, _m = _probe_pairs_packed(full_table, out, bpair)
        pflag = (out >= 0) & (nxtf != lane2) & (prank < INF_RANK)

        def sh_r(x, k):  # x[.., l-k] (shift right along lanes)
            return jnp.concatenate(
                [jnp.zeros((Rr, k), x.dtype), x[:, :-k]], axis=1
            )

        def sh_l(x, k):  # x[.., l+k]
            return jnp.concatenate(
                [x[:, k:], jnp.zeros((Rr, k), x.dtype)], axis=1
            )

        acc = pflag.astype(jnp.int32)
        k = 1
        while k < MAX_WORD:  # forward prefix-OR within the segment
            acc = acc | jnp.where(seg_pos >= k, sh_r(acc, k), 0)
            k *= 2
        k = 1
        while k < MAX_WORD:  # suffix-MAX pulls the segment total back
            acc = jnp.maximum(
                acc, jnp.where(seg_gend - lane2 >= k, sh_l(acc, k), 0)
            )
            k *= 2
        pflag_lane = acc != 0
    else:
        pflag_lane = jnp.zeros((Rr, 128), jnp.bool_)

    # --- flagged-word start lanes (long words + divergent words); must
    # precede the compaction sort, which carries them as a key class
    longstart_b = start & long_w & valid
    longstart128 = windows(longstart_b.astype(jnp.int32), 0) != 0
    # long words own no lanes, but their start byte always falls in the
    # A region of its own row (start lanes are < 96 by construction)
    longstartA = (longstart128 & (lane2 < WINDOW))
    partialstart = pflag_lane & (seg_pos == 0) & jnp.logical_not(seg_dead)
    flagstart = longstartA | partialstart

    # --- per-lane token geometry: a live lane's token spans the bytes
    # up to the next live lane in its row, clamped to its word end (the
    # kernel's final nxt pointers are NOT usable here: a merge that
    # consumes the segment tail leaves the survivor pointing at the
    # hole).  Next-live is a per-row reverse cummin — as cheap as the
    # row scans below.  Multi-byte tokens are the only ones the host
    # cannot reconstruct from the chunk bytes it already holds — the
    # basis of the sparse stream (mode 3).
    valid_lane = (out >= 0) & jnp.logical_not(pflag_lane)
    live = out >= 0
    lane_inf = jnp.where(live, lane2, jnp.int32(1 << 20))
    nli = jnp.flip(
        lax.cummin(jnp.flip(lane_inf, axis=1), axis=1), axis=1
    )
    nli = jnp.concatenate(
        [nli[:, 1:], jnp.full((Rr, 1), 1 << 20, jnp.int32)], axis=1
    )
    span = jnp.minimum(nli, seg_gend + 1) - lane2
    merged_lane = valid_lane & (span > 1)

    # inclusive prefix counts of valid lanes via the 2-level form (a
    # 128-wide row scan + a tiny row-offset scan); XLA's 1-D cumsum over
    # NL lowers to a far slower log-pass ladder
    rowc = jnp.cumsum(valid_lane.astype(jnp.int32), axis=1)
    rowtot = rowc[:, 127]
    rowoff_inc = jnp.cumsum(rowtot)
    vc = (rowc + (rowoff_inc - rowtot)[:, None]).reshape(-1)
    T = rowoff_inc[Rr - 1]

    # --- stream-mode selection BEFORE the sort (all counts are cheap
    # reductions), so one payload sort serves every mode via runtime-
    # selected keys.  Exact d2h volumes:
    #   mode 0: plain u16/i32 tokens           2|4 bytes * T
    #   mode 1: escape-coded u8 (u16 only)     T + 2*H
    #   mode 2: bit-packed                     pack_bits * ceil(T/8)
    #   mode 3: sparse merge records           8 * M   (singles rebuilt
    #           host-side from the chunk bytes via the byte->seed LUT)
    Mcap = max(Tcap // 16, min(1 << 15, Tcap // 2))
    H = jnp.sum((valid_lane & (out >= 255)).astype(jnp.int32))
    M = jnp.sum(merged_lane.astype(jnp.int32))
    Hcap = Tcap // 2
    tok_w = 2 if u16_out else 4
    INFV = jnp.int32(0x7FFFFFFF)
    vol0 = tok_w * T
    vol1 = jnp.where(u16_out & (H <= Hcap), T + 2 * H, INFV)
    vol2 = pack_bits * ((T + 7) // 8) if pack_bits else INFV
    vol3 = jnp.where(M <= Mcap, 8 * M, INFV)
    best12 = jnp.minimum(jnp.where(vol2 <= vol1, vol2, vol1), vol0)
    mode = jnp.where(
        vol3 < best12,
        3,
        jnp.where(
            (vol2 < vol0) & (vol2 <= vol1),
            2,
            jnp.where(vol1 < vol0, 1, 0),
        ),
    ).astype(jnp.int32)

    # --- ONE payload sort over all lanes, keys selected by mode.
    # Dense modes (0-2): valid -> lane, flag start -> NL + lane, dead ->
    # 2*NL + lane, so the first T payloads are the token stream and
    # [T, T+F) are the flag starts.  Sparse mode 3: merged -> lane,
    # flag -> NL + lane, rest -> 2*NL + lane, so [0, M) are the merge
    # records and [M, M+F) the flag starts.  Row-major lane order ==
    # corpus byte order in both (a start lane's byte is (l//128)*96 +
    # l%128, monotone in l because start columns are < 96).  Replaces
    # the previous three global key sorts + Tcap-sized gather — the
    # epilogue was ~2.3x slower that way (measured on-chip, C=4MB).
    NL = Rr * 128
    first_flat = jnp.where(
        mode == 3, merged_lane, valid_lane
    ).reshape(-1)
    flag_flat = flagstart.reshape(-1)
    liota = lax.iota(jnp.int32, NL)
    skeys = jnp.where(
        first_flat, liota, jnp.where(flag_flat, NL + liota, 2 * NL + liota)
    )
    skeys_s, toks_sorted = lax.sort((skeys, out.reshape(-1)), num_keys=1)

    tiota = lax.iota(jnp.int32, Tcap)
    tmask = tiota < T
    tok_i32 = jnp.where(tmask, toks_sorted[:Tcap], 0)

    # --- ONE mode-overlaid u8 output blob.  Returning device buffers
    # through the tunnel costs ~1.1 ms per MB of STATIC output size
    # (measured: identical compute, 7 big outputs = +25 ms/chunk over
    # tiny outputs), so the selected stream encoding is written into a
    # single shared buffer instead of five parallel ones:
    #   mode 0: little-endian u16/i32 tokens      [tok_w * T]
    #   mode 1: escape u8 stream ++ 2-byte records [T + 2*H]
    #   mode 2: bit-packed groups                  [pack_bits * ceil(T/8)]
    #   mode 3: (pos u24, span u8, id u16/u32) records  [R * M]
    # The host fetches one prefix of the exact advertised volume.
    R = 6 if u16_out else 8
    tok_w_static = 2 if u16_out else 4
    stream_max = (
        (Tcap // 8) * pack_bits if pack_bits else tok_w_static * Tcap
    )
    BLOB = max(stream_max, R * Mcap)

    def _sparse_blob(_):
        mlane = jnp.clip(skeys_s[:Mcap], 0, NL - 1)
        mpos = (mlane // 128) * WINDOW + (mlane % 128)
        mspan = fast_gather(span.reshape(-1), mlane)
        mid = toks_sorted[:Mcap]
        cols = [mpos & 0xFF, lax.shift_right_logical(mpos, 8) & 0xFF,
                lax.shift_right_logical(mpos, 16) & 0xFF, mspan & 0xFF,
                mid & 0xFF, lax.shift_right_logical(mid, 8) & 0xFF]
        if R == 8:
            cols += [lax.shift_right_logical(mid, 16) & 0xFF,
                     lax.shift_right_logical(mid, 24) & 0xFF]
        rec = jnp.stack(cols, axis=1).reshape(-1).astype(jnp.uint8)
        if BLOB > R * Mcap:
            rec = jnp.concatenate(
                [rec, jnp.zeros(BLOB - R * Mcap, jnp.uint8)]
            )
        return rec

    def _dense_blob(_):
        def _fit(x):
            if x.shape[0] < BLOB:
                return jnp.concatenate(
                    [x, jnp.zeros(BLOB - x.shape[0], jnp.uint8)]
                )
            return x[:BLOB]

        def _b_plain(_o):
            cols = [tok_i32 & 0xFF, lax.shift_right_logical(tok_i32, 8) & 0xFF]
            if not u16_out:
                cols += [lax.shift_right_logical(tok_i32, 16) & 0xFF,
                         lax.shift_right_logical(tok_i32, 24) & 0xFF]
            return _fit(
                jnp.stack(cols, axis=1).reshape(-1).astype(jnp.uint8)
            )

        def _b_esc(_o):
            esc = tmask & (tok_i32 >= 255)
            first_u8 = jnp.where(
                esc, 255, jnp.where(tmask, tok_i32, 0)
            ).astype(jnp.uint8)
            hkeys = jnp.where(esc, tiota, Tcap + tiota)
            _hk, hval_sorted = lax.sort((hkeys, tok_i32), num_keys=1)
            hval = hval_sorted[:Hcap]
            pairs_u8 = jnp.stack(
                [hval & 0xFF, lax.shift_right_logical(hval, 8) & 0xFF],
                axis=1,
            ).reshape(-1).astype(jnp.uint8)
            # records start right after the T stream bytes: dynamic-
            # update at offset T into an overflow-padded base, then
            # trim (T + 2*Hcap never exceeds Tcap + 2*Hcap)
            base = jnp.concatenate(
                [first_u8, jnp.zeros(2 * Hcap, jnp.uint8)]
            )
            base = lax.dynamic_update_slice(base, pairs_u8, (T,))
            return _fit(base)

        def _b_pack(_o):
            if pack_bits:
                B = pack_bits
                Gn = Tcap // 8
                tg = tok_i32[: Gn * 8].reshape(Gn, 8)
                cols = []
                for j in range(B):
                    k0 = (8 * j) // B
                    s0 = 8 * j - B * k0
                    v = lax.shift_right_logical(tg[:, k0], s0)
                    if B - s0 < 8 and k0 + 1 < 8:
                        v = v | (tg[:, k0 + 1] << (B - s0))
                    cols.append(v)
                return _fit(
                    jnp.stack(cols, axis=1).reshape(-1).astype(jnp.uint8)
                )
            return jnp.zeros(BLOB, jnp.uint8)  # mode 2 unreachable

        return lax.switch(
            jnp.clip(mode, 0, 2), [_b_plain, _b_esc, _b_pack], 0
        )

    blob = lax.cond(mode == 3, _sparse_blob, _dense_blob, 0)

    # --- per-segment cumulative token counts: vc at the last byte's lane
    p_end = jnp.maximum(doc_ends - 1, 0)
    ws_e = fast_gather(ws, p_end)
    row_e = ws_e // WINDOW
    lane_e = row_e * 128 + (p_end - row_e * WINDOW)
    doc_cum = jnp.where(
        doc_ends > 0, fast_gather(vc, lane_e), 0
    ).astype(jnp.int32)

    # --- flagged-word records from the sort's middle key class (it
    # starts at M in sparse mode, T otherwise); insert position = valid
    # tokens before the word (flag lanes are never valid, so the
    # inclusive vc at the lane is exactly that count)
    F = jnp.sum(flag_flat.astype(jnp.int32))
    fbase = jnp.where(mode == 3, M, T)
    fpos = jnp.minimum(fbase + lax.iota(jnp.int32, Fcap), NL - 1)
    flane = jnp.clip(fast_gather(skeys_s, fpos) - NL, 0, NL - 1)
    fstart = jnp.minimum(
        (flane // 128) * WINDOW + (flane % 128), Ce - 1
    )
    flen = fast_gather(wlen, fstart)
    fins = fast_gather(vc, flane)
    frecs = jnp.stack([fstart, flen, fins], axis=1).astype(jnp.int32)

    W = jnp.sum((start & valid).astype(jnp.int32))
    header = jnp.stack([W, T, F, mode, H, M]).astype(jnp.int32)
    meta_out = jnp.concatenate([header, doc_cum, frecs.reshape(-1)])
    return meta_out, blob


class RawChunkEncoder:
    """Host-side driver for `_raw_encode_chunk_jit`: owns the static
    configuration, builds per-chunk inputs, and decodes outputs.

    One instance per TpuTokenizer (created lazily by the engine when the
    raw path's preconditions hold: byte-encoder mode with a full byte
    seed LUT, a Pallas table, default parser, no prefix, single device).
    """

    def __init__(self, tokenizer, C: int = 1 << 20, Tcap: int = 0,
                 Fcap: int = 4096, Dcap: int = 4096):
        import jax.numpy as jnp

        self.C = C
        # tokens <= device-word bytes <= C, so Tcap = C never overflows;
        # a smaller cap saves epilogue-gather time but routes
        # low-merge-rate chunks (T > Tcap) to the slow host fallback
        self.Tcap = Tcap or C
        self.Fcap = Fcap
        self.Dcap = Dcap
        self.tok = tokenizer
        tab = tokenizer._pallas_tab
        self.tab = tab
        self._tk = jnp.asarray(tab.tk)
        self._tv = jnp.asarray(tab.tv)
        self._tv2 = jnp.asarray(tab.tv2)
        self._lut = jnp.asarray(tab.lut)
        if tab.partial:
            (pkey, pval, _z0, _z1, probe_len, cap_mask, _mode) = (
                tokenizer.table_arrays
            )
            self._fpkey, self._fpval = pkey, pval
            self._probe_len, self._cap_mask = probe_len, cap_mask
        else:
            z = jnp.zeros(1, jnp.int32)
            self._fpkey = self._fpval = z
            self._probe_len, self._cap_mask = 1, 0
        self.u16 = tokenizer._u16_out
        self.interpret = tokenizer._pallas_interpret
        # bit-packed stream width: B = bits to carry any vocab id (>= 9
        # so each packed byte spans <= 2 tokens; B == 16 is exactly the
        # u16 stream, so packing is disabled there)
        V = int(tokenizer.tables.vocab_size)
        B = max((max(V - 1, 1)).bit_length(), 9)
        self.pack_bits = B if (B <= 24 and B != 16) else 0
        self.Mcap = max(self.Tcap // 16, min(1 << 15, self.Tcap // 2))
        self.R = 6 if self.u16 else 8  # sparse record bytes
        stream_max = (
            (self.Tcap // 8) * self.pack_bits
            if self.pack_bits
            else (2 if self.u16 else 4) * self.Tcap
        )
        self.BLOB = max(stream_max, self.R * self.Mcap)
        # host-side byte -> seed-id LUT for the sparse stream (mode 3):
        # every chunk byte outside a merged span or flagged word is a
        # seed token the host rebuilds for free
        self._lut_host = np.asarray(tab.lut[0], dtype=np.int32)
        # speculative-fetch predictors (per corpus, converge in 1 chunk):
        # launch() starts the stream host copy at a predicted size so
        # finish() pays ONE transfer latency instead of two — the
        # tunnel's ~25-170 ms round trips dominate the pipeline
        self._pred_mode: "int | None" = None
        self._pred_tpb = 0.8  # device tokens per corpus byte
        self._pred_hr = 0.6   # escaped fraction of device tokens
        self._pred_mr = 0.1   # multi-byte tokens per corpus byte

    def launch(self, chunk_np: np.ndarray, seg_ends: np.ndarray):
        """Launch one chunk (chunk_np uint8, len <= C; seg_ends int32
        cumulative byte ends of the chunk's document segments).  Returns
        opaque device handles for `finish`."""
        import jax.numpy as jnp

        n = chunk_np.shape[0]
        n_docs = seg_ends.shape[0]
        if n_docs > self.Dcap:
            return None  # caller falls back (absurd segment count)
        pad = np.zeros(self.C, dtype=np.uint8)
        pad[:n] = chunk_np
        meta_in = np.full(2 + self.Dcap, n, dtype=np.int32)
        meta_in[0] = n
        meta_in[1] = n_docs
        meta_in[2 : 2 + n_docs] = seg_ends
        meta_out, blob = (
            _raw_encode_chunk_jit(
                jnp.asarray(pad), jnp.asarray(meta_in),
                self._tk, self._tv, self._tv2, self._lut,
                self._fpkey, self._fpval,
                C=self.C, Fcap=self.Fcap, Dcap=self.Dcap, Tcap=self.Tcap,
                depth=self.tab.depth, rank_in_val=self.tab.rank_in_val,
                multi_ok=self.tab.multi_ok, partial=self.tab.partial,
                probe_len=self._probe_len, cap_mask=self._cap_mask,
                u16_out=self.u16, pack_bits=self.pack_bits,
                interpret=self.interpret,
            )
        )
        spec = None
        spec_mode = self._pred_mode
        if spec_mode is not None:
            from .merge import slice_prefix

            # coarse rounding: each distinct slice length is its own
            # executable, and a mid-run compile on a loaded tunnel costs
            # seconds — coarse rounding keeps the shape set tiny and
            # stable across chunks and runs
            SGRAN = 1 << 17
            estT = int(n * self._pred_tpb * 1.15)
            if spec_mode == 3:
                MGRAN = 1 << 15  # records are sparse; finer rounding
                est = self.R * (int(n * self._pred_mr * 1.15) + MGRAN)
                gran = self.R * MGRAN
            elif spec_mode == 2:
                est = (estT // 8 + 1) * self.pack_bits
                gran = SGRAN
            elif spec_mode == 1:
                est = estT + 2 * int(estT * self._pred_hr * 1.3)
                gran = SGRAN
            else:
                est = (2 if self.u16 else 4) * estT
                gran = SGRAN
            ne = min(-(-(est + gran) // gran) * gran, self.BLOB)
            spec = slice_prefix(blob, ne)
        try:
            meta_out.copy_to_host_async()
            if spec is not None:
                spec.copy_to_host_async()
        except Exception:  # pragma: no cover - backends without async
            pass
        return (meta_out, blob, spec, spec_mode, n, n_docs, seg_ends)

    def finish(self, handles, chunk_np: np.ndarray):
        """Sync one launch; returns (tokens int32 [T], seg_counts int64
        [n_docs], stats) with flagged words spliced in, or None when the
        chunk exceeded a static capacity and must be re-encoded
        legacy-side.  ``stats`` carries the bench's honesty counters:
        device_bytes (bytes merged on-chip), words, flagged_words, and
        host bytes by cause ('over_bucket' = word > 32 B,
        'partial_flag' = divergence re-encode).

        ``chunk_np`` must be the same bytes passed to `launch` (flagged
        words re-encode from it on the exact host path)."""
        from .merge import slice_prefix

        (meta_out, blob, spec, spec_mode, n, n_docs, seg_ends) = handles
        bufs = (meta_out, blob, spec)
        meta = np.asarray(meta_out)
        W, T, F, mode, H, M = (int(x) for x in meta[:6])
        if T > self.Tcap or F > self.Fcap:
            self.tok._retire(bufs)
            return None
        GRAN = 1 << 16
        self._pred_mode = mode
        self._pred_tpb = max(T / max(n, 1), 0.05)
        self._pred_hr = H / max(T, 1)
        self._pred_mr = max(M / max(n, 1), 0.002)

        if mode == 3:
            need = self.R * M
        elif mode == 2:
            need = self.pack_bits * ((T + 7) // 8)
        elif mode == 1:
            need = T + 2 * H
        else:
            need = (2 if self.u16 else 4) * T
        if (spec is not None and spec_mode == mode
                and spec.shape[0] >= need):
            buf = np.asarray(spec)
        else:  # prediction miss: fetch the exact rounded prefix
            gran = self.R * (1 << 15) if mode == 3 else GRAN
            buf = np.asarray(
                slice_prefix(
                    blob, min(-(-max(need, 1) // gran) * gran, self.BLOB)
                )
            )

        if mode == 3:  # sparse merge records; singles from chunk bytes
            rec = (
                buf[:need].reshape(M, self.R).astype(np.int32)
                if M
                else np.zeros((0, self.R), np.int32)
            )
            mpos = rec[:, 0] | (rec[:, 1] << 8) | (rec[:, 2] << 16)
            mlen = rec[:, 3]
            mid = rec[:, 4] | (rec[:, 5] << 8)
            if self.R == 8:
                mid = mid | (rec[:, 6] << 16) | (rec[:, 7] << 24)
            # continuation bytes of merged spans and every byte of a
            # flagged word drop out of the stream; all other bytes are
            # their own seed token
            delta = np.zeros(n + 1, np.int32)
            delta[mpos + 1] += 1          # span starts are distinct...
            delta[mpos + mlen] -= 1       # ...and span ends are too
            frn = meta[6 + self.Dcap : 6 + self.Dcap + 3 * F]
            if F:
                fr3 = frn.reshape(F, 3)
                fs = np.minimum(fr3[:, 0], n)
                fe = np.minimum(fr3[:, 0] + fr3[:, 1], n)
                np.add.at(delta, fs, 1)   # flag spans can abut merged
                np.subtract.at(delta, fe, 1)
            drop = np.cumsum(delta[:n]) > 0
            ids = self._lut_host[chunk_np]
            if M:
                ids = ids.copy()
                ids[mpos] = mid
            toks = ids[~drop]
            if toks.shape[0] != T:  # pragma: no cover
                raise RuntimeError("sparse-stream length mismatch")
        elif mode == 2:  # bit-packed: groups of 8 tokens -> B bytes
            B = self.pack_bits
            G = (T + 7) // 8
            g = buf[: G * B].reshape(G, B).astype(np.uint32)
            cols = np.empty((G, 8), np.int32)
            for k in range(8):
                j, sft = (B * k) // 8, (B * k) % 8
                v = g[:, j] >> np.uint32(sft)
                got = 8 - sft
                while got < B:
                    j += 1
                    v = v | (g[:, j] << np.uint32(got))
                    got += 8
                cols[:, k] = (v & np.uint32((1 << B) - 1)).astype(
                    np.int32
                )
            toks = cols.reshape(-1)[:T].copy()
        elif mode == 1:  # escape-coded (marker 255 + 2-byte records)
            toks = buf[:T].astype(np.int32)
            escm = toks == 255
            if H:
                rec = buf[T : T + 2 * H]
                vals = rec[0::2].astype(np.int32) | (
                    rec[1::2].astype(np.int32) << 8
                )
                if vals.shape[0] != int(escm.sum()):  # pragma: no cover
                    raise RuntimeError("escape-stream record mismatch")
                toks[escm] = vals
        else:  # plain little-endian u16/i32
            toks = np.frombuffer(
                buf[:need].tobytes(),
                dtype="<u2" if self.u16 else "<i4",
            ).astype(np.int32)
        seg_cum = meta[6 : 6 + n_docs].astype(np.int64)
        self.tok._retire(bufs)
        stats = {
            "device_bytes": n,
            "words": W,
            "flagged_words": F,
            "over_bucket": 0,
            "partial_flag": 0,
        }
        if F == 0:
            return toks, np.diff(np.concatenate(([0], seg_cum))), stats
        fr = meta[6 + self.Dcap : 6 + self.Dcap + 3 * F].reshape(F, 3)
        # splice host-encoded flagged words at their stream positions
        order = np.argsort(fr[:, 2], kind="stable")
        fr = fr[order]
        parts: list[np.ndarray] = []
        seg_extra = np.zeros(n_docs, dtype=np.int64)
        cursor = 0
        for bstart, blen, tpos in fr:
            parts.append(toks[cursor:tpos])
            wb = chunk_np[bstart : bstart + blen].tobytes()
            enc = np.asarray(
                self.tok._encode_word_host(wb, None), dtype=np.int32
            )
            parts.append(enc)
            # route the extra tokens to the segment holding the word's
            # first byte (tpos can sit exactly on a segment boundary)
            seg = int(np.searchsorted(seg_ends, bstart, side="right"))
            seg_extra[seg] += enc.shape[0]
            cursor = tpos
            cause = "over_bucket" if blen > MAX_WORD else "partial_flag"
            stats[cause] += int(blen)
        parts.append(toks[cursor:])
        stats["device_bytes"] = n - stats["over_bucket"] - stats["partial_flag"]
        seg_counts = np.diff(np.concatenate(([0], seg_cum))) + seg_extra
        return np.concatenate(parts), seg_counts, stats
