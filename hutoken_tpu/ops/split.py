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
      6. stream compaction to ONE dense token array in corpus order +
         per-document cumulative token counts
    --d2h--> header(4 ints) + uint16 token stream (+ tiny flag records)

The host keeps only: UTF-8 corpus prep, safe chunk-cut selection, the
supported-alphabet precheck, and splicing of flagged words -- all O(1)
passes with numpy, no per-word Python.

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


@functools.partial(
    __import__("jax").jit,
    static_argnames=(
        "C", "Wcap", "Fcap", "Dcap", "depth", "rank_in_val", "multi_ok",
        "partial", "probe_len", "cap_mask", "u16_out", "interpret",
    ),
)
def _raw_encode_chunk_jit(
    chunk, n_valid, doc_ends, n_docs,
    tk, tv, tv2, lut, full_pkey, full_pval,
    *, C, Wcap, Fcap, Dcap, depth, rank_in_val, multi_ok, partial,
    probe_len, cap_mask, u16_out, interpret,
):
    """The fused raw-chunk encode program (module docstring pipeline).

    Returns (header int32[4] = [W, T, F, 0], tokens [C] u16/int32,
    doc_cum int32 [Dcap], frecs int32 [Fcap, 3]).

    * ``W`` real word count — W > Wcap means the chunk was too word-dense
      for the static block and the host must re-encode it legacy-side,
    * ``T`` total device tokens (prefix of ``tokens``),
    * ``F`` flagged words; ``frecs[i] = (byte_start, byte_len,
      token_insert_pos)`` — F > Fcap likewise invalidates the chunk,
    * ``doc_cum[d]`` = device tokens in segments 0..d (flagged words
      excluded; the host adds them back while splicing).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from .merge import INF_RANK, MODE_PACKED, _probe_pairs_packed, fast_gather
    from .pallas_merge import _pallas_merge_call

    iota = lax.iota(jnp.int32, C)
    valid = iota < n_valid
    b = chunk.astype(jnp.int32)

    # --- context resets at segment starts (docs and chunk head)
    seg_starts = jnp.where(
        lax.iota(jnp.int32, Dcap) == 0,
        0,
        jnp.concatenate([jnp.zeros(1, jnp.int32), doc_ends[:-1]]),
    )
    kill1 = jnp.zeros(C, jnp.bool_).at[seg_starts].set(True, mode="drop")
    kill2 = jnp.zeros(C, jnp.bool_).at[seg_starts + 1].set(True, mode="drop")

    start = _start_mask_any(b, kill1, kill2, valid)

    # --- word index per byte; word starts by sort-compaction
    wid = jnp.cumsum(start.astype(jnp.int32)) - 1  # [C], -1 before word 0
    W = wid[C - 1] + 1
    skeys = jnp.where(start, iota, n_valid)
    skeys = lax.sort(skeys)
    starts_ext = lax.slice(skeys, (0,), (Wcap + 1,))  # Wcap < C, checked
    starts_w = starts_ext[:Wcap]
    lens_full = starts_ext[1:] - starts_w  # [Wcap]; 0 for padding words
    flag_len = lens_full > MAX_WORD
    dev_len = jnp.where(flag_len, 0, lens_full)

    # --- length-sort words (short/empty first: empty tiles cluster and
    # the kernel's per-tile fixed point exits in local-max-length rounds)
    wiota = lax.iota(jnp.int32, Wcap)
    lens_sorted, sorted_wid = lax.sort((dev_len, wiota), num_keys=1)
    # inverse permutation: sort (sorted_wid, j) by the permutation values
    _, inv = lax.sort((sorted_wid, wiota), num_keys=1)

    # --- pack rows: one 32-byte dynamic slice per sorted word
    chunk_pad = jnp.concatenate(
        [chunk, jnp.zeros((MAX_WORD,), chunk.dtype)]
    )
    starts_sorted = fast_gather(starts_w, sorted_wid)
    block = jax.vmap(
        lambda s: lax.dynamic_slice(chunk_pad, (s,), (MAX_WORD,))
    )(starts_sorted)  # [Wcap, 32] u8

    # --- the on-chip greedy merge (ops/pallas_merge.py)
    wpr = 128 // MAX_WORD
    R = Wcap // wpr
    raw128 = block.reshape(R, 128)
    len128 = jnp.repeat(
        lens_sorted.reshape(R, wpr), MAX_WORD, axis=1
    )
    out, cnt = _pallas_merge_call(
        tk, tv, tv2, lut, raw128, len128,
        depth=depth, group_w=MAX_WORD, rank_in_val=rank_in_val,
        multi_ok=multi_ok, interpret=interpret,
    )
    out_w = out.reshape(Wcap, MAX_WORD)
    cnt_sorted = cnt.reshape(Wcap, MAX_WORD)[:, 0]

    # --- partial-table divergence check (build_pallas_table contract):
    # any full-table rule adjacent in the final state => host re-encode
    if partial:
        zero = jnp.zeros(1, jnp.int32)
        full_table = (
            full_pkey, full_pval, zero, zero, probe_len, cap_mask,
            MODE_PACKED,
        )
        rank, _m = _probe_pairs_packed(
            full_table, out_w[:, :-1], out_w[:, 1:]
        )
        pflag_sorted = jnp.any(rank < INF_RANK, axis=1)
    else:
        pflag_sorted = jnp.zeros((Wcap,), jnp.bool_)

    cnt_word = fast_gather(cnt_sorted, inv)
    flag = flag_len | fast_gather(pflag_sorted.astype(jnp.int32), inv).astype(
        jnp.bool_
    )
    counts = jnp.where(flag, 0, cnt_word)  # [Wcap] word order

    # --- stream compaction (corpus order): dense tokens + insert map
    cumc = jnp.cumsum(counts)
    wordbase = cumc - counts  # exclusive prefix
    T = cumc[Wcap - 1]
    marks = jnp.zeros((C,), jnp.int32).at[
        jnp.where(counts > 0, wordbase, C)
    ].max(wiota, mode="drop")
    word_of_j = lax.cummax(marks)
    # src = sorted_row(w)*32 - wordbase(w) + j, combined per word
    combo = fast_gather(inv, word_of_j) * MAX_WORD - fast_gather(
        wordbase, word_of_j
    )
    src = combo + iota
    toks = fast_gather(out_w.reshape(-1), src)
    out_dtype = jnp.uint16 if u16_out else jnp.int32
    tokens = jnp.where(iota < T, toks, 0).astype(out_dtype)

    # --- per-segment cumulative token counts
    wend = fast_gather(wid, jnp.maximum(doc_ends - 1, 0))
    doc_cum = jnp.where(
        doc_ends > 0,
        fast_gather(wordbase, wend) + fast_gather(counts, wend),
        0,
    ).astype(jnp.int32)

    # --- flagged-word records, compacted
    F = jnp.sum(flag.astype(jnp.int32))
    fkeys = jnp.where(flag, wiota, Wcap)
    fkeys = lax.sort(fkeys)
    fidx = jnp.minimum(fkeys[:Fcap], Wcap - 1)
    frecs = jnp.stack(
        [
            fast_gather(starts_w, fidx),
            fast_gather(lens_full, fidx),
            fast_gather(wordbase, fidx),
        ],
        axis=1,
    ).astype(jnp.int32)

    header = jnp.stack([W, T, F, jnp.int32(0)]).astype(jnp.int32)
    return header, tokens, doc_cum, frecs


class RawChunkEncoder:
    """Host-side driver for `_raw_encode_chunk_jit`: owns the static
    configuration, builds per-chunk inputs, and decodes outputs.

    One instance per TpuTokenizer (created lazily by the engine when the
    raw path's preconditions hold: byte-encoder mode with a full byte
    seed LUT, a Pallas table, default parser, no prefix, single device).
    """

    def __init__(self, tokenizer, C: int = 1 << 20, Wcap: int = 1 << 19,
                 Fcap: int = 4096, Dcap: int = 1 << 15):
        import jax.numpy as jnp

        assert Wcap % 1024 == 0  # 4 words/row * ROW_TILE rows/tile
        assert Wcap + 1 <= C  # starts_ext slices Wcap+1 sorted keys
        self.C = C
        self.Wcap = Wcap
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
        ends = np.full(self.Dcap, n, dtype=np.int32)
        ends[:n_docs] = seg_ends
        header, tokens, doc_cum, frecs = _raw_encode_chunk_jit(
            jnp.asarray(pad), jnp.int32(n), jnp.asarray(ends),
            jnp.int32(n_docs),
            self._tk, self._tv, self._tv2, self._lut,
            self._fpkey, self._fpval,
            C=self.C, Wcap=self.Wcap, Fcap=self.Fcap, Dcap=self.Dcap,
            depth=self.tab.depth, rank_in_val=self.tab.rank_in_val,
            multi_ok=self.tab.multi_ok, partial=self.tab.partial,
            probe_len=self._probe_len, cap_mask=self._cap_mask,
            u16_out=self.u16, interpret=self.interpret,
        )
        try:
            header.copy_to_host_async()
        except Exception:  # pragma: no cover - backends without async
            pass
        return (header, tokens, doc_cum, frecs, n, n_docs, seg_ends)

    def finish(self, handles, chunk_np: np.ndarray):
        """Sync one launch; returns (tokens int32 [T], seg_counts int64
        [n_docs]) with flagged words spliced in, or None when the chunk
        exceeded a static capacity and must be re-encoded legacy-side.

        ``chunk_np`` must be the same bytes passed to `launch` (flagged
        words re-encode from it on the exact host path)."""
        from .merge import slice_prefix

        header, tokens, doc_cum, frecs, n, n_docs, seg_ends = handles
        W, T, F, _ = (int(x) for x in np.asarray(header))
        if W > self.Wcap or F > self.Fcap:
            return None
        GRAN = 1 << 16
        need = min(-(-max(T, 1) // GRAN) * GRAN, self.C)
        toks = np.asarray(slice_prefix(tokens, need))[:T].astype(np.int32)
        seg_cum = np.asarray(doc_cum)[:n_docs].astype(np.int64)
        self.tok._retire((header, tokens, doc_cum))
        if F == 0:
            self.tok._retire(frecs)
            return toks, np.diff(np.concatenate(([0], seg_cum)))
        fr = np.asarray(frecs)[:F]
        self.tok._retire(frecs)
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
        parts.append(toks[cursor:])
        seg_counts = np.diff(np.concatenate(([0], seg_cum))) + seg_extra
        return np.concatenate(parts), seg_counts
