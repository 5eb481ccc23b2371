"""Device table construction.

Everything the reference keeps in pointer-based structures becomes fixed
shape arrays the device can gather from:

* **Pair-rank hash table** — open-addressed, power-of-two capacity,
  linear probing with a build-time maximum probe length, stored as four
  parallel int32 arrays (left, right, rank, merged).  It unifies the
  reference's two BPE paths:

  - *string path* (no merges.txt): rank of a pair is the vocab id of the
    concatenated spelling (reference: src/core.c:700-722).  We enumerate
    every split of every vocab token whose halves are both vocab tokens;
    the resulting (left_id, right_id) -> (id(concat), id(concat)) table
    is exactly equivalent whenever every element is a vocab token, which
    holds for all words whose seed characters are in the vocab (the
    engine falls back to the host oracle otherwise).
  - *id path* (merges.txt): (left, right) -> (line rank, merged id)
    (reference: src/lib.c:604-652, src/core.c:724-736).

* **byte -> initial id** — composition of the special-chars replacement,
  the >=0x80 2-byte expansion, and the per-char vocab lookup
  (reference: src/pretokenizer.c:56-73 + src/core.c:460-474).

* **decode byte table** — ``token_bytes[V, max_len]`` + ``lens[V]``
  (reference: src/lib.c:422-448).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .bytemaps import utf8_char_length
from .context import TokenizerContext
from .pretokenize import encode_remap

INF_RANK = np.int32(0x7FFFFFFF)


def _mix_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit mix of an id pair (same shape in/out, uint32).

    Wraparound is intended; must match the device probe in ops/merge.py.
    """
    with np.errstate(over="ignore"):
        h = a.astype(np.uint32) * np.uint32(0x85EBCA6B)
        h ^= b.astype(np.uint32) * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0x27D4EB2F)
        h ^= h >> np.uint32(15)
    return h


@dataclass
class PairTable:
    """Open-addressed (left,right) -> (rank, merged) table."""

    left: np.ndarray  # int32 [C], -1 = empty
    right: np.ndarray  # int32 [C]
    rank: np.ndarray  # int32 [C]
    merged: np.ndarray  # int32 [C]
    probe_len: int  # max displacement + 1: bounded unconditional probing
    num_pairs: int
    onehot_ok: bool = False  # capacity and values fit the MXU one-hot probe

    @property
    def capacity(self) -> int:
        return int(self.left.shape[0])

    @property
    def packed_ok(self) -> bool:
        """Every id/rank fits 16 bits -> the 1-gather-per-step packed
        probe layout applies (ops/merge.py MODE_PACKED)."""
        if self.num_pairs == 0:
            return True
        real = self.left >= 0
        hi = 0
        for arr in (self.left, self.right, self.rank, self.merged):
            if real.any():
                hi = max(hi, int(arr[real].max()))
        return hi < 0xFFFF

    def packed_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(pkey, pval) int32 arrays: key = left<<16|right (-1 = empty),
        value = rank<<16|merged."""
        with np.errstate(over="ignore"):
            pkey = (
                (self.left.astype(np.uint32) << 16)
                | (self.right.astype(np.uint32) & 0xFFFF)
            ).astype(np.int32)
            pkey = np.where(self.left < 0, np.int32(-1), pkey)
            pval = (
                (np.minimum(self.rank, 0xFFFF).astype(np.uint32) << 16)
                | (self.merged.astype(np.uint32) & 0xFFFF)
            ).astype(np.int32)
        return pkey, pval


def build_pair_table(
    pairs: dict[tuple[int, int], tuple[int, int]], max_probe_len: int = 4
) -> PairTable:
    """Insert all pairs with linear probing.

    Capacity starts at load factor 0.5 and doubles until the maximum
    displacement fits ``max_probe_len`` — short unconditional probe
    chains keep the device graph small and the per-lookup cost flat.
    """
    n = max(len(pairs), 1)
    cap = 1
    while cap < 2 * n:
        cap *= 2
    while True:
        left = np.full(cap, -1, dtype=np.int32)
        right = np.full(cap, -1, dtype=np.int32)
        rank = np.full(cap, INF_RANK, dtype=np.int32)
        merged = np.full(cap, -1, dtype=np.int32)
        mask = cap - 1
        max_disp = 0
        ok = True
        for (a, b), (r, m) in pairs.items():
            h = int(_mix_hash(np.uint32(a), np.uint32(b))) & mask
            disp = 0
            while left[h] != -1:
                h = (h + 1) & mask
                disp += 1
                if disp > 64:
                    ok = False
                    break
            if not ok:
                break
            left[h] = a
            right[h] = b
            rank[h] = r
            merged[h] = m
            max_disp = max(max_disp, disp)
        if ok and max_disp + 1 > max_probe_len and cap < (1 << 24):
            ok = False  # too much clustering: grow for shorter probes
        if ok:
            max_val = 0
            for (a, b), (r, m) in pairs.items():
                max_val = max(max_val, a, b, r, m)
            onehot_ok = cap <= 16384 and max_val < (1 << 24)
            return PairTable(
                left=left,
                right=right,
                rank=rank,
                merged=merged,
                probe_len=max_disp + 1,
                num_pairs=len(pairs),
                onehot_ok=onehot_ok,
            )
        cap *= 2  # pathological clustering: grow and retry


def enumerate_string_pairs(str2id: dict[bytes, int]) -> dict[tuple[int, int], tuple[int, int]]:
    """All (left_id, right_id) with concat spelling in the vocab.

    Equivalent to the reference's on-the-fly concat+lookup rank
    (src/core.c:700-722) restricted to elements that are vocab tokens.
    """
    pairs: dict[tuple[int, int], tuple[int, int]] = {}
    for token, tid in str2id.items():
        if len(token) < 2:
            continue
        for k in range(1, len(token)):
            a = str2id.get(token[:k])
            if a is None:
                continue
            b = str2id.get(token[k:])
            if b is None:
                continue
            pairs[(a, b)] = (tid, tid)
    return pairs


def merges_pairs(ctx: TokenizerContext) -> dict[tuple[int, int], tuple[int, int]]:
    assert ctx.merges is not None
    return dict(ctx.merges.rules)


# polynomial-hash constants for the substring (R-matrix) tables; the
# device rolling hash must reproduce these exactly (uint32 wraparound)
P1 = np.uint32(1000003)
P2 = np.uint32(0x85EBCA77)


def _spelling_hashes(s: bytes) -> tuple[int, int]:
    """Double 32-bit polynomial hash of a byte string: h = h*P + b + 1."""
    h1 = np.uint32(0)
    h2 = np.uint32(0)
    with np.errstate(over="ignore"):
        for b in s:
            h1 = h1 * P1 + np.uint32(b + 1)
            h2 = h2 * P2 + np.uint32(b + 1)
    return int(h1), int(h2)


@dataclass
class SubstrTable:
    """Spelling-hash -> token-id table for the lookup-free (R-matrix)
    string-path kernel: a span of elements merges to the vocab id of its
    concatenated spelling (src/core.c:700-722), so EVERY rank the merge
    loop can need is the id of a substring of the word.  The device
    computes double rolling hashes of all spans once and resolves them
    with the same bounded open-addressed probe as the pair table (a
    sort-merge join was tried first and was exact, but the 5-operand
    ``lax.sort`` program takes minutes to compile on the remote
    compiler, which this environment pays on every fresh process).

    Slot layout: ``sh1/sh2`` hold the double hashes (empty = (0,0);
    build rejects any real token hashing to (0,0)), ``stid`` the token
    id (-1 in empty slots).  Slot index = ``_mix_hash(h1, h2) & mask``,
    linear probing bounded by ``probe_len``.
    """

    sh1: np.ndarray  # int32 [C], (0,0) key = empty
    sh2: np.ndarray  # int32 [C]
    stid: np.ndarray  # int32 [C], -1 = empty
    probe_len: int  # max displacement + 1
    d_cap: int  # max token spelled length (spans longer can't be tokens)
    # per-raw-byte element hash composition (byte-encoder path): element
    # e appends to a rolling hash as h' = h * pmul[e] + ehash[e]
    b_ehash1: Optional[np.ndarray]  # int32 [256]
    b_pmul1: Optional[np.ndarray]
    b_ehash2: Optional[np.ndarray]
    b_pmul2: Optional[np.ndarray]

    @property
    def capacity(self) -> int:
        return int(self.sh1.shape[0])


def build_substr_table(
    ctx: TokenizerContext, max_probe_len: int = 4
) -> Optional[SubstrTable]:
    """Build the substring table (string path only; merges-path ranks are
    not substring ids).  Returns None if the double hash collides on the
    vocab (astronomically unlikely) or the config lacks a byte encoder."""
    if ctx.merges is not None or not ctx.is_byte_encoder:
        return None
    str2id = ctx.vocab.str2id
    seen: dict[tuple[int, int], int] = {}
    d_cap = 1
    for token, tid in str2id.items():
        k = _spelling_hashes(token)
        if k == (0, 0) or k in seen:
            return None  # collision: fall back to the probe kernel
        seen[k] = tid
        d_cap = max(d_cap, len(token))

    # open-addressed insert, grown until the probe chain is short
    # (same policy as build_pair_table)
    n = max(len(seen), 1)
    cap = 1
    while cap < 2 * n:
        cap *= 2
    while True:
        sh1 = np.zeros(cap, dtype=np.uint32)
        sh2 = np.zeros(cap, dtype=np.uint32)
        stid = np.full(cap, -1, dtype=np.int32)
        mask = cap - 1
        max_disp = 0
        ok = True
        for (h1, h2), tid in seen.items():
            s = int(_mix_hash(np.uint32(h1), np.uint32(h2))) & mask
            disp = 0
            while stid[s] != -1:
                s = (s + 1) & mask
                disp += 1
                if disp > 64:
                    ok = False
                    break
            if not ok:
                break
            sh1[s] = h1
            sh2[s] = h2
            stid[s] = tid
            max_disp = max(max_disp, disp)
        if ok and max_disp + 1 > max_probe_len and cap < (1 << 24):
            ok = False  # too much clustering: grow for shorter probes
        if ok:
            break
        cap *= 2
    b_eh1 = np.zeros(256, dtype=np.int64)
    b_pm1 = np.zeros(256, dtype=np.int64)
    b_eh2 = np.zeros(256, dtype=np.int64)
    b_pm2 = np.zeros(256, dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(256):
            spelled = encode_remap(bytes([b]), ctx.special_chars, None, True)
            e1, e2 = _spelling_hashes(spelled)
            b_eh1[b] = e1
            b_eh2[b] = e2
            p1 = np.uint32(1)
            p2 = np.uint32(1)
            for _ in spelled:
                p1 *= P1
                p2 *= P2
            b_pm1[b] = int(p1)
            b_pm2[b] = int(p2)

    return SubstrTable(
        sh1=sh1.view(np.int32),
        sh2=sh2.view(np.int32),
        stid=stid,
        probe_len=max_disp + 1,
        d_cap=d_cap,
        b_ehash1=np.array(b_eh1 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
        b_pmul1=np.array(b_pm1 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
        b_ehash2=np.array(b_eh2 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
        b_pmul2=np.array(b_pm2 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
    )


@dataclass
class SubstrMergesTable:
    """Substring-table form of the merges/id path (src/core.c:211-337 fed
    by src/lib.c:573-663) for GPT-2-scale rule sets, where the one-hot
    MXU probe's [N, C] contraction stops paying (capacity gate
    ops/merge.py:ONEHOT_MAX_CAPACITY).

    Requires two structural properties that every really-trained BPE
    vocab+merges pair has (verified at build; fall back to the probe
    kernel otherwise):

    1. *rank/id alignment*: merged ids strictly increase with rule rank,
       so comparing merged ids IS comparing ranks (same argmin, same
       leftmost tie-break as the reference's (rank, index) order);
    2. *unique producer*: each merged token is produced by exactly one
       rule, so a pair (A, B) has a rule iff the concatenated spelling
       is a vocab token M whose producing split is exactly |A| elements.

    The kernel then needs only two per-span tables: the token id of each
    span's spelling (same as the string-path R-matrix) and ``scut`` —
    the producing rule's left-side length in seed elements (0 = no rule
    produces this token).  A boundary (span1, span2) has a rule iff
    tok(span1 ∪ span2) exists and cut == len(span1)."""

    sh1: np.ndarray
    sh2: np.ndarray
    stid: np.ndarray
    scut: np.ndarray  # int32 [C]: producing-rule left length in elements
    probe_len: int
    d_cap: int
    b_ehash1: np.ndarray
    b_pmul1: np.ndarray
    b_ehash2: np.ndarray
    b_pmul2: np.ndarray

    @property
    def capacity(self) -> int:
        return int(self.sh1.shape[0])


def _char_count(spelling: bytes) -> int:
    n = 0
    i = 0
    while i < len(spelling):
        i += utf8_char_length(spelling[i])
        n += 1
    return n


def build_substr_table_merges(
    ctx: TokenizerContext, max_probe_len: int = 4
) -> Optional[SubstrMergesTable]:
    """Build the merges-path substring table; None when the rule set
    lacks the structure (see SubstrMergesTable) or there is no byte
    encoder (the per-byte hash composition needs 1 byte = 1 element)."""
    if ctx.merges is None or not ctx.is_byte_encoder:
        return None
    str2id = ctx.vocab.str2id
    id2str = ctx.vocab.id2str
    if len(set(id2str.values())) != len(id2str):
        # duplicate spellings: resolution-by-spelling could pick a
        # different id than the rule names — probe kernel handles it
        return None

    # verify rank/id alignment + unique producer; collect cut lengths
    rules = sorted(ctx.merges.rules.items(), key=lambda kv: kv[1][0])
    cut_of_id: dict[int, int] = {}
    prev_merged = -1
    for (a, b), (rank, merged) in rules:
        if merged <= prev_merged:
            return None  # ids not rank-ordered: probe kernel handles it
        prev_merged = merged
        if merged in cut_of_id:
            return None  # two rules produce the same token
        left_sp = id2str.get(a)
        right_sp = id2str.get(b)
        merged_sp = id2str.get(merged)
        if left_sp is None or right_sp is None or merged_sp is None:
            return None
        if left_sp + right_sp != merged_sp:
            return None  # rule output is not the concatenation
        cut_of_id[merged] = _char_count(left_sp)

    seen: dict[tuple[int, int], int] = {}
    d_cap = 1
    for token, tid in str2id.items():
        k = _spelling_hashes(token)
        if k == (0, 0) or k in seen:
            return None  # double-hash collision: fall back
        seen[k] = tid
        if tid in cut_of_id:
            d_cap = max(d_cap, _char_count(token))

    n = max(len(seen), 1)
    cap = 1
    while cap < 2 * n:
        cap *= 2
    while True:
        sh1 = np.zeros(cap, dtype=np.uint32)
        sh2 = np.zeros(cap, dtype=np.uint32)
        stid = np.full(cap, -1, dtype=np.int32)
        scut = np.zeros(cap, dtype=np.int32)
        mask = cap - 1
        max_disp = 0
        ok = True
        for (h1, h2), tid in seen.items():
            s = int(_mix_hash(np.uint32(h1), np.uint32(h2))) & mask
            disp = 0
            while stid[s] != -1:
                s = (s + 1) & mask
                disp += 1
                if disp > 64:
                    ok = False
                    break
            if not ok:
                break
            sh1[s] = h1
            sh2[s] = h2
            stid[s] = tid
            scut[s] = cut_of_id.get(tid, 0)
            max_disp = max(max_disp, disp)
        if ok and max_disp + 1 > max_probe_len and cap < (1 << 24):
            ok = False
        if ok:
            break
        cap *= 2

    b_eh1 = np.zeros(256, dtype=np.int64)
    b_pm1 = np.zeros(256, dtype=np.int64)
    b_eh2 = np.zeros(256, dtype=np.int64)
    b_pm2 = np.zeros(256, dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(256):
            spelled = encode_remap(bytes([b]), ctx.special_chars, None, True)
            e1, e2 = _spelling_hashes(spelled)
            b_eh1[b] = e1
            b_eh2[b] = e2
            p1 = np.uint32(1)
            p2 = np.uint32(1)
            for _ in spelled:
                p1 *= P1
                p2 *= P2
            b_pm1[b] = int(p1)
            b_pm2[b] = int(p2)

    return SubstrMergesTable(
        sh1=sh1.view(np.int32),
        sh2=sh2.view(np.int32),
        stid=stid,
        scut=scut,
        probe_len=max_disp + 1,
        d_cap=d_cap,
        b_ehash1=np.array(b_eh1 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
        b_pmul1=np.array(b_pm1 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
        b_ehash2=np.array(b_eh2 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
        b_pmul2=np.array(b_pm2 & 0xFFFFFFFF, dtype=np.uint32).view(np.int32),
    )


@dataclass
class EncoderTables:
    pair_table: PairTable
    # byte mode: byte value -> list of seed element ids (usually length 1;
    # a replacement spelling may seed several elements)
    byte_seed_ids: Optional[np.ndarray]  # int32 [256] when all single-element
    byte_seed_fallback: Optional[dict[int, list[int]]]
    vocab_size: int
    is_byte_encoder: bool
    uses_merges: bool
    # decode side
    token_bytes: np.ndarray  # uint8 [V, max_len]
    token_lens: np.ndarray  # int32 [V]
    # raw (left,right)->(rank,merged) dict, kept so callers can rebuild
    # the table at a different load factor (e.g. probe_len=2 for the
    # packed big-table probe)
    pairs: dict

    def seed_ids_for_byte(self, b: int) -> list[int]:
        if self.byte_seed_ids is not None:
            v = int(self.byte_seed_ids[b])
            return [v]
        return self.byte_seed_fallback[b]


def _seed_elements_of_spelling(spelling: bytes) -> list[bytes]:
    """Split a remapped spelling into seed elements (per UTF-8 char, with
    <0xNN> literals whole — src/core.c:49-55,483-487)."""
    from .bytemaps import hex_token_length

    out = []
    i = 0
    while i < len(spelling):
        ln = hex_token_length(spelling, i)
        if ln <= 0:
            ln = utf8_char_length(spelling[i])
        out.append(spelling[i : i + ln])
        i += ln
    return out


def build_encoder_tables(ctx: TokenizerContext) -> EncoderTables:
    str2id = ctx.vocab.str2id
    if ctx.merges is not None:
        pairs = merges_pairs(ctx)
        uses_merges = True
    else:
        pairs = enumerate_string_pairs(str2id)
        uses_merges = False
    table = build_pair_table(pairs)

    byte_seed_ids: Optional[np.ndarray] = None
    byte_seed_fallback: Optional[dict[int, list[int]]] = None
    if ctx.is_byte_encoder:
        per_byte: dict[int, Optional[list[int]]] = {}
        all_single = True
        for b in range(256):
            spelled = encode_remap(bytes([b]), ctx.special_chars, None, True)
            if uses_merges:
                # id path seeds per UTF-8 char (src/core.c:460-474)
                elems = []
                i = 0
                while i < len(spelled):
                    ln = utf8_char_length(spelled[i])
                    elems.append(spelled[i : i + ln])
                    i += ln
            else:
                elems = _seed_elements_of_spelling(spelled)
            ids = [str2id.get(e) for e in elems]
            if any(i is None for i in ids):
                per_byte[b] = None  # word containing b goes to host fallback
                all_single = False
            else:
                per_byte[b] = [int(i) for i in ids]
                if len(ids) != 1:
                    all_single = False
        if all_single:
            byte_seed_ids = np.array(
                [per_byte[b][0] for b in range(256)], dtype=np.int32
            )
        byte_seed_fallback = {
            b: (v if v is not None else []) for b, v in per_byte.items()
        }

    # decode tables
    vocab_size = ctx.vocab.size
    max_len = max((len(s) for s in ctx.vocab.id2str.values()), default=1)
    max_len = max(max_len, 1)
    token_bytes = np.zeros((max(vocab_size, 1), max_len), dtype=np.uint8)
    token_lens = np.zeros(max(vocab_size, 1), dtype=np.int32)
    for tid, s in ctx.vocab.id2str.items():
        if 0 <= tid < vocab_size:
            token_bytes[tid, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            token_lens[tid] = len(s)

    return EncoderTables(
        pair_table=table,
        byte_seed_ids=byte_seed_ids,
        byte_seed_fallback=byte_seed_fallback,
        vocab_size=vocab_size,
        is_byte_encoder=ctx.is_byte_encoder,
        uses_merges=uses_merges,
        token_bytes=token_bytes,
        token_lens=token_lens,
        pairs=pairs,
    )


def lookup_pairs_np(
    table: PairTable, a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Host (numpy) reference of the device probe — used in tests."""
    mask = np.uint32(table.capacity - 1)
    h = (_mix_hash(a, b) & mask).astype(np.int64)
    rank = np.full(a.shape, INF_RANK, dtype=np.int32)
    merged = np.full(a.shape, -1, dtype=np.int32)
    found = np.zeros(a.shape, dtype=bool)
    for i in range(table.probe_len):
        slot = (h + i) & mask
        hit = (~found) & (table.left[slot] == a) & (table.right[slot] == b)
        rank = np.where(hit, table.rank[slot], rank)
        merged = np.where(hit, table.merged[slot], merged)
        found |= hit
    valid = (a >= 0) & (b >= 0)
    rank = np.where(valid, rank, INF_RANK)
    merged = np.where(valid, merged, -1)
    return rank, merged
