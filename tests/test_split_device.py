"""Device pre-tokenizer tests (ops/split.py).

Tier 1: the byte-level start rule (numpy reference) against the scalar
parser oracle — the same golden-master pattern the reference uses for
its parser (/root/reference/tests/test_parser.c:77-108) and the native
SIMD splitter uses in test_native.py.

Tier 2: the full fused device program (interpret mode on the CPU mesh)
against the legacy engine, byte-for-byte.
"""

import random

import numpy as np
import pytest

from hutoken_tpu.ops.split import (
    find_cut,
    np_start_mask,
    supported_alphabet,
)
from hutoken_tpu.pretokenize import split_words_scalar

ALPHABETS = {
    "ascii": "abcXYZ 019.,!?-_ \t\n",
    "spacey": "a b  c   d\t \n  ",
    "accents": "áéíóúőűüöÁÉÍÓÚŐÜŰÖ abc ",
    "mixed": "ab12!? \t\náé£űhello   world..x9",
    "dense": "a1a1!a 1!a1 ",
}
# '£' is U+00A3 -> 0xC2 lead: NOT in the device alphabet; keep it out of
# the mask fuzz but in the splitter fuzz via supported_alphabet gating.
ALPHABETS_SUPPORTED = {k: v for k, v in ALPHABETS.items() if "£" not in v}


def starts_from_words(words: list[str]) -> np.ndarray:
    """Byte positions where the scalar splitter's words begin."""
    out = []
    pos = 0
    for w in words:
        out.append(pos)
        pos += len(w.encode("utf-8"))
    return np.asarray(out, dtype=np.int64)


@pytest.mark.parametrize("alphabet", sorted(ALPHABETS_SUPPORTED))
def test_start_mask_matches_scalar_parser(alphabet):
    rng = random.Random(hash(alphabet) & 0xFFFF)
    chars = ALPHABETS_SUPPORTED[alphabet]
    for trial in range(300):
        s = "".join(rng.choice(chars) for _ in range(rng.randrange(0, 60)))
        raw = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        if not supported_alphabet(raw):
            continue
        mask = np_start_mask(raw, np.zeros(1, dtype=np.int64))
        got = np.flatnonzero(mask)
        want = starts_from_words(split_words_scalar(s))
        assert got.tolist() == want.tolist(), (repr(s), got, want)


def test_start_mask_edge_cases():
    cases = [
        "", " ", "  ", "a", " a", "  a", "   a", "a b", "a  b",
        "\t", "\t\t", " \t ", "a\tb", "\na", "a\n b", "ab12cd",
        "!?!", " !?", "a!b", "1a2b", "őű ő ű", " ő", "  ő", "a ő",
        "aő1ő", "ő!ű", " \nx", "x \ny",
    ]
    for s in cases:
        raw = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        assert supported_alphabet(raw), repr(s)
        mask = np_start_mask(raw, np.zeros(1, dtype=np.int64))
        got = np.flatnonzero(mask).tolist()
        want = starts_from_words(split_words_scalar(s)).tolist()
        assert got == want, repr(s)


def test_start_mask_document_reset():
    """Words never span documents; each doc splits as if alone."""
    docs = ["abc", " x", "  y", "1", "!", "", "q1", " ", "  "]
    rng = random.Random(7)
    for _ in range(200):
        k = rng.randrange(1, 5)
        chosen = [rng.choice(docs) for _ in range(k)]
        blobs = [d.encode("utf-8") for d in chosen]
        chunk = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        lens = [len(b) for b in blobs]
        doc_starts = np.cumsum([0] + lens[:-1]).astype(np.int64)
        mask = np_start_mask(chunk, doc_starts)
        got = np.flatnonzero(mask).tolist()
        want = []
        off = 0
        for d, ln in zip(chosen, lens):
            want.extend(
                (starts_from_words(split_words_scalar(d)) + off).tolist()
            )
            off += ln
        assert got == want, (chosen, got, want)


def test_supported_alphabet():
    ok = ["abc", "őű", "áé!? 12", ""]
    bad = ["£", "…", "😀", "naïve£"]
    for s in ok:
        assert supported_alphabet(
            np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        ), repr(s)
    for s in bad:
        assert not supported_alphabet(
            np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        ), repr(s)
    # stray continuation / dangling lead bytes
    assert not supported_alphabet(np.array([0x80], dtype=np.uint8))
    assert not supported_alphabet(np.array([0xC3], dtype=np.uint8))
    assert not supported_alphabet(np.array([0x41, 0xC5], dtype=np.uint8))


def test_find_cut_is_a_true_word_start():
    rng = random.Random(99)
    chars = ALPHABETS["mixed"]
    for _ in range(200):
        s = "".join(rng.choice(chars) for _ in range(rng.randrange(4, 120)))
        raw = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        if not supported_alphabet(raw):
            continue
        p = find_cut(raw, 0, raw.shape[0])
        if p < 0:
            continue
        mask = np_start_mask(raw, np.zeros(1, dtype=np.int64))
        assert mask[p], (repr(s), p)
        # cutting at p yields identical starts on both sides
        left = np_start_mask(raw[:p], np.zeros(1, dtype=np.int64))
        right = np_start_mask(raw[p:], np.zeros(1, dtype=np.int64))
        rejoined = np.flatnonzero(left).tolist() + (
            np.flatnonzero(right) + p
        ).tolist()
        assert rejoined == np.flatnonzero(mask).tolist(), repr(s)


# ---------------------------------------------------------------- tier 2


import fixture_tools as ft  # noqa: E402
from hutoken_tpu import oracle  # noqa: E402
from hutoken_tpu.context import TokenizerContext  # noqa: E402

SMALL = dict(C=8192, Tcap=8192, Fcap=128, Dcap=64)


@pytest.fixture(scope="module")
def byte_tok():
    import os

    os.environ["HUTOKEN_TPU_PALLAS"] = "interpret"
    try:
        from hutoken_tpu.engine import TpuTokenizer

        v, s = ft.write_byte_level_fixture()
        ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
        tok = TpuTokenizer(ctx)
        assert tok._pallas_tab is not None
        yield tok
    finally:
        del os.environ["HUTOKEN_TPU_PALLAS"]


def _run_raw(tok, docs, **caps):
    from hutoken_tpu.ops.split import RawChunkEncoder

    enc = RawChunkEncoder(tok, **{**SMALL, **caps})
    blobs = [d.encode("utf-8") for d in docs]
    chunk = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    seg_ends = np.cumsum([len(b) for b in blobs]).astype(np.int32)
    h = enc.launch(chunk, seg_ends)
    assert h is not None
    res = enc.finish(h, chunk)
    assert res is not None
    toks, seg, stats = res
    assert stats["device_bytes"] + stats["over_bucket"] + stats[
        "partial_flag"
    ] == chunk.shape[0]
    return toks, seg


def _expect(ctx, docs):
    toks = [oracle.encode(ctx, d) for d in docs]
    flat = [t for doc in toks for t in doc]
    return flat, [len(t) for t in toks]


def test_raw_chunk_basic(byte_tok):
    docs = ["hello world", " leading space", "multi  space", "x"]
    flat, counts = _expect(byte_tok.ctx, docs)
    toks, seg = _run_raw(byte_tok, docs)
    assert toks.tolist() == flat
    assert seg.tolist() == counts


def test_raw_chunk_fuzz(byte_tok):
    rng = random.Random(31)
    chars = "abcdefghij XY12!?\t\nőű.,"
    for trial in range(30):
        docs = []
        for _ in range(rng.randrange(1, 8)):
            n = rng.randrange(0, 200)
            docs.append("".join(rng.choice(chars) for _ in range(n)))
        flat, counts = _expect(byte_tok.ctx, docs)
        toks, seg = _run_raw(byte_tok, docs)
        assert toks.tolist() == flat, (trial, docs)
        assert seg.tolist() == counts, (trial, docs)


def test_raw_chunk_long_words_flagged(byte_tok):
    """Words > 32 bytes fall to the exact host splice path."""
    docs = [
        "short " + "q" * 60 + " tail",
        "w" * 33,
        "a" * 100 + " b",
    ]
    flat, counts = _expect(byte_tok.ctx, docs)
    toks, seg = _run_raw(byte_tok, docs)
    assert toks.tolist() == flat
    assert seg.tolist() == counts


def test_raw_chunk_single_bytes_and_empty(byte_tok):
    docs = ["", "\t", "\t\t\t", " ", "a", "", "\n\n"]
    flat, counts = _expect(byte_tok.ctx, docs)
    toks, seg = _run_raw(byte_tok, docs)
    assert toks.tolist() == flat
    assert seg.tolist() == counts


def test_raw_chunk_tcap_overflow_detected(byte_tok):
    """More tokens than Tcap (degenerate all-single-byte chunk) ->
    finish() returns None (legacy fallback)."""
    from hutoken_tpu.ops.split import RawChunkEncoder

    enc = RawChunkEncoder(byte_tok, C=8192, Tcap=1024, Fcap=128, Dcap=64)
    doc = "a1" * 2000  # 4000 unmergeable 1-byte words
    chunk = np.frombuffer(doc.encode(), dtype=np.uint8)
    seg_ends = np.array([len(chunk)], dtype=np.int32)
    h = enc.launch(chunk, seg_ends)
    assert enc.finish(h, chunk) is None


def test_raw_chunk_partial_table(monkeypatch):
    """GPT-2-scale rules: partial pallas table + divergence splice.
    MAX_DEPTH is forced low so the partial branch genuinely runs."""
    monkeypatch.setenv("HUTOKEN_TPU_PALLAS", "interpret")
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu.ops import pallas_merge as PM

    monkeypatch.setattr(PM, "MAX_DEPTH", 16)
    v, s = ft.write_big_vocab_fixture()
    m = ft.write_big_merges_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True, merges_file_path=m)
    tok = TpuTokenizer(ctx)
    assert tok._pallas_tab is not None and tok._pallas_tab.partial
    rng = random.Random(13)
    chars = "abcdefghijklmnopqrstuvwxyz "
    docs = [
        "".join(rng.choice(chars) for _ in range(rng.randrange(0, 150)))
        for _ in range(6)
    ]
    flat, counts = _expect(ctx, docs)
    toks, seg = _run_raw(tok, docs)
    assert toks.tolist() == flat
    assert seg.tolist() == counts


# ------------------------------------------------------- engine raw path


def _fresh_engine(monkeypatch, raw: bool):
    monkeypatch.setenv("HUTOKEN_TPU_PALLAS", "interpret")
    if raw:
        monkeypatch.setenv("HUTOKEN_TPU_RAW", "1")
        monkeypatch.setenv("HUTOKEN_TPU_RAW_C", "8192")
    else:
        monkeypatch.setenv("HUTOKEN_TPU_RAW", "0")
    from hutoken_tpu.engine import TpuTokenizer

    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    return TpuTokenizer(ctx)


def test_engine_raw_path_multichunk(monkeypatch):
    """Raw path across several chunks == legacy engine == oracle,
    including docs that straddle chunk cuts."""
    tok = _fresh_engine(monkeypatch, raw=True)
    rng = random.Random(77)
    chars = "abcdefghij XY12!?\nőű.,"
    docs = []
    for _ in range(40):
        n = rng.randrange(0, 1500)
        docs.append("".join(rng.choice(chars) for _ in range(n)))
    docs.append("big " * 4000)            # one doc > several chunks
    docs.append("")                        # empty doc
    docs.append("x" * 40)                  # flagged long word
    got = tok.encode_batch(docs)
    assert tok.stat_device_bytes > 0       # the raw path really ran
    legacy = _fresh_engine(monkeypatch, raw=False)
    want = legacy.encode_batch(docs)
    assert got == want
    for d, g in zip(docs[:10], got[:10]):
        assert g == oracle.encode(tok.ctx, d)


def test_engine_raw_path_unsupported_alphabet(monkeypatch):
    """Chunks with out-of-alphabet bytes fall back to the exact host."""
    tok = _fresh_engine(monkeypatch, raw=True)
    docs = ["hello £ world…", "naïve 😀 text", "plain ascii"]
    got = tok.encode_batch(docs)
    for d, g in zip(docs, got):
        assert g == oracle.encode(tok.ctx, d)


def test_engine_raw_arrays_api(monkeypatch):
    tok = _fresh_engine(monkeypatch, raw=True)
    docs = ["alpha beta", "gamma  delta", ""]
    flat, offs = tok.encode_batch_arrays(docs)
    want = [oracle.encode(tok.ctx, d) for d in docs]
    for i, w in enumerate(want):
        assert flat[offs[i] : offs[i + 1]].tolist() == w


def test_raw_probe_separates_corpora(monkeypatch):
    tok = _fresh_engine(monkeypatch, raw=False)
    rng = random.Random(5)
    uniq = [
        " ".join(
            "".join(rng.choice("abcdefghijklmnop") for _ in range(8))
            for _ in range(200)
        )
        for _ in range(8)
    ]
    rep = [("the cat sat on the mat " * 200) for _ in range(8)]
    assert tok._raw_probe(uniq) > 0.6
    assert tok._raw_probe(rep) < 0.2


# --------------------------------------------------- segmented kernel


def test_segmented_kernel_parity(byte_tok):
    """Words at arbitrary lane spans (with dead gaps) merge exactly."""
    import jax.numpy as jnp

    from hutoken_tpu.ops.pallas_merge import (
        ROW_TILE,
        _pallas_merge_seg_call,
    )

    tab = byte_tok._pallas_tab
    rng = np.random.default_rng(123)
    R = ROW_TILE
    letters = np.frombuffer(
        b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8
    )
    raw = np.zeros((R, 128), dtype=np.uint8)
    aux = np.full((R, 128), 1 << 12, dtype=np.int32)  # all dead
    words = []  # (row, start_lane, bytes)
    for r in range(R):
        cur = 0
        while cur < 128:
            if rng.random() < 0.25:  # dead gap
                cur += int(rng.integers(1, 5))
                continue
            ln = int(rng.integers(1, 33))
            if cur + ln > 128:
                break
            wb = letters[rng.integers(0, len(letters), ln)]
            raw[r, cur : cur + ln] = wb
            for j in range(ln):
                aux[r, cur + j] = j | ((cur + ln - 1) << 5)
            words.append((r, cur, ln, wb.tobytes()))
            cur += ln
    # dead lanes: gend = own lane so nxt0 self-points
    lanes = np.arange(128, dtype=np.int32)[None, :]
    deadm = (aux & (1 << 12)) != 0
    aux = np.where(deadm, (1 << 12) | (lanes << 5), aux)
    out, _nxt = _pallas_merge_seg_call(
        jnp.asarray(tab.tk), jnp.asarray(tab.tv), jnp.asarray(tab.tv2),
        jnp.asarray(tab.lut), jnp.asarray(raw), jnp.asarray(aux),
        depth=tab.depth, rank_in_val=tab.rank_in_val,
        multi_ok=tab.multi_ok, interpret=True,
    )
    out = np.asarray(out)
    for r, cur, ln, wb in words:
        span = out[r, cur : cur + ln]
        got = span[span >= 0].tolist()
        exp = oracle.encode_word(byte_tok.ctx, wb, None)
        assert got == exp, (r, cur, wb, got, exp)
    # dead lanes stay holes
    assert (out[np.asarray(deadm)] == -1).all()


# ------------------------------------------------- stream mode selection


def test_raw_stream_mode_selection(byte_tok):
    """The device header picks the cheapest stream encoding by exact d2h
    volume (mode 0 plain, 1 escape-coded, 2 bit-packed, 3 sparse merge
    records) and every chosen path decodes byte-exactly.  Volumes are
    recomputed independently from the oracle ids + vocab spellings; the
    fixture vocab (768 ids) packs at 10 bits, so merge-heavy text must
    choose mode 2 while unmergeable single-byte streams (M = 0) must
    choose the zero-download sparse mode 3."""
    from hutoken_tpu.ops.split import RawChunkEncoder

    cases = [
        # merge-heavy: real corpus words -> mostly learned ids >= 255
        " ".join(ft.CORPUS.split()[:160]),
        # unmergeable: short words of control bytes never trained into
        # pairs, so every token is a single-byte seed (M = 0)
        "\x01 \x02 \x03 \x04 " * 75,
    ]
    id2str = byte_tok.ctx.vocab.id2str
    seen = set()
    for doc in cases:
        enc = RawChunkEncoder(byte_tok, **SMALL)
        assert enc.pack_bits == 10
        chunk = np.frombuffer(doc.encode("utf-8"), dtype=np.uint8)
        seg_ends = np.array([len(chunk)], dtype=np.int32)
        h = enc.launch(chunk, seg_ends)
        toks, seg, _stats = enc.finish(h, chunk)
        want = oracle.encode(byte_tok.ctx, doc)
        assert toks.tolist() == want
        assert seg.tolist() == [len(want)]
        T = len(want)
        H = sum(1 for t in want if t >= 255)
        # raw byte length of a byte-encoder token = remapped chars
        M = sum(1 for t in want if len(id2str[t].decode("utf-8")) > 1)
        vols = {0: 2 * T, 1: T + 2 * H, 2: 10 * ((T + 7) // 8), 3: 8 * M}
        got_mode = enc._pred_mode
        assert vols[got_mode] == min(vols.values()), (doc[:20], got_mode)
        seen.add(got_mode)
    assert seen == {2, 3}, seen


def test_raw_spec_prefetch_paths(byte_tok):
    """Speculative prefetch: chunk 2+ rides the predicted prefix when it
    covers the need and refetches exactly when it does not — both paths
    byte-exact (same encoder instance so the predictors persist)."""
    from hutoken_tpu.ops.split import RawChunkEncoder

    enc = RawChunkEncoder(byte_tok, **SMALL)
    docs = [
        " ".join(ft.CORPUS.split()[:120]),   # primes the predictors
        " ".join(ft.CORPUS.split()[120:240]),  # spec hit (similar rate)
        " ".join(ft.CORPUS.split()[:6]),     # tiny: spec covers easily
        "\x01\x02" * 400,                    # regime flip: mode miss
    ]
    for doc in docs:
        chunk = np.frombuffer(doc.encode("utf-8"), dtype=np.uint8)
        seg_ends = np.array([len(chunk)], dtype=np.int32)
        h = enc.launch(chunk, seg_ends)
        toks, seg, _stats = enc.finish(h, chunk)
        want = oracle.encode(byte_tok.ctx, doc)
        assert toks.tolist() == want, doc[:20]
        assert seg.tolist() == [len(want)]
