"""Native C++ host engine: differential vs the Python oracle."""

import random

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext


@pytest.fixture(scope="module")
def native_engine():
    from hutoken_tpu.native import NativeEngine, load_native

    if load_native() is None:
        pytest.skip("native library not built")
    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    return NativeEngine(ctx), ctx


TEXTS = [
    "A gyors barna róka átugrik a lusta kutya fölött.",
    " The quick brown fox jumps over the lazy dog.",
    "Öt szűk ütközőpont: 0xFF, 3.14159.",
    "   multiple   spaces\tand\nnewlines\r\nare whitespace too.",
    "emoji 🙂 and 中文 chars",
    "\n\nTest\n",
    "",
    " ",
    "x",
]


def test_native_encode_matches_oracle(native_engine):
    ne, ctx = native_engine
    got = ne.encode_batch(TEXTS, num_threads=4)
    want = [oracle.encode(ctx, t) for t in TEXTS]
    assert got == want


def test_native_decode_matches_oracle(native_engine):
    ne, ctx = native_engine
    token_lists = [oracle.encode(ctx, t) for t in TEXTS if t]
    assert ne.decode_batch(token_lists, num_threads=2) == [t for t in TEXTS if t]


def test_native_decode_bounds(native_engine):
    ne, ctx = native_engine
    with pytest.raises(
        ValueError, match="Element must be non-negative and less than vocab size."
    ):
        ne.decode_batch([[999999]])


def test_native_fuzz(native_engine):
    ne, ctx = native_engine
    rng = random.Random(11)
    words = ft.CORPUS.split()
    batch = [
        (" " if rng.random() < 0.3 else "")
        + " ".join(rng.choice(words) for _ in range(rng.randrange(0, 15)))
        for _ in range(200)
    ]
    assert ne.encode_batch(batch, 8) == [oracle.encode(ctx, t) for t in batch]


def test_native_prefix_path():
    from hutoken_tpu.formats import Vocab
    from hutoken_tpu.native import NativeEngine, load_native

    if load_native() is None:
        pytest.skip("native library not built")
    toks = {b"_": 0, b"a": 1, b"b": 2, b"_a": 3, b"ab": 4, b"_ab": 5, b"_b": 6}
    vocab = Vocab(
        str2id=dict(toks), id2str={v: k for k, v in toks.items()}, size=len(toks)
    )
    ctx = TokenizerContext(vocab=vocab, prefix=b"_", special_chars={32: b"_"})
    ne = NativeEngine(ctx)
    texts = ["ab", " ab", "ab ab", "b", " b a"]
    assert ne.encode_batch(texts) == [oracle.encode(ctx, t) for t in texts]


def test_native_merges_path(native_engine):
    from hutoken_tpu.native import NativeEngine

    v, s = ft.write_byte_level_fixture()
    merges = ft.write_merges_fixture()
    ctx = TokenizerContext.load(
        v, s, is_byte_encoder=True, merges_file_path=merges
    )
    ne = NativeEngine(ctx)
    assert ne.encode_batch(TEXTS, 2) == [oracle.encode(ctx, t) for t in TEXTS]


def test_native_split_simd_fuzz():
    """The SIMD hybrid splitter (native split_starts_hybrid, used by
    split_intern/split_dedup) must match the Python golden splitter
    word-for-word on adversarial class mixes: Hungarian accents,
    multi-space runs, control chars, emoji/CJK (scalar-region
    fallback), invalid UTF-8, and 64-byte window straddles."""
    import numpy as np

    from hutoken_tpu.native import WordInterner, load_native
    from hutoken_tpu.pretokenize import split_words

    if load_native() is None:
        pytest.skip("native library not built")

    rng = random.Random(1337)
    atoms = (
        list("abcXYZ019 ")
        + ["  ", "   ", "\t", "\n", "\r", "\x01", "!", "?!", ".",
           "á", "é", "ű", "Ő", "Ü", "ñ", "ß",  # C3/C5-page 2-byte chars
           "€", "中", "🙂", "—",               # 3/4-byte: scalar fallback
           " á", " 1", " !", "a1", "1a", "é9", "ő!"]
    )
    docs = []
    for _ in range(300):
        n = rng.randrange(0, 200)
        docs.append("".join(rng.choice(atoms) for _ in range(n)))
    # exact 64/65/127/128-byte ASCII+accent strings (window straddles)
    for ln in (63, 64, 65, 127, 128, 129):
        docs.append(("é" * 40 + "a b" + " " * 30)[:ln])
        docs.append(("x" * (ln - 1)) + "é")

    # drive the native splitter via the interner and rebuild each doc's
    # word list from gid spans
    it = WordInterner()
    for doc in docs:
        enc = doc.encode("utf-8")
        blob = np.frombuffer(enc, dtype=np.uint8) if enc else np.zeros(1, np.uint8)
        offs = np.array([0, len(enc)], dtype=np.int64)
        wg, dwo, new_off, new_len, prev = it.split_intern(blob, offs)
        # spans of all gids seen so far (first occurrences accumulate)
        if not hasattr(it, "_spans"):
            it._spans = []
        for o, l in zip(new_off.tolist(), new_len.tolist()):
            it._spans.append(enc[o : o + l])
        got = [it._spans[g] for g in wg.tolist()]
        want = [w.encode("utf-8") for w in split_words(doc) if w]
        assert got == want, f"split mismatch on {doc!r}: {got} != {want}"


def test_pack_rows_matches_numpy():
    """Native ragged->dense row packer vs the numpy reference pack."""
    import numpy as np

    from hutoken_tpu.native import load_native, pack_rows

    if load_native() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 20, 500).astype(np.int64)
    blob = rng.integers(0, 256, int(lens.sum())).astype(np.uint8)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    sel = rng.permutation(500)[:321].astype(np.int64)
    width = 16
    got = pack_rows(blob, offs, lens, sel, width)
    want = np.zeros((len(sel), width), dtype=np.uint8)
    for i, w in enumerate(sel):
        n = min(int(lens[w]), width)
        want[i, :n] = blob[offs[w] : offs[w] + n]
    assert np.array_equal(got, want)
