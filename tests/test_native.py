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
