"""Device engine vs scalar oracle: exact-id differential tests.

(The oracle itself is differentially tested against tiktoken/HF, so
transitively the engine is too.)
"""

import random

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext


@pytest.fixture(scope="module")
def byte_ctx():
    vocab_path, special_path = ft.write_byte_level_fixture()
    return TokenizerContext.load(vocab_path, special_path, is_byte_encoder=True)


@pytest.fixture(scope="module")
def engine(byte_ctx):
    from hutoken_tpu.engine import TpuTokenizer

    return TpuTokenizer(byte_ctx)


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


def test_engine_matches_oracle(engine, byte_ctx):
    got = engine.encode_batch(TEXTS)
    want = [oracle.encode(byte_ctx, t) for t in TEXTS]
    assert got == want


def test_engine_decode_matches_oracle(engine, byte_ctx):
    token_lists = [oracle.encode(byte_ctx, t) for t in TEXTS if t]
    got = engine.decode_batch(token_lists)
    want = [oracle.decode(byte_ctx, ids) for ids in token_lists]
    assert got == want
    assert got == [t for t in TEXTS if t]


def test_engine_corpus(engine, byte_ctx):
    got = engine.encode_batch([ft.CORPUS])
    assert got == [oracle.encode(byte_ctx, ft.CORPUS)]
    assert engine.decode_batch(got) == [ft.CORPUS]


def test_engine_fuzz(engine, byte_ctx):
    rng = random.Random(99)
    words = ft.CORPUS.split()
    batch = []
    for _ in range(200):
        n = rng.randrange(0, 10)
        text = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.3:
            text = " " + text
        batch.append(text)
    got = engine.encode_batch(batch)
    want = [oracle.encode(byte_ctx, t) for t in batch]
    for g, w, t in zip(got, want, batch):
        assert g == w, repr(t)


def test_engine_merges_path(byte_ctx):
    from hutoken_tpu.engine import TpuTokenizer

    vocab_path, special_path = ft.write_byte_level_fixture()
    merges_path = ft.write_merges_fixture()
    ctx = TokenizerContext.load(
        vocab_path, special_path, is_byte_encoder=True, merges_file_path=merges_path
    )
    eng = TpuTokenizer(ctx)
    got = eng.encode_batch(TEXTS)
    want = [oracle.encode(ctx, t) for t in TEXTS]
    assert got == want


def test_engine_prefix_path():
    """SentencePiece-style prefix handling through the engine."""
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu.formats import Vocab

    toks = {b"_": 0, b"a": 1, b"b": 2, b"_a": 3, b"ab": 4, b"_ab": 5, b"_b": 6}
    vocab = Vocab(
        str2id=dict(toks),
        id2str={v: k for k, v in toks.items()},
        size=len(toks),
    )
    ctx = TokenizerContext(vocab=vocab, prefix=b"_", special_chars={32: b"_"})
    eng = TpuTokenizer(ctx)
    texts = ["ab", " ab", "ab ab", "b", " b a"]
    got = eng.encode_batch(texts)
    want = [oracle.encode(ctx, t) for t in texts]
    assert got == want


def test_probe_table_lookup():
    import numpy as np

    from hutoken_tpu.tables import build_pair_table, lookup_pairs_np

    rng = random.Random(5)
    pairs = {}
    for _ in range(5000):
        a, b = rng.randrange(0, 50000), rng.randrange(0, 50000)
        pairs[(a, b)] = (rng.randrange(0, 1 << 20), rng.randrange(0, 1 << 20))
    table = build_pair_table(pairs)
    keys = list(pairs)
    a = np.array([k[0] for k in keys], dtype=np.int32)
    b = np.array([k[1] for k in keys], dtype=np.int32)
    rank, merged = lookup_pairs_np(table, a, b)
    for i, k in enumerate(keys):
        assert (rank[i], merged[i]) == pairs[k]
    # misses
    a2 = np.array([60001, 70002], dtype=np.int32)
    b2 = np.array([1, 2], dtype=np.int32)
    r2, m2 = lookup_pairs_np(table, a2, b2)
    assert (r2 == 0x7FFFFFFF).all() and (m2 == -1).all()
