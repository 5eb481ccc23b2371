"""Property-based cross-engine fuzzing: random trained vocabs + random
texts; the Python oracle, the C++ native engine, and the device engine
must agree token-for-token, and byte-level configs must round-trip."""

import random

import pytest

from hutoken_tpu import oracle
from hutoken_tpu.bytemaps import gpt2_bytes_to_unicode, gpt2_special_chars_table
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.formats import Vocab
from hutoken_tpu.train.bbpe import bbpe_train_core


def _random_byte_level_ctx(rng: random.Random) -> TokenizerContext:
    """Train a small vocab on random-ish text; spell it GPT-2 style."""
    words = []
    alphabet = "abcdefghijklmnopqrstuvwxyzáéíóúőűüö0123456789.,!?"
    for _ in range(rng.randrange(20, 60)):
        n = rng.randrange(1, 9)
        words.append("".join(rng.choice(alphabet) for _ in range(n)))
    corpus = " ".join(rng.choice(words) for _ in range(800))
    str2id = bbpe_train_core(
        corpus.encode("utf-8"), rng.randrange(280, 500), verbose=False
    )
    b2u = gpt2_bytes_to_unicode()
    spelled2id = {}
    for token, idx in str2id.items():
        raw = token if token else b"\x00"
        spelled = "".join(b2u[b] for b in raw).encode("utf-8")
        spelled2id[spelled] = idx
    vocab = Vocab(
        str2id=spelled2id,
        id2str={v: k for k, v in spelled2id.items()},
        size=max(spelled2id.values()) + 1,
    )
    sc = {k: v.encode("utf-8") for k, v in gpt2_special_chars_table().items()}
    return TokenizerContext(vocab=vocab, special_chars=sc, is_byte_encoder=True), words


def _random_texts(rng: random.Random, words: list[str], n: int) -> list[str]:
    texts = []
    for _ in range(n):
        k = rng.randrange(0, 14)
        t = " ".join(rng.choice(words) for _ in range(k))
        roll = rng.random()
        if roll < 0.2:
            t = " " + t
        elif roll < 0.3:
            t = t + "  "
        elif roll < 0.4:
            t = t.replace(" ", "\n", 1)
        texts.append(t)
    return texts


@pytest.mark.parametrize("seed", range(8))
def test_cross_engine_agreement(seed):
    rng = random.Random(1000 + seed)
    ctx, words = _random_byte_level_ctx(rng)
    texts = _random_texts(rng, words, 40)
    want = [oracle.encode(ctx, t) for t in texts]

    # roundtrip through the oracle
    for t, ids in zip(texts, want):
        assert oracle.decode(ctx, ids) == t

    # native C++ engine
    from hutoken_tpu.native import NativeEngine, load_native

    if load_native() is not None:
        ne = NativeEngine(ctx)
        assert ne.encode_batch(texts, 4) == want
        assert ne.decode_batch([w for w in want if w], 2) == [
            t for t, w in zip(texts, want) if w
        ]

    # device engine (runs on the forced-CPU JAX platform in tests)
    from hutoken_tpu.engine import TpuTokenizer

    eng = TpuTokenizer(ctx)
    assert eng.encode_batch(texts) == want
    assert eng.decode_batch([w for w in want if w]) == [
        t for t, w in zip(texts, want) if w
    ]
