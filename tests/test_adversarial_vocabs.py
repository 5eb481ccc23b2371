"""Adversarial vocab fixtures: hostile shapes the trained fixtures miss.

Covers the vocab-edge handling of the reference loader/engine
(src/lib.c:243-388, src/core.c:35-55 hex literals, very long tokens,
special-token spellings) across all three engines: the Python oracle,
the C++ native engine, and the device engine must agree exactly.
"""

import random

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.bytemaps import gpt2_bytes_to_unicode, gpt2_special_chars_table
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.formats import Vocab


def _byte_level_ctx(extra_tokens: dict[bytes, int]) -> TokenizerContext:
    """GPT-2-spelled byte seeds + extra raw-byte tokens at given ids."""
    b2u = gpt2_bytes_to_unicode()

    def spell(raw: bytes) -> bytes:
        return "".join(b2u[b] for b in raw).encode("utf-8")

    str2id: dict[bytes, int] = {}
    for b in range(256):
        str2id[spell(bytes([b]))] = b
    for raw, tid in extra_tokens.items():
        str2id[spell(raw)] = tid
    vocab = Vocab(
        str2id=str2id,
        id2str={v: k for k, v in str2id.items()},
        size=max(str2id.values()) + 1,
    )
    sc = {k: v.encode("utf-8") for k, v in gpt2_special_chars_table().items()}
    return TokenizerContext(vocab=vocab, special_chars=sc, is_byte_encoder=True)


def _assert_all_engines_agree(ctx, texts, roundtrip=True):
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu.native import NativeEngine, load_native

    want = [oracle.encode(ctx, t) for t in texts]
    engine = TpuTokenizer(ctx)
    assert engine.encode_batch(texts) == want, "device engine diverged"
    if load_native() is not None:
        ne = NativeEngine(ctx)
        assert ne.encode_batch(texts, 2) == want, "native engine diverged"
    if roundtrip:
        assert engine.decode_batch(want) == texts


def test_special_token_spellings():
    """GPT-2-style control tokens: long, punctuation-heavy spellings
    built from pair chains so the greedy loop can reach them."""
    nid = 300
    extra: dict[bytes, int] = {}
    for tok in ("<|endoftext|>", "<|fim_prefix|>", "<|pad|>", "</s>", "<s>"):
        raw = tok.encode()
        # prefix chain so every token splits into in-vocab halves
        for ln in range(2, len(raw) + 1):
            if raw[:ln] not in extra:
                extra[raw[:ln]] = nid
                nid += 1
    ctx = _byte_level_ctx(extra)
    texts = [
        "<|endoftext|>",
        "hello<|endoftext|>world",
        "<|fim_prefix|>x<|pad|></s>",
        "<<|endoftext|",  # near-miss prefixes
        "<|< |>< s>",
    ]
    _assert_all_engines_agree(ctx, texts)


def test_very_long_tokens():
    """Tokens longer than the 32-lane device bucket (host-fallback path)
    and longer than the native StrMap's 512-byte stack buffer."""
    long1 = b"a" * 80
    long2 = b"b" * 600  # forces the heap path in native get2
    extra: dict[bytes, int] = {}
    nid = 300
    for base in (long1, long2):
        for ln in range(2, len(base) + 1):
            extra[base[:ln]] = nid
            nid += 1
    ctx = _byte_level_ctx(extra)
    texts = [
        "a" * 80,
        "a" * 79 + "c",
        "b" * 600,
        "b" * 601,
        ("a" * 80 + " ") * 3,
    ]
    _assert_all_engines_agree(ctx, texts)


def test_hex_literal_dense_vocab():
    """Char-mode vocab where <0xNN> byte-fallback literals dominate:
    exercises hex_token_length seeding (src/core.c:35-55, 483-487)."""
    toks: dict[bytes, int] = {b"": 0}
    nid = 1
    for b in range(0x00, 0x20):
        toks[f"<0x{b:02X}>".encode()] = nid
        nid += 1
    for ch in "abcdefgh ":
        toks[ch.encode()] = nid
        nid += 1
    # composites of literals and chars
    for s in (b"ab", b"abc", b"<0x0A>a", b"a<0x0A>", b"<0x0A><0x0D>"):
        toks[s] = nid
        nid += 1
    vocab = Vocab(
        str2id=dict(toks), id2str={v: k for k, v in toks.items()}, size=nid
    )
    # newline/carriage-return remap to their literal spellings
    ctx = TokenizerContext(
        vocab=vocab,
        special_chars={0x0A: b"<0x0A>", 0x0D: b"<0x0D>"},
        is_byte_encoder=False,
    )
    texts = ["ab\ncd", "a\n", "\na", "\n\r", "abc abc", "h\rg"]
    want = [oracle.encode(ctx, t) for t in texts]
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu.native import NativeEngine, load_native

    engine = TpuTokenizer(ctx)
    assert engine.encode_batch(texts) == want
    if load_native() is not None:
        assert NativeEngine(ctx).encode_batch(texts, 2) == want


def test_probe_clustering_pairs():
    """Thousands of pairs sharing one left id (maximal realistic hash
    clustering pressure on the open-addressed pair table)."""
    rng = random.Random(4)
    extra: dict[bytes, int] = {}
    nid = 300
    # ' x', ' xy' chains: every pair is (space-token, suffix)
    seen = set()
    for _ in range(3000):
        w = "".join(rng.choice("abcdefgh") for _ in range(rng.randrange(2, 6)))
        raw = b" " + w.encode()
        for ln in range(2, len(raw) + 1):
            if raw[:ln] not in seen:
                seen.add(raw[:ln])
                extra[raw[:ln]] = nid
                nid += 1
    ctx = _byte_level_ctx(extra)
    words = [k[1:].decode() for k in list(extra)[:200] if len(k) > 3]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 12)))
        for _ in range(30)
    ]
    _assert_all_engines_agree(ctx, texts)


def test_cross_engine_fuzz_over_adversarial():
    """The full three-engine fuzz over a mixed adversarial vocab."""
    rng = random.Random(77)
    extra: dict[bytes, int] = {}
    nid = 300
    chains = [b"<|eot|>", b"z" * 70, b" qu", b"\xc3\xa1rv\xc3\xadz"]
    for base in chains:
        for ln in range(2, len(base) + 1):
            if base[:ln] not in extra:
                extra[base[:ln]] = nid
                nid += 1
    ctx = _byte_level_ctx(extra)
    atoms = ["<|eot|>", "z" * 70, "qu", "árvíz", " ", "\t", "x", "<|", "|>"]
    texts = [
        "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 12)))
        for _ in range(60)
    ]
    texts = [t for t in texts if "\x00" not in t]
    _assert_all_engines_agree(ctx, texts)
