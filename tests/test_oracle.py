"""Differential conformance of the scalar oracle.

Strategy mirrors the reference's (tests/test_tokenizer.py:55-103): exact
token-id equality against independent engines — here tiktoken's Rust BPE
and Hugging Face ``tokenizers`` — constructed offline from the same
fixture tables, plus decode round-trips.
"""

import random

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext

SENTENCES = [
    "How can the net amount of entropy of the universe be massively decreased?",
    "What I cannot create, I do not understand.",
    "A gyors barna róka átugrik a lusta kutya fölött, míg az őszi szél "
    "végigsöpör a Duna-parton és a fák levelei aranyszínűre váltak.",
    "Öt szűk ütközőpont maradt a hídon; 42 hajó érkezett 2026-ban.",
    " leading space sentence",
    "\n\nTest\n",
    "   multiple   spaces\tand\nnewlines\r\nare whitespace too.",
    "emoji 🙂 and 中文 chars mixed with ASCII",
    "punktuáció!?;:()[]{}«»---",
    "x",
    " ",
    "",
]


@pytest.fixture(scope="module")
def byte_ctx():
    vocab_path, special_path = ft.write_byte_level_fixture()
    return TokenizerContext.load(vocab_path, special_path, is_byte_encoder=True)


@pytest.fixture(scope="module")
def tiktoken_enc():
    return ft.tiktoken_encoding()


@pytest.mark.parametrize("text", SENTENCES)
def test_encode_matches_tiktoken(byte_ctx, tiktoken_enc, text):
    assert oracle.encode(byte_ctx, text) == tiktoken_enc.encode(text)


@pytest.mark.parametrize("text", [t for t in SENTENCES if t])
def test_decode_roundtrip(byte_ctx, text):
    assert oracle.decode(byte_ctx, oracle.encode(byte_ctx, text)) == text


def test_corpus_exact(byte_ctx, tiktoken_enc):
    mine = oracle.encode(byte_ctx, ft.CORPUS)
    assert mine == tiktoken_enc.encode(ft.CORPUS)
    assert oracle.decode(byte_ctx, mine) == ft.CORPUS


def test_fuzz_vs_tiktoken(byte_ctx, tiktoken_enc):
    rng = random.Random(7)
    words = ft.CORPUS.split()
    for _ in range(100):
        n = rng.randrange(0, 12)
        text = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.3:
            text = " " + text
        assert oracle.encode(byte_ctx, text) == tiktoken_enc.encode(text), repr(text)


def test_decode_out_of_bounds(byte_ctx):
    with pytest.raises(
        ValueError, match="Element must be non-negative and less than vocab size."
    ):
        oracle.decode(byte_ctx, [999999])
    with pytest.raises(ValueError):
        oracle.decode(byte_ctx, [-1])


def test_merges_path_matches_hf_tokenizers(byte_ctx):
    """Id-path (merges.txt ranks) vs the HF Rust BPE engine, word-by-word."""
    from tokenizers import Tokenizer, models

    vocab_path, special_path = ft.write_byte_level_fixture()
    merges_path = ft.write_merges_fixture()
    ctx = TokenizerContext.load(
        vocab_path, special_path, is_byte_encoder=True, merges_file_path=merges_path
    )
    assert ctx.merges is not None and ctx.merges.num_rules > 0

    # Build the HF tokenizer from the same tables (spelling space).
    hf_vocab = {
        ft.remapped_spelling(tok): idx for tok, idx in ft.build_ranks().items()
    }
    merges = []
    with open(merges_path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("#"):
                continue
            left, right = line.rstrip("\n").split(" ")
            merges.append((left, right))
    hf = Tokenizer(models.BPE(vocab=hf_vocab, merges=merges))

    from hutoken_tpu.pretokenize import encode_remap, split_words

    for text in SENTENCES:
        mine = oracle.encode(ctx, text)
        expected = []
        for word in split_words(text):
            spelled = encode_remap(
                word.encode(), ctx.special_chars, None, True
            ).decode()
            expected.extend(hf.encode(spelled).ids)
        assert mine == expected, repr(text)


def test_string_path_rank_covers_implicit_pairs(byte_ctx):
    """String-path ranks come from *any* concatenation present in the
    vocab, not just explicit merge rules (src/core.c:700-722)."""
    from hutoken_tpu.formats import Vocab

    vocab = Vocab(
        str2id={b"a": 0, b"b": 1, b"c": 2, b"ab": 3, b"abc": 4},
        id2str={0: b"a", 1: b"b", 2: b"c", 3: b"ab", 4: b"abc"},
        size=5,
    )
    ctx = TokenizerContext(vocab=vocab)
    # greedy: pair ("a","b")->3 is the lowest concat id; then ("ab","c")->4
    assert oracle.encode(ctx, "abc") == [4]
    # tie-break leftmost: "abab" -> ab(3) ab(3); pair (b,a) has no rank
    assert oracle.encode(ctx, "abab") == [3, 3]


def test_prefix_state_machine():
    """add_prefix vs add_prefix_token (src/core.c:364-366, 421-450)."""
    from hutoken_tpu.formats import Vocab

    # vocab: _=0 (prefix char), a=1, b=2, _a=3, ab=4, _ab=5 (spelled with '_')
    vocab = Vocab(
        str2id={b"_": 0, b"a": 1, b"b": 2, b"_a": 3, b"ab": 4, b"_ab": 5},
        id2str={0: b"_", 1: b"a", 2: b"b", 3: b"_a", 4: b"ab", 5: b"_ab"},
        size=6,
    )
    ctx = TokenizerContext(vocab=vocab, prefix=b"_", special_chars={32: b"_"})
    # text starts non-space: prefix glued to first word -> "_ab" one token
    assert oracle.encode(ctx, "ab") == [5]
    # text starts with space: prefix emitted as its own token run first;
    # the space itself remaps to "_" inside the word
    assert oracle.encode(ctx, " ab") == [0, 5]
    # second word gets no prefix: "ab cd"-style
    assert oracle.encode(ctx, "ab ab") == [5, 5]  # " ab" remaps to "_ab"
