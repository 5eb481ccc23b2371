"""Real published-tokenizer conformance anchor (network-gated).

The reference's core test strategy is exact-id differential testing
against REAL published tokenizers (reference:
tests/test_tokenizer.py:55-84 — HF PULI-LlumiX-32K and tiktoken gpt2).
This sandbox has no network, so the regular suite substitutes oracles
built from in-repo trained fixtures; THIS module is the real anchor,
ready to run the moment network (or a pre-populated tiktoken cache) is
available: it fetches the published GPT-2 BPE ranks via tiktoken,
writes them out in hutoken's own hex-vocab + special-chars format, and
asserts exact token-id equality.  Offline it skips cleanly.
"""

import os

import pytest

import fixture_tools as ft


def _real_gpt2():
    try:
        import tiktoken

        return tiktoken.get_encoding("gpt2")
    except Exception as e:  # no network / no cached BPE file
        pytest.skip(f"published gpt2 ranks unavailable offline: {e}")


TEXTS = [
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "  leading and   internal whitespace\tand\nnewlines",
    "árvíztűrő tükörfúrógép",
    "numbers 1234567890 and punct!?...",
    "emoji 🙂 and 中文 mixed",
]


@pytest.fixture(scope="module")
def real_ctx():
    enc = _real_gpt2()
    os.makedirs(ft.FIXTURE_DIR, exist_ok=True)
    vocab_path = os.path.join(ft.FIXTURE_DIR, "real-gpt2-vocab.txt")
    special_path = os.path.join(
        ft.FIXTURE_DIR, "real-gpt2-vocab_special_chars.txt"
    )
    ranks = enc._mergeable_ranks  # noqa: SLF001
    with open(vocab_path, "w", encoding="utf-8") as f:
        for token, idx in sorted(ranks.items(), key=lambda kv: kv[1]):
            spelled = ft.remapped_spelling(token).encode("utf-8")
            hex_token = "".join(f"0x{b:02X}" for b in spelled)
            f.write(f"{hex_token} == {idx}\n")
    ft.write_special_chars_file(
        special_path, ft.gpt2_special_chars_table()
    )
    from hutoken_tpu.context import TokenizerContext

    return enc, TokenizerContext.load(
        vocab_path, special_path, is_byte_encoder=True
    )


def test_real_gpt2_exact_ids_oracle(real_ctx):
    from hutoken_tpu import oracle

    enc, ctx = real_ctx
    for t in TEXTS:
        assert oracle.encode(ctx, t) == enc.encode(t), t


def test_real_gpt2_exact_ids_engine(real_ctx):
    from hutoken_tpu.engine import TpuTokenizer

    enc, ctx = real_ctx
    tok = TpuTokenizer(ctx)
    got = tok.encode_batch(TEXTS)
    for t, ids in zip(TEXTS, got):
        assert ids == enc.encode(t), t
        assert tok.decode_batch([ids])[0] == t  # round trip
