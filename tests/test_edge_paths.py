"""Edge-path coverage: very long words (tail bucket + host fallback),
words at bucket boundaries, pathological inputs."""

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext


def test_long_words_cross_buckets():
    from hutoken_tpu.engine import TpuTokenizer

    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    eng = TpuTokenizer(ctx)
    texts = [
        "x" * 31,           # primary bucket boundary
        "x" * 32,
        "x" * 33,           # tail bucket
        "y" * 127,
        "y" * 128,
        "z" * 129,          # beyond the largest bucket -> host fallback
        "w" * 4000,         # giant word
        "a " + "q" * 200 + " b",
    ]
    got = eng.encode_batch(texts)
    want = [oracle.encode(ctx, t) for t in texts]
    assert got == want
    assert eng.decode_batch(got) == texts


def test_long_words_native():
    from hutoken_tpu.native import NativeEngine, load_native

    if load_native() is None:
        import pytest

        pytest.skip("native library not built")
    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    ne = NativeEngine(ctx)
    texts = ["x" * 600, "á" * 300, "🙂" * 80, ("ab" * 200 + " ") * 3]
    assert ne.encode_batch(texts, 2) == [oracle.encode(ctx, t) for t in texts]


def test_all_bytes_roundtrip():
    """Every non-NUL byte value through encode+decode (byte mode)."""
    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    # build a valid UTF-8 string containing every byte value via latin-1
    # codepoints (bytes >= 0x80 appear as continuation/lead bytes of the
    # UTF-8 encodings)
    text = "".join(chr(c) for c in range(1, 256))
    ids = oracle.encode(ctx, text)
    assert all(i >= 0 for i in ids)
    assert oracle.decode(ctx, ids) == text


def test_mixed_whitespace_forms():
    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    enc = ft.tiktoken_encoding()
    for t in ["\t\t  \n \r\n\x0b\x0c", "a\tb\nc d", "   \t   ", "\n\n\n"]:
        assert oracle.encode(ctx, t) == enc.encode(t), repr(t)
        assert oracle.decode(ctx, oracle.encode(ctx, t)) == t


def test_unknown_seed_chars_fall_back_exactly():
    """Char-mode vocab missing some chars: the reference emits -1 ids
    (src/core.c:206-207,471); every engine must agree."""
    from hutoken_tpu.formats import Vocab

    toks = {b"a": 0, b"b": 1, b"ab": 2, b" ": 3}
    vocab = Vocab(
        str2id=dict(toks), id2str={v: k for k, v in toks.items()}, size=len(toks)
    )
    ctx = TokenizerContext(vocab=vocab)
    texts = ["ab", "aXb", "é ab", "abXXab"]
    want = [oracle.encode(ctx, t) for t in texts]
    assert want[1] == [0, -1, 1]  # 'X' unknown -> -1 between a and b

    from hutoken_tpu.engine import TpuTokenizer

    eng = TpuTokenizer(ctx)
    assert eng.encode_batch(texts) == want

    from hutoken_tpu.native import NativeEngine, load_native

    if load_native() is not None:
        assert NativeEngine(ctx).encode_batch(texts, 2) == want


def test_custom_regex_pattern_paths():
    """User-supplied POSIX pattern (src/core.c:352-359): oracle and
    device engine agree; gaps between matches are skipped."""
    from hutoken_tpu.engine import TpuTokenizer

    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(
        v, s, is_byte_encoder=True, pattern="[a-zA-Z]+|[0-9]+"
    )
    texts = ["hello world 42", "  gaps!! are## skipped 7x", "", "123abc"]
    want = [oracle.encode(ctx, t) for t in texts]
    # gap-skipping: punctuation/spaces not matched by the pattern vanish
    dec = oracle.decode(ctx, want[1])
    assert dec == "gapsareskipped7x"

    eng = TpuTokenizer(ctx)
    assert eng.encode_batch(texts) == want
