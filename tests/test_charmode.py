"""Char-mode (SentencePiece-style) conformance: prefix state machine,
<0xNN> literal seeding, multi-char replacement decode — oracle vs native
vs device engine on the same tables."""

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext

TEXTS = [
    "A gyors barna róka átugrik a lusta kutya fölött.",
    " leading space engages the prefix-token run",
    "newlines\nare\nliterals",
    "tabs\tand\rreturns",
    "Öt szűk ütközőpont",
    "multi  spaces",
    "x",
    " ",
    "",
]


@pytest.fixture(scope="module")
def char_ctx():
    v, s = ft.write_char_mode_fixture()
    return TokenizerContext.load(v, s, prefix="▁", is_byte_encoder=False)


def test_charmode_roundtrip(char_ctx):
    for t in TEXTS:
        ids = oracle.encode(char_ctx, t)
        assert all(i >= 0 for i in ids), (t, ids)
        # the prefix marker is stripped once at decode (src/pretokenizer.c:209-215)
        dec = oracle.decode(char_ctx, ids)
        want = t
        assert dec == want, (t, dec)


def test_charmode_prefix_semantics(char_ctx):
    # non-space start: prefix glued into the first word
    ids_glued = oracle.encode(char_ctx, "gyors")
    # space start: standalone prefix run emitted first
    ids_run = oracle.encode(char_ctx, " gyors")
    assert ids_glued != ids_run
    assert oracle.decode(char_ctx, ids_glued) == "gyors"
    assert oracle.decode(char_ctx, ids_run) == " gyors"


def test_charmode_native_matches_oracle(char_ctx):
    from hutoken_tpu.native import NativeEngine, load_native

    if load_native() is None:
        pytest.skip("native library not built")
    ne = NativeEngine(char_ctx)
    assert ne.encode_batch(TEXTS, 2) == [oracle.encode(char_ctx, t) for t in TEXTS]
    toks = [oracle.encode(char_ctx, t) for t in TEXTS if t]
    assert ne.decode_batch(toks, 2) == [t for t in TEXTS if t]


def test_charmode_engine_matches_oracle(char_ctx):
    from hutoken_tpu.engine import TpuTokenizer

    eng = TpuTokenizer(char_ctx)
    got = eng.encode_batch(TEXTS)
    want = [oracle.encode(char_ctx, t) for t in TEXTS]
    assert got == want
    toks = [w for w in want if w]
    assert eng.decode_batch(toks) == [t for t in TEXTS if t]
