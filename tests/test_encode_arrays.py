"""encode_batch_arrays: the array-form batch API (what bench.py times).

Covers the plain path and the standalone-prefix-run insertion branch
(engine.py np.insert of the prefix token run for documents that start
with a space — reference semantics: src/core.c:421-446), checked
against encode_batch (list outputs) and the oracle.
"""

import random

import numpy as np

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.engine import TpuTokenizer


def _check_arrays_match_lists(engine, ctx, docs):
    flat, offs = engine.encode_batch_arrays(docs)
    lists = engine.encode_batch(docs)
    want = [oracle.encode(ctx, d) for d in docs]
    assert lists == want
    assert offs.shape == (len(docs) + 1,)
    assert int(offs[-1]) == len(flat)
    for i, d in enumerate(docs):
        got = flat[offs[i] : offs[i + 1]].tolist()
        assert got == want[i], f"arrays mismatch on doc {i}: {d[:30]!r}"


def test_encode_batch_arrays_byte_level():
    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    engine = TpuTokenizer(ctx)
    rng = random.Random(21)
    words = ft.CORPUS.split()
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 25)))
        for _ in range(50)
    ] + ["", " ", "x", "  double  spaced  "]
    _check_arrays_match_lists(engine, ctx, docs)


def test_encode_batch_arrays_prefix_run_insert():
    """Char-mode + prefix: space-initial docs get the standalone prefix
    token run inserted at their start (the np.insert branch)."""
    v, s = ft.write_char_mode_fixture()
    ctx = TokenizerContext.load(v, s, prefix="▁")
    engine = TpuTokenizer(ctx)
    rng = random.Random(22)
    words = [w for w in ft.CORPUS.split() if w.isascii()]
    docs = []
    for i in range(30):
        body = " ".join(rng.choice(words) for _ in range(rng.randrange(1, 12)))
        docs.append((" " if i % 2 else "") + body)  # alternate prefix-run
    docs += [" leading space", "no leading space", "  two spaces"]
    flat, offs = engine.encode_batch_arrays(docs)
    lists = engine.encode_batch(docs)
    want = [oracle.encode(ctx, d) for d in docs]
    assert lists == want
    for i in range(len(docs)):
        got = flat[offs[i] : offs[i + 1]].tolist()
        assert got == want[i], f"prefix-run arrays mismatch on doc {i}"
    # the inserted run must appear only on space-initial docs
    run = engine._prefix_token_run()
    for i, d in enumerate(docs):
        toks = flat[offs[i] : offs[i + 1]].tolist()
        if d.startswith(" ") and toks:
            assert toks[: len(run)] == run


def test_encode_batch_arrays_empty_batch():
    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
    engine = TpuTokenizer(ctx)
    flat, offs = engine.encode_batch_arrays([])
    assert len(flat) == 0
    assert np.array_equal(offs, np.zeros(1, dtype=offs.dtype))
