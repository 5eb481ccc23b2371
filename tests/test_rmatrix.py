"""R-matrix (lookup-free) merge kernel vs the probe kernel and oracle.

The two device kernels implement the same greedy order, so their packed
outputs must be bit-identical on any block; the oracle check ties them
to the reference semantics (src/core.c:66-209).
"""

import numpy as np
import pytest

import fixture_tools as ft
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.tables import build_encoder_tables, build_substr_table


def _random_word_block(rng, n_words, max_len, charset):
    words = []
    for _ in range(n_words):
        n = rng.randint(1, max_len)
        words.append(bytes(rng.choice(charset) for _ in range(n)))
    return words


def _pack(words, rows, bucket):
    raw = np.zeros((rows, bucket), dtype=np.uint8)
    lens = np.zeros(rows, dtype=np.int32)
    for r, w in enumerate(words):
        raw[r, : len(w)] = np.frombuffer(w, dtype=np.uint8)
        lens[r] = len(w)
    return raw, lens


@pytest.mark.parametrize("fixture", ["small", "big"])
def test_rmatrix_matches_probe_kernel(fixture):
    import jax.numpy as jnp

    from hutoken_tpu.ops.merge import merge_words_from_bytes_packed
    from hutoken_tpu.ops.rmatrix import merge_words_from_bytes_rmatrix

    if fixture == "small":
        vp, sp = ft.write_byte_level_fixture()
    else:
        vp, sp = ft.write_big_vocab_fixture()
    ctx = TokenizerContext.load(vp, sp, is_byte_encoder=True)
    tables = build_encoder_tables(ctx)
    st = build_substr_table(ctx)
    assert st is not None

    import random

    rng = random.Random(7)
    charset = list(range(97, 123)) + [32, 46, 0xC3, 0xA1, 48, 49]
    words = _random_word_block(rng, 96, 30, charset)
    # filter to valid UTF-8-agnostic byte strings is unnecessary: the
    # byte path seeds per raw byte regardless of text validity
    rows, bucket = 128, 32
    raw, lens = _pack(words, rows, bucket)

    pt = tables.pair_table
    table_arrays = (
        jnp.asarray(pt.left), jnp.asarray(pt.right), jnp.asarray(pt.rank),
        jnp.asarray(pt.merged), pt.probe_len, pt.capacity - 1, False,
    )
    byte_seed = jnp.asarray(tables.byte_seed_ids)
    want = np.asarray(
        merge_words_from_bytes_packed(
            table_arrays, byte_seed, jnp.asarray(raw), jnp.asarray(lens),
            False,
        )
    )
    substr_arrays = (
        jnp.asarray(st.sh1), jnp.asarray(st.sh2), jnp.asarray(st.stid),
        jnp.asarray(st.b_ehash1), jnp.asarray(st.b_pmul1),
        jnp.asarray(st.b_ehash2), jnp.asarray(st.b_pmul2),
        st.probe_len,
    )
    got = np.asarray(
        merge_words_from_bytes_rmatrix(
            substr_arrays, byte_seed, jnp.asarray(raw), jnp.asarray(lens),
            32, False,
        )
    )
    # packed layout: [rows counts, compacted tokens]
    nc = int(want[:rows].sum())
    assert (got[:rows] == want[:rows]).all()
    assert (got[rows : rows + nc] == want[rows : rows + nc]).all()


def test_rmatrix_engine_matches_oracle(monkeypatch):
    """Force the engine onto the R-matrix path and compare against the
    exact host oracle end-to-end."""
    monkeypatch.setenv("HUTOKEN_TPU_FORCE_RMATRIX", "1")
    from hutoken_tpu import oracle
    from hutoken_tpu.engine import TpuTokenizer

    vp, sp = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(vp, sp, is_byte_encoder=True)
    eng = TpuTokenizer(ctx)
    assert eng._substr_arrays is not None
    texts = [
        "Hello world, this is a test.",
        " leading space and the rest",
        "árvíztűrő tükörfúrógép 123!!",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbb",
    ]
    got = eng.encode_batch(texts)
    for t, g in zip(texts, got):
        assert g == oracle.encode(ctx, t), t
