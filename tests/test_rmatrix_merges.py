"""Merges/id-path R-matrix kernel: big-table conformance vs the oracle.

The reference's merges path (src/core.c:211-337) is what every real
GPT-2 import runs; at 50k-rule scale the one-hot probe is gated off
(ops/merge.py:ONEHOT_MAX_CAPACITY), so the device serves it with the
substring R-matrix kernel (ops/rmatrix.py) whose rank order is the
merged-id order (equivalence verified by tables.build_substr_table_merges).
"""

import random

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext


@pytest.fixture(scope="module")
def big_merges_ctx():
    v, s = ft.write_big_vocab_fixture()
    m = ft.write_big_merges_fixture()
    return TokenizerContext.load(
        v, s, is_byte_encoder=True, merges_file_path=m
    )


def test_substr_merges_table_builds(big_merges_ctx):
    from hutoken_tpu.tables import build_substr_table_merges

    st = build_substr_table_merges(big_merges_ctx)
    assert st is not None
    assert st.capacity > 16384  # the config the one-hot probe can't serve
    assert st.d_cap >= 8
    # spot-check cut values: for rule (A, B) -> M, cut[M] = |A| chars
    rules = list(big_merges_ctx.merges.rules.items())[:50]
    import numpy as np

    from hutoken_tpu.tables import _mix_hash, _spelling_hashes

    mask = st.capacity - 1
    for (a, b), (rank, merged) in rules:
        sp = big_merges_ctx.vocab.id2str[merged]
        h1, h2 = _spelling_hashes(sp)
        s = int(_mix_hash(np.uint32(h1), np.uint32(h2))) & mask
        for _ in range(st.probe_len):
            if st.stid[s] == merged:
                break
            s = (s + 1) & mask
        assert st.stid[s] == merged
        left_sp = big_merges_ctx.vocab.id2str[a]
        assert st.scut[s] == len(left_sp.decode("utf-8"))


def test_substr_merges_rejects_nonmonotone():
    """Rule sets without rank/id alignment fall back (probe kernel)."""
    from hutoken_tpu.formats import MergeRules, Vocab
    from hutoken_tpu.tables import build_substr_table_merges

    toks = {b"a": 0, b"b": 1, b"ab": 3, b"abb": 2}
    vocab = Vocab(
        str2id=dict(toks), id2str={v: k for k, v in toks.items()}, size=4
    )
    # rank 0 produces id 3, rank 1 produces id 2: ids not rank-ordered
    merges = MergeRules(rules={(0, 1): (0, 3), (3, 1): (1, 2)}, num_rules=2)
    ctx = TokenizerContext(vocab=vocab, merges=merges, is_byte_encoder=True)
    assert build_substr_table_merges(ctx) is None


def test_packed_probe_big_merges_matches_oracle(big_merges_ctx):
    """Default big-table path: 16-bit packed gather probe (MODE_PACKED)."""
    from hutoken_tpu.engine import TpuTokenizer
    from hutoken_tpu.ops.merge import MODE_PACKED

    engine = TpuTokenizer(big_merges_ctx)
    assert engine.table_arrays[-1] == MODE_PACKED
    rng = random.Random(9)
    words = ft.CORPUS.split()
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 16)))
        for _ in range(40)
    ] + ["aaaa bbbb unknownzz 12345 ...!!!", "x" * 80]
    got = engine.encode_batch(docs)
    want = [oracle.encode(big_merges_ctx, d) for d in docs]
    assert got == want


def test_device_big_merges_matches_oracle(big_merges_ctx, monkeypatch):
    from hutoken_tpu.engine import TpuTokenizer

    # the R-matrix serves vocabs whose ids overflow the packed probe's
    # 16-bit layout; force it here so the 50k fixture exercises it
    monkeypatch.setenv("HUTOKEN_TPU_FORCE_RMATRIX", "1")
    engine = TpuTokenizer(big_merges_ctx)
    assert engine._substr_merges

    rng = random.Random(5)
    words = ft.CORPUS.split()
    docs = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 20)))
        for _ in range(60)
    ]
    docs += [
        "A gyors barna róka átugrik a lusta kutya fölött.",
        "unknownwordform zzz qqq",
        "xyzzy " * 30,  # repeats: dedup + cache
        " Számítógépes nyelvészet, tokenizálás! 0xFF 123",
        "a" * 100,  # longer than the 32-lane bucket
    ]
    got = engine.encode_batch(docs)
    want = [oracle.encode(big_merges_ctx, d) for d in docs]
    for g, w, d in zip(got, want, docs):
        assert g == w, f"mismatch on {d[:40]!r}"
