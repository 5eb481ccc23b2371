"""Trainer tests (reference: src/bpe.c, src/bbpe.c, src/lib.c:76-126)."""

import os

import pytest

from hutoken_tpu.train.bbpe import bbpe_train_core
from hutoken_tpu.train.bpe import bpe_train_core
from hutoken_tpu.train.common import (
    first_to_reach_winner,
    left_to_right_merge_mask,
)

import numpy as np


def test_left_to_right_merge_mask():
    # "aaaa": pair positions 0,1,2 all match -> merge at 0 and 2
    m = np.array([True, True, True])
    assert left_to_right_merge_mask(m).tolist() == [True, False, True]
    m = np.array([False, True, True, False, True])
    assert left_to_right_merge_mask(m).tolist() == [False, True, False, False, True]


def test_first_to_reach_winner_tiebreak():
    # groups: a at positions 0,3; b at positions 1,2 -> b reaches 2 first
    inverse = np.array([0, 1, 1, 0])
    counts = np.array([2, 2])
    win, cnt = first_to_reach_winner(inverse, counts)
    assert (win, cnt) == (1, 2)


def test_bbpe_simple():
    s2i = bbpe_train_core(b"abababab", 258, verbose=False)
    # most common pair (a,b) x4 -> id 256 "ab"; then (256,256) x2 -> 257
    assert s2i[b"ab"] == 256
    assert s2i[b"abab"] == 257


def test_bbpe_stops_on_low_freq():
    s2i = bbpe_train_core(b"abcdefg", 300, verbose=False)
    # every pair occurs once -> freq <= 1 stops immediately
    assert len(s2i) == 256


def test_bbpe_ids_are_creation_ordered():
    merge_log = []
    s2i = bbpe_train_core(
        b"the cat sat on the mat the cat sat" * 3, 280, verbose=False,
        merge_log=merge_log,
    )
    new_ids = [new for _, _, new in merge_log]
    assert new_ids == sorted(new_ids)
    assert all(i >= 256 for i in new_ids)


def test_bpe_id_quirk_skips_256():
    s2i = bpe_train_core(b"abababab", 260, verbose=False, strict=True)
    # reference assigns count+1: ids start at 257, 256 is never used
    ids = set(s2i.values())
    assert 256 not in ids
    # the stale-tail stats artifact re-selects 'ab' and overwrites its id
    # (so 257, its first id, is replaced by 259)
    assert s2i[b"ab"] == 259
    assert s2i[b"abab"] == 258


def test_bpe_strict_vs_relaxed_small():
    """On a tiny corpus where the reference artifacts bite, the two modes
    may differ; both must still produce supersets of the byte seeds."""
    for strict in (True, False):
        s2i = bpe_train_core(b"aabbaabb ccdd", 262, verbose=False, strict=strict)
        assert len(s2i) >= 256


def test_bpe_strict_drops_tail_element():
    """The reference rewrite drops the final element when unmerged
    (bpe.c:184-210): with corpus "abX", after merging "ab" the 'X' is
    gone, so "abX" can never form; relaxed mode can form it."""
    strict = bpe_train_core(b"ababX", 300, verbose=False, strict=True)
    assert b"abX" not in strict


def test_facade_train_saves_to_home_config(tmp_path, monkeypatch):
    import hutoken_tpu as hutoken

    monkeypatch.setenv("HOME", str(tmp_path))
    hutoken.bbpe_train("abababab", 258, "tiny-vocab.txt", verbose=False)
    path = tmp_path / "config" / "tiny-vocab.txt"
    assert path.exists()
    from hutoken_tpu.formats import parse_vocab_file

    v = parse_vocab_file(str(path))
    assert v.str2id[b"ab"] == 256
    # reloadable and usable for encoding
    assert v.size == 258
