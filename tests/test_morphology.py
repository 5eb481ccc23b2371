"""Morphology subsystem logic, driven by a fake libfoma CDLL.

The reference's morphology tests pin exact analyses for
"fejetlenséget" against the real emMorph FST
(reference: tests/test_tokenizer.py:265-290).  The FST artifact cannot
be built offline (its lexicon sources live in the nytud/emmorph repo),
so these tests inject a fake CDLL that replays emMorph-shaped apply_up
sequences and assert the exact same output contracts:
analysis collection order, ``[tag]`` splitting, the only_longest
strictly-greater rule, and the empty-word case.
"""

import pytest

from hutoken_tpu import morphology


class FakeFoma:
    """Mimics the libfoma calls morphology.py binds: apply_up(handle, w)
    starts an iteration; apply_up(handle, None) continues it."""

    ANALYSES = {
        "fejetlenséget": [
            "fejetlenség[/N]et[Acc]",
            "fejetlen[/Adj]ség[_Abs/N]et[Acc]",
            "fej[/N]etlen[_Priv/Adj]ség[_Abs/N]et[Acc]",
            "fej[/N]etlen[_Priv/Adj]ség[_Abs/N]et[Acc]",
        ],
        "": [],
    }

    def __init__(self):
        self._iter = iter(())

    def fsm_read_binary_file(self, path):
        return 1234 if b"hu.foma.bin" in path else None

    def apply_init(self, net):
        return 5678

    def apply_up(self, handle, word):
        if word is not None:
            self._iter = iter(
                self.ANALYSES.get(word.decode("utf-8"), [])
            )
        nxt = next(self._iter, None)
        return None if nxt is None else nxt.encode("utf-8")


@pytest.fixture
def fake_lib(monkeypatch):
    lib = FakeFoma()
    monkeypatch.setattr(morphology, "_lib", lib)
    monkeypatch.setattr(morphology, "_probed", True)
    return lib


def test_split_analysis_alternation():
    # strtok("[]") pieces alternate morpheme/tag starting with a morpheme
    assert morphology.split_analysis("fej[/N]etlen[_Priv/Adj]") == [
        "fej",
        "etlen",
    ]
    assert morphology.split_analysis("a[X]b[Y]c[Z]") == ["a", "b", "c"]
    # delimiter runs collapse: "][" between tag and morpheme
    assert morphology.split_analysis("fej[/N][Pl]") == ["fej", "Pl"]
    assert morphology.split_analysis("") == []
    assert morphology.split_analysis("csak") == ["csak"]


def test_look_up_word_all_analyses(fake_lib):
    handle = morphology.initialize_foma()
    got = morphology.look_up_word(handle, "fejetlenséget")
    assert got == [
        ["fejetlenség", "et"],
        ["fejetlen", "ség", "et"],
        ["fej", "etlen", "ség", "et"],
        ["fej", "etlen", "ség", "et"],
    ]


def test_look_up_word_only_longest(fake_lib):
    handle = morphology.initialize_foma()
    got = morphology.look_up_word(handle, "fejetlenséget", True)
    # strictly-greater morpheme count wins; later ties are ignored
    assert got == [["fej", "etlen", "ség", "et"]]


def test_look_up_word_empty(fake_lib):
    handle = morphology.initialize_foma()
    assert morphology.look_up_word(handle, "") == []


def test_initialize_foma_missing_fst(fake_lib):
    with pytest.raises(FileNotFoundError):
        morphology.initialize_foma("./bin/does-not-exist.bin")


def test_facade_look_up_word(fake_lib):
    import hutoken_tpu as hutoken

    handle = hutoken.initialize_foma()
    got = hutoken.look_up_word(handle, "fejetlenséget", True)
    assert got == [["fej", "etlen", "ség", "et"]]
