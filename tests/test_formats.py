"""Vocab/special-chars/merges file-format tests (reference error paths:
src/lib.c:243-388, 460-571, 573-663; tests/test_tokenizer.py:137-141)."""

import os

import pytest

from hutoken_tpu.formats import (
    Vocab,
    bytes_to_hex_str,
    hex_str_to_bytes,
    parse_merges_file,
    parse_special_chars_file,
    parse_vocab_file,
    write_special_chars_file,
    write_vocab_file,
)


def test_hex_roundtrip():
    for data in [b"a", b"hello", bytes(range(1, 256)), "ő".encode()]:
        assert hex_str_to_bytes(bytes_to_hex_str(data)) == data


def test_hex_tolerates_junk():
    # the reference scanner skips non-0x characters (src/helper.c:120-123)
    assert hex_str_to_bytes("0x41zz0x42") == b"AB"


def test_parse_vocab(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("0x61 == 0\n0x62 == 1\n0x610x62 == 2\n")
    v = parse_vocab_file(str(p))
    assert v.str2id == {b"a": 0, b"b": 1, b"ab": 2}
    assert v.id2str[2] == b"ab"
    assert v.size == 3


def test_parse_vocab_duplicate_last_wins(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("0x61 == 0\n0x61 == 5\n")
    v = parse_vocab_file(str(p))
    assert v.str2id[b"a"] == 5
    assert v.size == 2  # line count, like vocab_size_decode


def test_parse_vocab_invalid_format(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("invalid_line_format\n")
    with pytest.raises(ValueError, match="Invalid format in vocab file."):
        parse_vocab_file(str(p))


def test_parse_vocab_empty(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("")
    with pytest.raises(ValueError, match="Vocab file is empty."):
        parse_vocab_file(str(p))


def test_parse_vocab_missing():
    with pytest.raises(FileNotFoundError, match="Could not open vocab file."):
        parse_vocab_file("/nonexistent/vocab.txt")


def test_parse_vocab_bad_int(tmp_path):
    p = tmp_path / "v.txt"
    p.write_text("0x61 == xyz\n")
    with pytest.raises(ValueError, match="could not parse integer value"):
        parse_vocab_file(str(p))


def test_vocab_write_read_roundtrip(tmp_path):
    p = tmp_path / "v.txt"
    id2str = {0: b"a", 1: "ő".encode(), 7: b" world"}
    write_vocab_file(str(p), id2str)
    v = parse_vocab_file(str(p))
    assert v.id2str == id2str


def test_special_chars_roundtrip(tmp_path):
    p = tmp_path / "s.txt"
    write_special_chars_file(str(p), {32: "Ġ", 10: "Ċ", 9: "ĉ"})
    t = parse_special_chars_file(str(p))
    assert t == {32: "Ġ".encode(), 10: "Ċ".encode(), 9: "ĉ".encode()}


def test_special_chars_invalid(tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("no separator\n")
    with pytest.raises(ValueError, match="Invalid format in special character file."):
        parse_special_chars_file(str(p))


def test_special_chars_missing():
    with pytest.raises(
        FileNotFoundError, match="Could not open special characters file."
    ):
        parse_special_chars_file("/nonexistent/special.txt")


def test_merges_parsing(tmp_path):
    vocab = Vocab(
        str2id={b"a": 0, b"b": 1, b"c": 2, b"ab": 3, b"abc": 4},
        id2str={0: b"a", 1: b"b", 2: b"c", 3: b"ab", 4: b"abc"},
        size=5,
    )
    p = tmp_path / "merges.txt"
    p.write_text("#version: x\na b\nzz qq\nab c\n")
    m = parse_merges_file(str(p), vocab)
    # unknown-token rules are skipped without consuming a rank
    assert m.rules == {(0, 1): (0, 3), (3, 2): (1, 4)}
    assert m.num_rules == 2


def test_merges_empty_returns_none(tmp_path):
    vocab = Vocab(str2id={b"a": 0}, id2str={0: b"a"}, size=1)
    p = tmp_path / "merges.txt"
    p.write_text("# only comments\n")
    assert parse_merges_file(str(p), vocab) is None


def test_merges_missing():
    vocab = Vocab(str2id={b"a": 0}, id2str={0: b"a"}, size=1)
    with pytest.raises(FileNotFoundError, match="Could not open merges file."):
        parse_merges_file("/nonexistent/merges.txt", vocab)
