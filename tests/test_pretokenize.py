"""Word-splitter tests: regex fast path vs scalar state-machine oracle.

This is the golden-master pattern the reference uses for its parser
(reference: tests/test_parser.c:77-108, asserting the hand-rolled parser
against POSIX regexec).
"""

import random
import string

import pytest

from hutoken_tpu.bytemaps import gpt2_special_chars_table
from hutoken_tpu.pretokenize import (
    encode_remap,
    split_words,
    split_words_scalar,
)

EDGE_CASES = [
    "",
    " ",
    "  ",
    "   leading spaces",
    "trailing spaces   ",
    "hello world",
    " hello world",
    "Hello, World!",
    "árvíztűrő tükörfúrógép",
    "ÁRVÍZTŰRŐ TÜKÖRFÚRÓGÉP",
    "őŰüÖč",  # mixes Hungarian accents with a non-Hungarian accent
    "123abc456",
    " 123 abc 456 ",
    "a1b2c3",
    "!@#$%^&*()",
    " !@# $%^",
    "tab\there",
    "new\nline",
    "\r\n\t\x0b\x0c",
    "emoji 🙂🙃 test",
    "中文字符",
    "mixed 中文 and ASCII",
    "a",
    ".",
    "-",
    "szóköz  után",
    "dash-separated-words",
    "e.g., i.e., etc.",
    "5+5=10",
    "café naïve résumé",  # non-Hungarian accented letters are "other"
    "don't stop",
    "    ",
    "word    word",
    " nbsp",  # U+00A0 is NOT C-locale whitespace -> "other"
    " line sep",
]


@pytest.mark.parametrize("text", EDGE_CASES)
def test_regex_matches_scalar(text):
    assert split_words(text) == split_words_scalar(text)


def test_split_covers_text():
    for text in EDGE_CASES:
        assert "".join(split_words(text)) == text


def test_fuzz_regex_vs_scalar():
    rng = random.Random(1234)
    alphabet = (
        string.ascii_letters
        + string.digits
        + " \t\n.,;:!?-ő́űüöáéíóúŐŰÜÖÁÉÍÓÚ中🙂 "
    )
    for _ in range(300):
        n = rng.randrange(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert split_words(text) == split_words_scalar(text), repr(text)
        assert "".join(split_words(text)) == text


def test_class_priority():
    # " a" -> space+alpha beats space-run; single-byte fallback for \t
    assert split_words(" a b") == [" a", " b"]
    assert split_words(" 12x") == [" 12", "x"]
    assert split_words("\t\t") == ["\t", "\t"]
    # only ONE optional leading space attaches to alpha; a double space
    # falls through to the space-run branch which consumes the whole run
    assert split_words("  ab") == ["  ", "ab"]


def test_encode_remap_byte_mode():
    table = {k: v.encode() for k, v in gpt2_special_chars_table().items()}
    # space -> Ġ, newline -> Ċ, high bytes -> 2-byte UTF-8 expansion
    out = encode_remap(" a\n".encode(), table, None, True)
    out = encode_remap("ő".encode(), table, None, True)
    assert out.decode() == "Å" + gpt2_special_chars_table()[0x91]
    # prefix is prepended unremapped
    out = encode_remap(b"a", table, "▁".encode(), True)
    assert out.decode() == "▁a"


def test_encode_remap_char_mode():
    table = {10: "<0x0A>".encode(), 32: "▁".encode()}
    out = encode_remap(" ő\n".encode(), table, None, False)
    assert out.decode() == "▁ő<0x0A>"
