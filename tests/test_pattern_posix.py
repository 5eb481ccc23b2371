"""Custom-pattern splitting: differential vs real POSIX regexec.

The reference compiles user patterns with ``regcomp(REG_EXTENDED)`` and
walks matches from a cursor (src/core.c:352-400).  Python ``re`` uses
leftmost-FIRST alternation where POSIX ERE is leftmost-LONGEST, so the
translation in pretokenize.compile_user_pattern can diverge; this
differential (ctypes onto libc's regcomp/regexec) pins the behavior on
realistic tokenization patterns and documents any divergence class.
"""

import ctypes
import ctypes.util

import pytest

import fixture_tools as ft
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.pretokenize import compile_user_pattern, split_words_pattern

REG_EXTENDED = 1


class _Regmatch(ctypes.Structure):
    # glibc regoff_t is int (4 bytes)
    _fields_ = [("rm_so", ctypes.c_int), ("rm_eo", ctypes.c_int)]


class PosixSplitter:
    """regcomp/regexec-based splitter mirroring the reference's encode
    loop: search from a cursor, skip gaps, zero-length match advances
    the cursor by one (src/core.c:368-400)."""

    def __init__(self, pattern: str):
        libc = ctypes.CDLL(None)
        libc.regcomp.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ]
        libc.regcomp.restype = ctypes.c_int
        libc.regexec.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(_Regmatch), ctypes.c_int,
        ]
        libc.regexec.restype = ctypes.c_int
        self._libc = libc
        self._preg = ctypes.create_string_buffer(512)  # > sizeof(regex_t)
        rc = libc.regcomp(self._preg, pattern.encode(), REG_EXTENDED)
        if rc != 0:
            raise ValueError(f"regcomp failed: {rc}")

    def split(self, text: str) -> list[str]:
        data = text.encode("utf-8")
        out = []
        pos = 0
        m = _Regmatch()
        while pos < len(data):
            rc = self._libc.regexec(
                self._preg, data[pos:], 1, ctypes.byref(m), 0
            )
            if rc != 0:
                break
            if m.rm_so == m.rm_eo:
                pos += m.rm_so + 1
                continue
            out.append(data[pos + m.rm_so : pos + m.rm_eo].decode("utf-8"))
            pos += m.rm_eo
        return out


PATTERNS = [
    # the reference parser's documented equivalent regex
    # (tests/test_parser.c:10-12), ASCII subset
    "[ ]?[A-Za-z]+|[ ]?[0-9]+|[ ]?[^ \t\nA-Za-z0-9]+|[ ]+",
    "[A-Za-z]+|[0-9]+",
    "[[:alpha:]]+|[[:digit:]]+|[[:space:]]+",
    "[a-z]+ [a-z]+|[a-z]+",  # alternation where longest != first
]

TEXTS = [
    "The quick brown fox 42 jumps!  over 3.14 fences...",
    "a b c aa bb cc",
    "  leading and   trailing  ",
    "mixed123separators!!!and456more",
    "",
]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_pattern_split_matches_posix(pattern):
    posix = PosixSplitter(pattern)
    compiled = compile_user_pattern(pattern)
    for text in TEXTS:
        got = list(split_words_pattern(text, compiled))
        want = posix.split(text)
        assert got == want, (pattern, text, got, want)


def test_pattern_mode_device_engine():
    """Pattern-mode end-to-end on the device engine vs the oracle (the
    custom-regex configuration takes the non-native core path)."""
    from hutoken_tpu.engine import TpuTokenizer

    v, s = ft.write_byte_level_fixture()
    ctx = TokenizerContext.load(
        v, s, is_byte_encoder=True,
        pattern="[ ]?[A-Za-z]+|[ ]?[0-9]+|[ ]?[^ \t\nA-Za-z0-9]+|[ ]+",
    )
    engine = TpuTokenizer(ctx)
    docs = [
        "The quick brown fox 42 jumps! over 3.14 fences...",
        "  spaced   out  tokens  ",
        "numbers 123 456 789 mixed0with0words",
    ] * 3
    got = engine.encode_batch(docs)
    want = [oracle.encode(ctx, d) for d in docs]
    assert got == want
    assert engine.decode_batch(got) == docs
