"""Facade with the device backend (runs on the forced-CPU JAX platform;
the same code path drives real TPU chips)."""

import fixture_tools as ft
import hutoken_tpu as hutoken


def _init(**kw):
    v, s = ft.write_byte_level_fixture()
    hutoken.initialize(v, s, is_byte_encoder=True, backend="device", **kw)


def test_device_backend_roundtrip():
    _init()
    text = "Egy szűk utcában öt gyors róka szaladt át."
    ids = hutoken.encode(text)
    assert hutoken.decode(ids) == text


def test_device_backend_matches_host():
    _init()
    batch = [
        "What I cannot",
        " create, I do",
        " not understand.",
        "   spaces\tand\nnewlines",
        "emoji 🙂 test",
    ]
    dev = hutoken.batch_encode(batch)
    hutoken.initialize(
        *ft.write_byte_level_fixture(), is_byte_encoder=True, backend="host"
    )
    host = hutoken.batch_encode(batch)
    assert dev == host


def test_device_backend_decode_batch():
    _init()
    batch = ["the quick brown fox", " jumps over", " the lazy dog"]
    toks = hutoken.batch_encode(batch)
    assert hutoken.batch_decode(toks) == batch
