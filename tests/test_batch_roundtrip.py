"""Large-batch roundtrip (BASELINE config 2: batch_encode/batch_decode
roundtrip on a many-document corpus with special-char handling)."""

import random

import fixture_tools as ft
import hutoken_tpu as hutoken


def _docs(n: int) -> list[str]:
    rng = random.Random(4242)
    words = ft.CORPUS.split()
    docs = []
    for _ in range(n):
        k = rng.randrange(1, 40)
        t = " ".join(rng.choice(words) for _ in range(k))
        if rng.random() < 0.2:
            t = " " + t
        if rng.random() < 0.2:
            t = t + "\n"
        docs.append(t)
    return docs


def test_batch_roundtrip_2k_host():
    v, s = ft.write_byte_level_fixture()
    hutoken.initialize(v, s, is_byte_encoder=True, backend="host")
    docs = _docs(2000)
    toks = hutoken.batch_encode(docs, num_threads=8)
    assert hutoken.batch_decode(toks, num_threads=8) == docs


def test_batch_roundtrip_500_device():
    v, s = ft.write_byte_level_fixture()
    hutoken.initialize(v, s, is_byte_encoder=True, backend="device")
    docs = _docs(500)
    toks = hutoken.batch_encode(docs)
    assert hutoken.batch_decode(toks) == docs
