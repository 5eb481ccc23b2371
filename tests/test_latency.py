"""Latency smoke tests (reference: tests/test_tokenizer.py:107-130 asserts
mean single-document encode and encode+decode round-trips under 1 ms)."""

import timeit

import pytest

import fixture_tools as ft
import hutoken_tpu as hutoken

SENTENCE = "How can the net amount of entropy of the universe be massively decreased?"


@pytest.fixture()
def host_init():
    v, s = ft.write_byte_level_fixture()
    hutoken.initialize(v, s, is_byte_encoder=True, backend="host")


@pytest.mark.benchmark
def test_encode_speed(host_init):
    number = 2000
    execution_time = timeit.timeit(lambda: hutoken.encode(SENTENCE), number=number)
    mean = execution_time / number
    print(f"mean encode latency: {mean * 1e3:.3f} ms")
    assert mean < 1e-3, f"Average execution for function took too long: {mean}."


@pytest.mark.benchmark
def test_decode_speed(host_init):
    number = 2000
    execution_time = timeit.timeit(
        lambda: hutoken.decode(hutoken.encode(SENTENCE)), number=number
    )
    mean = execution_time / number
    print(f"mean roundtrip latency: {mean * 1e3:.3f} ms")
    assert mean < 1e-3, f"Average execution for function took too long: {mean}."
