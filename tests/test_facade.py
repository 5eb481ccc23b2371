"""Module-level facade parity tests (reference: hutoken.py + error paths in
tests/test_tokenizer.py:43-52, 137-149, 195-263)."""

import pytest

import fixture_tools as ft
import hutoken_tpu as hutoken


def _init_fixture(**kw):
    vocab_path, special_path = ft.write_byte_level_fixture()
    hutoken.initialize(vocab_path, special_path, is_byte_encoder=True, **kw)


def test_encode_raises_error():
    with pytest.raises(
        RuntimeError,
        match="Vocabulary is not initialized for encoding. "
        "Call 'initialize_encode' function first.",
    ):
        hutoken.encode("szia")


def test_decode_raises_error():
    with pytest.raises(
        RuntimeError,
        match="Vocabulary is not initialized for decoding. "
        "Call 'initialize_decode' function first.",
    ):
        hutoken.decode([1, 2, 3])


def test_initialize_invalid_format(tmp_path):
    bad = tmp_path / "invalid-vocab.txt"
    bad.write_text("invalid_line_format\n")
    special = tmp_path / "s.txt"
    special.write_text("32 == X\n")
    with pytest.raises(ValueError, match="Invalid format in vocab file."):
        hutoken.initialize(str(bad), str(special))


def test_initialize_missing_special(tmp_path):
    vocab_path, _ = ft.write_byte_level_fixture()
    with pytest.raises(ValueError, match="does not exist"):
        hutoken.initialize(vocab_path, str(tmp_path / "nope.txt"))


def test_decode_invalid_tokens():
    _init_fixture(backend="host")
    with pytest.raises(
        ValueError, match="Element must be non-negative and less than vocab size."
    ):
        hutoken.decode([999999, -1, 50258])


def test_encode_decode_roundtrip():
    _init_fixture(backend="host")
    text = "Egy szűk utcában öt gyors róka szaladt át."
    assert hutoken.decode(hutoken.encode(text)) == text


def test_encode_matches_tiktoken():
    _init_fixture(backend="host")
    enc = ft.tiktoken_encoding()
    for text in ["gyors barna róka", " The quick brown fox", "1234 !?"]:
        assert hutoken.encode(text) == enc.encode(text)


def test_batch_encode_matches_single():
    _init_fixture(backend="host")
    batch = ["What I cannot", " create, I do", " not understand."]
    out = hutoken.batch_encode(batch, num_threads=3)
    assert out == [hutoken.encode(t) for t in batch]


def test_batch_concat_equals_full_document():
    # reference: tests/test_tokenizer.py:211-217
    _init_fixture(backend="host")
    sentence = "How can the net amount of entropy of the universe be massively decreased?"
    batch = [
        "How can the net",
        " amount of entropy of",
        " the universe be massively decreased?",
    ]
    tokens = sum(hutoken.batch_encode(batch, num_threads=3), [])
    assert hutoken.decode(tokens) == sentence


def test_batch_decode_roundtrip():
    _init_fixture(backend="host")
    batch = ["What I cannot", " create, I do", " not understand."]
    assert hutoken.batch_decode(hutoken.batch_encode(batch, num_threads=3), 3) == batch
    assert hutoken.batch_decode(hutoken.batch_encode(batch, num_threads=1), 1) == batch
    assert hutoken.batch_decode(hutoken.batch_encode(batch, num_threads=8), 8) == batch


def test_batch_decode_empty_raises():
    # reference: src/lib.c:977-980 ("No tokens provided.")
    _init_fixture(backend="host")
    with pytest.raises(RuntimeError, match="No tokens provided."):
        hutoken.batch_decode([])


def test_hf_branch_raises_valueerror_offline():
    # no network: the HF import path must fail like the reference facade
    with pytest.raises(ValueError, match="Could not download Hugging Face tokenizer"):
        hutoken.initialize("openai-community/gpt2")


def test_train_arg_validation(tmp_path):
    with pytest.raises(
        RuntimeError, match="vocab_size must be at least 256 to encode all bytes."
    ):
        hutoken.bpe_train("abc", 100, "v.txt")
    with pytest.raises(
        RuntimeError, match="vocab_file_name file extension must be .txt."
    ):
        hutoken.bbpe_train("abc", 300, "vocab.bin")


def test_foma_unavailable_raises():
    with pytest.raises(RuntimeError, match="Foma support is not installed"):
        hutoken.initialize_foma()


def test_initialize_without_special_file():
    # README-documented single-arg usage (reference README.md:155-158)
    vocab_path, _ = ft.write_byte_level_fixture()
    hutoken.initialize(vocab_path, backend="host")
    ids = hutoken.encode("the")
    assert ids and all(i >= 0 for i in ids)
    assert hutoken.decode(ids) == "the"


def test_encode_embedded_null_raises():
    # reference: PyArg_ParseTuple("s") rejects embedded nulls at the
    # binding boundary (src/lib.c:668-676), surfaced as the facade's
    # wrapped RuntimeError on every backend path
    _init_fixture(backend="host")
    with pytest.raises(RuntimeError, match="embedded null character"):
        hutoken.encode("a\x00b")
    with pytest.raises(RuntimeError, match="embedded null character"):
        hutoken.batch_encode(["ok", "a\x00b"])
