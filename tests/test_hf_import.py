"""End-to-end Hugging Face import flow, offline.

Builds a local GPT-2-style tokenizer directory (vocab.json + merges.txt)
from the fixture tables and drives ``hutoken.initialize("<org>/<model>")``
through the full HF branch (reference: hutoken.py:44-120): AutoTokenizer
load, hex vocab export, prefix derivation, byte_encoder special-chars
file, merges.txt discovery, byte-encoder auto-detection.
"""

import json
import os

import pytest

import fixture_tools as ft
import hutoken_tpu as hutoken
from hutoken_tpu import oracle
from hutoken_tpu.context import TokenizerContext


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    pytest.importorskip("transformers")
    base = tmp_path_factory.mktemp("hf")
    model_dir = base / "testorg" / "gpt2like"
    os.makedirs(model_dir, exist_ok=True)

    vocab = {
        ft.remapped_spelling(tok): idx for tok, idx in ft.build_ranks().items()
    }
    with open(model_dir / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    merges_path = ft.write_merges_fixture()
    with open(merges_path, encoding="utf-8") as src, open(
        model_dir / "merges.txt", "w", encoding="utf-8"
    ) as dst:
        dst.write(src.read())
    with open(model_dir / "tokenizer_config.json", "w", encoding="utf-8") as f:
        json.dump({"tokenizer_class": "GPT2Tokenizer", "model_max_length": 1024}, f)
    return base, "testorg/gpt2like"


def test_hf_import_full_flow(hf_model_dir, tmp_path, monkeypatch):
    base, rel_id = hf_model_dir
    monkeypatch.chdir(base)  # "<org>/<model>" resolves as a local dir
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))

    hutoken.initialize(rel_id, backend="host")

    # cache layout parity (reference: hutoken.py:55-73)
    vocab_file = tmp_path / "cache" / "hutoken" / "testorg" / "gpt2like" / "gpt2like.txt"
    assert vocab_file.exists()
    special_file = (
        tmp_path / "cache" / "hutoken" / "testorg" / "gpt2like"
        / "gpt2like_special_chars.txt"
    )
    assert special_file.exists()

    # the fixture vocab has no "hu" token, so the reference's prefix
    # derivation (first char of tokenize("hu")[0], hutoken.py:82-83)
    # yields "h" — faithfully reproduced here
    assert hutoken._ctx.prefix == b"h"
    assert hutoken._ctx.is_byte_encoder
    assert hutoken._ctx.merges is not None  # merges.txt was discovered

    # conformance: module state == context independently loaded from the
    # exported files with the same derived options
    ctx = TokenizerContext.load(
        str(vocab_file),
        str(special_file),
        prefix="h",
        is_byte_encoder=True,
        merges_file_path=str(vocab_file.parent / "merges.txt"),
    )
    for text in [
        "A gyors barna róka átugrik a lusta kutya fölött.",
        " The quick brown fox",
        "Öt szűk ütközőpont: 0xFF!",
    ]:
        got = hutoken.encode(text)
        assert got == oracle.encode(ctx, text)
