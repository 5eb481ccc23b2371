"""Hugging Face tokenizer import -> hutoken-format files.

Reproduces the reference facade's HF branch (reference: hutoken.py:44-120):
download via ``AutoTokenizer``, write the vocab in hex format to
``~/.cache/hutoken/<org>/<model>/<model>.txt``, derive the prefix token by
tokenizing "hu", emit a ``*_special_chars.txt`` from the tokenizer's
``byte_encoder`` (or per-char tokenization), locate ``merges.txt``, and
auto-enable byte-encoder mode.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

from .bytemaps import SPECIAL_CHAR_BYTES


def import_hf_tokenizer(
    model_or_path: str,
) -> tuple[str, str, Optional[str], int, Optional[str]]:
    """Returns (vocab_file, special_chars_file, prefix, is_byte_encoder,
    merges_file_path)."""
    try:
        from transformers import AutoTokenizer
    except ImportError as e:  # pragma: no cover
        raise ValueError(
            f"Could not download Hugging Face tokenizer '{model_or_path}': {e}"
        )

    try:
        hf_tokenizer = AutoTokenizer.from_pretrained(model_or_path)
    except OSError as e:
        raise ValueError(
            f"Could not download Hugging Face tokenizer '{model_or_path}': {e}"
        )

    if not hasattr(hf_tokenizer, "vocab"):
        raise ValueError("Could not extract vocab from Hugging Face tokenizer.")

    cache_dir = os.getenv(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    org_name, model_name = model_or_path.split("/")
    vocab_dir = os.path.join(cache_dir, f"hutoken/{org_name}/{model_name}")
    os.makedirs(vocab_dir, exist_ok=True)
    vocab_file = os.path.join(vocab_dir, f"{model_name}.txt")

    hf_tokenizer.save_pretrained(vocab_dir)

    with open(vocab_file, "w", encoding="utf-8") as f:
        for token, idx in sorted(hf_tokenizer.vocab.items(), key=lambda kv: kv[1]):
            try:
                hex_token = "".join(f"0x{b:02X}" for b in token.encode("utf-8"))
                f.write(f"{hex_token} == {idx}\n")
            except Exception as e:  # pragma: no cover
                sys.stderr.write(f"Failed to process token '{token}': {e}")

    hu_tokenized = hf_tokenizer.tokenize("hu")[0]
    prefix = hu_tokenized[0] if hu_tokenized != "hu" else None

    hf_tokenizer = AutoTokenizer.from_pretrained(
        model_or_path,
        use_fast=False,
        add_prefix_space=False if prefix is not None else None,
    )
    special_chars_file = os.path.join(vocab_dir, f"{model_name}_special_chars.txt")
    with open(special_chars_file, "w", encoding="utf-8") as f:
        for char in SPECIAL_CHAR_BYTES:
            if hasattr(hf_tokenizer, "byte_encoder"):
                value = hf_tokenizer.byte_encoder[char]
            else:
                value = "".join(hf_tokenizer.tokenize(chr(char)))
            if value == char:
                continue
            f.write(f"{char} == {value}\n")

    merges_file_path: Optional[str] = os.path.join(vocab_dir, "merges.txt")
    if not os.path.isfile(merges_file_path):
        merges_file_path = None
        sys.stderr.write(
            f"No merges.txt found for '{model_or_path}'. "
            "Continuing without merge rules.\n"
        )

    is_byte_encoder = 0
    if hasattr(hf_tokenizer, "byte_encoder") and hf_tokenizer.byte_encoder is not None:
        is_byte_encoder = 1

    return vocab_file, special_chars_file, prefix, is_byte_encoder, merges_file_path
