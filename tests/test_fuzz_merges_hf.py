"""Merges-path (explicit rank) fuzz vs Hugging Face tokenizers.

Random trained vocabs with their merge logs are loaded both as a
hutoken merges-path context and as an HF Rust BPE model; per-word token
ids must be identical.  (Word-level comparison isolates BPE-merge
semantics from pre-tokenizer differences.)
"""

import random

import pytest

from hutoken_tpu import oracle
from hutoken_tpu.bytemaps import gpt2_bytes_to_unicode
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.formats import MergeRules, Vocab
from hutoken_tpu.train.bbpe import bbpe_train_core


@pytest.mark.parametrize("seed", range(5))
def test_merges_path_fuzz_vs_hf(seed):
    tokenizers = pytest.importorskip("tokenizers")

    rng = random.Random(500 + seed)
    alphabet = "abcdefghijkláéíóú .,"
    words = [
        "".join(rng.choice(alphabet.replace(" ", "")) for _ in range(rng.randrange(1, 8)))
        for _ in range(40)
    ]
    corpus = " ".join(rng.choice(words) for _ in range(600))
    merge_log: list = []
    str2id = bbpe_train_core(
        corpus.encode("utf-8"), rng.randrange(300, 450), verbose=False,
        merge_log=merge_log,
    )

    b2u = gpt2_bytes_to_unicode()

    def spell(raw: bytes) -> str:
        return "".join(b2u[b] for b in raw)

    spelled2id = {}
    for tok, idx in str2id.items():
        spelled2id[spell(tok if tok else b"\x00").encode()] = idx
    vocab = Vocab(
        str2id=spelled2id,
        id2str={v: k for k, v in spelled2id.items()},
        size=max(spelled2id.values()) + 1,
    )

    # merges resolved to ids, rank = training order
    id_to_bytes = {i: bytes([i]) for i in range(256)}
    rules = {}
    hf_merges = []
    rank = 0
    for id1, id2, new in merge_log:
        left_b, right_b = id_to_bytes[id1], id_to_bytes[id2]
        id_to_bytes[new] = left_b + right_b
        rules[(id1, id2)] = (rank, new)
        hf_merges.append((spell(left_b), spell(right_b)))
        rank += 1
    from hutoken_tpu.bytemaps import gpt2_special_chars_table

    ctx = TokenizerContext(
        vocab=vocab,
        merges=MergeRules(rules=rules, num_rules=len(rules)),
        is_byte_encoder=True,
        special_chars={
            k: v.encode() for k, v in gpt2_special_chars_table().items()
        },
    )

    hf_vocab = {spell(tok if tok else b"\x00"): idx for tok, idx in str2id.items()}
    hf = tokenizers.Tokenizer(tokenizers.models.BPE(vocab=hf_vocab, merges=hf_merges))

    for _ in range(30):
        w = rng.choice(words)
        mine = oracle.encode_word(ctx, w.encode(), None)
        theirs = hf.encode(spell(w.encode())).ids
        assert mine == theirs, (w, mine, theirs)
