"""Build offline tokenizer fixtures for differential testing.

There is no network access in CI, so instead of downloading GPT-2 /
PULI-LlumiX vocabularies we *train* small byte-level vocabularies on a
fixed corpus and cross-check against independently implemented engines
constructed from the same tables:

* ``tiktoken.Encoding`` built from our ranks (a Rust BPE engine),
* ``tokenizers`` (HF Rust) ``models.BPE`` built from our vocab+merges.

This mirrors the reference's differential strategy
(reference: tests/test_tokenizer.py:55-103) with offline-constructible
oracles.
"""

from __future__ import annotations

import os

from hutoken_tpu.bytemaps import gpt2_bytes_to_unicode, gpt2_special_chars_table
from hutoken_tpu.formats import write_special_chars_file
from hutoken_tpu.train.bbpe import bbpe_train_core

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

_BASE_TEXT = (
    "A gyors barna róka átugrik a lusta kutya fölött. "
    "Az őszi szél végigsöpört a Duna-parton, és a fák levelei "
    "aranyszínűre váltak. Öt szűk ütközőpont maradt a hídon. "
    "The quick brown fox jumps over the lazy dog. "
    "Programming languages map bytes to tokens with byte pair encoding. "
    "Számítógépes nyelvészet: a tokenizálás a szöveg feldolgozásának "
    "első lépése. Különböző írásrendszerek — például a kínai 中文 vagy "
    "az emoji 🙂 — bájtsorozatokként jelennek meg. "
    "Egy, kettő, három, négy, öt, hat, hét, nyolc, kilenc, tíz. "
    "1234567890 42 2026 3.14159 0xFF. "
    "   multiple   spaces\tand\nnewlines\r\nare whitespace too. "
    "Árvíztűrő tükörfúrógép. ÁRVÍZTŰRŐ TÜKÖRFÚRÓGÉP. "
)


def _make_corpus() -> str:
    """Seeded word-shuffled expansions of the base text, so pair counts
    decay naturally and the trained vocab has word-fragment tokens instead
    of whole repeated sentences."""
    import random

    rng = random.Random(42)
    words = _BASE_TEXT.split(" ")
    parts = [_BASE_TEXT]
    for _ in range(12):
        sample = [rng.choice(words) for _ in range(len(words))]
        parts.append(" ".join(sample))
    return " ".join(parts)


# A fixed multilingual training corpus (own text; Hungarian-heavy to
# exercise the accented alpha class).
CORPUS = _make_corpus()

VOCAB_SIZE = 768


def remapped_spelling(token_bytes: bytes) -> str:
    """GPT-2 byte-level spelling of raw token bytes."""
    b2u = gpt2_bytes_to_unicode()
    return "".join(b2u[b] for b in token_bytes)


def build_ranks(
    merge_log: list | None = None,
) -> dict[bytes, int]:
    """Train the fixture vocab; returns raw-bytes -> id (rank-ordered)."""
    str2id = bbpe_train_core(
        CORPUS.encode("utf-8"), VOCAB_SIZE, verbose=False, merge_log=merge_log
    )
    ranks = {}
    for token, idx in str2id.items():
        ranks[token if token else b"\x00"] = idx
    return ranks


def write_merges_fixture() -> str:
    """Write a merges.txt (remapped spellings, one rule per line) matching
    the byte-level fixture vocab's creation order."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    merges_path = os.path.join(FIXTURE_DIR, "bytelevel-merges.txt")
    if os.path.exists(merges_path):
        return merges_path
    merge_log: list = []
    build_ranks(merge_log=merge_log)
    # reconstruct id -> bytes in creation order (robust to later overwrites)
    id_to_bytes = {i: bytes([i]) for i in range(256)}
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: fixture\n")
        for id1, id2, new in merge_log:
            left_b, right_b = id_to_bytes[id1], id_to_bytes[id2]
            id_to_bytes[new] = left_b + right_b
            f.write(f"{remapped_spelling(left_b)} {remapped_spelling(right_b)}\n")
    return merges_path


def write_byte_level_fixture() -> tuple[str, str]:
    """Write gpt2-style (vocab, special_chars) fixture files; returns paths."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    vocab_path = os.path.join(FIXTURE_DIR, "bytelevel-vocab.txt")
    special_path = os.path.join(FIXTURE_DIR, "bytelevel-vocab_special_chars.txt")
    if os.path.exists(vocab_path) and os.path.exists(special_path):
        return vocab_path, special_path

    ranks = build_ranks()
    with open(vocab_path, "w", encoding="utf-8") as f:
        for token, idx in sorted(ranks.items(), key=lambda kv: kv[1]):
            spelled = remapped_spelling(token).encode("utf-8")
            hex_token = "".join(f"0x{b:02X}" for b in spelled)
            f.write(f"{hex_token} == {idx}\n")
    write_special_chars_file(special_path, gpt2_special_chars_table())
    return vocab_path, special_path


def write_char_mode_fixture() -> tuple[str, str]:
    """A SentencePiece-style char-mode fixture: '▁' space marker, newline
    mapped to the literal '<0x0A>' byte-fallback spelling, vocab trained
    on the remapped corpus (exercises prefix gluing, <0xNN> seeding and
    multi-char replacement decode)."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    vocab_path = os.path.join(FIXTURE_DIR, "charmode-vocab.txt")
    special_path = os.path.join(FIXTURE_DIR, "charmode-vocab_special_chars.txt")
    if os.path.exists(vocab_path) and os.path.exists(special_path):
        return vocab_path, special_path

    remapped = CORPUS.replace("\r", "<0x0D>").replace("\n", "<0x0A>").replace(
        "\t", "<0x09>"
    ).replace(" ", "▁")
    str2id = bbpe_train_core(remapped.encode("utf-8"), 900, verbose=False)
    # ensure every single char of the remapped corpus plus the fallback
    # literals are present (they are, via byte seeds + training), and give
    # multi-byte chars whole-char tokens by adding them explicitly
    extra = sorted({c for c in remapped if ord(c) > 127})
    next_id = max(str2id.values()) + 1
    for ch in extra + ["<0x0A>", "<0x0D>", "<0x09>"]:
        b = ch.encode("utf-8")
        if b not in str2id:
            str2id[b] = next_id
            next_id += 1
    with open(vocab_path, "w", encoding="utf-8") as f:
        for token, idx in sorted(str2id.items(), key=lambda kv: (kv[1], kv[0])):
            if not token:
                f.write(f"0x00 == {idx}\n")
                continue
            hex_token = "".join(f"0x{b:02X}" for b in token)
            f.write(f"{hex_token} == {idx}\n")
    write_special_chars_file(
        special_path, {32: "▁", 10: "<0x0A>", 13: "<0x0D>", 9: "<0x09>"}
    )
    return vocab_path, special_path


def _big_vocab_tokens(target_size: int = 50257) -> dict[bytes, int]:
    """Deterministic GPT-2-scale token set: 256 byte seeds plus per-word
    prefix chains over a large word-form list (every multi-char token
    splits into in-vocab halves, like a trained BPE vocab; ids are
    creation-ordered)."""
    import random
    import string as _string

    rng = random.Random(7)
    base_words = sorted(set(_BASE_TEXT.split()))
    forms: list[str] = list(base_words)
    while len(forms) < 14000:
        w = rng.choice(base_words)
        forms.append(
            w
            + rng.choice(_string.ascii_lowercase)
            + rng.choice(_string.ascii_lowercase)
        )
    tokens: dict[bytes, int] = {}
    for i in range(256):
        tokens[bytes([i]) if i else b"\x00"] = i
    next_id = 256
    # breadth-first over prefix lengths mimics merge creation order
    for ln in range(2, 24):
        for w in forms:
            wb = (" " + w).encode("utf-8")
            for cand in (wb[:ln], wb[1 : 1 + ln]):
                if len(cand) == ln and cand not in tokens:
                    tokens[cand] = next_id
                    next_id += 1
                    if next_id >= target_size:
                        break
            if next_id >= target_size:
                break
        if next_id >= target_size:
            break
    return tokens


def write_big_vocab_fixture(target_size: int = 50257) -> tuple[str, str]:
    """A GPT-2-scale byte-level vocab (≈50k tokens) for big-table
    benchmarking (string path: pair rank = concat's vocab id)."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    vocab_path = os.path.join(FIXTURE_DIR, "bigvocab-vocab.txt")
    special_path = os.path.join(FIXTURE_DIR, "bigvocab-vocab_special_chars.txt")
    if os.path.exists(vocab_path) and os.path.exists(special_path):
        return vocab_path, special_path

    tokens = _big_vocab_tokens(target_size)
    b2u = gpt2_bytes_to_unicode()
    with open(vocab_path, "w", encoding="utf-8") as f:
        for tok, idx in sorted(tokens.items(), key=lambda kv: kv[1]):
            spelled = "".join(b2u[b] for b in tok).encode("utf-8")
            hex_token = "".join(f"0x{b:02X}" for b in spelled)
            f.write(f"{hex_token} == {idx}\n")
    write_special_chars_file(special_path, gpt2_special_chars_table())
    return vocab_path, special_path


def write_big_merges_fixture(target_size: int = 50257) -> str:
    """merges.txt matching the big vocab: every multi-byte token t whose
    parent t[:-1] is in the vocab gets rule (t[:-1], t[-1:]) at a rank
    equal to its creation order — rank order == merged-id order and one
    rule per output token, like a really-trained GPT-2 merges file
    (reference format: src/lib.c:573-663)."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    merges_path = os.path.join(FIXTURE_DIR, "bigvocab-merges.txt")
    if os.path.exists(merges_path):
        return merges_path
    # derive from the committed vocab file so the rules always match it
    vocab_path, _ = write_big_vocab_fixture(target_size)
    spelled_by_id: dict[int, str] = {}
    with open(vocab_path, "r", encoding="utf-8") as f:
        for line in f:
            hexes, _, idx = line.rstrip("\n").partition(" == ")
            raw = bytes(
                int(hexes[i + 2 : i + 4], 16) for i in range(0, len(hexes), 4)
            )
            spelled_by_id[int(idx)] = raw.decode("utf-8")
    spellings = set(spelled_by_id.values())
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: fixture-big\n")
        for idx in sorted(spelled_by_id):
            sp = spelled_by_id[idx]
            if idx < 256 or len(sp) < 2 or sp[:-1] not in spellings:
                continue
            f.write(f"{sp[:-1]} {sp[-1]}\n")
    return merges_path


def tiktoken_encoding():
    """tiktoken.Encoding over the fixture ranks with a pattern equivalent
    to the reference parser (documented: tests/test_parser.c:10-12)."""
    import tiktoken

    from hutoken_tpu.pretokenize import HUNGARIAN_ACCENTS

    alpha = "A-Za-z" + HUNGARIAN_ACCENTS
    ws = " \\t\\n\\x0B\\x0C\\r"
    pat = (
        f" ?[{alpha}]+"
        f"| ?[0-9]+"
        f"| ?[^{ws}0-9{alpha}]+"
        f"| +"
        f"|(?s:.)"
    )
    return tiktoken.Encoding(
        name="hutoken-fixture",
        pat_str=pat,
        mergeable_ranks=build_ranks(),
        special_tokens={},
    )
