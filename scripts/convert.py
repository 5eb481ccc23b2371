"""Convert a Hugging Face vocab.json into the hutoken hex vocab format.

Capability parity with the reference's scripts/convert.py.

    python scripts/convert.py vocab.json vocab.txt
"""

from __future__ import annotations

import json
import sys


def convert(src: str, dst: str) -> None:
    with open(src, encoding="utf-8") as f:
        vocab = json.load(f)
    with open(dst, "w", encoding="utf-8") as f:
        for token, idx in sorted(vocab.items(), key=lambda kv: kv[1]):
            hex_token = "".join(f"0x{b:02X}" for b in token.encode("utf-8"))
            f.write(f"{hex_token} == {idx}\n")
    print(f"wrote {len(vocab)} entries to {dst}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print("usage: python scripts/convert.py <vocab.json> <out.txt>")
        sys.exit(1)
    convert(sys.argv[1], sys.argv[2])
