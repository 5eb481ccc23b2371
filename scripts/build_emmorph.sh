#!/usr/bin/env bash
# Build the Hungarian emMorph analyzer FST used by initialize_foma().
#
# Produces bin/hu.foma.bin: the case-normalizing emMorph analyzer
# (behavioral spec: reference scripts/emmorph.sh — lexicon generation,
# foma compile with flag elimination, hfst case-normalizer inversion,
# composition, install).  Requires the nytud/emmorph sources plus the
# `foma` and `hfst` toolchains on PATH.
#
# Usage: scripts/build_emmorph.sh [path-to-emmorph-checkout]
set -euo pipefail

EMMORPH_DIR="${1:-emmorph}"

for tool in foma hfst-xfst hfst-invert hfst-fst2fst; do
    if ! command -v "$tool" >/dev/null 2>&1; then
        echo "missing dependency: $tool (install foma + hfst)" >&2
        exit 1
    fi
done
if [ ! -d "$EMMORPH_DIR/mak" ]; then
    echo "emmorph sources not found at '$EMMORPH_DIR'" >&2
    echo "clone them first: git clone https://github.com/nytud/emmorph" >&2
    exit 1
fi

REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"

echo "[1/3] generating lexicon files (emmorph/mak helpers)"
(
    cd "$EMMORPH_DIR/mak"
    bash mkX.sh xlx
    bash mkxlxrmseg.sh
    bash xlx2lglexc.sh huX
)

echo "[2/3] compiling + composing the transducers"
(
    cd "$EMMORPH_DIR/lexc"

    # case-sensitive analyzer from the generated lexc source
    foma -e "read lexc huXlg.lexc" \
         -e "eliminate flag St" \
         -e "minimize net" \
         -e "save stack hu_case_sensitive.foma.bin" \
         -e "exit"

    # case normalizer: compile, invert (surface->normalized), export in
    # foma's binary format so it can be composed below
    hfst-xfst -F casenormhuX.xfs
    hfst-invert casenormhu.hfst -o casenormhu_inv.hfst
    hfst-fst2fst -F -b -i casenormhu_inv.hfst -o casenormhu_inv.foma.bin

    # analyzer ∘ normalizer = the final lookup FST
    foma -e "load stack casenormhu_inv.foma.bin" \
         -e "load stack hu_case_sensitive.foma.bin" \
         -e "compose" \
         -e "save stack hu.foma.bin" \
         -e "exit"
)

echo "[3/3] installing bin/hu.foma.bin"
mkdir -p "$REPO_ROOT/bin"
mv "$EMMORPH_DIR/lexc/hu.foma.bin" "$REPO_ROOT/bin/hu.foma.bin"
echo "done: $REPO_ROOT/bin/hu.foma.bin"
