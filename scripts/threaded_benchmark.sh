#!/usr/bin/env bash
# Thread/size sweep for the native host engine (parity with the
# reference's threaded_benchmark.sh matrix: threads x corpus sizes).
set -euo pipefail
cd "$(dirname "$0")/.."
for MB in 1 4 8; do
  for THREADS in 1 2 4 8 16; do
    python - "$MB" "$THREADS" <<'PY'
import sys, time
sys.path.insert(0, "."); sys.path.insert(0, "tests")
mb, threads = float(sys.argv[1]), int(sys.argv[2])
import fixture_tools as ft
from bench import build_corpus
from hutoken_tpu.context import TokenizerContext
from hutoken_tpu.native import NativeEngine
v, s = ft.write_byte_level_fixture()
ctx = TokenizerContext.load(v, s, is_byte_encoder=True)
ne = NativeEngine(ctx)
docs = build_corpus(mb)
total = sum(len(d.encode()) for d in docs)
ne.encode_batch(docs[:4], threads)
t0 = time.perf_counter(); ne.encode_batch(docs, threads); dt = time.perf_counter() - t0
print(f"{mb:>4} MB  {threads:>2} threads  {total/dt/1e6:7.1f} MB/s")
PY
  done
done
