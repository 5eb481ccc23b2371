"""TpuTokenizer: the batched device-backed tokenization engine.

Pipeline for ``encode_batch`` (replaces the reference's pthread pool,
src/taskqueue.c + src/lib.c:722-874, with batch vectorization over a
four-thread host pipeline):

1. MAIN thread: per-group corpus prep (utf-8 encode + join) one group
   ahead of the producer,
2. PRODUCER thread: SIMD split + persistent word->gid interning
   (native/: AVX-512 classifier, packed-key maps); only first-seen
   words continue,
3. MAIN thread: resolve new words (vectorized numpy), pack length-sorted
   fixed-row blocks, launch the greedy-merge fixed point per block
   (ops/merge.py — one-hot MXU probes for small tables, 16-bit packed
   gather probes at GPT-2 scale, R-matrix for 100k+ vocabs), sharded
   over a ``mesh`` when one is given,
4. DRAINER thread: device_get finished blocks while later groups split,
   while a TAIL worker thread encodes the sub-block remainder on the
   exact native path (overlapped with the drain; results integrate
   through private buffers after extract),
5. MAIN thread: native span-gather assembly of per-document streams;
   a REAPER thread releases device buffers off the hot path.

Words that cannot take the device fast path fall back to the exact host
oracle per word, preserving byte-for-byte parity:

* seed elements missing from the vocab (string path can still merge
  them by spelling — src/core.c:700-722 works on strings),
* words longer than the largest bucket,
* glued-prefix first words (one per document, cached),
* sub-block remainders (native scalar engine — cheaper than a padded
  device round trip).

``decode_batch`` runs the threaded native C++ decoder (or the numpy
flat path / device decode kernel — see decode_arrays and
decode_batch_device).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from . import oracle
from .context import TokenizerContext
from .pretokenize import encode_remap, split_words, split_words_pattern
from .tables import EncoderTables, build_encoder_tables
from .utils.logging import log_debug

# One primary bucket (covers ~99.9% of words) plus a tail bucket that is
# only compiled if long words actually occur — remote/tunneled XLA
# compiles cost seconds per shape, so the shape set is minimal.  Rounds
# track the longest word in a chunk; inactive lanes are cheap.
BUCKETS = (32, 128)
MAX_DEVICE_LEN = BUCKETS[-1]
# rows per device launch: fixed small blocks keep the compiled-shape set
# at ONE shape per bucket while (a) kernel time scales with real work
# instead of a huge padded block and (b) length-sorted homogeneous
# blocks exit the merge fixed point early.  Launches are asynchronous
# and synced once, so per-dispatch latency (~25 ms tunneled) amortizes.
ROW_BLOCKS = {32: 4096, 128: 1024}
# with the fused Pallas kernel active, launches amortize the tunneled
# dispatch floor much better at larger blocks (the kernel streams grid
# tiles, so block size costs no VMEM)
ROW_BLOCKS_PALLAS = {32: 16384, 128: 1024}
# documents are processed in byte-bounded groups; the producer thread
# splits group g+1 while the main thread resolves/launches group g and
# the drainer downloads finished blocks — smaller groups = finer overlap
try:
    GROUP_BYTES = int(os.environ.get("HUTOKEN_TPU_GROUP_BYTES", 2 << 20))
except ValueError:
    GROUP_BYTES = 2 << 20
if GROUP_BYTES < (64 << 10):  # degenerate groups kill pipeline overlap
    GROUP_BYTES = 64 << 10

# raw TPU-resident path (ops/split.py): selected for big cache-cold
# batches, where the legacy pipeline's per-byte host stages (split,
# resolve, pack, extract, assemble) bound throughput while the device
# idles.  The probe measures the corpus's intrinsic unique-byte ratio on
# a small sample; repetitive corpora stay on the cache-driven pipeline.
try:
    RAW_MIN_BYTES = int(os.environ.get("HUTOKEN_TPU_RAW_MIN", 768 << 10))
except ValueError:
    RAW_MIN_BYTES = 768 << 10
try:
    RAW_THRESH = float(os.environ.get("HUTOKEN_TPU_RAW_THRESH", 0.5))
except ValueError:
    RAW_THRESH = 0.5


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes (first jit of each block
    shape costs seconds; the cache makes it once per machine)."""
    import os

    import jax

    try:
        cache_dir = os.environ.get(
            "HUTOKEN_TPU_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "hutoken_tpu", "xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # pragma: no cover - best effort
        log_debug("compilation cache unavailable: %s", e)


class TpuTokenizer:
    """Object-style tokenizer bound to one TokenizerContext.

    The module facade drives a global instance of this; it can also be
    used directly for multi-tokenizer or sharded workloads.
    """

    def __init__(
        self, ctx: TokenizerContext, *, interpret: bool = False, mesh=None,
        prefer_device_decode: bool = False,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh``; when given, every
        device block launch is sharded over the mesh's first axis (rows
        of the padded word block = the embarrassingly parallel axis) and
        all tables are replicated per device — the multi-chip form of
        the reference's pthread pool (src/taskqueue.c)."""
        import jax  # deferred so host-only paths never require a device
        import jax.numpy as jnp

        from .utils.mem import tune_allocator

        tune_allocator()
        _enable_compilation_cache()
        self._jax = jax
        self._jnp = jnp
        self._mesh = mesh
        # facade backend="device" flows here so decode routes to the
        # device kernel without the HUTOKEN_TPU_DECODE env override
        # (reference honors the caller's engine choice: src/lib.c:954-1094)
        self._prefer_device_decode = prefer_device_decode
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            self._sh_repl = NamedSharding(mesh, PartitionSpec())
            self._sh_rows = NamedSharding(mesh, PartitionSpec(axis, None))
            self._sh_vec = NamedSharding(mesh, PartitionSpec(axis))

        def _table(x):
            arr = jnp.asarray(x)
            return (
                jax.device_put(arr, self._sh_repl) if mesh is not None else arr
            )

        self._put_table = _table
        self.ctx = ctx
        self.tables: EncoderTables = build_encoder_tables(ctx)
        pt = self.tables.pair_table
        import os as _os

        from .ops.merge import MODE_ONEHOT, MODE_PACKED, MODE_PROBE

        force_rmatrix = _os.environ.get("HUTOKEN_TPU_FORCE_RMATRIX") == "1"
        # the one-hot MXU probe relies on XLA fusing the [N, C] one_hot
        # into the contraction; CPU XLA materializes it, so gate on a
        # real accelerator backend.  Beyond the one-hot capacity gate,
        # GPT-2-scale tables with 16-bit-packable ids take the packed
        # gather probe (measured 7-15x faster per block than the
        # R-matrix resolve at 500k slots); the R-matrix serves big
        # vocabs whose ids overflow 16 bits (e.g. 100k+ vocabularies).
        if pt.onehot_ok and jax.default_backend() != "cpu":
            mode = MODE_ONEHOT
        elif pt.packed_ok and not force_rmatrix:
            mode = MODE_PACKED
        else:
            mode = MODE_PROBE
        if mode == MODE_PACKED:
            # rebuild at a lower load factor: probe_len <= 2 halves the
            # per-lookup gather count for one extra doubling of an
            # int32-pair table (8 MB at 1M slots — HBM noise)
            from .tables import build_pair_table

            pt2 = build_pair_table(self.tables.pairs, max_probe_len=2)
            pkey, pval = pt2.packed_arrays()
            zero = np.zeros(1, dtype=np.int32)
            self.table_arrays = (
                _table(pkey),
                _table(pval),
                _table(zero),
                _table(zero),
                pt2.probe_len,
                pt2.capacity - 1,
                MODE_PACKED,
            )
        else:
            self.table_arrays = (
                _table(pt.left),
                _table(pt.right),
                _table(pt.rank),
                _table(pt.merged),
                pt.probe_len,
                pt.capacity - 1,
                mode,
            )
        # big-vocab fallbacks: the R-matrix kernel (ops/rmatrix.py)
        # replaces per-round table probes with per-span resolution
        self._substr_arrays = None
        self._substr_merges = False
        self._substr_dcap = 0
        if self.tables.is_byte_encoder:
            if force_rmatrix or mode == MODE_PROBE:
                if self.tables.uses_merges:
                    from .tables import build_substr_table_merges

                    stm = build_substr_table_merges(ctx)
                    if stm is not None:
                        self._substr_arrays = (
                            _table(stm.sh1),
                            _table(stm.sh2),
                            _table(stm.stid),
                            _table(stm.scut),
                            _table(stm.b_ehash1),
                            _table(stm.b_pmul1),
                            _table(stm.b_ehash2),
                            _table(stm.b_pmul2),
                            stm.probe_len,
                        )
                        self._substr_dcap = stm.d_cap
                        self._substr_merges = True
                else:
                    from .tables import build_substr_table

                    st = build_substr_table(ctx)
                    if st is not None:
                        self._substr_arrays = (
                            _table(st.sh1),
                            _table(st.sh2),
                            _table(st.stid),
                            _table(st.b_ehash1),
                            _table(st.b_pmul1),
                            _table(st.b_ehash2),
                            _table(st.b_pmul2),
                            st.probe_len,
                        )
                        self._substr_dcap = st.d_cap
        # per-word tokenization cache (exactness-preserving; the reference
        # recomputes every time, caching is a pure speedup).  Token lists
        # live in one flat pool; the dict maps word -> (start, len) so
        # assembly is a single vectorized gather, never 10k tiny arrays.
        self._word_cache: dict[bytes, tuple[int, int]] = {}
        self._cache_pool = np.zeros(1 << 16, dtype=np.int32)
        self._cache_used = 0
        # pipelined path: persistent native word->gid interner; spans per
        # gid live in flat arrays (the dict cache serves the non-native
        # configurations only)
        self._interner = None
        self._gid_start = np.full(1 << 15, -1, dtype=np.int64)
        self._gid_len = np.zeros(1 << 15, dtype=np.int64)
        self._prefix_run: Optional[list[int]] = None
        # byte-mode fast-path support arrays
        self._u16_out = self.tables.vocab_size < 0xFFFF
        # fused Pallas merge kernel (ops/pallas_merge.py): serves words
        # <= 16 bytes for small/mid pair tables entirely on-chip; the
        # XLA kernels remain for longer words and big tables
        self._pallas_tab = None
        self._pallas_interpret = False
        pallas_env = _os.environ.get("HUTOKEN_TPU_PALLAS", "1")
        if (
            pallas_env != "0"
            and self.tables.is_byte_encoder
            and self.tables.byte_seed_ids is not None
            and mesh is None
        ):
            on_tpu = jax.default_backend() not in ("cpu",)
            if on_tpu or pallas_env == "interpret":
                from .ops.pallas_merge import build_pallas_table

                self._pallas_tab = build_pallas_table(
                    self.tables.pairs,
                    self.tables.byte_seed_ids,
                    self.ctx.vocab.id2str,
                )
                self._pallas_interpret = pallas_env == "interpret"
                if (
                    self._pallas_tab is not None
                    and self._pallas_tab.partial
                    and self.table_arrays[-1] != MODE_PACKED
                ):
                    # partial tables need the full packed table for the
                    # final-state divergence check
                    self._pallas_tab = None
                if self._pallas_tab is not None:
                    log_debug(
                        "pallas merge kernel: depth=%d multi_ok=%s partial=%s",
                        self._pallas_tab.depth, self._pallas_tab.multi_ok,
                        self._pallas_tab.partial,
                    )
        if self.tables.byte_seed_ids is not None:
            self._byte_seed_dev = _table(self.tables.byte_seed_ids)
            # single-byte words bypass the device entirely
            self._single_byte_ids = [
                np.array([int(self.tables.byte_seed_ids[b])], dtype=np.int32)
                for b in range(256)
            ]
        else:
            self._byte_seed_dev = None
            self._single_byte_ids = None
        try:
            from .native import load_native

            self._native_split_ok = load_native() is not None
        except Exception:
            self._native_split_ok = False
        # cumulative seed elements (bytes, on the byte path) launched to
        # the device — bench.py reports device_byte_share from this
        self.stat_device_bytes = 0
        # partial-table divergence accounting: words flagged (0x8000
        # count bit) are re-encoded host-side; bench.py reports
        # flagged/total so a quietly host-bound config is visible
        self.stat_flagged_words = 0
        self.stat_device_words = 0
        self._reaper = None
        self._row_blocks = (
            ROW_BLOCKS_PALLAS if self._pallas_tab is not None else ROW_BLOCKS
        )
        # TPU-resident raw-chunk path (ops/split.py): device split+pack
        # for cache-cold corpora; built lazily, selected per call
        self._raw_enc = None
        self.stat_host_cause: dict[str, int] = {}
        self._build_decode_fast_path()

    def _retire(self, objs) -> None:
        """Park device-array references in a deadpool; free in rare bursts.

        Releasing a jax.Array issues a buffer-free RPC (~30 ms each on
        tunneled backends, measured as 0.1-0.5 s batch stalls wherever
        the drops land), so references accumulate in a deadpool and only
        a high-water mark hands the whole pool to a reaper thread.  The
        pool is bounded by HUTOKEN_TPU_DEADPOOL_MB (default 512) of
        estimated device bytes — a tiny slice of HBM traded for keeping
        frees off every batch's critical path.
        """
        import os as _os
        import queue as _queue
        import threading

        if _os.environ.get("HUTOKEN_TPU_NO_REAPER") == "1":
            return  # drop inline (diagnostics)
        if not hasattr(self, "_deadpool"):
            self._deadpool: list = []
            self._deadpool_bytes = 0
            self._deadpool_cap = (
                int(_os.environ.get("HUTOKEN_TPU_DEADPOOL_MB", "512")) << 20
            )
        size = 0
        try:
            for o in objs if isinstance(objs, (list, tuple)) else [objs]:
                h = o[0] if isinstance(o, tuple) else o
                size += int(getattr(h, "nbytes", 0) or 0)
        except Exception:
            size = 1 << 20
        self._deadpool.append(objs)
        self._deadpool_bytes += max(size, 1)
        if self._deadpool_bytes < self._deadpool_cap:
            return
        if self._reaper is None:
            q: _queue.Queue = _queue.Queue()

            def _reap() -> None:
                while True:
                    item = q.get()
                    del item  # __del__ (and its free RPCs) run here

            t = threading.Thread(target=_reap, daemon=True)
            t.start()
            self._reaper = q
        self._reaper.put(self._deadpool)
        self._deadpool = []
        self._deadpool_bytes = 0

    def _pool_reserve(self, n: int) -> None:
        # +4 keeps readable slack after the last span: the native
        # assemble fill copies in 16-byte chunks and may overread (never
        # overwrite) up to 3 ints past a span end
        need = self._cache_used + n + 4
        if need > self._cache_pool.shape[0]:
            cap = self._cache_pool.shape[0]
            while cap < need:
                cap *= 2
            new = np.zeros(cap, dtype=np.int32)
            new[: self._cache_used] = self._cache_pool[: self._cache_used]
            self._cache_pool = new

    def _pool_append(self, arr) -> tuple[int, int]:
        n = len(arr)
        self._pool_reserve(n)
        start = self._cache_used
        self._cache_pool[start : start + n] = arr
        self._cache_used += n
        return start, n

    def _pool_append_flat(self, flat: np.ndarray) -> int:
        """Bulk append; returns the base offset."""
        n = flat.shape[0]
        self._pool_reserve(n)
        base = self._cache_used
        self._cache_pool[base : base + n] = flat
        self._cache_used += n
        return base

    # ------------------------------------------------------------- encode

    def _split(self, text: str) -> list[str]:
        if self.ctx.compiled_pattern is not None:
            return list(split_words_pattern(text, self.ctx.compiled_pattern))
        return split_words(text)

    def _prefix_token_run(self) -> list[int]:
        """The standalone prefix token run (src/core.c:421-446), cached."""
        if self._prefix_run is None:
            prefix_encoded = encode_remap(
                self.ctx.prefix, self.ctx.special_chars, None, self.ctx.is_byte_encoder
            )
            elements = oracle._seed_per_char(prefix_encoded)
            self._prefix_run = oracle._merge_string_path(
                elements, self.ctx.vocab.str2id
            )
        return list(self._prefix_run)

    def _seed_word(self, word: bytes, glued_prefix: bool) -> Optional[np.ndarray]:
        """Seed-element ids for a word, or None -> host fallback."""
        t = self.tables
        if glued_prefix:
            return None  # rare (once per document), host handles exactly
        if t.is_byte_encoder and t.byte_seed_ids is not None:
            arr = np.frombuffer(word, dtype=np.uint8)
            return t.byte_seed_ids[arr]
        # general path: remap then seed by elements
        spelled = encode_remap(word, self.ctx.special_chars, None, t.is_byte_encoder)
        if t.uses_merges:
            from .bytemaps import utf8_char_length

            elems = []
            i = 0
            while i < len(spelled):
                ln = utf8_char_length(spelled[i])
                elems.append(spelled[i : i + ln])
                i += ln
        else:
            from .tables import _seed_elements_of_spelling

            elems = _seed_elements_of_spelling(spelled)
        ids = [self.ctx.vocab.str2id.get(e) for e in elems]
        if any(v is None for v in ids):
            return None  # unknown seed: spelling-level merges possible
        return np.array(ids, dtype=np.int32)

    def _encode_word_host(self, word: bytes, prefix: Optional[bytes]) -> list[int]:
        return oracle.encode_word(self.ctx, word, prefix)

    def _split_dedup_py(self, texts: list[str]):
        """Pure-Python split + dedup (handles prefix gluing and custom
        regex patterns; the native path covers the common fast case)."""
        unique: dict[tuple[bytes, bool], int] = {}
        uword_list: list[tuple[bytes, bool]] = []
        all_refs: list[int] = []
        doc_ref_counts: list[int] = []
        doc_prefix_run: list[bool] = []
        for text in texts:
            words = self._split(text)
            add_prefix = not text.startswith(" ")
            wants_prefix_run = (not add_prefix) and self.ctx.prefix is not None
            n_before = len(all_refs)
            first_real = True
            for w in words:
                wb = w.encode("utf-8")
                if not wb:
                    continue
                glued = first_real and add_prefix and self.ctx.prefix is not None
                first_real = False
                key = (wb, glued)
                ref = unique.get(key)
                if ref is None:
                    ref = len(uword_list)
                    unique[key] = ref
                    uword_list.append(key)
                all_refs.append(ref)
            n_words = len(all_refs) - n_before
            doc_ref_counts.append(n_words)
            doc_prefix_run.append(wants_prefix_run and n_words > 0)
        return uword_list, all_refs, doc_ref_counts, doc_prefix_run

    def encode_batch(self, texts: list[str]) -> list[list[int]]:
        flat, doc_offs, doc_prefix_run = self._encode_core(texts)
        prefix_run = None
        out_docs: list[list[int]] = []
        for i in range(len(texts)):
            toks = flat[doc_offs[i] : doc_offs[i + 1]].tolist()
            if doc_prefix_run[i]:
                if prefix_run is None:
                    prefix_run = self._prefix_token_run()
                toks = list(prefix_run) + toks
            out_docs.append(toks)
        return out_docs

    def encode_batch_arrays(
        self, texts: list[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch encode to (flat_tokens int32, doc_offsets int64).

        The arrays form is the natural product for TPU serving (token
        streams feed device buffers); it also skips the Python-object
        materialization cost of list outputs.  ``flat[offs[i]:offs[i+1]]``
        is document i's token ids.
        """
        flat, doc_offs, doc_prefix_run = self._encode_core(texts)
        if any(doc_prefix_run):
            run = np.asarray(self._prefix_token_run(), dtype=np.int32)
            flags = np.asarray(doc_prefix_run)
            pos = np.repeat(doc_offs[:-1][flags], len(run))
            vals = np.tile(run, int(flags.sum()))
            flat = np.insert(flat, pos, vals)
            doc_offs = doc_offs + np.concatenate(
                ([0], np.cumsum(flags.astype(np.int64) * len(run)))
            )
        return flat, doc_offs

    def _encode_core(self, texts: list[str]):
        import os
        import time as _time

        timing = os.environ.get("HUTOKEN_TPU_TIMING") == "1"

        for t in texts:
            if "\x00" in t:
                raise ValueError("embedded null character")

        # bound the word-cache pool (reset is cheap and exact)
        if self._cache_used > (1 << 26):
            self.reset_cache()

        raw_env = os.environ.get("HUTOKEN_TPU_RAW", "auto")
        if (
            raw_env != "0"
            and self._pallas_tab is not None
            and self.tables.byte_seed_ids is not None
            and self.ctx.compiled_pattern is None
            and self.ctx.prefix is None
            and self._mesh is None
        ):
            total = sum(len(t) for t in texts)
            if raw_env == "1" or (
                total >= RAW_MIN_BYTES and self._raw_probe(texts) >= RAW_THRESH
            ):
                return self._encode_core_raw(texts, timing, _time)

        if (
            self.ctx.compiled_pattern is None
            and self.ctx.prefix is None
            and self._native_split_ok
        ):
            return self._encode_core_pipelined(texts, timing, _time)
        return self._encode_core_py(texts, timing, _time)

    def reset_cache(self) -> None:
        """Drop all memoized word tokenizations (pool, dict cache, and
        the native interner).  Outputs are unchanged — the cache is a
        pure speedup — so this only matters for memory bounds and cold
        benchmarking."""
        self._word_cache.clear()
        self._cache_pool = np.zeros(1 << 16, dtype=np.int32)
        self._cache_used = 0
        if self._interner is not None:
            self._interner.reset()
        self._gid_start = np.full(1 << 15, -1, dtype=np.int64)
        self._gid_len = np.zeros(1 << 15, dtype=np.int64)

    # ---------------- device launch/extract helpers (both core paths)

    def _launch_byte_words(self, bucket: int, items: list, pending: list) -> None:
        """items = (key, word_bytes) pairs; packs length-sorted fixed-row
        blocks and issues asynchronous merge launches."""
        if not items:
            return
        items.sort(key=lambda kv: len(kv[1]))
        rows = self._row_blocks[bucket]
        lens = np.array([len(wb) for _, wb in items], dtype=np.int32)
        blob = b"".join(wb for _, wb in items)
        flat = np.frombuffer(blob, dtype=np.uint8)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        lo = 0
        while lo < len(items):
            hi = min(lo + rows, len(items))
            k = hi - lo
            # partial tail: shrink to the smallest row count that fits
            # (a 16384-row mostly-padding block costs real compute)
            r = rows
            while r // 4 >= k and r // 4 >= 64:
                r //= 4
            raw = np.zeros((r, bucket), dtype=np.uint8)
            cl = lens[lo:hi]
            cs = starts[lo:hi]
            # vectorized ragged pack: scatter all word bytes at once
            pos_in_word = np.arange(int(cl.sum())) - np.repeat(
                np.cumsum(cl) - cl, cl
            )
            rows_idx = np.repeat(np.arange(k), cl)
            raw[rows_idx, pos_in_word] = flat[np.repeat(cs, cl) + pos_in_word]
            lens_pad = np.zeros(r, dtype=np.int32)
            lens_pad[:k] = cl
            handle = self._merge_bytes_block(
                raw, lens_pad, int(cl.max(initial=1))
            )
            self._stage_launch(
                handle, [key for key, _ in items[lo:hi]], r,
                int(cl.sum()), pending, redo_src=(raw, lens_pad),
            )
            lo = hi

    def _launch_id_words(self, bucket: int, items: list, pending: list) -> None:
        """items = (key, seed_ids) pairs; same contract as the byte path."""
        if not items:
            return
        items.sort(key=lambda t: t[1].shape[0])
        rows = self._row_blocks[bucket]
        lo = 0
        while lo < len(items):
            chunk = items[lo : lo + rows]
            lo += rows
            block = np.full((rows, bucket), -1, dtype=np.int32)
            seed_sum = 0
            for r, (_, seeds) in enumerate(chunk):
                block[r, : seeds.shape[0]] = seeds
                seed_sum += seeds.shape[0]
            self._stage_launch(
                self._merge_block(block), [k for k, _ in chunk], rows,
                seed_sum, pending,
            )

    def _stage_launch(self, handle, keys, rows: int, tok_bound: int,
                      pending: list, redo_src=None) -> None:
        """Slice a launched block to its packed prefix and start its
        device->host transfer immediately, so by extraction time the
        bytes are already on the host (or in flight).

        ``redo_src`` = (raw, lens) numpy views for partial-table
        launches, kept so flagged words (count bit 0x8000, see
        ops/pallas_merge.py) can be re-encoded on the exact host path."""
        # tok_bound = real seed elements in the launch (= word bytes on
        # the byte path): the honest "how much work reached the device"
        # counter behind bench.py's device_byte_share
        self.stat_device_bytes += int(tok_bound)
        sliced = self._slice_packed(handle, rows, tok_bound)
        try:
            sliced.copy_to_host_async()
        except Exception:  # pragma: no cover - backend without async copy
            pass
        if sliced is not handle:
            self._retire(handle)  # free the full block off the hot path
        pending.append((sliced, keys, rows, tok_bound, redo_src))

    def _slice_packed(self, handle, rows: int, tok_bound: int):
        """Prefix view of a packed output covering counts + all real
        tokens, rounded to a coarse granularity (each distinct slice
        shape is its own tiny executable; coarse rounding bounds the
        compile set AND the per-executable tunnel dispatch cost)."""
        from .ops.merge import slice_prefix

        GRAN = 32768
        full = int(handle.shape[0])
        need = min(-(-(rows + tok_bound) // GRAN) * GRAN, full)
        return slice_prefix(handle, need) if need < full else handle

    def _extract_pending(
        self, pending, res_start, res_len, word_for_key, results=None
    ) -> None:
        """Sync + download each launch's packed prefix (counts, then the
        row-major compacted tokens); fill spans and the word cache.
        ``results`` carries transfers already prefetched by the drainer
        thread; otherwise one bulk device_get collects everything."""
        import os as _os
        import time as _t
        _timing = _os.environ.get("HUTOKEN_TPU_TIMING") == "1"
        _tw = _t.perf_counter()
        if results is not None:
            outs = [results[i] for i in range(len(pending))]
        else:
            # entries are pre-sliced with transfers already in flight
            outs = self._jax.device_get([h for h, *_rest in pending])
        if _timing:
            print(
                f"[ht-timing]   device_get wait: {_t.perf_counter()-_tw:.3f}s"
                f" ({len(pending)} launches)"
            )
            _tw = _t.perf_counter()
        wcache = self._word_cache
        for (handle, keys, rows, tok_bound, redo_src), sliced in zip(
            pending, outs
        ):
            k = len(keys)
            counts_raw = sliced[:k].astype(np.int64)
            # bit 0x8000 flags partial-table divergence (the token
            # stream is still laid out by the REAL counts)
            counts = counts_raw & 0x7FFF
            total = int(counts.sum())
            toks = sliced[rows : rows + total]
            base = self._pool_append_flat(toks.astype(np.int32))
            starts = base + np.concatenate(([0], np.cumsum(counts)[:-1]))
            key_arr = np.asarray(keys, dtype=np.int64)
            res_start[key_arr] = starts
            res_len[key_arr] = counts
            flagged = np.nonzero(counts_raw & 0x8000)[0]
            self.stat_device_words += k
            self.stat_flagged_words += int(flagged.size)
            if flagged.size:
                raw_src, lens_src = redo_src
                for r in flagged:
                    wb = bytes(raw_src[r, : lens_src[r]])
                    sp = self._pool_append(
                        np.asarray(
                            self._encode_word_host(wb, None), dtype=np.int32
                        )
                    )
                    res_start[keys[r]], res_len[keys[r]] = sp
                    starts[r], counts[r] = sp
            if word_for_key is not None:
                starts_l = starts.tolist()
                counts_l = counts.tolist()
                for r, key in enumerate(keys):
                    wb = word_for_key(key)
                    if wb is not None:
                        wcache[wb] = (starts_l[r], counts_l[r])
        if _timing:
            print(f"[ht-timing]   extract fill: {_t.perf_counter()-_tw:.3f}s")

    def _resolve_generic(self, wb, g, new_ids, res_start, res_len) -> None:
        """Non-byte-fast unique word: seed by elements, bucket for the
        device, or fall back to the exact host path."""
        seeds = self._seed_word(wb, False)
        if seeds is None or seeds.shape[0] > MAX_DEVICE_LEN:
            sp = self._pool_append(self._encode_word_host(wb, None))
            self._word_cache[wb] = sp
            res_start[g], res_len[g] = sp
        elif seeds.shape[0] <= 1:
            sp = self._pool_append(seeds.astype(np.int32))
            self._word_cache[wb] = sp
            res_start[g], res_len[g] = sp
        else:
            for b in BUCKETS:
                if seeds.shape[0] <= b:
                    new_ids[b].append((g, seeds))
                    break

    # --------------------------------------- raw TPU-resident path

    def _raw_probe(self, texts: list[str]) -> float:
        """Intrinsic unique-byte ratio of a small corpus sample (new-word
        bytes / sample bytes, measured with a throwaway interner so the
        engine's warm cache doesn't skew the estimate)."""
        budget = 256 << 10
        sample: list[str] = []
        stride = max(1, len(texts) // 16)
        got = 0
        for i in range(0, len(texts), stride):
            t = texts[i][: 32 << 10]
            sample.append(t)
            got += len(t)
            if got >= budget:
                break
        if not got:
            return 0.0
        if self._native_split_ok:
            from .native import WordInterner

            probe = WordInterner()
            _wg, _dwo, _nb, new_len, _prev = probe.split_intern_strs(sample)
            return float(new_len.sum()) / float(got)
        seen: set[str] = set()
        new_bytes = 0
        total = 0
        for t in sample:
            for w in split_words(t):
                total += len(w)
                if w not in seen:
                    seen.add(w)
                    new_bytes += len(w)
        return (new_bytes / total) if total else 0.0

    def _host_encode_text(self, s: str) -> np.ndarray:
        """Exact host encode of one text (fallback for chunks the raw
        device program cannot serve)."""
        ne = self._native_word_encoder()
        if ne is not None:
            return np.asarray(ne.encode_batch([s])[0], dtype=np.int32)
        return np.asarray(oracle.encode(self.ctx, s), dtype=np.int32)

    def _host_chunk(self, chunk: np.ndarray, seg_ends: np.ndarray):
        parts: list[np.ndarray] = []
        counts: list[int] = []
        lo = 0
        for hi in seg_ends.tolist():
            s = chunk[lo:hi].tobytes().decode("utf-8")
            arr = self._host_encode_text(s)
            parts.append(arr)
            counts.append(arr.shape[0])
            lo = hi
        flat = (
            np.concatenate(parts) if parts else np.zeros(0, dtype=np.int32)
        )
        return flat, np.asarray(counts, dtype=np.int64)

    def _encode_core_raw(self, texts: list[str], timing, _time):
        """Cache-cold batch encode, TPU-resident end to end.

        Per fixed-size byte chunk, ONE fused device program does split ->
        pack -> greedy merge -> stream compaction (ops/split.py); the
        host only preps chunk bytes (producer thread), launches, and
        splices rare flagged words (drainer thread).  Replaces the
        legacy pipeline's per-byte host stages for unique-heavy corpora
        (reference hot path: src/parser.c:14-183 + src/core.c:339-501,
        recast for the device instead of translated)."""
        import os as _os
        import queue as _queue
        import threading

        from .ops.split import RawChunkEncoder, find_cut, supported_alphabet

        t0 = _time.perf_counter()
        if self._raw_enc is None:
            # 4 MB chunks: ~20 ms of the program cost is per-dispatch
            # (sorts ramp, fixed launches), so bigger chunks are
            # strictly cheaper per byte until HBM pressure; measured
            # 47.6 -> 27.0 ms/MB going 1 MB -> 4 MB on-chip
            C = int(_os.environ.get("HUTOKEN_TPU_RAW_C", 1 << 22))
            self._raw_enc = RawChunkEncoder(self, C=C)
        enc = self._raw_enc
        C = enc.C
        n_docs = len(texts)

        chunkq: _queue.Queue = _queue.Queue(maxsize=4)

        def _producer():
            try:
                bufs: list[np.ndarray] = []
                segs: list[int] = []
                segdoc: list[int] = []
                size = 0

                def emit():
                    nonlocal bufs, segs, segdoc, size
                    if not size:
                        return
                    chunk = (
                        np.concatenate(bufs) if len(bufs) > 1 else bufs[0]
                    )
                    ok = supported_alphabet(chunk)
                    chunkq.put(
                        (
                            chunk,
                            np.asarray(segs, dtype=np.int32),
                            np.asarray(segdoc, dtype=np.int64),
                            ok,
                        )
                    )
                    bufs, segs, segdoc, size = [], [], [], 0

                for di, t in enumerate(texts):
                    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                    nb = b.shape[0]
                    if nb == 0:
                        continue  # empty docs keep zero counts
                    pos = 0
                    while pos < nb:
                        room = C - size
                        take = nb - pos
                        if take <= room:
                            bufs.append(b[pos:])
                            size += take
                            segs.append(size)
                            segdoc.append(di)
                            pos = nb
                            if size >= C - (C >> 4) or len(segs) >= enc.Dcap:
                                emit()
                            continue
                        # cut the oversized doc at a safe word start
                        cut = find_cut(b, pos, pos + room)
                        if cut < 0:
                            if size:
                                emit()  # retry with a full chunk's room
                                continue
                            # a full chunk with no safe cut: degenerate
                            # input; whole doc goes to the exact host path
                            chunkq.put(
                                (
                                    b,
                                    np.asarray([nb], dtype=np.int32),
                                    np.asarray([di], dtype=np.int64),
                                    False,
                                )
                            )
                            pos = nb
                            continue
                        bufs.append(b[pos:cut])
                        size += cut - pos
                        segs.append(size)
                        segdoc.append(di)
                        pos = cut
                        emit()
                emit()
                chunkq.put(None)
            except BaseException as e:  # re-raised on the main thread
                chunkq.put(e)

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        # two drainer threads overlap the per-chunk round trips (meta
        # download, token-slice dispatch + download) across chunks; the
        # results dict restores order at assembly
        sem = threading.BoundedSemaphore(8)
        drainq: _queue.Queue = _queue.Queue()
        results: dict = {}

        def _drainer():
            while True:
                item = drainq.get()
                if item is None:
                    drainq.put(None)  # let the other drainer exit too
                    return
                idx, chunk, handles = item
                try:
                    if handles is None:
                        results[idx] = None
                    else:
                        try:
                            results[idx] = enc.finish(handles, chunk)
                        finally:
                            sem.release()
                except BaseException as e:
                    results[idx] = e

        drainers = [
            threading.Thread(target=_drainer, daemon=True) for _ in range(4)
        ]
        for d in drainers:
            d.start()

        metas: list = []
        idx = 0
        t_launch = 0.0
        while True:
            item = chunkq.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                drainq.put(None)
                raise item
            chunk, seg_ends, segdoc, ok = item
            handles = None
            tg = _time.perf_counter()
            if ok and seg_ends.shape[0] <= enc.Dcap and chunk.shape[0] <= C:
                sem.acquire()
                handles = enc.launch(chunk, seg_ends)
                if handles is None:  # pragma: no cover - Dcap pre-checked
                    sem.release()
            t_launch += _time.perf_counter() - tg
            metas.append((chunk, seg_ends, segdoc))
            drainq.put((idx, chunk, handles))
            idx += 1
        producer.join()
        drainq.put(None)
        for d in drainers:
            d.join()
        if timing:
            print(
                f"[ht-timing] raw prep+launch: {_time.perf_counter()-t0:.3f}s"
                f" (launch {t_launch:.3f}, {idx} chunks)"
            )
            t0 = _time.perf_counter()

        doc_counts = np.zeros(n_docs, dtype=np.int64)
        flat_parts: list[np.ndarray] = []
        cause = self.stat_host_cause
        for i in range(idx):
            res = results[i]
            if isinstance(res, BaseException):
                raise res
            chunk, seg_ends, segdoc = metas[i]
            if res is None:  # capacity overflow / unsupported alphabet
                toks, seg_counts = self._host_chunk(chunk, seg_ends)
                cause["raw_host_chunk"] = cause.get(
                    "raw_host_chunk", 0
                ) + int(chunk.shape[0])
            else:
                toks, seg_counts, stats = res
                self.stat_device_bytes += stats["device_bytes"]
                self.stat_device_words += stats["words"]
                self.stat_flagged_words += stats["flagged_words"]
                for k in ("over_bucket", "partial_flag"):
                    if stats[k]:
                        cause[k] = cause.get(k, 0) + stats[k]
            np.add.at(doc_counts, segdoc, seg_counts)
            flat_parts.append(toks)
        flat = (
            np.concatenate(flat_parts)
            if flat_parts
            else np.zeros(0, dtype=np.int32)
        )
        doc_offs = np.concatenate(
            (np.zeros(1, dtype=np.int64), np.cumsum(doc_counts))
        )
        if timing:
            print(f"[ht-timing] raw finish+assemble: "
                  f"{_time.perf_counter()-t0:.3f}s")
        return flat, doc_offs, [False] * n_docs

    def _encode_core_pipelined(self, texts: list[str], timing, _time):
        """Group-pipelined batch encode (default parser, no prefix).

        Three-stage pipeline over byte-bounded document groups:

        * a PRODUCER thread runs the native split+intern for group g+1
          (the ctypes call drops the GIL, so it genuinely overlaps),
        * the MAIN thread resolves new words and launches device merge
          blocks for group g,
        * a DRAINER thread device_get's each finished block while later
          groups are still being split/launched, so the final sync
          costs ~one in-flight block instead of the whole batch.

        Words are interned into a PERSISTENT native word->gid map; only
        first-seen words are resolved (vectorized numpy over the new-gid
        tail — no per-word Python in the hot path).
        """
        import queue as _queue
        import threading

        from .native import WordInterner, assemble

        t0 = _time.perf_counter()
        if self._interner is None:
            self._interner = WordInterner()
        interner = self._interner
        # group cuts by CHAR count (a byte-count estimate — groups only
        # need rough balance); per-group utf-8 encode + join happens
        # inside the pipeline loop, overlapped with the producer's split
        groups: list[tuple[int, int]] = []
        glo = 0
        acc = 0
        for gi, t in enumerate(texts):
            acc += len(t)
            if acc >= GROUP_BYTES:
                groups.append((glo, gi + 1))
                glo = gi + 1
                acc = 0
        if glo < len(texts) or not groups:
            groups.append((glo, len(texts)))

        def _prep(lo: int, hi: int):
            # per-doc str objects: the native splitter reads CPython's
            # cached UTF-8 buffers directly (no encode, no blob join)
            return texts[lo:hi]

        pending: list = []
        group_refs: list[np.ndarray] = []
        dwo_parts: list[np.ndarray] = [np.zeros(1, dtype=np.int64)]
        words_so_far = 0
        byte_fast = (
            self.tables.is_byte_encoder and self.tables.byte_seed_ids is not None
        )
        bseed = self.tables.byte_seed_ids
        # unresolved new words accumulate as packed matrices across
        # groups; only FULL length-sorted blocks ever launch on the
        # device — the sub-block remainder at end of stream (rare Zipf
        # tail, a few KB of bytes) takes the exact native scalar path on
        # the host instead of paying a padded launch round trip
        carry_byte: dict[int, list] = {b: [] for b in BUCKETS}
        carry_ids: dict[int, list] = {b: [] for b in BUCKETS}
        host_tail: list = []

        def flush(force: bool) -> None:
            for b in BUCKETS:
                rows = self._row_blocks[b]
                parts = carry_byte[b]
                n_tot = sum(len(g) for g, _, _ in parts)
                if parts and (n_tot >= rows or (force and n_tot)):
                    gids = np.concatenate([g for g, _, _ in parts])
                    raw = np.vstack([r for _, r, _ in parts])
                    lens = np.concatenate([l for _, _, l in parts])
                    order = np.argsort(lens, kind="stable")
                    cut = (n_tot // rows) * rows
                    # device blocks take the LONGEST words: their merge
                    # loops run the most rounds, so they get the head
                    # start; the sub-block remainder is the cheapest
                    # (shortest words, fewest rounds)
                    sel = order[n_tot - cut :]
                    if cut:
                        self._launch_byte_blocks(
                            b, gids[sel], raw[sel], lens[sel], pending
                        )
                    parts.clear()
                    if cut < n_tot:
                        rest = order[: n_tot - cut]
                        if force:
                            host_tail.append((gids[rest], raw[rest], lens[rest]))
                        else:
                            parts.append((gids[rest], raw[rest], lens[rest]))
                items = carry_ids[b]
                if items and (len(items) >= rows or force):
                    items.sort(key=lambda t: t[1].shape[0])
                    cut = len(items) if force else (len(items) // rows) * rows
                    self._launch_id_words(b, items[:cut], pending)
                    del items[:cut]

        # producer: split+intern runs one group ahead of the main thread;
        # the main thread preps (encodes+joins) upcoming groups while the
        # producer splits, so corpus prep never sits on the critical path
        prepq: _queue.Queue = _queue.Queue()
        splitq: _queue.Queue = _queue.Queue(maxsize=2)

        def _producer():
            try:
                while True:
                    enc = prepq.get()
                    if enc is None:
                        splitq.put(None)
                        return
                    res = interner.split_intern_strs(enc)
                    splitq.put(res)
            except BaseException as e:  # re-raised on the main thread
                splitq.put(e)

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        # drainer: pulls finished device blocks to the host as they land
        import os as _os

        use_drainer = _os.environ.get("HUTOKEN_TPU_NO_DRAINER") != "1"
        drainq: _queue.Queue = _queue.Queue()
        drain_results: dict = {}

        def _drainer():
            while True:
                item = drainq.get()
                if item is None:
                    return
                idx, handle = item
                try:
                    drain_results[idx] = self._jax.device_get(handle)
                except BaseException as e:
                    drain_results[idx] = e

        drainer = None
        if use_drainer:
            drainer = threading.Thread(target=_drainer, daemon=True)
            drainer.start()
        drained = 0

        def _push_drain() -> None:
            nonlocal drained
            if drainer is None:
                return
            while drained < len(pending):
                drainq.put((drained, pending[drained][0]))
                drained += 1

        t_split = t_resolve = t_launch = t_prep = 0.0
        n_put = 0
        n_done = 0
        n_groups = len(groups)
        while n_done < n_groups:
            tg = _time.perf_counter()
            while n_put < n_groups and n_put - n_done < 2:
                prepq.put(_prep(*groups[n_put]))
                n_put += 1
                if n_put == n_groups:
                    prepq.put(None)
            t_prep += _time.perf_counter() - tg
            tg = _time.perf_counter()
            item = splitq.get()
            t_split += _time.perf_counter() - tg
            if item is None:
                break
            if isinstance(item, BaseException):
                drainq.put(None)
                raise item
            n_done += 1
            wg, dwo, nb, new_len, prev = item
            tg = _time.perf_counter()

            n_new = len(new_len)
            self._ensure_gid_capacity(prev + n_new)
            if n_new:
                # first-seen words arrive as one compact byte blob (a
                # few KB per group) with per-word lengths
                gids = np.arange(prev, prev + n_new, dtype=np.int64)
                nl = new_len.astype(np.int64)
                no = np.concatenate(([0], np.cumsum(nl)[:-1]))
                if byte_fast:
                    m1 = nl == 1
                    if m1.any():
                        ids1 = bseed[nb[no[m1]]].astype(np.int32)
                        base = self._pool_append_flat(ids1)
                        g1 = gids[m1]
                        self._gid_start[g1] = base + np.arange(
                            len(ids1), dtype=np.int64
                        )
                        self._gid_len[g1] = 1
                    lo_b = 1
                    for b in BUCKETS:
                        sel = np.flatnonzero((nl > lo_b) & (nl <= b))
                        lo_b = b
                        if not len(sel):
                            continue
                        ln = nl[sel]
                        raw = None
                        if self._native_split_ok:
                            from .native import pack_rows

                            raw = pack_rows(nb, no, nl, sel, b)
                        if raw is None:  # pure-python fallback pack
                            off = no[sel]
                            k = len(sel)
                            raw = np.zeros((k, b), dtype=np.uint8)
                            tot = int(ln.sum())
                            pos = np.arange(tot) - np.repeat(
                                np.cumsum(ln) - ln, ln
                            )
                            rows_idx = np.repeat(np.arange(k), ln)
                            raw[rows_idx, pos] = nb[np.repeat(off, ln) + pos]
                        carry_byte[b].append((gids[sel], raw, ln))
                    if (nl > MAX_DEVICE_LEN).any():
                        nbb = nb.tobytes()
                        for i in np.flatnonzero(nl > MAX_DEVICE_LEN):
                            wb = nbb[no[i] : no[i] + nl[i]]
                            sp = self._pool_append(
                                self._encode_word_host(wb, None)
                            )
                            self._gid_start[gids[i]] = sp[0]
                            self._gid_len[gids[i]] = sp[1]
                else:
                    nbb = nb.tobytes()
                    no_l = no.tolist()
                    nl_l = new_len.tolist()
                    for i in range(n_new):
                        wb = nbb[no_l[i] : no_l[i] + nl_l[i]]
                        self._resolve_generic(
                            wb, gids[i], carry_ids,
                            self._gid_start, self._gid_len,
                        )
            group_refs.append(wg)
            dwo_parts.append(dwo[1:] + words_so_far)
            words_so_far += int(dwo[-1])
            t_resolve += _time.perf_counter() - tg
            tg = _time.perf_counter()
            flush(False)
            _push_drain()
            t_launch += _time.perf_counter() - tg
        producer.join()
        tg = _time.perf_counter()
        flush(True)
        _push_drain()
        t_launch += _time.perf_counter() - tg

        # host-tail encode runs in a worker thread (the native scalar
        # engine drops the GIL) OVERLAPPED with the device drain +
        # extract below; results land in private buffers and integrate
        # after extract (the span pool is not thread-safe)
        tg = _time.perf_counter()
        tail_results: list = []
        tail_err: list = []
        tail_thread = None
        if host_tail:

            def _tail_worker() -> None:
                try:
                    tail_results.extend(
                        self._encode_host_tail_parts(host_tail)
                    )
                except BaseException as e:  # re-raised on the main thread
                    tail_err.append(e)

            tail_thread = threading.Thread(target=_tail_worker, daemon=True)
            tail_thread.start()
        t_tail = _time.perf_counter() - tg

        if timing:
            print(
                f"[ht-timing] split+resolve+launch: {_time.perf_counter()-t0:.3f}s"
                f" (prep {t_prep:.3f} split-wait {t_split:.3f}"
                f" resolve {t_resolve:.3f} launch {t_launch:.3f}"
                f" host-tail-start {t_tail:.3f})"
            )
            t0 = _time.perf_counter()

        if drainer is not None:
            drainq.put(None)
            drainer.join()
            for i in range(len(pending)):
                if isinstance(drain_results.get(i), BaseException):
                    raise drain_results[i]
        self._extract_pending(
            pending, self._gid_start, self._gid_len, None,
            results=drain_results if (drainer is not None and pending) else None,
        )
        self._retire(pending)
        pending = None
        if tail_thread is not None:
            tg = _time.perf_counter()
            tail_thread.join()
            if tail_err:
                raise tail_err[0]
            for gids, toks, spans in tail_results:
                base = self._pool_append_flat(toks)
                self._gid_start[gids] = base + spans[:-1]
                self._gid_len[gids] = spans[1:] - spans[:-1]
            if timing:
                print(
                    f"[ht-timing] host-tail join+fill: "
                    f"{_time.perf_counter()-tg:.3f}s"
                )
        if timing:
            print(f"[ht-timing] sync+extract: {_time.perf_counter()-t0:.3f}s")
            t0 = _time.perf_counter()

        n_g = interner.count()
        all_refs = (
            np.concatenate(group_refs)
            if group_refs
            else np.zeros(0, dtype=np.int32)
        )
        dwo_all = np.concatenate(dwo_parts)
        doc_prefix_run = [False] * len(texts)
        if all_refs.size == 0:
            flat_tokens = np.zeros(0, dtype=np.int32)
            doc_offs = np.zeros(len(texts) + 1, dtype=np.int64)
        else:
            assembled = assemble(
                all_refs,
                dwo_all,
                self._gid_start[:n_g],
                self._gid_len[:n_g],
                self._cache_pool,
            )
            if assembled is not None:
                flat_tokens, doc_offs = assembled
            else:  # pragma: no cover - library vanished mid-run
                flat_tokens, doc_offs = self._assemble_np(
                    all_refs.astype(np.int64), dwo_all,
                    self._gid_start, self._gid_len,
                )
        if timing:
            print(f"[ht-timing] assembly: {_time.perf_counter()-t0:.3f}s")
        return flat_tokens, doc_offs, doc_prefix_run

    def _native_word_encoder(self):
        """Lazily built native scalar engine for stream-tail words."""
        if not hasattr(self, "_nat_enc"):
            try:
                from .native import NativeEngine

                self._nat_enc = NativeEngine(self.ctx)
            except Exception:  # pragma: no cover - library vanished
                self._nat_enc = None
        return self._nat_enc

    def _encode_host_tail_parts(self, host_tail: list) -> list:
        """Exact scalar encode of the sub-block remainder (new unique
        words that never filled a device block): a few KB of rare words,
        cheaper on the host than one padded device round trip.

        Returns ``(gids, flat_tokens, spans)`` per part WITHOUT touching
        shared engine state, so it can run on a worker thread overlapped
        with the device drain (the native call drops the GIL)."""
        out = []
        nat = self._native_word_encoder()
        for gids, raw, lens in host_tail:
            k, width = raw.shape
            if nat is not None:
                flat = np.ascontiguousarray(raw).reshape(-1)
                offs = np.arange(k, dtype=np.int64) * width
                toks, spans = nat.encode_words(flat, offs, lens, num_threads=2)
                out.append((gids, toks, spans))
            else:  # pure-python fallback, exact but slower
                lens_l = lens.tolist()
                toks_l: list[int] = []
                spans = np.zeros(k + 1, dtype=np.int64)
                for r in range(k):
                    wb = raw[r, : lens_l[r]].tobytes()
                    t = self._encode_word_host(wb, None)
                    toks_l.extend(t)
                    spans[r + 1] = spans[r] + len(t)
                out.append((gids, np.asarray(toks_l, dtype=np.int32), spans))
        return out

    def _ensure_gid_capacity(self, n: int) -> None:
        cap = self._gid_start.shape[0]
        if n <= cap:
            return
        while cap < n:
            cap *= 2
        ns = np.full(cap, -1, dtype=np.int64)
        ns[: self._gid_start.shape[0]] = self._gid_start
        self._gid_start = ns
        nl = np.zeros(cap, dtype=np.int64)
        nl[: self._gid_len.shape[0]] = self._gid_len
        self._gid_len = nl

    def _launch_byte_blocks(
        self, bucket: int, gids: np.ndarray, raw: np.ndarray,
        lens: np.ndarray, pending: list,
    ) -> None:
        """Launch pre-packed, length-sorted byte rows as fixed-row blocks.

        The final partial block shrinks to the smallest row count
        (rows/4, rows/16) that still fits — the stream tail's compute
        and transfer sit exposed at the end of the batch, so a mostly
        padded full-size block there costs real wall time."""
        rows = self._row_blocks[bucket]
        n = len(gids)
        lo = 0
        while lo < n:
            hi = min(lo + rows, n)
            k = hi - lo
            r = rows
            while r // 4 >= k and r // 4 >= 64:
                r //= 4
            block = raw[lo:hi]
            if k < r:
                block = np.zeros((r, bucket), dtype=np.uint8)
                block[:k] = raw[lo:hi]
            lens_pad = np.zeros(r, dtype=np.int32)
            lens_pad[:k] = lens[lo:hi]
            handle = self._merge_bytes_block(
                block, lens_pad, int(lens[lo:hi].max(initial=1))
            )
            self._stage_launch(
                handle, gids[lo:hi], r, int(lens[lo:hi].sum()), pending,
                redo_src=(block, lens_pad),
            )
            lo = hi

    def _assemble_np(self, all_refs, dwo_all, res_start, res_len):
        """Vectorized numpy fallback of native assemble()."""
        refs = all_refs.astype(np.int64)
        rl = res_len[refs] if refs.size else np.zeros(0, dtype=np.int64)
        rs = res_start[refs] if refs.size else np.zeros(0, dtype=np.int64)
        total = int(rl.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(rl) - rl, rl
        )
        flat_tokens = (
            self._cache_pool[np.repeat(rs, rl) + within]
            if total
            else np.zeros(0, dtype=np.int32)
        )
        ref_cum = np.concatenate(([0], np.cumsum(rl)))
        doc_offs = ref_cum[dwo_all]
        return flat_tokens, doc_offs

    def _encode_core_py(self, texts: list[str], timing, _time):
        """Whole-batch core for configurations the native splitter does
        not cover (custom regex pattern, prefix gluing)."""
        t_start = _time.perf_counter()

        uword_list, all_refs, doc_ref_counts, doc_prefix_run = (
            self._split_dedup_py(texts)
        )
        dwo_arr = np.concatenate(
            ([0], np.cumsum(np.asarray(doc_ref_counts, dtype=np.int64)))
        )
        if timing:
            print(f"[ht-timing] split+dedup: {_time.perf_counter()-t_start:.3f}s")
            t_start = _time.perf_counter()

        # resolve unique words: cache -> byte fast path -> generic device
        # path -> host fallback
        n_uniq = len(uword_list)
        res_start = np.full(max(n_uniq, 1), -1, dtype=np.int64)
        res_len = np.zeros(max(n_uniq, 1), dtype=np.int64)
        new_byte: dict[int, list] = {b: [] for b in BUCKETS}
        new_ids: dict[int, list] = {b: [] for b in BUCKETS}
        byte_fast = (
            self.tables.is_byte_encoder and self.tables.byte_seed_ids is not None
        )
        cache_get = self._word_cache.get
        for idx, (wb, glued) in enumerate(uword_list):
            cached = cache_get(wb) if not glued else None
            if cached is not None:
                res_start[idx], res_len[idx] = cached
                continue
            if byte_fast and not glued:
                n = len(wb)
                if n == 1:
                    span = self._pool_append(
                        [int(self.tables.byte_seed_ids[wb[0]])]
                    )
                    self._word_cache[wb] = span
                    res_start[idx], res_len[idx] = span
                    continue
                if n <= MAX_DEVICE_LEN:
                    for b in BUCKETS:
                        if n <= b:
                            new_byte[b].append((idx, wb))
                            break
                    continue
                span = self._pool_append(self._encode_word_host(wb, None))
                self._word_cache[wb] = span
                res_start[idx], res_len[idx] = span
                continue
            if glued:
                span = self._pool_append(
                    self._encode_word_host(wb, self.ctx.prefix)
                )
                res_start[idx], res_len[idx] = span
                continue
            self._resolve_generic(wb, idx, new_ids, res_start, res_len)

        pending: list = []
        for b in BUCKETS:
            self._launch_byte_words(b, new_byte[b], pending)
            self._launch_id_words(b, new_ids[b], pending)
        if timing:
            print(f"[ht-timing] resolve+launch: {_time.perf_counter()-t_start:.3f}s")
            t_start = _time.perf_counter()

        def _word_for_key(key):
            wb, glued = uword_list[key]
            return None if glued else wb

        self._extract_pending(pending, res_start, res_len, _word_for_key)
        self._retire(pending)
        pending = None
        if timing:
            print(f"[ht-timing] sync+extract: {_time.perf_counter()-t_start:.3f}s")
            t_start = _time.perf_counter()

        all_refs_arr = np.asarray(all_refs, dtype=np.int64)
        assembled = None
        if self._native_split_ok and all_refs_arr.size:
            from .native import assemble

            assembled = assemble(
                all_refs_arr.astype(np.int32),
                dwo_arr,
                res_start,
                res_len,
                self._cache_pool,
            )
        if assembled is not None:
            flat_tokens, doc_offs = assembled
        else:
            flat_tokens, doc_offs = self._assemble_np(
                all_refs_arr, dwo_arr, res_start, res_len
            )
        if timing:
            print(f"[ht-timing] assembly: {_time.perf_counter()-t_start:.3f}s")
        return flat_tokens, doc_offs, doc_prefix_run

    def warmup(self) -> None:
        """Compile the primary block shape (the tail bucket compiles
        lazily only when >32-lane words occur)."""
        b = BUCKETS[0]
        rows = self._row_blocks[b]
        if self._byte_seed_dev is not None:
            raw = np.zeros((rows, b), dtype=np.uint8)
            lens = np.zeros(rows, dtype=np.int32)
            self._merge_bytes_block(raw, lens).block_until_ready()
        else:
            self._merge_block(
                np.full((rows, b), -1, dtype=np.int32)
            ).block_until_ready()

    def _place_rows(self, arr: np.ndarray):
        if self._mesh is not None:
            return self._jax.device_put(arr, self._sh_rows)
        return self._jnp.asarray(arr)

    def _place_vec(self, arr: np.ndarray):
        if self._mesh is not None:
            return self._jax.device_put(arr, self._sh_vec)
        return self._jnp.asarray(arr)

    def _merge_block(self, block: np.ndarray):
        from .ops.merge import merge_words_packed

        return merge_words_packed(
            self.table_arrays, self._place_rows(block), False
        )

    def _merge_bytes_block(
        self, raw: np.ndarray, lens: np.ndarray, max_len: int = 0
    ):
        if self._substr_arrays is not None:
            L = raw.shape[1]
            D = 8  # round the span-length dimension to bound the shape set
            # spans longer than the longest token spelling (d_cap) can
            # never resolve, so they can never merge: capping D there is
            # exact and shrinks R for long-word buckets
            target = max(1, max_len or L)
            if self._substr_dcap:
                target = min(target, self._substr_dcap)
            while D < target and D < L:
                D *= 2
            D = min(D, L)
            if self._substr_merges:
                from .ops.rmatrix import merge_words_from_bytes_rmatrix_merges

                return merge_words_from_bytes_rmatrix_merges(
                    self._substr_arrays,
                    self._byte_seed_dev,
                    self._place_rows(raw),
                    self._place_vec(lens),
                    D,
                    self._u16_out,
                )
            from .ops.rmatrix import merge_words_from_bytes_rmatrix

            return merge_words_from_bytes_rmatrix(
                self._substr_arrays,
                self._byte_seed_dev,
                self._place_rows(raw),
                self._place_vec(lens),
                D,
                self._u16_out,
            )
        # slice the lane axis to the real content width (length-sorted
        # blocks are homogeneous): initial-rank probes and merge rounds
        # scale with the true max length instead of the bucket width
        L = raw.shape[1]
        W = 8
        target = max(1, max_len or L)
        while W < target and W < L:
            W *= 2
        if W < L:
            raw = raw[:, :W]
        if self._pallas_tab is not None and W <= 32:
            # words of 17-32 bytes ride the same kernel at 4 words per
            # 128-lane row (VERDICT r3 #2a: these previously fell to the
            # ~20 MB/s XLA gather path)
            gw = 8 if W <= 8 else (16 if W <= 16 else 32)
            wpr = 128 // gw
            from .ops.pallas_merge import ROW_TILE, merge_words_from_bytes_pallas

            rows_mult = ROW_TILE * wpr
            if raw.shape[0] % rows_mult == 0:
                return merge_words_from_bytes_pallas(
                    self._pallas_tab,
                    self._place_rows(np.ascontiguousarray(raw)),
                    self._place_vec(lens),
                    self._u16_out,
                    group_w=gw,
                    interpret=self._pallas_interpret,
                    full_table=(
                        self.table_arrays if self._pallas_tab.partial
                        else None
                    ),
                )
        from .ops.merge import merge_words_from_bytes_packed

        return merge_words_from_bytes_packed(
            self.table_arrays,
            self._byte_seed_dev,
            self._place_rows(np.ascontiguousarray(raw)),
            self._place_vec(lens),
            self._u16_out,
        )

    # ------------------------------------------------------------- decode

    def _build_decode_fast_path(self) -> None:
        """Vectorized reverse remap when every replacement is a single
        UTF-8 char of <= 2 bytes (e.g. the GPT-2 byte-encoder table)."""
        self._pat1 = np.full(256, -1, dtype=np.int32)
        self._pat2 = np.full(65536, -1, dtype=np.int32)
        fast = self.tables.is_byte_encoder
        for idx, val in self.ctx.special_chars.items():
            if len(val) == 1:
                self._pat1[val[0]] = idx
            elif len(val) == 2 and (val[0] & 0xE0) == 0xC0:
                self._pat2[(val[0] << 8) | val[1]] = idx
            else:
                fast = False
        self._decode_fast = fast

    def decode_batch(
        self, token_lists: list[list[int]], num_threads: Optional[int] = None
    ) -> list[str]:
        import os as _os

        dec_env = _os.environ.get("HUTOKEN_TPU_DECODE")
        want_device = dec_env == "device" or (
            self._prefer_device_decode and dec_env is None
        )
        if token_lists and want_device:
            out = self._try_decode_batch_device(token_lists)
            if out is not None:
                return out
        return self._decode_batch_host(token_lists, num_threads)

    def _decode_batch_host(
        self, token_lists: list[list[int]], num_threads: Optional[int] = None
    ) -> list[str]:
        V = self.tables.vocab_size
        # the native C++ decoder (threaded per-doc concat + reverse scan)
        # beats the numpy flat path ~10x on list-of-lists inputs; exact
        # parity is tested in tests/test_native.py.  The caller's thread
        # count is honored (reference: src/lib.c:954-1094); default 2
        # matches this host's core count.
        if token_lists and self._native_split_ok:
            nat = self._native_word_encoder()
            if nat is not None:
                return nat.decode_batch(
                    token_lists, num_threads=num_threads or 2
                )
        if self._decode_fast and self.ctx.prefix is None and token_lists:
            return self._decode_batch_flat(token_lists)
        out: list[str] = []
        for ids in token_lists:
            arr = np.asarray(ids, dtype=np.int64)
            if arr.size and (arr.min() < 0 or arr.max() >= V):
                raise ValueError(
                    "Element must be non-negative and less than vocab size."
                )
            rows = self.tables.token_bytes[arr]  # [T, max_len]
            lens = self.tables.token_lens[arr]
            mask = (
                np.arange(rows.shape[1], dtype=np.int32)[None, :] < lens[:, None]
            )
            raw = rows[mask].tobytes()
            if self.ctx.prefix and raw.startswith(self.ctx.prefix):
                raw = raw[len(self.ctx.prefix) :]
            if self._decode_fast:
                out.append(self._reverse_remap_np(raw).decode("utf-8"))
            else:
                out.append(
                    oracle.reverse_remap_nostrip(self.ctx, raw).decode("utf-8")
                )
        return out

    # decode on the device (SURVEY §7 step 3: lens-gather + concat +
    # reverse remap as array ops; reference src/core.c:513-581)

    def _ensure_decode_device(self) -> bool:
        """Build the per-id decoded-bytes table; returns usability.

        A token's decoded spelling is context-free whenever no reverse-
        map match (and no UTF-8 char step) can straddle its boundary —
        per-id flags record the straddle-capable exceptions
        (``_dec_host_only``); streams containing any flagged id decode
        on the exact host path instead."""
        if getattr(self, "_dec_decoded", None) is not None:
            return self._dec_table_ok
        jnp = self._jnp
        t = self.tables
        if self._decode_fast:
            # vectorized builder: every replacement is a single char of
            # <= 2 bytes, so chars never straddle tokens in byte mode
            # and no flags are needed.  One output byte per char start
            # (byte mode emits '?' for codepoints >= 256,
            # pretokenizer.c:244-254).
            rows = t.token_bytes.astype(np.int32)
            col = np.arange(rows.shape[1], dtype=np.int32)[None, :]
            valid = col < t.token_lens[:, None]
            is_start = ((rows & 0xC0) != 0x80) & valid
            b1 = np.concatenate(
                [rows[:, 1:], np.zeros((rows.shape[0], 1), np.int32)], axis=1
            )
            one = rows < 0x80
            two = (rows & 0xE0) == 0xC0
            p1 = self._pat1[np.clip(rows, 0, 255)]
            key2 = ((rows << 8) | b1) & 0xFFFF
            p2 = np.where(two, self._pat2[key2], -1)
            cp2 = ((rows & 0x1F) << 6) | (b1 & 0x3F)
            outb = np.where(
                one,
                np.where(p1 >= 0, p1, rows),
                np.where(
                    p2 >= 0, p2, np.where(two & (cp2 < 256), cp2, ord("?"))
                ),
            ).astype(np.uint8)
            self._dec_counts = is_start.sum(axis=1).astype(np.int64)
            Ld = max(int(self._dec_counts.max(initial=1)), 1)
            dec = np.zeros((rows.shape[0], Ld), dtype=np.uint8)
            pos = np.cumsum(is_start, axis=1) - 1
            rs, cs = np.nonzero(is_start)
            dec[rs, pos[rs, cs]] = outb[rs, cs]
            self._dec_host_only = np.zeros(rows.shape[0], dtype=bool)
            ok = True
        else:
            dec, ok = self._build_decode_general()
        self._dec_table_ok = ok
        if ok:
            self._dec_decoded_np = dec  # host fill for small batches
            self._dec_decoded = jnp.asarray(dec)
            self._dec_decoded_flat = jnp.asarray(
                np.ascontiguousarray(dec).reshape(-1)
            )
            # per-id byte counts on device: the serving path's length
            # gather/cumsum/v-delta prep runs on-chip (ops/decode.py
            # decode_tokens_blob), the host uploads only token ids
            self._dec_counts_dev = jnp.asarray(
                self._dec_counts.astype(np.int32)
            )
            self._dec_tok_dtype = (
                np.uint16 if self.tables.vocab_size < 0xFFFF else np.int32
            )
        return ok

    def _build_decode_general(self):
        """General decode table: per-id exact host reverse scan
        (src/pretokenizer.c:197-296 semantics for ANY replacement set,
        char mode included), with straddle detection.

        A match can cross a token boundary only if it STARTS inside a
        token whose proper suffix is a proper prefix of some
        replacement value; a char step crosses only if a token's final
        char is truncated.  Both are per-id properties — flagged ids
        force the host path for the streams that contain them
        (conservative: a flagged id merely *may* straddle)."""
        from . import oracle
        from .bytemaps import utf8_char_length

        t = self.tables
        V = t.vocab_size
        # proper prefixes of every replacement value
        prefixes: set[bytes] = set()
        for val in self.ctx.special_chars.values():
            for ln in range(1, len(val)):
                prefixes.add(bytes(val[:ln]))
        max_pref = max((len(p) for p in prefixes), default=0)
        lens = t.token_lens
        values = sorted(
            (bytes(v) for v in self.ctx.special_chars.values()),
            key=len, reverse=True,
        )
        decoded: list[bytes] = []
        host_only = np.zeros(V, dtype=bool)
        for i in range(V):
            s = t.token_bytes[i, : lens[i]].tobytes()
            decoded.append(oracle.reverse_remap_nostrip(self.ctx, s))
            # replay the reverse scan's EXACT position sequence (matches
            # consume their full length, else one char step) and flag
            # any position where the in-context scan could diverge:
            # * the remaining suffix is a proper prefix of some value
            #   (a LONGER match could complete across the boundary and
            #   win longest-match), or
            # * a char step would read past the token end.
            # A naive char walk is not enough: a replacement value that
            # is not char-aligned shifts the scan phase.
            p = 0
            while p < len(s):
                rest = len(s) - p
                if rest <= max_pref and s[p:] in prefixes:
                    host_only[i] = True
                    break
                m = next(
                    (v for v in values if s.startswith(v, p)), None
                )
                if m is not None:
                    p += len(m)
                    continue
                cl = utf8_char_length(s[p])
                if p + cl > len(s):
                    host_only[i] = True
                    break
                p += cl
        self._dec_counts = np.array(
            [len(d) for d in decoded], dtype=np.int64
        )
        Ld = max(int(self._dec_counts.max(initial=1)), 1)
        dec = np.zeros((V, Ld), dtype=np.uint8)
        for i, d in enumerate(decoded):
            dec[i, : len(d)] = np.frombuffer(d, dtype=np.uint8)
        self._dec_host_only = host_only
        return dec, True

    # launch shape quanta: token-count and byte-count axes each ride a
    # pow2 ladder so the compiled-shape set stays tiny while padding
    # waste stays bounded
    DEC_N_QUANTA = (1 << 14, 1 << 17, 1 << 20, 1 << 22, 1 << 24)
    DEC_T_QUANTA = (1 << 15, 1 << 18, 1 << 21, 1 << 24, 1 << 25)

    def decode_batch_device(self, token_lists: list[list[int]]) -> list[str]:
        """Device decode via the fused one-launch gather kernel
        (ops/decode.py decode_gather_blob): the whole token stream
        decodes in one dispatch per (pow2-padded) chunk — no per-length
        buckets, no scatter chains.  Serves any config whose decode
        table is per-token context-free (byte-encoder fast configs AND
        general/char-mode replacement sets; prefix configs get their
        document heads host-decoded, since the prefix strip happens
        pre-remap).  Streams containing a straddle-capable id fall back
        to the exact host path.  Exactness guarded by tests vs the
        oracle decode."""
        out = self._try_decode_batch_device(token_lists)
        if out is None:
            return self._decode_batch_host(token_lists)
        return out

    def _try_decode_batch_device(
        self, token_lists: list[list[int]]
    ) -> "Optional[list[str]]":
        V = self.tables.vocab_size
        counts = np.fromiter(
            map(len, token_lists), dtype=np.int64, count=len(token_lists)
        )
        total_toks = int(counts.sum())
        if total_toks == 0:
            return ["" for _ in token_lists]
        flat_all = np.concatenate(
            [np.asarray(t, dtype=np.int64) for t in token_lists if t]
        )
        if flat_all.min() < 0 or flat_all.max() >= V:
            raise ValueError(
                "Element must be non-negative and less than vocab size."
            )
        if not self._ensure_decode_device():
            return None
        if self._dec_host_only.any() and self._dec_host_only[flat_all].any():
            return None  # stream holds a straddle-capable id: host path

        heads: Optional[list[bytes]] = None
        if self.ctx.prefix is not None:
            # the strip is PRE-remap on the raw spelling stream
            # (src/pretokenizer.c:209-215): host-decode each document's
            # head tokens covering the prefix length, device-decode the
            # rest (the cut is a token boundary; no id in the stream can
            # straddle one, checked above)
            pref = self.ctx.prefix
            tb, tl = self.tables.token_bytes, self.tables.token_lens
            heads = []
            dev_lists = []
            for ids_l in token_lists:
                raw = b""
                h = 0
                while h < len(ids_l) and len(raw) < len(pref):
                    tid = ids_l[h]
                    raw += tb[tid, : tl[tid]].tobytes()
                    h += 1
                if raw.startswith(pref):
                    raw = raw[len(pref):]
                heads.append(oracle.reverse_remap_nostrip(self.ctx, raw))
                dev_lists.append(ids_l[h:])
            counts = np.fromiter(
                map(len, dev_lists), dtype=np.int64, count=len(dev_lists)
            )
            flat_all = (
                np.concatenate(
                    [np.asarray(t, dtype=np.int64) for t in dev_lists if t]
                )
                if int(counts.sum())
                else np.zeros(0, dtype=np.int64)
            )

        byte_lens = self._dec_counts[flat_all]
        offs = np.concatenate(([0], np.cumsum(byte_lens)))
        total = int(offs[-1])
        if total < (1 << 14):
            # tiny stream: a launch + transfer would be all overhead —
            # fill from the host copy (same bytes by construction)
            rows = self._dec_decoded_np[flat_all]
            col = np.arange(rows.shape[1], dtype=np.int64)[None, :]
            blob = rows[col < byte_lens[:, None]].tobytes()
        else:
            blob = self._decode_device_blob(
                flat_all.astype(np.int32), offs
            )
        bounds = offs[np.concatenate(([0], np.cumsum(counts)))]
        out = []
        for i in range(len(token_lists)):
            piece = blob[bounds[i] : bounds[i + 1]]
            if heads is not None:
                piece = heads[i] + piece
            out.append(piece.decode("utf-8"))
        return out

    def _decode_device_blob(self, flat32: np.ndarray, offs) -> bytes:
        """Fused-launch decode of a token stream to host bytes.

        Chunks only when the stream exceeds the largest quantum; each
        chunk is ONE ``decode_gather_blob`` dispatch with its transfer
        started immediately."""
        jnp = self._jnp
        from .ops.decode import decode_tokens_blob
        from .ops.merge import slice_prefix

        ld = self._dec_decoded_np.shape[1]
        launches = []
        for toks_p, n, _nq, tq, tbytes in self._decode_chunks_tok(
            flat32, offs
        ):
            h = decode_tokens_blob(
                self._dec_decoded_flat,
                self._dec_counts_dev,
                jnp.asarray(toks_p),
                jnp.int32(n),
                tq,
                ld,
            )
            GRAN = 1 << 15
            need = min(-(-tbytes // GRAN) * GRAN, tq)
            if need < tq:
                full = h
                h = slice_prefix(full, need)
                self._retire(full)
            try:
                h.copy_to_host_async()
            except Exception:  # pragma: no cover
                pass
            launches.append((h, tbytes))
        outs = self._jax.device_get([h for h, _ in launches])
        self._retire([h for h, _ in launches])
        return b"".join(
            np.asarray(o)[:tb].tobytes() for o, (_h, tb) in zip(outs, launches)
        )

    def _decode_chunks_tok(self, flat32: np.ndarray, offs):
        """Yield (padded token ids, n real, n-quantum, t-quantum, real
        byte count) launch chunks for ``decode_tokens_blob``.  The host
        keeps the cumulative byte offsets only to pick chunk cuts and
        shape quanta — the per-token prep runs on device."""
        N = flat32.shape[0]
        NMAX = self.DEC_N_QUANTA[-1]
        TMAX = self.DEC_T_QUANTA[-1]
        dt = self._dec_tok_dtype
        lo = 0
        while lo < N:
            hi = min(lo + NMAX, N)
            if int(offs[hi] - offs[lo]) > TMAX:
                cut = int(
                    np.searchsorted(offs, offs[lo] + TMAX, side="right") - 1
                )
                hi = max(cut, lo + 1)
            n = hi - lo
            tbytes = int(offs[hi] - offs[lo])
            nq = next((q for q in self.DEC_N_QUANTA if q >= n), NMAX)
            tq = next((q for q in self.DEC_T_QUANTA if q >= tbytes), TMAX)
            toks_p = np.zeros(nq, dt)
            toks_p[:n] = flat32[lo:hi].astype(dt)
            yield toks_p, n, nq, tq, tbytes
            lo = hi

    def decode_arrays_device(self, flat, doc_offs):
        """Full-device decode for serving pipelines: flat token ids +
        per-doc offsets -> (DEVICE uint8 blob, per-doc byte offsets).

        The decoded text never crosses to the host — the blob stays
        resident for downstream device consumers (the tunnel's d2h path
        otherwise caps any decode that materializes host strings).
        One fused gather dispatch per pow2 chunk (ops/decode.py
        decode_gather_blob); straddle-capable streams build the blob on
        the exact host path and upload it (still a resident blob)."""
        if self.ctx.prefix is not None:
            raise ValueError(
                "decode_arrays_device requires a no-prefix configuration"
            )
        V = self.tables.vocab_size
        flat = np.asarray(flat, dtype=np.int64)
        if flat.size and (flat.min() < 0 or flat.max() >= V):
            raise ValueError(
                "Element must be non-negative and less than vocab size."
            )
        jnp = self._jnp
        ok = self._ensure_decode_device()
        if not ok or (
            self._dec_host_only.any() and self._dec_host_only[flat].any()
        ):
            # exact host decode, then upload (still a resident blob).
            # decode_arrays is exact via the native engine for any
            # config, and via its numpy path only for the byte-encoder
            # fast config — otherwise use the per-document oracle scan.
            if self._native_split_ok or self._decode_fast:
                blob_host, out_offs = self.decode_arrays(flat, doc_offs)
            else:
                blob_host, out_offs = self._decode_arrays_host_exact(
                    flat, doc_offs
                )
            return (
                jnp.asarray(np.frombuffer(blob_host, dtype=np.uint8)),
                out_offs,
            )
        # fully-device serving path (VERDICT r4 #4): the host uploads
        # token ids + doc boundaries and chunks by TOKEN COUNT alone;
        # per-token length gathers, cumsum, v-deltas, chunk byte totals
        # and doc byte offsets all compute on device
        # (ops/decode.py decode_tokens_blob_tot).  Output quanta are
        # PREDICTED from a rolling bytes-per-token estimate; the
        # end-of-batch aux download validates every chunk's real total
        # and the rare overflow redoes the call on the exact host path.
        from .ops.decode import decode_tokens_blob_tot, write_chunk

        ld = self._dec_decoded_np.shape[1]
        dt = self._dec_tok_dtype
        N = flat.shape[0]
        NMAX = self.DEC_N_QUANTA[-1]
        TMAX = self.DEC_T_QUANTA[-1]
        bpt = getattr(self, "_dec_bpt", None) or (
            float(self._dec_counts.mean()) * 1.5 + 1.0
        )
        doc_np = np.asarray(doc_offs, dtype=np.int64)
        DQ = 1 << 14
        parts = []
        lo = 0
        while lo < N or not parts:
            hi = min(lo + NMAX, N)
            n = hi - lo
            est = int(n * bpt * 1.3) + 4096
            tq = next(
                (q for q in self.DEC_T_QUANTA if q >= est), TMAX
            )
            nq = next((q for q in self.DEC_N_QUANTA if q >= n), NMAX)
            toks_p = np.zeros(nq, dt)
            toks_p[:n] = flat[lo:hi].astype(dt)
            sel = (doc_np > lo) & (doc_np <= hi)
            dl = doc_np[sel] - lo
            if dl.shape[0] > DQ:  # absurd doc count: host fallback
                blob_host, out_offs = self.decode_arrays(flat, doc_offs)
                return (
                    jnp.asarray(np.frombuffer(blob_host, dtype=np.uint8)),
                    out_offs,
                )
            dl_p = np.zeros(DQ, np.int32)
            dl_p[: dl.shape[0]] = dl.astype(np.int32)
            h, aux = decode_tokens_blob_tot(
                self._dec_decoded_flat,
                self._dec_counts_dev,
                jnp.asarray(toks_p),
                jnp.int32(n),
                jnp.asarray(dl_p),
                tq,
                ld,
            )
            parts.append((h, aux, tq, int(dl.shape[0]), n))
            lo = hi
        auxs = [np.asarray(a) for _h, a, *_rest in parts]
        totals = [int(a[0]) for a in auxs]
        if len(parts) == 1:
            blob = parts[0][0]  # padded past the real byte count
        else:
            # stitch: write each FULL padded chunk at its real base
            # (later writes overwrite earlier tail padding); the blob
            # must fit every chunk's full padded write
            bases = np.concatenate(([0], np.cumsum(totals[:-1])))
            need = max(
                int(b) + int(h.shape[0])
                for (h, *_r), b in zip(parts, bases)
            )
            size = 1 << max(need - 1, 1).bit_length()
            blob = jnp.zeros((size,), jnp.uint8)
            for (h, *_r), b in zip(parts, bases):
                blob = write_chunk(blob, h, jnp.int32(int(b)))
        # validate predictions; rebuild exactly on overflow (rare)
        for (h, _a, tq, _dn, n), tot in zip(parts, totals):
            if tot > tq:  # pragma: no cover - predictor undershoot
                self._dec_bpt = max(tot / max(n, 1), 1.0) * 1.5
                blob_host, out_offs = self.decode_arrays(flat, doc_offs)
                return (
                    jnp.asarray(np.frombuffer(blob_host, dtype=np.uint8)),
                    out_offs,
                )
        tot_all = sum(totals)
        n_all = sum(p[4] for p in parts)
        if n_all:
            self._dec_bpt = max(tot_all / n_all, 0.25)
        # assemble global doc byte offsets from the per-chunk aux
        D = doc_np.shape[0]
        out_offs = np.zeros(D, dtype=np.int64)
        base = 0
        lo = 0
        for (_h, _a, _tq, dn, n), aux_np, tot in zip(parts, auxs, totals):
            hi = lo + n
            sel = (doc_np > lo) & (doc_np <= hi)
            out_offs[sel] = aux_np[1 : 1 + dn].astype(np.int64) + base
            base += tot
            lo = hi
        out_offs[doc_np <= 0] = 0
        return blob, out_offs

    def _decode_batch_flat(self, token_lists: list[list[int]]) -> list[str]:
        """One flat vectorized pass over the whole batch (no-prefix,
        single-char-pattern byte mode): detokenize + reverse remap with
        zero per-document numpy work."""
        counts = np.array([len(t) for t in token_lists], dtype=np.int64)
        flat = np.concatenate(
            [np.asarray(t, dtype=np.int64) for t in token_lists if t]
        ) if counts.sum() else np.zeros(0, dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)))
        blob, out_offs = self.decode_arrays(flat, offs)
        return [
            blob[out_offs[i] : out_offs[i + 1]].decode("utf-8")
            for i in range(len(token_lists))
        ]

    def _decode_arrays_host_exact(
        self, flat: np.ndarray, doc_offs: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        """Exact array-form decode for ANY replacement set: per-document
        oracle reverse scan over the concatenated raw spellings (the
        numpy fast path in decode_arrays is byte-encoder-fast-config
        only)."""
        t = self.tables
        flat = np.asarray(flat, dtype=np.int64)
        rows = t.token_bytes[flat]
        lens = t.token_lens[flat].astype(np.int64)
        mask = (
            np.arange(rows.shape[1], dtype=np.int32)[None, :] < lens[:, None]
        )
        data = rows[mask].tobytes()
        len_cum = np.concatenate(([0], np.cumsum(lens)))
        bounds = len_cum[np.asarray(doc_offs, dtype=np.int64)]
        pieces: list[bytes] = []
        out_offs = np.zeros(len(bounds), dtype=np.int64)
        for i in range(len(bounds) - 1):
            dec = oracle.reverse_remap_nostrip(
                self.ctx, data[bounds[i] : bounds[i + 1]]
            )
            pieces.append(dec)
            out_offs[i + 1] = out_offs[i] + len(dec)
        return b"".join(pieces), out_offs

    def decode_arrays(
        self, flat: np.ndarray, doc_offs: np.ndarray
    ) -> tuple[bytes, np.ndarray]:
        """Array-form batch decode (the TPU-serving shape): flat token
        ids + doc offsets -> (decoded byte blob, per-doc byte offsets).
        Host vectorized fast path; requires the byte-encoder fast config
        (no prefix, single/2-byte replacement spellings)."""
        if self._native_split_ok:
            nat = self._native_word_encoder()
            if nat is not None:
                return nat.decode_arrays(flat, doc_offs)
        V = self.tables.vocab_size
        flat = np.asarray(flat, dtype=np.int64)
        if flat.size and (flat.min() < 0 or flat.max() >= V):
            raise ValueError(
                "Element must be non-negative and less than vocab size."
            )
        rows = self.tables.token_bytes[flat]
        lens = self.tables.token_lens[flat].astype(np.int64)
        mask = np.arange(rows.shape[1], dtype=np.int32)[None, :] < lens[:, None]
        data = rows[mask]  # flat raw bytes of the whole batch

        # per-doc byte boundaries
        len_cum = np.concatenate(([0], np.cumsum(lens)))
        doc_byte_bounds = len_cum[doc_offs]

        # per-char reverse remap over the flat stream (alignment is
        # per-char and docs end on char boundaries, so one pass serves all)
        n = data.shape[0]
        if n == 0:
            return b"", np.zeros(len(doc_offs), dtype=np.int64)
        is_start = (data & 0xC0) != 0x80
        starts = np.flatnonzero(is_start)
        b0 = data[starts].astype(np.int32)
        nxt = np.minimum(starts + 1, n - 1)
        b1 = data[nxt].astype(np.int32)
        one_byte = b0 < 0x80
        two_byte = (b0 & 0xE0) == 0xC0
        p1 = self._pat1[b0]
        p2 = np.where(two_byte, self._pat2[((b0 << 8) | b1) & 0xFFFF], -1)
        cp2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
        out_bytes = np.where(
            one_byte,
            np.where(p1 >= 0, p1, b0),
            np.where(p2 >= 0, p2, np.where(two_byte & (cp2 < 256), cp2, ord("?"))),
        ).astype(np.uint8)

        # each char start emits exactly one byte: output doc boundaries =
        # number of char starts before each input boundary
        start_cum = np.concatenate(([0], np.cumsum(is_start)))
        return out_bytes.tobytes(), start_cum[doc_byte_bounds]

    def _reverse_remap_np(self, raw: bytes) -> bytes:
        """Per-char vectorized reverse remap (byte-encoder mode, single-char
        patterns): each char start emits exactly one output byte
        (src/pretokenizer.c:222-255 specialised)."""
        if not raw:
            return b""
        data = np.frombuffer(raw, dtype=np.uint8)
        n = data.shape[0]
        is_start = (data & 0xC0) != 0x80
        starts = np.flatnonzero(is_start)
        b0 = data[starts].astype(np.int32)
        nxt = np.minimum(starts + 1, n - 1)
        b1 = data[nxt].astype(np.int32)

        one_byte = b0 < 0x80
        two_byte = (b0 & 0xE0) == 0xC0
        key2 = (b0 << 8) | b1
        p1 = self._pat1[b0]
        p2 = np.where(two_byte, self._pat2[key2 & 0xFFFF], -1)
        cp2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)

        out = np.where(
            one_byte,
            np.where(p1 >= 0, p1, b0),
            np.where(
                p2 >= 0,
                p2,
                np.where(two_byte & (cp2 < 256), cp2, ord("?")),
            ),
        )
        return out.astype(np.uint8).tobytes()
