"""Device decode: token ids -> packed output bytes.

Recasts the reference decode (src/core.c:513-581 concat +
src/pretokenizer.c:197-296 reverse remap) as array ops over a padded
block of token ids:

1. gather each id's spelling row from the ``token_bytes[V, L]`` table
   (per-row dynamic-slice gathers — the fast lowering),
2. classify char-start bytes (UTF-8 lead bytes) within each row —
   vocab spellings are whole remapped chars, so a char never straddles
   tokens and the next byte of any 2-byte char is in the same row,
3. reverse the byte->unicode remap per char start with the 256/65536
   pattern tables (single- and two-byte replacement spellings; the
   engine verifies this covers the table before selecting this path,
   matching its vectorized host fast path),
4. compact the one-output-byte-per-char-start results into a flat byte
   stream (row-major), downloadable as a prefix because the host knows
   every token's decoded char count from its own table.

Serves byte-encoder configs with no prefix; the general multi-char
replacement table stays on the host scan (engine.decode_batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .merge import fast_gather


def _gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] for a 2-D table — per-row dynamic-slice gathers."""
    L = table.shape[1]

    def per_id(i):
        return jax.lax.dynamic_slice(table, (i, 0), (1, L))[0]

    return jax.vmap(per_id)(ids)


@functools.partial(jax.jit, static_argnames=())
def _decode_block(token_bytes, token_lens, pat1, pat2, ids):
    """ids [N] int32 -> packed decoded bytes [N * L] uint8 (row-major
    compacted; each token contributes exactly its char count)."""
    N = ids.shape[0]
    L = token_bytes.shape[1]
    rows = _gather_rows(token_bytes, ids).astype(jnp.int32)  # [N, L]
    lens = fast_gather(token_lens, ids)  # [N]
    col = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    valid = col < lens[:, None]
    is_start = valid & ((rows & 0xC0) != 0x80)

    b0 = rows
    b1 = jnp.pad(rows[:, 1:], ((0, 0), (0, 1)))
    one_byte = b0 < 0x80
    two_byte = (b0 & 0xE0) == 0xC0
    p1 = fast_gather(pat1, jnp.clip(b0, 0, 255))
    key2 = ((b0 << 8) | b1) & 0xFFFF
    p2 = jnp.where(two_byte, fast_gather(pat2, key2), -1)
    cp2 = ((b0 & 0x1F) << 6) | (b1 & 0x3F)
    out = jnp.where(
        one_byte,
        jnp.where(p1 >= 0, p1, b0),
        jnp.where(
            p2 >= 0, p2, jnp.where(two_byte & (cp2 < 256), cp2, ord("?"))
        ),
    ).astype(jnp.uint8)

    # compact: one byte per char start, row-major
    counts = jnp.sum(is_start, axis=1, dtype=jnp.int32)  # [N]
    row_base = jnp.cumsum(counts) - counts
    pos = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    dest = jnp.where(is_start, row_base[:, None] + pos, N * L)
    flat = jnp.zeros((N * L,), dtype=jnp.uint8)
    flat = flat.at[dest.reshape(-1)].set(
        out.reshape(-1), mode="drop", unique_indices=True
    )
    return flat


def decode_ids_block(table_arrays, ids) -> jnp.ndarray:
    """One padded block of token ids -> packed decoded byte stream."""
    token_bytes, token_lens, pat1, pat2 = table_arrays
    return _decode_block(token_bytes, token_lens, pat1, pat2, ids)


@functools.partial(jax.jit, static_argnames=("k",))
def decode_rows_fixed_len(token_decoded, ids, k: int) -> jnp.ndarray:
    """Decoded bytes for ids whose decoded length is EXACTLY k.

    The caller buckets the token stream by decoded length host-side, so
    each bucket's output is dense by construction: one row-gather of k
    bytes per token, a reshape, and NOTHING else — no per-byte scatter
    (XLA scatter runs ~150M elem/s and dominated the old block kernel),
    no compaction, and the device->host transfer carries exactly the
    decoded bytes.  The host interleaves bucket streams back into
    document order with vectorized numpy (it knows every token's
    decoded offset).  Reference semantics: src/core.c:548-559 concat of
    per-id spellings + src/pretokenizer.c:197-296 reverse remap, with
    the remap precomputed per token into ``token_decoded``."""

    def per_id(i):
        return jax.lax.dynamic_slice(token_decoded, (i, 0), (1, k))[0]

    rows = jax.vmap(per_id)(ids)  # [N, k] uint8
    return rows.reshape(-1)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def decode_scatter_bucket(out, token_decoded, ids, dest, k: int):
    """Scatter one fixed-decoded-length bucket into the device-resident
    output blob (serving path: the blob never leaves the device).
    ``dest`` is each token's first output byte offset; padded entries
    carry an out-of-range dest and drop."""

    def per_id(i):
        return jax.lax.dynamic_slice(token_decoded, (i, 0), (1, k))[0]

    rows = jax.vmap(per_id)(ids)  # [N, k] uint8
    ar = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], k), 1)
    dests = (dest[:, None] + ar).reshape(-1)
    return out.at[dests].set(rows.reshape(-1), mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def decode_scatter_masked(out, token_decoded, ids, dest, lens):
    """Variable-length variant for the non-dominant lengths: one shape
    covers every remaining bucket (full-width rows, per-byte length
    mask).  Costs ~Ld/len extra scatter lanes, which is fine for the
    minority of tokens it serves."""
    Ld = token_decoded.shape[1]

    def per_id(i):
        return jax.lax.dynamic_slice(token_decoded, (i, 0), (1, Ld))[0]

    rows = jax.vmap(per_id)(ids)  # [N, Ld] uint8
    ar = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], Ld), 1)
    oob = jnp.int32(out.shape[0])
    dests = jnp.where(ar < lens[:, None], dest[:, None] + ar, oob)
    return out.at[dests.reshape(-1)].set(rows.reshape(-1), mode="drop")
