"""Device decode: token ids -> decoded text bytes.

Recasts the reference decode (src/core.c:513-581 concat +
src/pretokenizer.c:197-296 reverse remap) around one precomputed
table: the engine reverse-remaps every token's spelling ONCE into a
``token_decoded[V, Ld]`` byte table (exact per token whenever no
reverse-map match can straddle a token boundary — the engine verifies
that per id and routes straddle-capable streams to the host), after
which device decode is pure data movement.

``decode_gather_blob`` is the one-launch path: the whole token stream
decodes in a single fused dispatch — token-of-byte via scatter+cumsum,
then one table gather per output byte.  No scatter chains, no per-
length buckets, no padding waste beyond the pow2 shape quantum.  The
older per-length-bucket kernels (``decode_rows_fixed_len``,
``decode_scatter_*``) remain for comparison benchmarks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("ld", "out_size"))
def decode_gather_blob(dec_flat, ids, offs, ld: int, out_size: int):
    """Decode a whole token stream in ONE launch.

    ``dec_flat`` is the [V*ld] flattened per-id decoded-bytes table,
    ``ids`` int32 [N] token ids (pad with 0), ``offs`` int32 [N] each
    token's first output-byte offset, ascending (pad with the total
    byte count).  Returns a uint8 [out_size] blob whose first ``total``
    bytes are the decoded text.

    out[i] = dec_flat[ids[tok(i)] * ld + (i - offs[tok(i)])] where
    tok(i) = (number of tokens starting at or before byte i) - 1 —
    computed as a scatter of ones at token starts + a cumsative sum.
    Zero-length tokens share their successor's start and the cumsum
    lands on the later token, which owns the byte.
    """
    marks = jnp.zeros((out_size,), jnp.int32).at[offs].add(1, mode="drop")
    tok = jnp.cumsum(marks) - 1
    tok = jnp.clip(tok, 0, ids.shape[0] - 1)
    start = offs[tok]
    pos = jnp.arange(out_size, dtype=jnp.int32) - start
    idx = ids[tok] * ld + jnp.clip(pos, 0, ld - 1)
    idx = jnp.clip(idx, 0, dec_flat.shape[0] - 1)
    return dec_flat[idx]


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
