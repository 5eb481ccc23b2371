"""Device decode: token ids -> decoded text bytes.

Recasts the reference decode (src/core.c:513-581 concat +
src/pretokenizer.c:197-296 reverse remap) around one precomputed
table: the engine reverse-remaps every token's spelling ONCE into a
``token_decoded[V, Ld]`` byte table (valid because replacements are
per-char and chars never straddle tokens), after which device decode
is pure data movement.  The engine buckets the token stream by exact
decoded length so each bucket's output is dense by construction — a
k-byte row gather per token and a reshape, no scatter, no compaction
(``decode_rows_fixed_len``); the serving path scatters buckets into a
device-resident blob instead (``decode_scatter_*``).

Serves byte-encoder configs with no prefix; the general multi-char
replacement table stays on the host scan (engine.decode_batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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
