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


@functools.partial(jax.jit, static_argnames=("out_size",))
def decode_gather_blob(dec_flat, v_delta, offs, out_size: int):
    """Decode a whole token stream in ONE launch: a scatter, a cumsum,
    and a single table gather per output byte.

    ``dec_flat`` is the [V*ld] flattened per-id decoded-bytes table.
    The host precomputes per token ``v[j] = ids[j]*ld - offs[j]`` and
    passes ``v_delta`` int32 [N] (= v[j] - v[j-1], v[0] for j=0) and
    ``offs`` int32 [N] (each token's first output-byte offset,
    ascending; pad tokens carry offs = total, delta = 0).  Then for
    output byte i owned by token j:

        out[i] = dec_flat[v[j] + i]        since v[j] + i
               = ids[j]*ld + (i - offs[j]) = row j, byte-in-token

    and ``v[tok(i)]`` for EVERY byte is one cumsum over the deltas
    scattered at token starts — tokens sharing a start (zero-length
    decoded spellings) telescope to the last one, which owns the byte.
    Returns a uint8 [out_size] blob; bytes past the real total are
    padding garbage for the caller to slice off.
    """
    acc = jnp.zeros((out_size,), jnp.int32).at[offs].add(
        v_delta, mode="drop"
    )
    v = jnp.cumsum(acc)
    idx = v + jnp.arange(out_size, dtype=jnp.int32)
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
