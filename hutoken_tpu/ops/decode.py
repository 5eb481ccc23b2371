"""Device decode: token ids -> decoded text bytes.

Recasts the reference decode (src/core.c:513-581 concat +
src/pretokenizer.c:197-296 reverse remap) around one precomputed
table: the engine reverse-remaps every token's spelling ONCE into a
``token_decoded[V, Ld]`` byte table (exact per token whenever no
reverse-map match can straddle a token boundary — the engine verifies
that per id and routes straddle-capable streams to the host), after
which device decode is pure data movement.

``decode_gather_blob`` is the one-launch path: the whole token stream
decodes in a single fused dispatch — per-token v-deltas scattered at
token starts, one cumsum, one table gather per output byte.  No
scatter chains, no per-length buckets, no padding waste beyond the
pow2 shape quantum.  (Rounds 2-3 used per-decoded-length bucket
kernels — dense row gathers and scatter chains; the fused form
replaced them in round 4 at ~10-20x their measured rate.)
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


@functools.partial(jax.jit, donate_argnums=(0,))
def write_chunk(out, chunk, offset):
    """Write a full chunk blob into ``out`` at a dynamic byte offset
    (multi-chunk stitching for decode_arrays_device: later writes
    overwrite earlier chunks' tail padding).  One compile per
    (out, chunk) shape pair — both ride pow2 quantum ladders."""
    return jax.lax.dynamic_update_slice(
        out, chunk, (offset.astype(jnp.int32),)
    )
