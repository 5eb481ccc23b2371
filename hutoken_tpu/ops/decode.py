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


@functools.partial(jax.jit, static_argnames=("out_size", "ld"))
def decode_tokens_blob(dec_flat, counts, toks, n_valid, out_size: int,
                       ld: int):
    """One-launch decode from RAW token ids: the per-token byte-length
    gather, offset cumsum and v-delta construction all run on device,
    so the host uploads ONLY the (u16/i32) token stream — no numpy
    length gather, no cumsum, no 8-byte-per-token delta/offset upload.
    (VERDICT r4 #4: that host prep was the 10x gap between the fused
    kernel's measured rate and the serving path's e2e rate.)

    ``counts`` int32 [V] per-id decoded byte counts; ``toks`` [N]
    padded token ids with ``n_valid`` real entries; ``ld`` the decoded
    table's row stride.  Same output contract as `decode_gather_blob`.
    """
    from .merge import fast_gather

    N = toks.shape[0]
    ids = toks.astype(jnp.int32)
    iota = jnp.arange(N, dtype=jnp.int32)
    valid = iota < n_valid
    lens = jnp.where(valid, fast_gather(counts, ids), 0)
    cum = jnp.cumsum(lens)
    offs = cum - lens
    v = ids * ld - offs
    vprev = jnp.concatenate([jnp.zeros(1, jnp.int32), v[:-1]])
    delta = jnp.where(valid, v - vprev, 0)
    offs_p = jnp.where(valid, offs, out_size)  # pad entries drop
    acc = jnp.zeros((out_size,), jnp.int32).at[offs_p].add(
        delta, mode="drop"
    )
    vb = jnp.cumsum(acc)
    idx = vb + jnp.arange(out_size, dtype=jnp.int32)
    idx = jnp.clip(idx, 0, dec_flat.shape[0] - 1)
    return dec_flat[idx]


@functools.partial(jax.jit, static_argnames=("out_size", "ld"))
def decode_tokens_blob_tot(dec_flat, counts, toks, n_valid, doc_local,
                           out_size: int, ld: int):
    """`decode_tokens_blob` + the serving path's remaining host needs
    computed on device: returns (blob, aux int32 [1 + Dq]) where
    aux[0] = the chunk's REAL byte total (the host validates it against
    ``out_size`` after the fact — launches use a predicted quantum) and
    aux[1:] = byte offsets of the doc boundaries listed in
    ``doc_local`` (token indices local to this chunk; 0-padded).  With
    these on device, decode_arrays_device uploads token ids and doc
    boundaries and downloads nothing per chunk — the blob stays
    resident and one aggregate aux fetch ends the batch."""
    from .merge import fast_gather

    N = toks.shape[0]
    ids = toks.astype(jnp.int32)
    iota = jnp.arange(N, dtype=jnp.int32)
    valid = iota < n_valid
    lens = jnp.where(valid, fast_gather(counts, ids), 0)
    cum = jnp.cumsum(lens)
    total = cum[N - 1]
    offs = cum - lens
    v = ids * ld - offs
    vprev = jnp.concatenate([jnp.zeros(1, jnp.int32), v[:-1]])
    delta = jnp.where(valid, v - vprev, 0)
    offs_p = jnp.where(valid, offs, out_size)
    acc = jnp.zeros((out_size,), jnp.int32).at[offs_p].add(
        delta, mode="drop"
    )
    vb = jnp.cumsum(acc)
    idx = vb + jnp.arange(out_size, dtype=jnp.int32)
    idx = jnp.clip(idx, 0, dec_flat.shape[0] - 1)
    docb = jnp.where(
        doc_local > 0,
        fast_gather(cum, jnp.maximum(doc_local - 1, 0)),
        0,
    )
    aux = jnp.concatenate([total.reshape(1), docb]).astype(jnp.int32)
    return dec_flat[idx], aux


@functools.partial(jax.jit, donate_argnums=(0,))
def write_chunk(out, chunk, offset):
    """Write a full chunk blob into ``out`` at a dynamic byte offset
    (multi-chunk stitching for decode_arrays_device: later writes
    overwrite earlier chunks' tail padding).  One compile per
    (out, chunk) shape pair — both ride pow2 quantum ladders."""
    return jax.lax.dynamic_update_slice(
        out, chunk, (offset.astype(jnp.int32),)
    )
