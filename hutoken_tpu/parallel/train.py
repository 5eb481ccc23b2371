"""Distributed BPE training: corpus-shard pair counting with psum over ICI.

Device recast of the trainers in train/bpe.py / train/bbpe.py (reference:
src/bpe.c:108-231, src/bbpe.c:73-124): the corpus lives sharded across
chips as an id array; each merge step is

    1. per-chip pair-count histogram over the live shard (dense [K*K]
       bincount in HBM; K = target vocab size),
    2. ``psum`` of histograms over the ``data`` mesh axis — the single
       collective of the workload,
    3. global argmax -> winning pair,
    4. vectorized left-to-right merge of the winning pair within each
       shard (run-parity mask, identical to the sequential two-pointer
       rewrite of src/bbpe.c:53-71).

Semantics are the *corrected* trainer semantics (``strict=False``):
array-reuse artifacts of the reference implementation are not emulated,
and shard boundaries are merge barriers (pairs spanning two shards are
neither counted nor merged — shards are cut at document/whitespace
boundaries by the caller, so with D shards at most D-1 of the billions
of corpus pairs are affected).  Tie-break note: the scan-order
first-to-reach-max rule of the host trainer degenerates to
lowest-pair-key on device (documented divergence; identical when counts
have a unique max).
"""

from __future__ import annotations

import numpy as np


def _merge_mask_device(match):
    """Left-to-right non-overlapping selection of matched pair positions
    (device version of train.common.left_to_right_merge_mask).

    take[i] = match[i] and i is at even offset within its run of
    consecutive matches.  Computed with a prefix-scan over run starts.
    """
    import jax
    import jax.numpy as jnp

    n = match.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), bool), match[:-1]])
    run_start = match & ~prev
    start_idx = jnp.where(run_start, idx, -1)
    start_idx = jax.lax.associative_scan(jnp.maximum, start_idx)
    pos_in_run = idx - start_idx
    return match & ((pos_in_run & 1) == 0)


def make_train_step(K: int, mesh, min_merge_count: int = 2):
    """Build the jitted sharded train step.

    State per shard: ``ids`` int32 [n] (PAD = -1 for holes), scanned with
    shard_map over the ``data`` axis.  Returns (counts_argmax_key,
    max_count, new_ids) per step.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    def count_shard(ids):
        a = ids[:-1]
        b = ids[1:]
        valid = (a >= 0) & (b >= 0)
        keys = jnp.where(valid, a * K + b, 0)
        hist = jnp.zeros((K * K,), jnp.int32).at[keys].add(
            valid.astype(jnp.int32), mode="drop"
        )
        return hist

    def step(ids):
        hist = count_shard(ids)
        hist = jax.lax.psum(hist, "data")
        best_key = jnp.argmax(hist)
        best_count = hist[best_key]
        return best_key.astype(jnp.int32), best_count.astype(jnp.int32)

    def apply_merge(ids, id1, id2, new_id):
        from ..ops.merge import fast_gather

        a = ids[:-1]
        b = ids[1:]
        match = (a == id1) & (b == id2)
        take = _merge_mask_device(match)
        consumed = jnp.concatenate([jnp.zeros((1,), bool), take])
        new = jnp.where(
            jnp.concatenate([take, jnp.zeros((1,), bool)]), new_id, ids
        )
        new = jnp.where(consumed, -1, new)
        # stable in-shard compaction: kept elements keep order, holes sink
        # to the shard tail (so adjacency = pair adjacency next step)
        perm = jnp.argsort(new == -1, stable=True)
        return fast_gather(new, perm.astype(jnp.int32))

    def fused(ids, new_id):
        """count + psum + argmax + conditional merge, one dispatch."""
        key, cnt = step(ids)
        id1 = (key // K).astype(jnp.int32)
        id2 = (key % K).astype(jnp.int32)
        merged = apply_merge(ids, id1, id2, new_id[0])
        # byte-level training stops at count <= 1 (src/bbpe.c:83-84) so the
        # merge must not land then; the string trainer merges any best pair
        # (min_merge_count=1).  State untouched -> the caller's break is clean.
        new_ids = jnp.where(cnt >= min_merge_count, merged, ids)
        return key, cnt, new_ids

    count_fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=(P(), P()),
    )

    merge_fn = shard_map(
        apply_merge,
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=P("data"),
    )

    fused_fn = shard_map(
        fused,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=(P(), P(), P("data")),
    )

    @jax.jit
    def train_step(ids):
        key, cnt = count_fn(ids)
        return key, cnt

    @jax.jit
    def merge_step(ids, id1, id2, new_id):
        return merge_fn(
            ids,
            jnp.asarray([id1], jnp.int32),
            jnp.asarray([id2], jnp.int32),
            jnp.asarray([new_id], jnp.int32),
        )

    @jax.jit
    def fused_step(ids, new_id):
        return fused_fn(ids, jnp.asarray([new_id], jnp.int32))

    return train_step, merge_step, fused_step


def distributed_bbpe_train(
    data: bytes,
    vocab_size: int,
    *,
    mesh,
    verbose: bool = True,
) -> dict[bytes, int]:
    """Byte-level distributed training (device pair counting + psum)."""
    import jax.numpy as jnp

    from ..parallel.mesh import shard_batch

    K = vocab_size
    str2id: dict[bytes, int] = {}
    id2str: dict[int, bytes] = {}
    for i in range(256):
        key = b"" if i == 0 else bytes([i])
        str2id[key] = i
        id2str[i] = key
    count = 256

    n_dev = mesh.devices.size
    ids_np = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    # pad the shard axis with holes so it divides the mesh
    pad = (-len(ids_np)) % n_dev
    if pad:
        ids_np = np.concatenate([ids_np, np.full(pad, -1, np.int32)])
    _, _, fused_step = make_train_step(K, mesh, min_merge_count=2)
    ids = shard_batch(mesh, jnp.asarray(ids_np))

    prev_pair = None
    while count < vocab_size:
        new_id = count
        key, cnt, new_ids = fused_step(ids, new_id)
        key = int(key)
        cnt = int(cnt)
        if cnt <= 1:
            break
        ids = new_ids
        id1, id2 = key // K, key % K
        merged = id2str.get(id1, b"") + id2str.get(id2, b"")
        if merged not in str2id:
            count += 1
        str2id[merged] = new_id
        id2str[new_id] = merged
        if verbose:
            print(f"Most common pair: ({id1}, {id2}), freq: {cnt}")
            print(f"New token id: {new_id}\n")
        if prev_pair == (id1, id2):
            break
        prev_pair = (id1, id2)
    return str2id


def distributed_bpe_train(
    data: bytes,
    vocab_size: int,
    *,
    mesh,
    verbose: bool = True,
) -> dict[bytes, int]:
    """String-keyed distributed training.

    Identical device machinery to the byte-level trainer — pairs are
    keyed by element ids, and since the corrected (non-strict) string
    trainer never produces two live elements with the same spelling but
    different ids, id-keying equals spelling-keying.  The id-assignment
    quirk (count+1, skipping 256) is preserved (src/bpe.c:171).
    """
    import jax.numpy as jnp

    from ..parallel.mesh import shard_batch

    K = vocab_size + 2  # ids run to count+1
    str2id: dict[bytes, int] = {}
    id2str: dict[int, bytes] = {}
    for i in range(256):
        key = b"" if i == 0 else bytes([i])
        str2id[key] = i
        id2str[i] = key
    count = 256

    n_dev = mesh.devices.size
    ids_np = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    pad = (-len(ids_np)) % n_dev
    if pad:
        ids_np = np.concatenate([ids_np, np.full(pad, -1, np.int32)])
    _, _, fused_step = make_train_step(K, mesh, min_merge_count=1)
    ids = shard_batch(mesh, jnp.asarray(ids_np))

    prev_key: bytes | None = None
    while count < vocab_size:
        new_id = count + 1
        key, cnt, new_ids = fused_step(ids, new_id)
        cnt = int(cnt)
        if cnt < 1:
            break
        ids = new_ids
        key = int(key)
        id1, id2 = key // K, key % K
        merged = id2str.get(id1, b"") + id2str.get(id2, b"")
        if merged not in str2id:
            count += 1
        str2id[merged] = new_id
        id2str[new_id] = merged
        if verbose:
            print(
                f"Most common pair: '{merged.decode('utf-8', 'replace')}', rank: {cnt}"
            )
            print(
                f"New token '{merged.decode('utf-8', 'replace')}', value: {new_id}\n"
            )
        if prev_key is not None and prev_key == merged:
            break
        prev_key = merged
    return str2id
