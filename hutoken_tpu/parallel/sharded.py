"""Sharded (multi-chip) encode: the batch_encode equivalent at pod scale.

The padded word block is sharded along the word axis; each chip runs the
identical merge fixed point on its shard.  There is no cross-word state,
so no collectives are needed — the compiler partitions the program and
the only multi-chip cost is the initial shard placement.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.merge import merge_words


def sharded_merge_words(table_arrays, mesh: Mesh, ids):
    """Run the merge fixed point with the word axis sharded over
    ``mesh``'s ``data`` axis (tables replicated per chip)."""
    block_sharding = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot = table_arrays
    t_left = jax.device_put(t_left, repl)
    t_right = jax.device_put(t_right, repl)
    t_rank = jax.device_put(t_rank, repl)
    t_merged = jax.device_put(t_merged, repl)
    ids = jax.device_put(ids, block_sharding)
    return merge_words(
        (t_left, t_right, t_rank, t_merged, probe_len, cap_mask, use_onehot), ids
    )
