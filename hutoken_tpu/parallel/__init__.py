"""Multi-chip parallelism: mesh helpers, sharded encode, distributed training.

The reference's only parallelism is a pthread pool over documents
(reference: src/taskqueue.c, src/lib.c:722-874).  The TPU-native
equivalent is data parallelism over a 1-D ``data`` mesh axis:

* **encode/decode** — embarrassingly parallel: the padded word blocks are
  sharded over chips with ``NamedSharding(P("data", None))``; XLA runs
  the merge fixed point on each shard with zero communication.
* **training** — corpus shards counted in parallel; per merge step the
  pair-count histograms are combined with a ``psum`` over ICI before the
  global argmax (the only collective the workload needs).

Multi-host (DCN) runs the same program under ``jax.distributed``; the
merge-rank table is replicated per chip in HBM.
"""

from .mesh import data_mesh, shard_batch  # noqa: F401
from .sharded import sharded_merge_words  # noqa: F401
