"""Pallas TPU in-row gather (the fast per-word lookup primitive).

Mosaic supports a 2-D gather along the lane axis: ``out[i, j] =
mat[i, idx[i, j]]`` when both the operand row and the index row are
exactly 128 lanes wide.  Measured at ~3 G lookups/s on v5e — about 40x
the XLA scalar-core gather path.  Shapes outside that contract are
rejected by the compiler (wider rows fail, per-lane gathers along the
sublane axis crash Mosaic), so this wrapper enforces it.

This is the building block for the planned lookup-free merge loop
(ARCHITECTURE.md "round-2"): per-word rank matrices packed into 128-lane
rows make every in-loop rank fetch an in-row gather instead of a table
probe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANES = 128


def inrow_gather(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``out[i, j] = mat[i, idx[i, j]]`` for 128-lane rows.

    ``mat``: [rows, 128] int32; ``idx``: [rows, 128] int32 in [0, 128).
    """
    if mat.ndim != 2 or mat.shape[1] != LANES:
        raise ValueError(f"mat must be [rows, {LANES}], got {mat.shape}")
    if idx.shape != mat.shape:
        raise ValueError(f"idx shape {idx.shape} must match mat {mat.shape}")

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(m_ref, i_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(m_ref[:, :], i_ref[:, :], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(mat.shape, mat.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mat, idx)
