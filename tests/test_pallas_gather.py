"""Pallas in-row gather: correctness on TPU (skipped on CPU platforms,
where Mosaic is unavailable)."""

import numpy as np
import pytest


def test_inrow_gather_tpu():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("Pallas TPU kernel; no TPU backend in this run")
    import jax.numpy as jnp

    from hutoken_tpu.ops.pallas_gather import inrow_gather

    rng = np.random.RandomState(0)
    mat = rng.randint(0, 1 << 20, size=(256, 128)).astype(np.int32)
    idx = rng.randint(0, 128, size=(256, 128)).astype(np.int32)
    out = np.asarray(inrow_gather(jnp.asarray(mat), jnp.asarray(idx)))
    want = np.take_along_axis(mat, idx, axis=1)
    assert np.array_equal(out, want)


def test_inrow_gather_shape_validation():
    import jax.numpy as jnp

    from hutoken_tpu.ops.pallas_gather import inrow_gather

    with pytest.raises(ValueError, match="mat must be"):
        inrow_gather(jnp.zeros((4, 64), jnp.int32), jnp.zeros((4, 64), jnp.int32))
