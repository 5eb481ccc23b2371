"""Training checkpoint/resume (distributed trainer)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax

    from hutoken_tpu.parallel.mesh import data_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return data_mesh(8)


def test_checkpoint_and_resume_match_straight_run(mesh, tmp_path):
    from hutoken_tpu.parallel.train import distributed_bbpe_train

    corpus = (b"the cat sat on the mat and a dog dug a rug " * 24)
    straight = distributed_bbpe_train(corpus, 300, mesh=mesh, verbose=False)

    ckpt = str(tmp_path / "ckpt.txt")
    # phase 1: train to a smaller vocab, checkpointing every few merges
    distributed_bbpe_train(
        corpus, 280, mesh=mesh, verbose=False,
        checkpoint_path=ckpt, checkpoint_every=8,
    )
    assert (tmp_path / "ckpt.txt").exists()
    assert (tmp_path / "ckpt.txt.merges").exists()

    # phase 2: resume from the checkpoint up to the full target
    resumed = distributed_bbpe_train(
        corpus, 300, mesh=mesh, verbose=False,
        checkpoint_path=ckpt, resume=True,
    )
    assert resumed == straight
