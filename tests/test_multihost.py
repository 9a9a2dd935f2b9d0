"""Multi-host helpers (parallel/multihost.py): the pieces testable in a
single process. jax.distributed.initialize itself needs real hosts; the
per-host batch-slice math and the documented mesh recipe must hold on the
virtual 8-device mesh (reference counterpart: the NCCL env rendezvous in
finetune_pp.py:33-36 — which has no test at all)."""

import jax

from sparsebit_tpu.parallel.mesh import make_mesh_named
from sparsebit_tpu.parallel.multihost import local_batch_slice


def test_local_batch_slice_partitions_batch():
    mesh = make_mesh_named(dp=4, tp=2)
    sl = local_batch_slice(32, mesh, axis="dp")
    # single process == index 0: first dp shard, contiguous, 32/4 rows
    assert sl == slice(0, 8)


def test_local_batch_slice_covers_whole_batch():
    mesh = make_mesh_named(dp=2, tp=4)
    per = 64 // 2
    sl = local_batch_slice(64, mesh, axis="dp")
    assert (sl.stop - sl.start) == per


def test_recipe_mesh_axes_exist():
    # the user-guide recipe: tp within a slice, dp across
    mesh = make_mesh_named(dp=2, tp=4)
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 4
    assert len(jax.devices()) == 8
