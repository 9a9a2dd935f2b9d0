"""Multi-host (parallel/multihost.py): batch-slice math, the documented
mesh recipe, and a REAL 2-process jax.distributed run — two subprocesses
with 4 virtual CPU devices each rendezvous through
``initialize_multihost`` (gloo collectives), run the dp x tp train step +
a TP decode step with dp spanning the process boundary, and the loss must
match the single-process 8-device run exactly. Reference counterpart: the
NCCL env rendezvous in finetune_pp.py:33-36 — which has no test at all."""

import os
import socket
import subprocess
import sys

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


def _single_process_reference():
    """Same model/mesh/step as multihost_worker.py, on this process's own
    8-device mesh (conftest forces xla_force_host_platform_device_count=8)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsebit_tpu.llm.kv_cache import init_kv_cache
    from sparsebit_tpu.llm.llama import init_llama_params, llama_tiny
    from sparsebit_tpu.parallel.mesh import make_mesh
    from sparsebit_tpu.parallel.tp import (
        TPLinear,
        shard_kv_cache_tp,
        shard_llama_params_tp,
        tp_decode_step,
        tp_llama_loss,
    )

    cfg = llama_tiny(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=64 * 2, max_seq_len=64, dtype="float32",
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, tp=2)
    params_tp = shard_llama_params_tp(params, cfg, 2)
    params_tp = jax.tree.map(
        lambda x: (
            jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("tp"))), x
            )
            if isinstance(x, TPLinear)
            else jax.device_put(x, NamedSharding(mesh, P()))
        ),
        params_tp,
        is_leaf=lambda x: isinstance(x, TPLinear),
    )
    tokens = jax.device_put(
        jnp.tile(jnp.arange(16, dtype=jnp.int32)[None] % cfg.vocab_size,
                 (8, 1)),
        NamedSharding(mesh, P("dp")),
    )
    loss = jax.jit(lambda p, t: tp_llama_loss(p, t, cfg, mesh))(
        params_tp, tokens)

    cache = init_kv_cache(cfg, 2, 16, quantized=True)
    cache_tp = shard_kv_cache_tp(cache, mesh)
    tok = jnp.array([3, 7], jnp.int32)
    logits, _ = jax.jit(
        lambda p, t, c: tp_decode_step(p, t, c, cfg, mesh)
    )(params_tp, tok, cache_tp)
    return float(loss), float(logits[0, 0])


def test_two_process_distributed_matches_single_process():
    """Spawn 2 real processes through initialize_multihost and assert the
    dp x tp loss and the TP decode logit match the single-process run."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker)),
         env.get("PYTHONPATH", "")])
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, "worker %s failed:\n%s" % (p.args, o)
    result = [ln for ln in outs[0].splitlines() if ln.startswith("RESULT ")]
    assert result, outs[0]
    loss_mh, logit_mh = (float(v) for v in result[0].split()[1:])

    loss_sp, logit_sp = _single_process_reference()
    assert abs(loss_mh - loss_sp) < 1e-5, (loss_mh, loss_sp)
    assert abs(logit_mh - logit_sp) < 1e-5, (logit_mh, logit_sp)
