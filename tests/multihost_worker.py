"""Worker for the 2-process jax.distributed test (test_multihost.py).

Run as: python multihost_worker.py <process_id> <port>

Each process brings 4 virtual CPU devices; after initialize_multihost the
global mesh is (dp=4, tp=2) — dp spans the PROCESS boundary (jax.devices()
is process-major, so dp shards 0-1 live on process 0 and 2-3 on process 1,
while every tp pair stays process-local), exactly the DCN-outside /
ICI-inside layout documented in parallel/multihost.py. The dp loss mean is
the cross-process (gloo) collective under test.

Prints one line ``RESULT <train_loss> <decode_logit00>`` on process 0;
the parent test asserts parity with the single-process 8-device run.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cross-process CPU collectives need an explicit backend (gloo ships with
# jaxlib); TPU pods use the ICI/DCN backend automatically instead
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def gput(mesh, x, spec):
    """Global array from process-replicated host data: every process holds
    the full value and contributes its addressable shards (device_put onto
    non-addressable devices is not portable across processes)."""
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
    )


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]

    from sparsebit_tpu.parallel.multihost import initialize_multihost

    idx, count = initialize_multihost(
        coordinator_address="127.0.0.1:%s" % port,
        num_processes=2,
        process_id=pid,
    )
    assert (idx, count) == (pid, 2), (idx, count)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4, jax.local_devices()

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

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
        ffn_dim=128, max_seq_len=64, dtype="float32",
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    dp, tp = 4, 2
    mesh = make_mesh(dp=dp, tp=tp)

    params_tp = shard_llama_params_tp(params, cfg, tp)
    params_tp = jax.tree.map(
        lambda x: (
            jax.tree.map(lambda a: gput(mesh, a, P("tp")), x)
            if isinstance(x, TPLinear)
            else gput(mesh, x, P())
        ),
        params_tp,
        is_leaf=lambda x: isinstance(x, TPLinear),
    )
    tokens = gput(
        mesh,
        jnp.tile(jnp.arange(16, dtype=jnp.int32)[None] % cfg.vocab_size,
                 (2 * dp, 1)),
        P("dp"),
    )

    loss = jax.jit(lambda p, t: tp_llama_loss(p, t, cfg, mesh))(
        params_tp, tokens
    )
    loss.block_until_ready()
    assert jnp.isfinite(loss), loss

    # TP decode step across the process boundary (dp replicates the cache)
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cache = init_kv_cache(cfg, 2, 16, quantized=True)
    cache = jax.tree.map(lambda a: gput(mesh, a, P()), cache)
    cache_tp = shard_kv_cache_tp(cache, mesh)
    tok = gput(mesh, jnp.array([3, 7], jnp.int32), P())
    logits, cache_tp = jax.jit(
        lambda p, t, c: tp_decode_step(p, t, c, cfg, mesh)
    )(params_tp, tok, cache_tp)
    logits.block_until_ready()
    assert bool(jnp.all(jnp.isfinite(logits)))

    if pid == 0:
        print("RESULT %.8f %.8f" % (float(loss), float(logits[0, 0])),
              flush=True)


if __name__ == "__main__":
    main()
