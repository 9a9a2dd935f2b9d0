"""Multi-host setup: ICI within a slice, DCN across hosts.

Replaces the reference's torch.distributed init (NCCL env rendezvous,
finetune_pp.py:33-36) with jax.distributed: after ``initialize()`` every
host sees the global device set and the same Mesh/pjit program runs SPMD —
collectives ride ICI inside a slice and DCN between slices without any
backend code here.

Typical pod-slice serving layout (BASELINE.json north star: 2+ hosts,
tensor-sharded weights/KV):

    initialize_multihost()                       # once per process
    mesh = make_mesh_named(dp=n_slices, tp=8)    # tp within a slice (ICI)
    params_tp = shard_llama_params_tp(...)       # pack per shard
    logits, cache = tp_decode_step(...)          # psums on ICI

With the default device order jax.devices() groups each host's local
devices; keep the tp axis within a host/slice so the per-layer psums never
cross DCN (dp gradients/all-reduces are the only DCN traffic).
"""

import jax


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """jax.distributed.initialize with env-var fallbacks (JAX reads
    COORDINATOR_ADDRESS etc. on TPU pods automatically)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch, mesh, axis="dp"):
    """Rows of the global batch owned by this process under a batch-sharded
    input (for per-host data loading)."""
    n = mesh.shape[axis]
    per = global_batch // n
    # processes own contiguous dp shards in mesh order
    idx = jax.process_index() % n
    return slice(idx * per, (idx + 1) * per)
