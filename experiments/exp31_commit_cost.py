"""exp31: price the OUT-OF-KERNEL flat-KV commit (round-5 centerpiece).

The flat (L, B, S, Hkv*D) cache cannot take in-kernel 1-row
dynamic-sublane writes (probe_toolchain: vmem_row_store_dyn /
hbm_row_dma_dyn all false), so the round-5 design emits fresh rows as a
kernel OUTPUT and commits them with pure-XLA updates in the scan body.
The one risk: XLA copying the multi-GB carried cache around the opaque
pallas read + the scatter (the round-1 per-layer version of this pattern
DID copy — 4.6 ms/tok at 7B). This experiment times, per scan step, a
7B-shaped cache commit right after a pallas kernel that READS the cache:

  a) baseline: kernel read only, no commit
  b) vmapped dynamic_update_slice (lowers to scatter)
  c) unrolled per-row dynamic_update_slice chain
  d) .at[arange, pos].set advanced-index scatter

If in place, the marginal cost is ~the 128 KB of row bytes (~micro-
seconds); a copy shows up as ~2.6 ms/step (2.1 GB at 819 GB/s).
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, B, S, KVD = 32, 8, 512, 4096
ITERS = 50


def _read_kernel(cache_hbm, o_ref, row, sem):
    cp = pltpu.make_async_copy(cache_hbm.at[0, 0, pl.ds(0, 8), :], row, sem)
    cp.start()
    cp.wait()
    o_ref[...] = row[...]


def kernel_read(cache):
    return pl.pallas_call(
        _read_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, KVD), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, KVD), jnp.int8),
        scratch_shapes=[pltpu.VMEM((8, KVD), jnp.int8),
                        pltpu.SemaphoreType.DMA],
    )(cache)


def commit_vmap(cache, rows, pos):
    def per_b(col, r, p):
        return jax.lax.dynamic_update_slice(col, r[:, None, :], (0, p, 0))
    return jax.vmap(per_b, in_axes=(1, 1, 0), out_axes=1)(cache, rows, pos)


def commit_unrolled(cache, rows, pos):
    for b in range(B):
        cache = jax.lax.dynamic_update_slice(
            cache, rows[:, b][:, None, None, :], (0, b, pos[b], 0))
    return cache


def commit_scatter(cache, rows, pos):
    return cache.at[:, jnp.arange(B), pos].set(rows)


def run(name, commit):
    @jax.jit
    def loop(cache, pos0):
        def body(carry, _):
            cache, pos = carry
            r = kernel_read(cache)
            rows = jnp.broadcast_to(r[:1, None, :], (L, B, KVD)).astype(
                jnp.int8)
            if commit is not None:
                cache = commit(cache, rows, pos)
            return (cache, pos + 1), r[0, 0]
        (cache, pos), outs = jax.lax.scan(
            body, (cache, pos0), None, length=ITERS)
        return cache, outs

    cache = jnp.zeros((L, B, S, KVD), jnp.int8)
    pos0 = jnp.arange(B, dtype=jnp.int32) * 3
    # warm compile
    c2, o = loop(cache, pos0)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    c2, o = loop(cache, pos0)
    jax.block_until_ready((c2, o))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:12s}: {dt*1e3:7.3f} ms/step")
    return dt


if __name__ == "__main__":
    print(f"cache bytes: {L*B*S*KVD/1e9:.2f} GB")
    base = run("baseline", None)
    for name, fn in (("vmap_dus", commit_vmap),
                     ("unrolled_dus", commit_unrolled),
                     ("at_scatter", commit_scatter)):
        dt = run(name, fn)
        print(f"  marginal vs baseline: {(dt-base)*1e3:7.3f} ms/step")
