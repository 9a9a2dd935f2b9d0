"""Price the (512, 32, 128) int8 -> (512, 4096) reshape feeding the
attention dots. Each grid step DMAs a fresh slab (as the megakernel
does), then runs 16 reshape+dot vs 16 dots on an identically-DMA'd flat
slab. Difference / 16 = per-reshape cost.

CAVEAT (round 4): measured 0.12 us/step for a grid step that issues a
2 MB DMA — far below the DMA floor — so something in this probe is
still elided/overlapped and its delta is NOT trustworthy. The
relayout-cost attribution for the batched attention phase rests on the
macro ablations (exp23 int8: 209 us/layer attention compute at B=32,
consistent with ~2 us x 16 slab uses + dots/glue), not on this probe.
Left as a record of the measurement hazard (docs/perf_notes.md
"Measurement rules")."""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

S, Hkv, D = 512, 32, 128
NSL = 8  # slab pool in HBM; step s copies slab s % NSL


def kernel(x_hbm, o_ref, slab, q8, acc, sem, *, flat):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        q8[...] = jnp.ones_like(q8)
        acc[...] = jnp.zeros_like(acc)

    cp = pltpu.make_async_copy(x_hbm.at[s % NSL], slab, sem)
    cp.start()
    cp.wait()
    a = acc[...]
    for r in range(16):
        K2 = slab[...] if flat else slab[...].reshape(S, Hkv * D)
        d = jax.lax.dot_general(
            q8[...], K2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        a = a + d[:, :128]
    acc[...] = a

    @pl.when(s == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...]


def run(flat):
    shape = (NSL, S, Hkv * D) if flat else (NSL, S, Hkv, D)
    x = jnp.ones(shape, jnp.int8)
    slab_shape = (S, Hkv * D) if flat else (S, Hkv, D)
    f = jax.jit(pl.pallas_call(
        functools.partial(kernel, flat=flat),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(256,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((32, 128), lambda s: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM(slab_shape, jnp.int8),
                pltpu.VMEM((32, Hkv * D), jnp.int8),
                pltpu.VMEM((32, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    ))

    @jax.jit
    def g(xx):
        def body(carry, _):
            out = f(carry)
            carry = carry + jnp.where(out[0, 0] > 2**30, jnp.int8(1),
                                      jnp.int8(0))
            return carry, ()
        return jax.lax.scan(body, xx, None, length=10)[0]

    out = g(x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(x); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10 / 256
    print(json.dumps({"flat": flat, "us_per_step": round(dt * 1e6, 2)}),
          flush=True)
    return dt


d3 = run(False)
d2 = run(True)
print(json.dumps({"reshape_us_each": round((d3 - d2) * 1e6 / 16, 3)}))
