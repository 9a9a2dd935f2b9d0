"""Does a scalar-condition pl.when SKIP its body's cost on TC, or
predicate it? Grid (256,); each step gates a heavy vector body (8x
int8->bf16 casts of (128, 4096) + dots) on an SMEM scalar. Compare
always-true vs always-false wall time. Decides the round-4 B=32 flash
gating mystery (exp23: pos=17 vs pos=400 identical compute cost)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(cond_ref, x_ref, o_ref, acc, *, variant):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def heavy():
        # step-dependent dynamic indices + accumulator feedback: nothing
        # here is loop-invariant, so the cost cannot be hoisted out of
        # the grid — it exists ONLY where this body executes
        a = acc[...]
        for r in range(8):
            xb = x_ref[(s + r) % 8].astype(jnp.bfloat16)  # (128, 4096)
            d = jax.lax.dot_general(
                xb[:32], xb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (32, 128)
            a = a + d[:, :128]
        acc[...] = a

    if variant == "when":
        @pl.when(cond_ref[s] > 0)
        def _():
            heavy()
    elif variant == "cond":
        jax.lax.cond(cond_ref[s] > 0, heavy, lambda: None)
    else:
        heavy()

    @pl.when(s == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...]


def run(variant, frac):
    N = 256
    conds = (jnp.arange(N) < int(N * frac)).astype(jnp.int32)
    x = jnp.ones((8, 128, 4096), jnp.int8)

    f = jax.jit(functools.partial(
        pl.pallas_call,
        functools.partial(kernel, variant=variant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N,),
            in_specs=[pl.BlockSpec((8, 128, 4096), lambda s, c: (0, 0, 0))],
            out_specs=pl.BlockSpec((32, 128), lambda s, c: (0, 0)),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )())
    # x stays whole in HBM? simpler: put in VMEM via ANY->no. Use plain.
    @jax.jit
    def g(c, xx):
        # dependent scan: per-iter device time, immune to the tunnel's
        # async dispatch acks (docs/perf_notes.md measurement rules)
        def body(carry, _):
            out = f(c, carry)
            carry = carry + jnp.where(out[0, 0] > 1e30, jnp.int8(1), jnp.int8(0))
            return carry, ()
        carry, _ = jax.lax.scan(body, xx, None, length=20)
        return carry

    out2 = f(conds, x)
    out = g(conds, x); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = g(conds, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print("%-6s frac=%.2f  %7.3f ms  out00=%.1f" % (variant, frac, dt * 1e3, float(out2[0, 0])), flush=True)
    return dt


for variant in ("when", "cond"):
    run(variant, 1.0)
    run(variant, 0.25)
    run(variant, 0.0)
