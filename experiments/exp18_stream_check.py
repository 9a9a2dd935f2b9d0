"""TPU correctness check for the manual weight-streaming megakernel.

Runs fused_decoder_layers (stream=ON, s4r + bf16 qparams serving layout)
vs the per-layer fused_decoder_layer loop at small shapes, non-interpret.
Catches Mosaic legality of the strided HBM tile copies and the ring
buffer semantics on real hardware before paying the 7B compile.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_layer_fused import _build, _mk_cfg
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.ops.layer_fused import (
    fused_decoder_layer, fused_decoder_layers, fused_layer_supported)
from sparsebit_tpu.ops.packing import pack_s4_rows, unpack_columns

cfg = _mk_cfg()
gs = 64
B = 2
assert fused_layer_supported(cfg, gs, B)
Hkv, D = cfg.n_kv_heads, cfg.head_dim
nl = 3
keys = jax.random.split(jax.random.PRNGKey(0), nl)
built = [_build(cfg, gs, k) for k in keys]
names = ("wqkv", "wo", "w13", "w2")

u4s = {n: jnp.stack([
    pack_s4_rows(unpack_columns(b[0][n].packed, 4, b[0][n].n_padded))
    for b in built]) for n in names}
scs = {n: jnp.stack([b[0][n].scales.astype(jnp.bfloat16) for b in built])
       for n in names}
zrs = {n: jnp.stack([b[0][n].zeros.astype(jnp.bfloat16) for b in built])
       for n in names}
ans = jnp.stack([b[1] for b in built])
fns = jnp.stack([b[2] for b in built])
Hp = 128
S = 64

kx = jax.random.PRNGKey(7)
x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
pos = jnp.array([9, 13], jnp.int32)[:B]
angles = pos[:, None].astype(jnp.float32) * L.rope_frequencies(cfg)
cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)
k8 = jax.random.randint(jax.random.PRNGKey(1), (nl, B, S, Hkv, D), -127,
                        127, jnp.int8)
v8 = jax.random.randint(jax.random.PRNGKey(2), (nl, B, S, Hkv, D), -127,
                        127, jnp.int8)
ks = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (nl, B, S, Hp))) * 0.01
vs = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (nl, B, S, Hp))) * 0.01

args = (u4s["wqkv"], scs["wqkv"], zrs["wqkv"],
        u4s["wo"], scs["wo"], zrs["wo"],
        u4s["w13"], scs["w13"], zrs["w13"],
        u4s["w2"], scs["w2"], zrs["w2"], ans, fns)


@jax.jit
def whole():
    return fused_decoder_layers(x, pos, cos, sin, *args,
                                k8, v8, ks, vs, cfg, gs, signed=True)[0]


@jax.jit
def seq():
    xc, kc, vc, ksc, vsc = x, k8, v8, ks, vs
    for li in range(nl):
        xc, kc, vc, ksc, vsc = fused_decoder_layer(
            xc, pos, cos, sin, jnp.int32(li), *args, kc, vc, ksc, vsc,
            cfg, gs, signed=True)
    return xc


o1 = np.asarray(whole())
o2 = np.asarray(seq())
d = np.max(np.abs(o1 - o2))
rel = d / max(np.max(np.abs(o2)), 1e-9)
print("max|diff|:", d, "rel:", rel)
assert rel < 1e-4, (d, rel)
print("STREAM MEGAKERNEL OK on", jax.default_backend())
