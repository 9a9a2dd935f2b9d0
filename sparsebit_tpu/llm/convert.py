"""Layer-streaming GPTQ conversion for LLaMA.

Reference: large_language_models/llama/quantization/convert.py
(llama_sequential :63-174, llama_pack :262, checkpoint format :355-365).

TPU-native structure: instead of forward hooks + a Catcher exception, the
functional model exposes its intermediate activations directly. Per decoder
layer we:
  1. compute the two norm'd inputs and the attention intermediate,
  2. accumulate Hessians for the 4 linear groups (qkv share an input, as do
     w1/w3 — same grouping the reference gets from its hook placement),
  3. GPTQ-solve each weight (mixed-precision candidate bits),
  4. re-run the layer with quantized weights to produce the next layer's
     inputs (the reference's outs <- layer(inps) swap, convert.py:169) —
     so later layers calibrate against quantized predecessors.

Memory stays bounded to one layer's Hessians + the activation batch
(the reference streams layers GPU<->CPU for the same reason; on TPU the
activations stay on device and only H is large).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.gptq import HessianAccumulator, gptq_quantize_mixed
from sparsebit_tpu.llm.quant import DenseLinear, QuantLinear


def _layer_intermediates(layer, x, cfg, inv_freq, positions, mask):
    """Returns inputs feeding each linear group of one decoder layer
    (handles both separate wq/wk/wv/w1/w3 and fused wqkv/w13 layers)."""
    h1 = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)  # -> wq/wk/wv|wqkv
    B, S, _ = x.shape
    hd = cfg.head_dim
    q, k, v = L.qkv_proj(layer, h1, cfg)
    q = L.apply_rope(q, positions, inv_freq)
    k = L.apply_rope(k, positions, inv_freq)
    n_rep = cfg.n_heads // cfg.n_kv_heads
    attn = L.attention_scores(
        q, L.repeat_kv(k, n_rep), L.repeat_kv(v, n_rep), mask
    ).reshape(B, S, cfg.n_heads * hd)  # -> wo
    x2 = x + layer["wo"](attn)
    h2 = L.rms_norm(x2, layer["ffn_norm"], cfg.rms_eps)  # -> w1/w3|w13
    if "w13" in layer:
        g, u = jnp.split(layer["w13"](h2), 2, axis=-1)
        ffn_mid = jax.nn.silu(g) * u  # -> w2
    else:
        ffn_mid = jax.nn.silu(layer["w1"](h2)) * layer["w3"](h2)
    return {"qkv": h1, "wo": attn, "ffn_in": h2, "w2": ffn_mid}


_GROUP_OF = {
    "wq": "qkv", "wk": "qkv", "wv": "qkv", "wqkv": "qkv",
    "wo": "wo", "w1": "ffn_in", "w3": "ffn_in", "w13": "ffn_in", "w2": "w2",
}


def quantize_llama_gptq(
    params,
    calib_tokens,
    cfg,
    candidate_bits=(4,),
    groupsize=128,
    sym=False,
    percdamp=0.01,
    loss_threshold=1e-3,
    batch_size=1,
    quantize_lm_head=False,
    act_order=False,
    verbose=True,
):
    """calib_tokens: (n_samples, seqlen) int32 (reference: 128 x 2048
    wikitext2 samples, convert.py:37). Returns (quant_params, layers_bit).
    """
    n, S = calib_tokens.shape
    inv_freq = L.rope_frequencies(cfg)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (batch_size, S))
    mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]

    inter_fn = jax.jit(_layer_intermediates, static_argnames=("cfg",))
    layer_fn = jax.jit(L.decoder_layer, static_argnames=("cfg",))

    # embed all calibration samples (cheap) — these are layer-0 inputs
    inps = params["tok_embed"][calib_tokens]  # (n, S, D)

    new_params = dict(params)
    new_params["layers"] = []
    layers_bit = {}

    for li, layer in enumerate(params["layers"]):
        # 1+2: Hessian accumulation over calibration batches
        accs = {
            "qkv": HessianAccumulator(cfg.dim),
            "wo": HessianAccumulator(cfg.n_heads * cfg.head_dim),
            "ffn_in": HessianAccumulator(cfg.dim),
            "w2": HessianAccumulator(cfg.ffn_dim),
        }
        for b in range(0, n, batch_size):
            xb = inps[b : b + batch_size]
            feats = inter_fn(layer, xb, cfg, inv_freq, positions, mask)
            for g, acc in accs.items():
                acc.add_batch(feats[g])

        # 3: GPTQ-solve each linear (fused or separate layout)
        new_layer = dict(layer)
        lin_names = [n for n in L._LINEAR_NAMES if n in layer]
        for name in lin_names:
            lin = layer[name]
            acc = accs[_GROUP_OF[name]]
            res = gptq_quantize_mixed(
                lin.w,
                acc.H,
                candidate_bits=candidate_bits,
                loss_threshold=loss_threshold,
                groupsize=groupsize,
                sym=sym,
                percdamp=percdamp,
                mean_x=acc.mean_x,
                bias=lin.bias,
                act_order=act_order,
            )
            path = "layers.{}.{}".format(li, name)
            layers_bit[path] = res["bits"]
            new_layer[name] = QuantLinear.from_codes(
                res["codes"], res["scales"], res["zeros"], res["bits"],
                groupsize, bias=res.get("bias", lin.bias), perm=res["perm"],
            )
            if verbose:
                print(
                    "[gptq] {} bits={} loss={:.3e}".format(
                        path, res["bits"], res["loss"]
                    )
                )

        new_params["layers"].append(new_layer)

        # 4: propagate quantized outputs as next layer inputs
        outs = []
        for b in range(0, n, batch_size):
            xb = inps[b : b + batch_size]
            yb, _ = layer_fn(new_layer, xb, cfg, inv_freq, positions, mask)
            outs.append(yb)
        inps = jnp.concatenate(outs, axis=0)

    if quantize_lm_head:
        lin = params["lm_head"]
        acc = HessianAccumulator(cfg.dim)
        final = L.rms_norm(inps, params["norm"], cfg.rms_eps)
        acc.add_batch(final)
        res = gptq_quantize_mixed(
            lin.w, acc.H, candidate_bits=candidate_bits,
            loss_threshold=loss_threshold, groupsize=groupsize, sym=sym,
            percdamp=percdamp, mean_x=acc.mean_x, bias=lin.bias,
        )
        layers_bit["lm_head"] = res["bits"]
        new_params["lm_head"] = QuantLinear.from_codes(
            res["codes"], res["scales"], res["zeros"], res["bits"], groupsize,
            bias=res.get("bias", lin.bias),
        )
    return new_params, layers_bit


# ---- checkpointing (reference convert.py:355-365 format) --------------------


def save_quant_checkpoint(path, quant_params, layers_bit, cfg, groupsize,
                          fmt="npz"):
    """Packed weights + json metadata ({hyper_parameters, layers_bit} —
    the mixed-precision map consumers need, reference utils.py:92).

    fmt="npz" (default): single weights.npz — float leaves upcast to f32
    (bfloat16 has no stable npz encoding). fmt="orbax": an orbax/
    StandardCheckpointer directory — native dtypes incl. bf16, sharded
    async-capable storage (SURVEY §5's checkpoint note); same json
    metadata sidecar either way, and load_quant_checkpoint auto-detects
    the format."""
    os.makedirs(path, exist_ok=True)
    flat = {}

    def arr(v):
        if fmt == "orbax":  # orbax stores dtypes natively
            return np.asarray(v)
        a = np.asarray(v)
        if a.dtype.kind not in "iub":
            a = a.astype(np.float32)
        return a

    def put(prefix, lin):
        if isinstance(lin, QuantLinear):
            for k, v in lin.packed.items():
                flat["{}.packed.{}".format(prefix, k)] = arr(v)
            flat[prefix + ".scales"] = arr(lin.scales)
            flat[prefix + ".zeros"] = arr(lin.zeros)
            # scales may be lane-padded (pallas_n_pad); keep logical width
            flat[prefix + ".nout"] = np.asarray(lin.out_features, np.int64)
            if lin.perm is not None:
                flat[prefix + ".perm"] = np.asarray(lin.perm)
            if lin.bias is not None:
                flat[prefix + ".bias"] = arr(lin.bias)
        else:
            flat[prefix + ".w"] = arr(lin.w)
            if lin.bias is not None:
                flat[prefix + ".bias"] = arr(lin.bias)

    flat["tok_embed"] = arr(quant_params["tok_embed"])
    flat["norm"] = arr(quant_params["norm"])
    for i, layer in enumerate(quant_params["layers"]):
        flat["layers.{}.attn_norm".format(i)] = arr(layer["attn_norm"])
        flat["layers.{}.ffn_norm".format(i)] = arr(layer["ffn_norm"])
        for name in L._LINEAR_NAMES:
            if name in layer:
                put("layers.{}.{}".format(i, name), layer[name])
    put("lm_head", quant_params["lm_head"])
    if fmt == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        odir = os.path.abspath(os.path.join(path, "weights_orbax"))
        if os.path.exists(odir):
            shutil.rmtree(odir)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(odir, flat)
        ckptr.wait_until_finished()
    else:
        np.savez(os.path.join(path, "weights.npz"), **flat)
    meta = {
        "hyper_parameters": {
            "groupsize": groupsize,
            "config": {
                k: getattr(cfg, k)
                for k in (
                    "vocab_size", "dim", "n_layers", "n_heads", "n_kv_heads",
                    "ffn_dim", "max_seq_len", "rope_theta", "rms_eps", "dtype",
                )
            },
        },
        "layers_bit": layers_bit,
    }
    with open(os.path.join(path, "quant_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_quant_checkpoint(path):
    """Returns (params, cfg, layers_bit)."""
    with open(os.path.join(path, "quant_meta.json")) as f:
        meta = json.load(f)
    cfg = L.LlamaConfig(**meta["hyper_parameters"]["config"])
    gs = meta["hyper_parameters"]["groupsize"]
    layers_bit = meta["layers_bit"]
    odir = os.path.abspath(os.path.join(path, "weights_orbax"))
    if os.path.isdir(odir):
        import orbax.checkpoint as ocp

        z = dict(ocp.StandardCheckpointer().restore(odir))
    else:
        z = dict(np.load(os.path.join(path, "weights.npz")))
    dt = cfg.jnp_dtype

    def get_lin(prefix, bits):
        bias = (
            jnp.asarray(z[prefix + ".bias"], dt) if prefix + ".bias" in z else None
        )
        if bits is None:  # dense
            return DenseLinear(jnp.asarray(z[prefix + ".w"], dt), bias)
        packed = {
            k.split(".packed.")[1]: jnp.asarray(z[k])
            for k in z
            if k.startswith(prefix + ".packed.")
        }
        perm = (
            jnp.asarray(z[prefix + ".perm"]) if prefix + ".perm" in z else None
        )
        nout = (
            int(z[prefix + ".nout"])
            if prefix + ".nout" in z
            else int(z[prefix + ".scales"].shape[1])
        )
        return QuantLinear(
            packed,
            jnp.asarray(z[prefix + ".scales"]),
            jnp.asarray(z[prefix + ".zeros"]),
            bits,
            gs,
            nout,
            bias,
            perm=perm,
        )

    params = {
        "tok_embed": jnp.asarray(z["tok_embed"], dt),
        "norm": jnp.asarray(z["norm"], dt),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.asarray(z["layers.{}.attn_norm".format(i)], dt),
            "ffn_norm": jnp.asarray(z["layers.{}.ffn_norm".format(i)], dt),
        }
        for name in L._LINEAR_NAMES:
            p = "layers.{}.{}".format(i, name)
            if any(f.startswith(p + ".") for f in z):
                layer[name] = get_lin(p, layers_bit.get(p))
        params["layers"].append(layer)
    params["lm_head"] = get_lin("lm_head", layers_bit.get("lm_head"))
    return params, cfg, layers_bit
