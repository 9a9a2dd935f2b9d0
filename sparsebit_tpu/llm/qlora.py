"""QLoRA: LoRA adapters over a frozen quantized backbone.

Reference: large_language_models/alpaca-qlora/qlora.py:38-300 (LoraQModel
module surgery, QLinear = QuantLinear + lora_A/B) and qmatmul.py (W4A8
forward/backward). TPU-native design:

- ``LoraLinear`` is a pytree wrapping any frozen linear (QuantLinear /
  DenseLinear) plus trainable lora_A/lora_B. The base's custom_vjp already
  returns dx = g @ W^T without weight grads, so a standard jax.grad over
  the whole params pytree only produces nonzero grads for LoRA leaves —
  ``lora_trainable_filter`` masks the rest for the optimizer.
- The W4A8 speedup of the reference's forward (unpack -> int8 gemm) is a
  bandwidth/MXU optimisation, not a semantic: here the quantized base runs
  the groupwise dequant-matmul kernel; ops.int8_matmul provides the int8
  activation path for W8 backbones.
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.llm.quant import DenseLinear, QuantLinear


@jax.tree_util.register_pytree_node_class
class LoraLinear:
    def __init__(self, base, lora_A, lora_B, alpha=16.0, dropout=0.0):
        self.base = base
        self.lora_A = lora_A  # (K, r)
        self.lora_B = lora_B  # (r, N)
        self.alpha = alpha
        self.dropout = dropout

    @property
    def r(self):
        return self.lora_A.shape[1]

    @property
    def scaling(self):
        return self.alpha / self.r

    @property
    def out_features(self):
        return self.base.out_features

    @classmethod
    def wrap(cls, base, r=8, alpha=16.0, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        K = base.in_features
        N = base.out_features
        lora_A = jax.random.normal(key, (K, r), jnp.float32) * (1.0 / max(K, 1)) ** 0.5
        lora_B = jnp.zeros((r, N), jnp.float32)  # zero-init: identity at start
        return cls(base, lora_A, lora_B, alpha)

    def __call__(self, x):
        y = self.base(x)
        lora = jnp.dot(
            jnp.dot(x.astype(jnp.float32), self.lora_A), self.lora_B
        ) * self.scaling
        return y + lora.astype(y.dtype)

    def merge(self):
        """Fold the adapter into a dense weight (inference deployment)."""
        w = (
            self.base.dequantize()
            if isinstance(self.base, QuantLinear)
            else self.base.w.astype(jnp.float32)
        )
        w = w + jnp.dot(self.lora_A, self.lora_B) * self.scaling
        return DenseLinear(w, getattr(self.base, "bias", None))

    def tree_flatten(self):
        return (self.base, self.lora_A, self.lora_B), (self.alpha, self.dropout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        base, lora_A, lora_B = children
        return cls(base, lora_A, lora_B, *aux)


DEFAULT_TARGETS = ("wq", "wv")  # reference finetune.py LoRA targets q/v proj


def wrap_llama_lora(params, r=8, alpha=16.0, targets=DEFAULT_TARGETS, key=None):
    """get_peft_qmodel analogue (reference qlora.py:200): wrap target linears
    of every decoder layer with LoRA adapters."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out = dict(params)
    out["layers"] = []
    for i, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for name in targets:
            key, sub = jax.random.split(key)
            new_layer[name] = LoraLinear.wrap(layer[name], r, alpha, sub)
        out["layers"].append(new_layer)
    return out


def merge_llama_lora(params):
    def mrg(x):
        return x.merge() if isinstance(x, LoraLinear) else x

    out = dict(params)
    out["layers"] = [
        {k: mrg(v) for k, v in layer.items()} for layer in params["layers"]
    ]
    out["lm_head"] = mrg(params["lm_head"])
    return out


def extract_lora(params):
    """{(layer_idx, name): {"lora_A", "lora_B"}} — the trainable pytree."""
    out = {}
    for i, layer in enumerate(params["layers"]):
        for name, lin in layer.items():
            if isinstance(lin, LoraLinear):
                out[(i, name)] = {"lora_A": lin.lora_A, "lora_B": lin.lora_B}
    return out


def inject_lora(params, lora):
    out = dict(params)
    out["layers"] = []
    for i, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for name, lin in layer.items():
            if (i, name) in lora:
                new_layer[name] = LoraLinear(
                    lin.base,
                    lora[(i, name)]["lora_A"],
                    lora[(i, name)]["lora_B"],
                    lin.alpha,
                    lin.dropout,
                )
        out["layers"].append(new_layer)
    return out


def prepare_train(params):
    """Enter training mode: every QuantLinear in the backbone (including
    LoRA bases) gets its per-input-channel int8 requantized W^T so the
    QLoRA backward's dx runs on the int8 MXU (reference model.train() →
    prepare_backward_scales, utils.py:230-255). Run inside jit once; the
    results are frozen leaves reused every step."""

    def prep(lin):
        if isinstance(lin, LoraLinear) and isinstance(lin.base, QuantLinear):
            return LoraLinear(
                lin.base.prepare_backward(), lin.lora_A, lin.lora_B,
                lin.alpha, lin.dropout,
            )
        if isinstance(lin, QuantLinear):
            return lin.prepare_backward()
        return lin

    out = dict(params)
    out["layers"] = [
        {k: prep(v) for k, v in layer.items()} for layer in params["layers"]
    ]
    if "lm_head" in out:
        out["lm_head"] = prep(out["lm_head"])
    return out


def qlora_loss_fn(lora, params, tokens, cfg):
    """Causal-LM loss as a function of the LoRA pytree only — the frozen
    quantized backbone is a closure constant, so jax.grad touches nothing
    but the adapters (reference: requires_grad_(False) surgery)."""
    from sparsebit_tpu.llm.llama import llama_loss

    return llama_loss(inject_lora(params, lora), tokens, cfg)


def qlora_train_step(lora, opt_state, params, tokens, cfg, optimizer):
    """One optax step on the LoRA pytree (reference finetune.py loop)."""
    loss, grads = jax.value_and_grad(qlora_loss_fn)(lora, params, tokens, cfg)
    updates, opt_state = optimizer.update(grads, opt_state, lora)
    lora = jax.tree.map(lambda p, u: p + u, lora, updates)
    return lora, opt_state, loss
