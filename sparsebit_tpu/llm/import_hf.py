"""Import HuggingFace LLaMA weights into the functional params pytree.

Reference loads LLaMA via transformers (convert.py:14 get_llama); here the
torch state_dict (cpu) is mapped tensor-by-tensor into the TPU pytree —
note the transpose: torch nn.Linear stores (out, in), this framework uses
(in, out) so forward is x @ w.

Works from (a) a transformers model object, (b) a local from_pretrained
path, or (c) a raw state_dict (e.g. torch.load of consolidated weights).
No network access is assumed anywhere.
"""

import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm.llama import LlamaConfig
from sparsebit_tpu.llm.quant import DenseLinear


def _t(x, dtype):
    arr = np.asarray(x.detach().cpu().float().numpy() if hasattr(x, "detach") else x)
    return jnp.asarray(arr, dtype)


def config_from_hf(hf_config):
    return LlamaConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        n_layers=hf_config.num_hidden_layers,
        n_heads=hf_config.num_attention_heads,
        n_kv_heads=getattr(
            hf_config, "num_key_value_heads", hf_config.num_attention_heads
        ),
        ffn_dim=hf_config.intermediate_size,
        max_seq_len=hf_config.max_position_embeddings,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rms_eps=hf_config.rms_norm_eps,
    )


_HF_LINEAR = {
    "wq": "self_attn.q_proj",
    "wk": "self_attn.k_proj",
    "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj",
    "w1": "mlp.gate_proj",
    "w3": "mlp.up_proj",
    "w2": "mlp.down_proj",
}


def params_from_state_dict(sd, cfg, dtype=None):
    """sd: HF LlamaForCausalLM state_dict (torch tensors or numpy)."""
    dt = dtype or cfg.jnp_dtype

    def lin(prefix):
        w = _t(sd[prefix + ".weight"], dt).T  # (out,in) -> (in,out)
        b = (
            _t(sd[prefix + ".bias"], dt)
            if prefix + ".bias" in sd
            else None
        )
        return DenseLinear(w, b)

    layers = []
    for i in range(cfg.n_layers):
        p = "model.layers.{}.".format(i)
        layer = {
            "attn_norm": _t(sd[p + "input_layernorm.weight"], dt),
            "ffn_norm": _t(sd[p + "post_attention_layernorm.weight"], dt),
        }
        for ours, theirs in _HF_LINEAR.items():
            layer[ours] = lin(p + theirs)
        layers.append(layer)
    return {
        "tok_embed": _t(sd["model.embed_tokens.weight"], dt),
        "layers": layers,
        "norm": _t(sd["model.norm.weight"], dt),
        "lm_head": lin("lm_head")
        if "lm_head.weight" in sd
        else DenseLinear(_t(sd["model.embed_tokens.weight"], dt).T),
    }


def load_llama_from_hf(model_or_path, dtype=None):
    """Returns (params, cfg). Accepts a transformers model instance or a
    local pretrained path (no downloads in this environment)."""
    if isinstance(model_or_path, str):
        from transformers import AutoConfig, AutoModelForCausalLM

        hf_cfg = AutoConfig.from_pretrained(model_or_path)
        model = AutoModelForCausalLM.from_pretrained(model_or_path)
    else:
        model = model_or_path
        hf_cfg = model.config
    cfg = config_from_hf(hf_cfg)
    return params_from_state_dict(model.state_dict(), cfg, dtype), cfg
