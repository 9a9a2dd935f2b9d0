"""Import torch/HF checkpoints into the first-party model zoo.

The reference consumes torchvision/timm/transformers models directly; this
framework's zoo is JAX-native, so importers map state_dicts tensor-by-
tensor with the layout transposes:

- conv: torch OIHW -> HWIO
- linear: torch (out, in) -> (in, out)
- activations stay NHWC/NLC (inputs must be channel-last)

Each importer accepts a state_dict (torch tensors or numpy arrays) — no
network access, bring your own checkpoint file (torch.load(...) or npz).
"""

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _conv(sd, prefix):
    out = {prefix + ".weight": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out[prefix + ".bias"] = _np(sd[prefix + ".bias"])
    return out


def _linear(sd, prefix, transpose=True):
    w = _np(sd[prefix + ".weight"])
    out = {prefix + ".weight": w.T if transpose else w}
    if prefix + ".bias" in sd:
        out[prefix + ".bias"] = _np(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix):
    return {
        prefix + ".weight": _np(sd[prefix + ".weight"]),
        prefix + ".bias": _np(sd[prefix + ".bias"]),
        prefix + ".running_mean": _np(sd[prefix + ".running_mean"]),
        prefix + ".running_var": _np(sd[prefix + ".running_var"]),
    }


def _rename(d, old, new):
    return {k.replace(old, new, 1) if k.startswith(old) else k: v for k, v in d.items()}


def load_resnet_from_torch(model, sd):
    """torchvision resnet{18,34,50} state_dict -> our ResNet.

    torchvision names: conv1/bn1/layerX.Y.{conv1,bn1,conv2,bn2,conv3,bn3,
    downsample.0,downsample.1}/fc — ours match except downsample ->
    down_conv/down_bn.
    """
    flat = {}
    for key in sd:
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.rsplit(".", 1)
        prefix = parts[0]
        if prefix in flat:
            continue
        ours = prefix.replace("downsample.0", "down_conv").replace(
            "downsample.1", "down_bn"
        )
        if "conv" in prefix.split(".")[-1] or prefix.endswith("downsample.0"):
            flat.update(_rename(_conv(sd, prefix), prefix, ours))
        elif "bn" in prefix.split(".")[-1] or prefix.endswith("downsample.1"):
            flat.update(_rename(_bn(sd, prefix), prefix, ours))
        elif prefix == "fc":
            flat.update(_linear(sd, prefix))
    model.load_full_state_dict(flat)
    return model


def load_gpt2_from_hf(model, sd):
    """HF GPT2LMHeadModel state_dict -> our GPT2Model.

    HF Conv1D weights are already (in, out) — no transpose. Names:
    transformer.{wte,wpe,h.N.*,ln_f}; ours: wte/wpe/blocks.N.*/ln_f.
    """
    flat = {}
    sd = {k[len("transformer."):] if k.startswith("transformer.") else k: v
          for k, v in sd.items()}
    flat["wte.weight"] = _np(sd["wte.weight"])
    flat["wpe.weight"] = _np(sd["wpe.weight"])
    n = 0
    while "h.{}.ln_1.weight".format(n) in sd:
        hf = "h.{}.".format(n)
        ours = "blocks.{}.".format(n)
        for ln in ("ln_1", "ln_2"):
            flat[ours + ln + ".weight"] = _np(sd[hf + ln + ".weight"])
            flat[ours + ln + ".bias"] = _np(sd[hf + ln + ".bias"])
        for conv1d, target in (
            ("attn.c_attn", "attn.c_attn"),
            ("attn.c_proj", "attn.c_proj"),
            ("mlp.c_fc", "c_fc"),
            ("mlp.c_proj", "c_proj"),
        ):
            flat[ours + target + ".weight"] = _np(sd[hf + conv1d + ".weight"])
            flat[ours + target + ".bias"] = _np(sd[hf + conv1d + ".bias"])
        n += 1
    flat["ln_f.weight"] = _np(sd["ln_f.weight"])
    flat["ln_f.bias"] = _np(sd["ln_f.bias"])
    flat["lm_head.weight"] = _np(sd["wte.weight"]).T  # tied
    model.load_full_state_dict(flat)
    return model


def load_deit_from_timm(model, sd):
    """timm/DeiT checkpoint -> our VisionTransformer. timm names:
    patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, norm, head."""
    flat = {}
    flat.update(_conv(sd, "patch_embed.proj"))
    flat["cls_token"] = _np(sd["cls_token"])
    flat["pos_embed"] = _np(sd["pos_embed"])
    n = 0
    while "blocks.{}.norm1.weight".format(n) in sd:
        p = "blocks.{}.".format(n)
        for ln in ("norm1", "norm2"):
            flat[p + ln + ".weight"] = _np(sd[p + ln + ".weight"])
            flat[p + ln + ".bias"] = _np(sd[p + ln + ".bias"])
        for lin, ours in (
            ("attn.qkv", "attn.qkv"),
            ("attn.proj", "attn.proj"),
            ("mlp.fc1", "mlp.fc1"),
            ("mlp.fc2", "mlp.fc2"),
        ):
            flat.update(_rename(_linear(sd, p + lin), p + lin, p + ours))
        n += 1
    flat["norm.weight"] = _np(sd["norm.weight"])
    flat["norm.bias"] = _np(sd["norm.bias"])
    flat.update(_linear(sd, "head"))
    model.load_full_state_dict(flat)
    return model


def load_bert_from_hf(model, sd, classifier_key="classifier"):
    """HF BertForSequenceClassification -> our BertModel."""
    flat = {}
    sd = {k[len("bert."):] if k.startswith("bert.") else k: v for k, v in sd.items()}
    emb = "embeddings."
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        flat[emb + name + ".weight"] = _np(sd[emb + name + ".weight"])
    flat[emb + "norm.weight"] = _np(sd[emb + "LayerNorm.weight"])
    flat[emb + "norm.bias"] = _np(sd[emb + "LayerNorm.bias"])
    n = 0
    while "encoder.layer.{}.attention.self.query.weight".format(n) in sd:
        hf = "encoder.layer.{}.".format(n)
        ours = "encoder.{}.".format(n)
        for theirs, mine in (
            ("attention.self.query", "attention.query"),
            ("attention.self.key", "attention.key"),
            ("attention.self.value", "attention.value"),
            ("attention.output.dense", "attention.output"),
            ("intermediate.dense", "intermediate"),
            ("output.dense", "ffn_output"),
        ):
            flat.update(_rename(_linear(sd, hf + theirs), hf + theirs, ours + mine))
        flat[ours + "norm1.weight"] = _np(sd[hf + "attention.output.LayerNorm.weight"])
        flat[ours + "norm1.bias"] = _np(sd[hf + "attention.output.LayerNorm.bias"])
        flat[ours + "norm2.weight"] = _np(sd[hf + "output.LayerNorm.weight"])
        flat[ours + "norm2.bias"] = _np(sd[hf + "output.LayerNorm.bias"])
        n += 1
    flat.update(_rename(_linear(sd, "pooler.dense"), "pooler.dense", "pooler"))
    if classifier_key + ".weight" in sd:
        flat.update(
            _rename(_linear(sd, classifier_key), classifier_key, "classifier")
        )
    model.load_full_state_dict(flat)
    return model
