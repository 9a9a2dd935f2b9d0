"""Importer parity: HF torch models vs our zoo on identical weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from sparsebit_tpu.models import create_model  # noqa: E402
from sparsebit_tpu.models.import_torch import (  # noqa: E402
    load_bert_from_hf,
    load_gpt2_from_hf,
    load_resnet_from_torch,
)


def test_gpt2_parity():
    hf_cfg = transformers.GPT2Config(
        vocab_size=1024, n_positions=256, n_embd=128, n_layer=2, n_head=2,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    ours = create_model("gpt2_tiny").eval()
    load_gpt2_from_hf(ours, hf.state_dict())
    ids = np.array([[3, 17, 91, 200, 4, 8]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    out = np.asarray(ours(jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_bert_parity():
    hf_cfg = transformers.BertConfig(
        vocab_size=1024, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=512,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.BertForSequenceClassification(hf_cfg).eval()
    ours = create_model("bert_tiny").eval()
    load_bert_from_hf(ours, hf.state_dict())
    ids = np.array([[5, 9, 100, 30, 77, 2]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    out = np.asarray(ours(jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_resnet_import_from_torch_layout():
    """No torchvision in env: fabricate a torch-layout state_dict (OIHW
    convs, (out,in) fc) and check the importer loads + changes outputs."""
    ours = create_model("resnet18").eval()
    sd = {}
    rng = np.random.default_rng(0)

    def all_prefixes():
        for path, m in ours.named_modules():
            t = type(m).__name__
            if t == "Conv2d":
                kh, kw, icg, oc = np.shape(m._params["weight"])
                sd[path + ".weight"] = rng.normal(
                    size=(oc, icg, kh, kw), scale=0.05
                ).astype(np.float32)
            elif t in ("BatchNorm2d", "BatchNorm1d"):
                c = m.num_features
                sd[path + ".weight"] = rng.normal(size=c).astype(np.float32) + 1
                sd[path + ".bias"] = rng.normal(size=c).astype(np.float32)
                sd[path + ".running_mean"] = rng.normal(size=c).astype(np.float32)
                sd[path + ".running_var"] = np.abs(rng.normal(size=c)).astype(np.float32) + 1
                sd[path + ".num_batches_tracked"] = np.int64(1)
            elif t == "Linear":
                w = m._params["weight"]
                sd[path + ".weight"] = rng.normal(
                    size=(w.shape[1], w.shape[0]), scale=0.05
                ).astype(np.float32)
                sd[path + ".bias"] = rng.normal(size=w.shape[1]).astype(np.float32)

    all_prefixes()
    # remap our names to torchvision-style downsample before import
    tv_sd = {
        k.replace("down_conv", "downsample.0").replace("down_bn", "downsample.1"): v
        for k, v in sd.items()
    }
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    before = ours(x)
    load_resnet_from_torch(ours, tv_sd)
    after = ours(x)
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # spot-check one conv got the OIHW->HWIO transpose
    w_ours = np.asarray(ours.conv1._params["weight"])  # (7,7,3,64)
    np.testing.assert_allclose(
        w_ours, tv_sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6
    )


def test_deit_import_from_timm_layout():
    """Fabricate a timm-style DeiT state_dict and verify layout mapping."""
    from sparsebit_tpu.models.import_torch import load_deit_from_timm

    ours = create_model("deit_tiny", img_size=32)
    rng = np.random.default_rng(0)
    dim, depth, heads = 192, 12, 3
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(dim, 3, 16, 16), scale=0.02).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(dim, np.float32),
        "cls_token": rng.normal(size=(1, 1, dim), scale=0.02).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 5, dim), scale=0.02).astype(np.float32),
        "norm.weight": np.ones(dim, np.float32),
        "norm.bias": np.zeros(dim, np.float32),
        "head.weight": rng.normal(size=(1000, dim), scale=0.02).astype(np.float32),
        "head.bias": np.zeros(1000, np.float32),
    }
    for i in range(depth):
        p = "blocks.{}.".format(i)
        for ln in ("norm1", "norm2"):
            sd[p + ln + ".weight"] = np.ones(dim, np.float32)
            sd[p + ln + ".bias"] = np.zeros(dim, np.float32)
        sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * dim, dim), scale=0.02).astype(np.float32)
        sd[p + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[p + "attn.proj.weight"] = rng.normal(size=(dim, dim), scale=0.02).astype(np.float32)
        sd[p + "attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[p + "mlp.fc1.weight"] = rng.normal(size=(4 * dim, dim), scale=0.02).astype(np.float32)
        sd[p + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[p + "mlp.fc2.weight"] = rng.normal(size=(dim, 4 * dim), scale=0.02).astype(np.float32)
        sd[p + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
    load_deit_from_timm(ours, sd)
    np.testing.assert_allclose(
        np.asarray(ours.patch_embed.proj._params["weight"]),
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.blocks[0].attn.qkv._params["weight"]),
        sd["blocks.0.attn.qkv.weight"].T,
        rtol=1e-6,
    )
    out = ours.eval()(jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 1000)
