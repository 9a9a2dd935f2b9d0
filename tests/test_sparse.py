"""Sparse (pruning) package tests.

Mirrors the reference's model-level integration style (SURVEY.md §4):
SparseModel on a small convnet, unstructured + structured l1norm.
"""

import jax
import jax.numpy as jnp
import pytest

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.nn import functional as F
from sparsebit_tpu.sparse import SparseModel, parse_sconfig


class SmallNet(nn.Module):
    def __init__(self, key):
        super().__init__()
        ks = jax.random.split(key, 4)
        self.conv1 = nn.Conv2d(3, 16, 3, padding=1, key=ks[0])
        self.bn1 = nn.BatchNorm2d(16)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(16, 16, 3, padding=1, key=ks[1])
        self.bn2 = nn.BatchNorm2d(16)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flat = nn.Flatten()
        self.fc = nn.Linear(16, 10, key=ks[2])

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = y + self.relu(self.bn2(self.conv2(y)))  # residual
        return self.fc(self.flat(self.pool(y)))


def _sconfig(tmp_path, strategy, ratio, stype="l1norm"):
    p = tmp_path / "sconfig.yaml"
    p.write_text(
        "SPARSER:\n  TYPE: {}\n  STRATEGY: {}\n  RATIO: {}\n".format(
            stype, strategy, ratio
        )
    )
    return parse_sconfig(str(p))


@pytest.fixture
def data():
    return jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))


def test_unstructured_l1norm(tmp_path, data):
    model = SmallNet(jax.random.PRNGKey(0))
    cfg = _sconfig(tmp_path, "unstructure", 0.5)
    smodel = SparseModel(model, cfg, (data,))
    ref = smodel(data)  # ratio applied only after calc_params
    smodel.calc_params()
    out = smodel(data)
    assert out.shape == (2, 10)
    assert 0.4 < smodel.sparsity() < 0.6
    assert not jnp.allclose(out, ref)


def test_structured_masks_thread_into_bn(tmp_path, data):
    model = SmallNet(jax.random.PRNGKey(0))
    cfg = _sconfig(tmp_path, "structure", 0.5)
    smodel = SparseModel(model, cfg, (data,))
    smodel.calc_params()
    out = smodel(data)
    assert out.shape == (2, 10)
    # residual producers (conv2 feeding the add, and conv1 feeding it via
    # the skip) must be ratio-0 => only fc prunes channels
    convs = {n: m for n, m in smodel.smodules() if m.HAS_WEIGHT}
    assert float(jnp.sum(convs["conv1"]._buffers["w_mask"] == 0)) == 0
    assert float(jnp.sum(convs["conv2"]._buffers["w_mask"] == 0)) == 0
    fc_mask = convs["fc"]._buffers["w_mask"]
    # half of fc's 10 output channels pruned
    col_zeros = jnp.all(fc_mask == 0, axis=0)
    assert int(jnp.sum(col_zeros)) == 5


def test_structured_bn_channel_mask(tmp_path):
    """Without a residual, a structured-pruned conv's mask lands on its BN."""

    class Plain(nn.Module):
        def __init__(self, key):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, padding=1, key=key)
            self.bn = nn.BatchNorm2d(8)
            self.relu = nn.ReLU()

        def forward(self, x):
            return self.relu(self.bn(self.conv(x)))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    model = Plain(jax.random.PRNGKey(0))
    cfg_dir = __import__("pathlib").Path("/tmp/sparse_cfg")
    cfg_dir.mkdir(exist_ok=True)
    cfg = _sconfig(cfg_dir, "structure", 0.25)
    smodel = SparseModel(model, cfg, (x,))
    smodel.calc_params()
    out = smodel(x)
    bn = dict(smodel.smodules())["bn"]
    assert int(jnp.sum(bn._buffers["ch_mask"] == 0)) == 2
    # pruned channels are exactly zero in the output feature map
    pruned = bn._buffers["ch_mask"] == 0
    assert float(jnp.max(jnp.abs(out[..., pruned]))) == 0.0


def test_slimming_and_l2_and_specific(tmp_path, data):
    model = SmallNet(jax.random.PRNGKey(0))
    cfg = _sconfig(tmp_path, "structure", 0.5, stype="slimming")
    cfg.defrost()
    cfg.SPARSER.SPECIFIC = [{"fc": ["TYPE", "l2norm", "RATIO", "0.2"]}]
    cfg.freeze()
    smodel = SparseModel(model, cfg, (data,))
    fc = dict(smodel.smodules())["fc"]
    assert type(fc.sparser).TYPE == "l2norm"
    assert fc.sparser.ratio == 0.2
    smodel.calc_params()
    assert smodel(data).shape == (2, 10)


def test_ratio_zero_is_identity(tmp_path, data):
    model = SmallNet(jax.random.PRNGKey(0))
    float_out = model.eval()(data)
    cfg = _sconfig(tmp_path, "unstructure", 0.0)
    smodel = SparseModel(model, cfg, (data,))
    smodel.calc_params()
    assert jnp.allclose(smodel(data), float_out, atol=1e-5)


def test_unstructured_bert_with_specific_overrides(tmp_path):
    """Unstructured prune of a transformer encoder (reference:
    examples/unstructured_prune/{GLUE/bert,SQuAD}): encoder Linears hit
    the requested elementwise sparsity, embeddings/classifier kept dense
    via SPECIFIC RATIO overrides, and the masked model still evals."""
    from sparsebit_tpu.models.bert import BertModel

    model = BertModel(
        vocab_size=64, dim=32, depth=2, num_heads=2, ffn_dim=64,
        num_classes=2, key=jax.random.PRNGKey(0),
    ).eval()
    p = tmp_path / "sconfig.yaml"
    p.write_text(
        "SPARSER:\n"
        "  TYPE: l1norm\n"
        "  STRATEGY: unstructure\n"
        "  RATIO: 0.7\n"
        "  SPECIFIC:\n"
        "    - \"*embed*\": [\"RATIO\", \"0.0\"]\n"
        "      \"*classifier*\": [\"RATIO\", \"0.0\"]\n"
    )
    cfg = parse_sconfig(str(p))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    smodel = SparseModel(model, cfg, (ids,))
    smodel.calc_params()
    out = smodel(ids)
    assert out.shape == (2, 2)
    assert jnp.all(jnp.isfinite(out))

    # per-module: encoder linears at ~0.7, overridden modules fully dense
    from sparsebit_tpu.sparse.modules.base import SparseOpr

    seen_encoder = seen_dense = 0
    for node in smodel.graph.op_nodes:
        op = node.op
        if not (isinstance(op, SparseOpr) and op.HAS_WEIGHT):
            continue
        density = float(jnp.mean(op._buffers["w_mask"]))
        if "classifier" in node.name or "embed" in node.name:
            assert density == 1.0, (node.name, density)
            seen_dense += 1
        else:
            assert 0.25 < density < 0.35, (node.name, density)
            seen_encoder += 1
    assert seen_encoder >= 8  # 2 layers x (q,k,v,out,ffn-in,ffn-out)
    assert seen_dense >= 1
