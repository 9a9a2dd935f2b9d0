"""Recorded accuracy fixture for the graph-PTQ regime: a deterministically
trained tiny CNN on a synthetic shifted-template classification task, so
top-1 claims about the PTQ flow are testable WITHOUT any external dataset
(this environment has neither datasets nor checkpoints — zero egress).

This is the CNN counterpart of the LLM ppl fixture
(sparsebit_tpu/llm/fixture.py): it exercises the exact harness a real
ImageNet run uses (reference
examples/post_training_quantization/imagenet1k/basecase/main.py:152-229):
build model -> QuantModel trace/convert -> calibration forwards ->
calc_qparams -> fake-quant eval, and asserts the platform-stable relative
claim the reference README tables make (int8 PTQ within a small top-1
delta of float, basecase/README.md:27-33). Absolute numbers are recorded
to accuracy/ACCURACY.json by
examples/post_training_quantization/record_fixture.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu import QuantModel, parse_qconfig


class FixtureCNN(nn.Module):
    """Tiny conv net: conv-relu-conv-relu-pool-linear. Small enough to train
    in seconds on CPU, deep enough to exercise conv/activation/pool/linear
    QModules and per-channel weight quantization."""

    def __init__(self, n_classes=10, key=None):
        super().__init__()
        ks = jax.random.split(key if key is not None else jax.random.PRNGKey(0), 3)
        self.conv1 = nn.Conv2d(3, 16, 3, padding=1, key=ks[0])
        self.relu1 = nn.ReLU()
        self.conv2 = nn.Conv2d(16, 32, 3, stride=2, padding=1, key=ks[1])
        self.relu2 = nn.ReLU()
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flat = nn.Flatten()
        self.fc = nn.Linear(32, n_classes, key=ks[2])

    def forward(self, x):
        x = self.relu1(self.conv1(x))
        x = self.relu2(self.conv2(x))
        return self.fc(self.flat(self.pool(x)))


def make_shifted_template_data(n, n_classes=10, size=16, noise=0.6, seed=0,
                               template_seed=1234):
    """Class k = fixed random template, circularly shifted by a random
    offset per sample, plus Gaussian noise. The random shift makes the task
    translation-invariant (a plain linear readout on raw pixels fails;
    conv + global pooling succeeds), so the fixture genuinely needs the
    conv path it certifies. Templates come from their own fixed seed so
    train and eval splits (different ``seed``) share classes."""
    rng_t = np.random.default_rng(template_seed)
    templates = rng_t.normal(size=(n_classes, size, size, 3)).astype(np.float32)
    rng = np.random.default_rng(seed)
    y = rng.integers(0, n_classes, size=n)
    x = templates[y].copy()
    for i in range(n):
        dy, dx = rng.integers(0, size, size=2)
        x[i] = np.roll(x[i], (int(dy), int(dx)), axis=(0, 1))
    x += rng.normal(scale=noise, size=x.shape).astype(np.float32)
    return x, y.astype(np.int64)


def _ptq_cfg(w_bit=8, a_bit=8):
    return parse_qconfig({
        "BACKEND": "virtual",
        "W": {"QSCHEME": "per-channel-symmetric",
              "QUANTIZER": {"TYPE": "uniform", "BIT": w_bit},
              "OBSERVER": {"TYPE": "MINMAX"}},
        "A": {"QSCHEME": "per-tensor-affine",
              "QUANTIZER": {"TYPE": "uniform", "BIT": a_bit},
              "OBSERVER": {"TYPE": "MINMAX", "LAYOUT": "NHWC"}},
    })


def _accuracy(apply_fn, params, x, y, batch=256):
    correct = 0
    for i in range(0, len(x), batch):
        logits = apply_fn(params, jnp.asarray(x[i : i + batch]))
        correct += int(
            jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(y[i : i + batch]))
        )
    return correct / len(x)


def run_cnn_fixture(steps=300, n_train=4096, n_eval=2048, batch=128, lr=3e-3,
                    bit_configs=((8, 8), (4, 8)), seed=0, verbose=False):
    """Full harness: train float -> calibrate -> PTQ at each (w_bit, a_bit).

    Returns the dict recorded as the committed accuracy artifact."""
    x_tr, y_tr = make_shifted_template_data(n_train, seed=seed)
    x_ev, y_ev = make_shifted_template_data(n_eval, seed=seed + 1)

    model = FixtureCNN(key=jax.random.PRNGKey(seed)).eval()
    cfg = _ptq_cfg()
    qmodel = QuantModel(model, cfg, (jnp.asarray(x_tr[:batch]),))
    qmodel.set_quant(w_quant=False, a_quant=False)

    params = qmodel.params()
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_of(p):
            logits = qmodel.apply(p, xb)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=-1))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 2)
    for i in range(steps):
        key, sub = jax.random.split(key)
        idx = np.asarray(jax.random.randint(sub, (batch,), 0, n_train))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx])
        )
        if verbose and (i + 1) % 100 == 0:
            print("train step {}: loss {:.4f}".format(i + 1, float(loss)))
    qmodel.load_params(params)

    eval_fn = jax.jit(lambda p, xb: qmodel.apply(p, xb))
    results = {
        "config": "fixture-cnn 16x16x3, 10-class shifted templates",
        "train_steps": steps,
        "n_train": n_train,
        "n_eval": n_eval,
        "acc_float": _accuracy(eval_fn, params, x_ev, y_ev),
    }
    if verbose:
        print("float acc:", results["acc_float"])

    # sweep bit configs by re-deriving qparams after set_bit overrides —
    # mirrors the reference flow (QAT basecase main.py:236-239 uses the same
    # per-quantizer set_bit hook for head/tail overrides).
    for w_bit, a_bit in bit_configs:
        for _, op in qmodel.qmodules():
            if op.weight_quantizer is not None:
                op.weight_quantizer.set_bit(w_bit)
            if op.input_quantizer is not None:
                op.input_quantizer.set_bit(a_bit)
        qmodel.prepare_calibration()
        for i in range(0, 512, batch):
            qmodel(jnp.asarray(x_tr[i : i + batch]))
        qmodel.calc_qparams()
        qmodel.set_quant(w_quant=True, a_quant=True)
        q_eval = jax.jit(lambda p, xb: qmodel.apply(p, xb))
        acc = _accuracy(q_eval, qmodel.params(), x_ev, y_ev)
        results["acc_w{}a{}".format(w_bit, a_bit)] = acc
        if verbose:
            print("w{}a{} acc: {}".format(w_bit, a_bit, acc))
        qmodel.set_quant(w_quant=False, a_quant=False)
    return results
