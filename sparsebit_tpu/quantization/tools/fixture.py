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
                               template_seed=1234, shift_multiple=1):
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
    n_shift = size // shift_multiple
    for i in range(n):
        dy, dx = rng.integers(0, n_shift, size=2) * shift_multiple
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


# ---------------------------------------------------------------------------
# Transformer-regime fixtures (reference accuracy tables: DeiT
# imagenet1k/deit/README.md:37-40, BERT GLUE/CoLA/README.md:24-27). Same
# recorded-artifact pattern as the CNN fixture, but on the NLC path:
# LayerNorm / softmax / F.matmul QModules, per-tensor activations with the
# reference's norm/softmax quantizer-disable overrides.
# ---------------------------------------------------------------------------


def _transformer_cfg(w_bit=8, a_bit=8, w_observer="MSE", a_observer="MSE"):
    """DeiT regime (defaults): MSE observers, NLC layout, LN/softmax left
    in float (examples/post_training_quantization/imagenet1k_deit/
    qconfig.yaml). The BERT/CoLA regime passes w_observer=MINMAX +
    a_observer=PERCENTILE (GLUE/CoLA qconfig: ALPHA 0.001)."""
    return parse_qconfig({
        "BACKEND": "virtual",
        "W": {"QSCHEME": "per-channel-symmetric",
              "QUANTIZER": {"TYPE": "uniform", "BIT": w_bit},
              "OBSERVER": {"TYPE": w_observer}},
        "A": {"QSCHEME": "per-tensor-affine",
              "QUANTIZER": {"TYPE": "uniform", "BIT": a_bit},
              "OBSERVER": {"TYPE": a_observer, "LAYOUT": "NLC",
                           "PERCENTILE": {"ALPHA": 0.001}},
              "SPECIFIC": [{
                  "*norm*": ["QUANTIZER.DISABLE", "True"],
                  "*softmax*": ["QUANTIZER.DISABLE", "True"],
              }]},
    })


def _train_and_sweep(qmodel, x_tr, y_tr, x_ev, y_ev, steps, batch, lr, seed,
                     bit_configs, config_name, verbose, calib_n=512):
    """Shared train-float -> calibrate -> PTQ-sweep harness (the CNN
    fixture's loop, factored for the transformer fixtures)."""
    import optax

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
    n_train = len(x_tr)
    for i in range(steps):
        key, sub = jax.random.split(key)
        idx = np.asarray(jax.random.randint(sub, (batch,), 0, n_train))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx])
        )
        if verbose and (i + 1) % 100 == 0:
            print("train step {}: loss {:.4f}".format(i + 1, float(loss)))
    qmodel.load_params(params)

    # transformer graphs bake B into F.reshape target shapes at trace
    # time — evaluate at the traced batch (n_eval must be a multiple)
    assert len(x_ev) % batch == 0, (len(x_ev), batch)
    eval_fn = jax.jit(lambda p, xb: qmodel.apply(p, xb))
    results = {
        "config": config_name,
        "train_steps": steps,
        "n_train": n_train,
        "n_eval": len(x_ev),
        "acc_float": _accuracy(eval_fn, params, x_ev, y_ev, batch=batch),
    }
    if verbose:
        print("float acc:", results["acc_float"])

    for w_bit, a_bit in bit_configs:
        for _, op in qmodel.qmodules():
            if op.weight_quantizer is not None:
                op.weight_quantizer.set_bit(w_bit)
            if op.input_quantizer is not None:
                op.input_quantizer.set_bit(a_bit)
        qmodel.prepare_calibration()
        for i in range(0, calib_n, batch):
            qmodel(jnp.asarray(x_tr[i : i + batch]))
        qmodel.calc_qparams()
        qmodel.set_quant(w_quant=True, a_quant=True)
        q_eval = jax.jit(lambda p, xb: qmodel.apply(p, xb))
        acc = _accuracy(q_eval, qmodel.params(), x_ev, y_ev, batch=batch)
        results["acc_w{}a{}".format(w_bit, a_bit)] = acc
        if verbose:
            print("w{}a{} acc: {}".format(w_bit, a_bit, acc))
        qmodel.set_quant(w_quant=False, a_quant=False)
    return results


def run_vit_fixture(steps=300, n_train=4096, n_eval=1024, batch=128, lr=1e-3,
                    bit_configs=((8, 8), (4, 8)), seed=0, verbose=False):
    """DeiT-regime gate: a tiny VisionTransformer (patch conv -> 2 MHSA
    blocks with F.matmul/softmax/LayerNorm on the NLC path -> cls head)
    trained on the shifted-template task with PATCH-ALIGNED shifts (the
    patch set is permuted, content preserved — attention can pool it;
    sub-patch shifts would shred patch contents for a 2-block ViT)."""
    from sparsebit_tpu.models.vit import VisionTransformer

    size, patch = 16, 4
    # noise 2.2 (vs the CNN fixture's 0.6): patch-aligned shifts make the
    # task much easier for attention, and a saturated gate (1.0 top-1 at
    # every bit width) cannot detect quantization damage — push float
    # top-1 off the ceiling so the w8a8/w4a8 deltas are measurable.
    x_tr, y_tr = make_shifted_template_data(
        n_train, size=size, seed=seed, shift_multiple=patch, noise=2.2)
    x_ev, y_ev = make_shifted_template_data(
        n_eval, size=size, seed=seed + 1, shift_multiple=patch, noise=2.2)

    model = VisionTransformer(
        img_size=size, patch_size=patch, dim=48, depth=2, num_heads=2,
        num_classes=10, key=jax.random.PRNGKey(seed),
    ).eval()
    qmodel = QuantModel(
        model, _transformer_cfg(), (jnp.asarray(x_tr[:batch]),))
    qmodel.set_quant(w_quant=False, a_quant=False)
    return _train_and_sweep(
        qmodel, x_tr, y_tr, x_ev, y_ev, steps, batch, lr, seed, bit_configs,
        "fixture-vit 16x16x3/p4 d48 L2, 10-class patch-shifted templates",
        verbose,
    )


def make_markov_lm_data(n, seqlen=16, vocab=64, n_classes=2, seed=0,
                        chain_seed=1234, sharpness=8.0):
    """CoLA-regime synthetic 'grammaticality': class k = a fixed random
    Markov chain over the vocab (Dirichlet rows, peaked), sample = a
    seqlen walk from it. Telling chains apart needs BIGRAM evidence —
    token-order statistics attention must aggregate (unigram marginals of
    the chains are near-identical stationary distributions)."""
    rng_c = np.random.default_rng(chain_seed)
    chains = rng_c.dirichlet(
        np.full(vocab, 1.0 / sharpness), size=(n_classes, vocab))
    rng = np.random.default_rng(seed)
    y = rng.integers(0, n_classes, size=n)
    x = np.zeros((n, seqlen), np.int32)
    for i in range(n):
        t = chains[y[i]]
        tok = rng.integers(0, vocab)
        for j in range(seqlen):
            x[i, j] = tok
            tok = rng.choice(vocab, p=t[tok])
    return x, y.astype(np.int64)


def run_bert_fixture(steps=400, n_train=4096, n_eval=1024, batch=128, lr=1e-3,
                     bit_configs=((8, 8), (4, 8)), seed=0, verbose=False):
    """CoLA-regime gate: the zoo's BertModel (embeddings + 2 encoder
    layers + pooled cls head) on synthetic Markov-chain classification,
    PERCENTILE activation observers like the reference's CoLA qconfig."""
    from sparsebit_tpu.models.bert import BertModel

    x_tr, y_tr = make_markov_lm_data(n_train, seed=seed)
    x_ev, y_ev = make_markov_lm_data(n_eval, seed=seed + 1)

    model = BertModel(
        vocab_size=64, dim=48, depth=2, num_heads=2, ffn_dim=96,
        num_classes=2, key=jax.random.PRNGKey(seed),
    ).eval()
    qmodel = QuantModel(
        model,
        _transformer_cfg(w_observer="MINMAX", a_observer="PERCENTILE"),
        (jnp.asarray(x_tr[:batch]),))
    qmodel.set_quant(w_quant=False, a_quant=False)
    return _train_and_sweep(
        qmodel, x_tr, y_tr, x_ev, y_ev, steps, batch, lr, seed, bit_configs,
        "fixture-bert vocab64 d48 L2, 2-chain Markov grammaticality",
        verbose,
    )


def run_vit_qat_fixture(steps=150, qat_steps=800, n_train=2048, n_eval=512,
                        batch=128, lr=1e-3, qat_lr=5e-4, qat_schedule="cosine",
                        seed=0, verbose=False):
    """QAT-DeiT-regime gate: the fixture ViT at LSQ 4w4a — low enough that
    plain PTQ visibly hurts — trained THROUGH the quantizers so LSQ scales
    learn on the quantized attention path (QMatmul/softmax inputs), which
    no CNN QAT example exercises. Mirrors
    examples/quantization_aware_training/imagenet1k_deit/main.py
    (reference: examples/quantization_aware_training/imagenet1k/deit/).

    Returns acc_float, acc_ptq (quant-on at LSQ init == the calibrated
    starting point), acc_qat (after training); gate: acc_qat >= acc_ptq.
    """
    import optax

    from sparsebit_tpu.models.vit import VisionTransformer
    from sparsebit_tpu.quantization.tools.qat import (
        commit_qat_params,
        cross_entropy,
        init_qat_state,
        make_qat_step,
    )

    size, patch = 16, 4
    x_tr, y_tr = make_shifted_template_data(
        n_train, size=size, seed=seed, shift_multiple=patch, noise=2.2)
    x_ev, y_ev = make_shifted_template_data(
        n_eval, size=size, seed=seed + 1, shift_multiple=patch, noise=2.2)

    model = VisionTransformer(
        img_size=size, patch_size=patch, dim=48, depth=2, num_heads=2,
        num_classes=10, key=jax.random.PRNGKey(seed),
    ).eval()
    cfg = parse_qconfig({
        "BACKEND": "virtual",
        "W": {"QSCHEME": "per-channel-symmetric",
              "QUANTIZER": {"TYPE": "lsq", "BIT": 4},
              "OBSERVER": {"TYPE": "MINMAX"}},
        "A": {"QSCHEME": "per-tensor-affine",
              "QUANTIZER": {"TYPE": "lsq", "BIT": 4},
              "OBSERVER": {"TYPE": "MINMAX", "LAYOUT": "NLC"},
              "SPECIFIC": [{
                  "*norm*": ["QUANTIZER.DISABLE", "True"],
                  "*softmax*": ["QUANTIZER.DISABLE", "True"],
              }]},
    })
    qmodel = QuantModel(model, cfg, (jnp.asarray(x_tr[:batch]),))
    qmodel.set_quant(w_quant=False, a_quant=False)

    # ---- float training (same loop as _train_and_sweep) --------------------
    params = qmodel.params()
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def fstep(params, opt_state, xb, yb):
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
        params, opt_state, _ = fstep(
            params, opt_state, jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx]))
    qmodel.load_params(params)
    eval_fn = jax.jit(lambda p, xb: qmodel.apply(p, xb))
    acc_float = _accuracy(eval_fn, params, x_ev, y_ev, batch=batch)

    # ---- calibrate + init_QAT; quant-on at init == the PTQ baseline --------
    qmodel.prepare_calibration()
    for i in range(0, 512, batch):
        qmodel(jnp.asarray(x_tr[i : i + batch]))
    qmodel.init_QAT()
    q_eval = jax.jit(lambda p, xb: qmodel.apply(p, xb))
    acc_ptq = _accuracy(q_eval, qmodel.params(), x_ev, y_ev, batch=batch)

    # ---- QAT: train weights + LSQ scales through the fake-quant graph ------
    # defaults tuned by experiments/exp35_vit_qat_ablation.py (round 5):
    # the fixture SATURATES at ~0.711 top-1 (800-step cosine @ 5e-4 ==
    # 1600-step; 400 const @ 5e-4 -> 0.697; the round-4 run — 120 @
    # 2e-4 const — stopped at 0.582, a half-trained schedule)
    qmodel.train()
    if qat_schedule == "cosine":
        qat_opt = optax.adam(
            optax.cosine_decay_schedule(qat_lr, qat_steps, alpha=0.05))
    else:
        qat_opt = optax.adam(qat_lr)
    qstep = make_qat_step(qmodel, cross_entropy, qat_opt)
    trainable, qat_state = init_qat_state(qmodel, qat_opt)
    for i in range(qat_steps):
        key, sub = jax.random.split(key)
        idx = np.asarray(jax.random.randint(sub, (batch,), 0, n_train))
        trainable, qat_state, loss = qstep(
            trainable, qat_state, jnp.asarray(x_tr[idx]),
            jnp.asarray(y_tr[idx]))
        if verbose and (i + 1) % 50 == 0:
            print("qat step {}: loss {:.4f}".format(i + 1, float(loss)))
    commit_qat_params(qmodel, jax.device_get(trainable))
    qmodel.eval()
    q_eval2 = jax.jit(lambda p, xb: qmodel.apply(p, xb))
    acc_qat = _accuracy(q_eval2, qmodel.params(), x_ev, y_ev, batch=batch)

    return {
        "config": "fixture-vit-qat 16x16x3/p4 d48 L2, LSQ 4w4a",
        "train_steps": steps, "qat_steps": qat_steps,
        "n_train": n_train, "n_eval": len(x_ev),
        "acc_float": acc_float, "acc_ptq": acc_ptq, "acc_qat": acc_qat,
    }
