"""Recorded accuracy fixture: a deterministically-trained tiny LLaMA on a
synthetic Markov corpus, so perplexity claims are testable WITHOUT any
external dataset or checkpoint (the environment has neither — zero egress).

This exercises the exact harness a real checkpoint runs (reference
convert.py:176-259 llama_eval): import/init -> GPTQ convert -> packed
QuantLinear decode -> windowed ppl. The CI gate asserts *relative* claims
(quantized ppl close to float; GPTQ <= RTN) which are platform-stable,
while examples/llm/accuracy_fixture.py records the absolute numbers to
accuracy/ACCURACY.json. The same eval path, pointed at a real LLaMA-7B +
wikitext2 via examples/llm/eval_ppl.py, produces the number to compare
against the reference table (int4-g128 7B ppl 7.547,
llama/quantization/README.md:79-86).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsebit_tpu.llm import llama as L


def make_markov_corpus(n_tokens, vocab_size, order=1, seed=0, alpha=0.3):
    """Synthetic corpus from a sparse random Markov chain: real sequential
    structure (learnable, ppl floor << vocab_size) with a fixed seed."""
    rng = np.random.default_rng(seed)
    # sparse transition matrix: each state strongly prefers ~4 successors
    n_next = 4
    succ = rng.integers(0, vocab_size, size=(vocab_size, n_next))
    probs = rng.dirichlet(np.full(n_next, alpha), size=vocab_size)
    toks = np.empty(n_tokens, np.int64)
    s = int(rng.integers(vocab_size))
    for i in range(n_tokens):
        toks[i] = s
        j = rng.choice(n_next, p=probs[s])
        s = int(succ[s, j])
    return toks.astype(np.int32)


def fixture_config():
    return L.llama_tiny(
        vocab_size=256, dim=128, n_layers=2, n_heads=4, n_kv_heads=4,
        ffn_dim=256, max_seq_len=128, dtype="float32",
    )


def train_tiny_llama(cfg, corpus, steps=200, batch=8, seqlen=64, lr=3e-3,
                     seed=0, verbose=False):
    """Adam training on next-token loss; deterministic given seeds."""
    params = L.init_llama_params(cfg, jax.random.PRNGKey(seed))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    n_windows = len(corpus) // (seqlen + 1)
    windows = jnp.asarray(
        corpus[: n_windows * (seqlen + 1)].reshape(n_windows, seqlen + 1)
    )

    @jax.jit
    def step(params, opt_state, toks):
        loss, grads = jax.value_and_grad(
            lambda p: L.llama_loss(p, toks, cfg)
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch,), 0, n_windows)
        params, opt_state, loss = step(params, opt_state, windows[idx])
        if verbose and (i + 1) % 50 == 0:
            print("train step {}: loss {:.4f}".format(i + 1, float(loss)))
    return params


def fixture_eval_tokens(corpus, n_eval=4096):
    """Held-out tail of the corpus for the ppl windows."""
    return corpus[-n_eval:]


def run_fixture(steps=200, n_tokens=40_000, gptq_bits=(4,), groupsize=32,
                seqlen=64, verbose=False):
    """Full harness: train -> float ppl -> RTN ppl -> GPTQ ppl.

    Returns a dict of results (the committed accuracy artifact)."""
    from sparsebit_tpu.llm.convert import quantize_llama_gptq
    from sparsebit_tpu.llm.eval import perplexity
    from sparsebit_tpu.llm.quant import QuantLinear

    cfg = fixture_config()
    corpus = make_markov_corpus(n_tokens, cfg.vocab_size, seed=0)
    train_toks = corpus[:-8192]
    eval_toks = fixture_eval_tokens(corpus, 4096)
    params = train_tiny_llama(
        cfg, train_toks, steps=steps, seqlen=seqlen, verbose=verbose
    )

    results = {
        "config": "tiny-llama d{} L{} vocab{}".format(
            cfg.dim, cfg.n_layers, cfg.vocab_size
        ),
        "corpus": "markov(seed=0, n={})".format(n_tokens),
        "train_steps": steps,
        "groupsize": groupsize,
        "seqlen": seqlen,
    }
    results["ppl_float"] = perplexity(params, eval_toks, cfg, seqlen=seqlen)
    if verbose:
        print("float ppl:", results["ppl_float"])

    # GPTQ quality tracks calibration coverage; 48 windows keeps the
    # Hessian well-conditioned at this scale (16 was too noisy to reliably
    # beat RTN).
    n_calib = 48
    calib = jnp.asarray(
        train_toks[: n_calib * (seqlen + 1)]
        .reshape(n_calib, seqlen + 1)[:, :seqlen]
    )
    for bits in gptq_bits:
        rtn = L.quantize_llama_params(
            params,
            lambda path, lin: QuantLinear.from_dense(
                lin.w.astype(jnp.float32), bits=bits, groupsize=groupsize
            ),
        )
        results["ppl_rtn_int{}".format(bits)] = perplexity(
            rtn, eval_toks, cfg, seqlen=seqlen
        )
        qp, _ = quantize_llama_gptq(
            params, calib, cfg, candidate_bits=(bits,), groupsize=groupsize,
            verbose=False,
        )
        results["ppl_gptq_int{}".format(bits)] = perplexity(
            qp, eval_toks, cfg, seqlen=seqlen
        )
        if verbose:
            print(
                "int{}: rtn ppl {:.4f}, gptq ppl {:.4f}".format(
                    bits,
                    results["ppl_rtn_int{}".format(bits)],
                    results["ppl_gptq_int{}".format(bits)],
                )
            )
    return results
