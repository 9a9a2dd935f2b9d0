"""exp36: int8-attention noise at LONG context (round-4 ADVICE #2).

The decode megakernel's attention runs INT8 end-to-end; the value mix
quantizes scale-folded softmax probabilities to 7 bits, so entries below
~max/254 round to zero and rounding noise grows ~sqrt(S). The round-4
record claimed "the same ~1/254 noise level as the INT8 KV cache"
backed only by S<=256 kernel-level tolerances. This measures the
formulation against the f32-attention XLA oracle at S ~ 2k on the real
decode path (TPU, 7B-shaped tiny model, identical int8 KV caches):
teacher-forced logits at positions ~1900..2028, reporting logit MAE/max,
greedy-token agreement, and agreement on decisive margins.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import (
    decode_step, decode_step_scanned, prefill, stack_layers,
    prepare_params_host)
from sparsebit_tpu.llm.kv_cache import init_kv_cache
from sparsebit_tpu.llm.quant import QuantLinear


def _train_tiny(cfg, stream, steps=250, seqlen=2047, batch=4):
    """Train the tiny llama on a Markov stream at FULL context length
    (positions ~1900 must be in-distribution for the rope — a model
    trained on short windows evaluates as garbage there; peaked
    attention is the point, the adversarial flat-attention case is the
    untrained variant below)."""
    import optax

    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    params = L.fuse_llama_params(params)
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if a.dtype == jnp.bfloat16 else a, params)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, toks):
        loss, grads = jax.value_and_grad(
            lambda p: L.llama_loss(p, toks, cfg))(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    rng = np.random.RandomState(7)
    n_win = len(stream) - seqlen - 1
    for i in range(steps):
        idx = rng.randint(0, n_win, size=batch)
        toks = jnp.asarray(np.stack([stream[j:j + seqlen + 1]
                                     for j in idx]))
        params, opt_state, loss = step(params, opt_state, toks)
    return params, float(loss)


def _markov_stream(n, vocab, walk_seed=1, chain_seed=1234,
                   sharpness=8.0):
    rng_c = np.random.RandomState(chain_seed)
    # peaked Dirichlet rows -> learnable bigram structure; the CHAIN is
    # shared between train and eval (held-out WALK seed)
    T = rng_c.dirichlet(np.full(vocab, 1.0 / sharpness), size=vocab)
    Tc = np.cumsum(T, axis=1)
    rng = np.random.RandomState(walk_seed)
    u = rng.random_sample(n)
    out = np.zeros(n, np.int32)
    t = rng.randint(vocab)
    for i in range(n):
        out[i] = t
        t = int(np.searchsorted(Tc[t], u[i]))
        t = min(t, vocab - 1)
    return out


def main_trained():
    """Trained-model quality at S~2k: teacher-forced NLL of the true
    next token through the megakernel int8 attention vs the f32 XLA
    oracle — the ppl-style measurement the round-4 advisor asked for."""
    S_CTX, STEPS = 1900, 128
    vocab = 256
    cfg = L.llama_tiny(dim=512, n_heads=4, n_kv_heads=4, ffn_dim=384,
                       max_seq_len=2048, vocab_size=vocab,
                       dtype="float32")
    # 1M tokens: at 40k the d512 model MEMORIZED the training walk
    # (train loss 0.41 << chain entropy) and read held-out walks
    # worse than uniform — only the CHAIN may be learnable
    stream = _markov_stream(1_000_000, vocab)
    params, final_loss = _train_tiny(cfg, stream)
    print("trained: final train loss %.4f" % final_loss)
    qparams = L.quantize_llama_params(
        params, lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=64))
    sparams = prepare_params_host(qparams)
    stacked = stack_layers(sparams)

    eval_stream = _markov_stream(S_CTX + STEPS + 2, vocab, walk_seed=4321)
    prompt = jnp.asarray(eval_stream[:S_CTX])[None]
    cache_a = init_kv_cache(cfg, 1, 2048, quantized=True)
    lg, cache_a = prefill(sparams, prompt, cache_a, cfg)
    cache_b = jax.tree.map(lambda x: x, cache_a)

    nll_o, nll_k, agree = [], [], 0
    for i in range(STEPS):
        tok = jnp.asarray([eval_stream[S_CTX + i]], jnp.int32)
        nxt = int(eval_stream[S_CTX + i + 1])
        lg_o, cache_a = decode_step(sparams, tok, cache_a, cfg)
        lg_k, cache_b = decode_step_scanned(stacked, tok, cache_b, cfg)
        for lg_x, acc in ((lg_o, nll_o), (lg_k, nll_k)):
            lp = jax.nn.log_softmax(lg_x[0].astype(jnp.float32))
            acc.append(-float(lp[nxt]))
        agree += int(np.asarray(lg_o[0]).argmax()
                     == np.asarray(lg_k[0]).argmax())
    out = {
        "mode": "TRAINED markov model, ctx ~%d..%d" % (S_CTX,
                                                       S_CTX + STEPS),
        "ppl_f32_attn": round(float(np.exp(np.mean(nll_o))), 5),
        "ppl_int8_attn": round(float(np.exp(np.mean(nll_k))), 5),
        "greedy_agree": "%d/%d" % (agree, STEPS),
    }
    print(json.dumps(out))


def main():
    S_CTX, STEPS = 1900, 64
    cfg = L.llama_tiny(dim=512, n_heads=4, n_kv_heads=4, ffn_dim=384,
                       max_seq_len=2048, vocab_size=512, dtype="float32")
    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    params = L.fuse_llama_params(params)
    qparams = L.quantize_llama_params(
        params, lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=64))
    sparams = prepare_params_host(qparams)
    stacked = stack_layers(sparams)

    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, S_CTX), 0,
                                cfg.vocab_size)
    # identical prefilled caches for both paths (same codes/scales; the
    # comparison isolates the DECODE attention formulation)
    cache_a = init_kv_cache(cfg, 1, 2048, quantized=True)
    lg, cache_a = prefill(sparams, prompt, cache_a, cfg)
    cache_b = jax.tree.map(lambda x: x, cache_a)

    tok = jnp.argmax(lg, -1).astype(jnp.int32)
    maes, maxes, agree, decisive_agree, n_decisive = [], [], 0, 0, 0
    for i in range(STEPS):
        lg_o, cache_a = decode_step(sparams, tok, cache_a, cfg)  # f32 attn
        lg_k, cache_b = decode_step_scanned(stacked, tok, cache_b, cfg)
        lo = np.asarray(lg_o[0], np.float32)
        lk = np.asarray(lg_k[0], np.float32)
        d = np.abs(lo - lk)
        maes.append(d.mean())
        maxes.append(d.max())
        agree += int(lo.argmax() == lk.argmax())
        top2 = np.sort(lo)[-2:]
        if top2[1] - top2[0] > 2 * d.max():
            n_decisive += 1
            decisive_agree += int(lo.argmax() == lk.argmax())
        tok = jnp.asarray([lo.argmax()], jnp.int32)
    out = {
        "context": "positions ~%d..%d" % (S_CTX, S_CTX + STEPS),
        "logit_mae_mean": round(float(np.mean(maes)), 5),
        "logit_maxdiff_mean": round(float(np.mean(maxes)), 5),
        "logit_maxdiff_max": round(float(np.max(maxes)), 5),
        "greedy_agree": "%d/%d" % (agree, STEPS),
        "decisive_agree": "%d/%d" % (decisive_agree, n_decisive),
        "logit_scale_ref": round(float(np.abs(lo).mean()), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--trained" in sys.argv:
        main_trained()
    else:
        main()
