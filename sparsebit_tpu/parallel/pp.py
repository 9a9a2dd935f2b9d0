"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Reference: torch.distributed.pipeline.sync.Pipe wrapping an nn.Sequential
LLaMA (model_pp.py:173-191, finetune_pp.py) — single-host, p2p copies,
activation checkpointing. TPU-native redesign:

- stages are CONTIGUOUS layer blocks whose params are stacked on a leading
  axis sharded over the "pp" mesh axis (every device holds 1/P of depth);
- the schedule is a lax.fori_loop over M + P - 1 waves inside shard_map:
  each wave every stage processes its in-flight microbatch, then the
  activation ring-shifts one stage via lax.ppermute (ICI neighbor copy —
  replacing Pipe's p2p CUDA copies);
- backward: plain jax.grad through the pipelined forward — ppermute's
  transpose is the reverse ppermute, so autodiff emits the reverse
  schedule automatically; jax.checkpoint on the stage body reproduces
  Pipe's checkpoint='always' memory behavior;
- embed/norm/head are replicated (small); only the last stage's loss term
  is nonzero and a psum shares it.

The same function runs the full training step under jit on a dp x pp mesh:
batch sharded over dp, depth over pp.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sparsebit_tpu.llm import llama as L


def stack_llama_stages(params, n_stages):
    """Split params["layers"] into n_stages contiguous blocks and stack
    leaves -> {"embed", "stages" (leading axis = n_stages), "norm", "head"}.

    Layers within a stage are additionally stacked on axis 1 so the stage
    body can lax.scan over them (layer structure is uniform)."""
    n_layers = len(params["layers"])
    assert n_layers % n_stages == 0, "layers must split evenly over stages"
    per = n_layers // n_stages
    stages = []
    for s in range(n_stages):
        block = params["layers"][s * per : (s + 1) * per]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *block))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
    return {
        "embed": params["tok_embed"],
        "stages": stacked,  # leaves: (n_stages, per, ...)
        "norm": params["norm"],
        "head": params["lm_head"],
    }


def _stage_body(stage_params, x, cfg, positions):
    """Run this device's layer block (scan over the stacked layer axis)."""

    def one_layer(x, layer):
        S = x.shape[1]
        mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
        inv_freq = L.rope_frequencies(cfg)
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        B = x.shape[0]
        hd = cfg.head_dim
        q = jnp.dot(h, layer["wq"]).reshape(B, S, cfg.n_heads, hd)
        k = jnp.dot(h, layer["wk"]).reshape(B, S, cfg.n_kv_heads, hd)
        v = jnp.dot(h, layer["wv"]).reshape(B, S, cfg.n_kv_heads, hd)
        q = L.apply_rope(q, positions, inv_freq)
        k = L.apply_rope(k, positions, inv_freq)
        n_rep = cfg.n_heads // cfg.n_kv_heads
        att = L.attention_scores(
            q, L.repeat_kv(k, n_rep), L.repeat_kv(v, n_rep), mask
        ).reshape(B, S, cfg.n_heads * hd)
        x = x + jnp.dot(att, layer["wo"])
        h2 = L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        ffn = jnp.dot(
            jax.nn.silu(jnp.dot(h2, layer["w1"])) * jnp.dot(h2, layer["w3"]),
            layer["w2"],
        )
        return x + ffn, None

    x, _ = jax.lax.scan(one_layer, x, stage_params)
    return x


def pp_llama_loss(params_pp, tokens, cfg, mesh, n_microbatches):
    """Mean next-token NLL with GPipe microbatch pipelining.

    params_pp: from stack_llama_stages, with DenseLinear weights flattened
    to plain arrays (see flatten note in stack util). tokens: (B, S+1).
    B must divide by dp * n_microbatches.
    """
    Pstages = mesh.shape["pp"]
    M = n_microbatches

    def local(params, toks):
        stage_id = jax.lax.axis_index("pp")
        stage_params = jax.tree.map(lambda a: a[0], params["stages"])
        B, S1 = toks.shape
        S = S1 - 1
        inputs = toks[:, :-1].reshape(M, B // M, S)
        targets = toks[:, 1:].reshape(M, B // M, S)
        positions = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32), (B // M, S)
        )

        body = jax.checkpoint(
            lambda sp, x: _stage_body(sp, x, cfg, positions)
        )

        D = cfg.dim
        zero_x = jnp.zeros((B // M, S, D), params["embed"].dtype)
        outs0 = jnp.zeros((M, B // M, S, D), jnp.float32)

        def wave(t, carry):
            x_in, outs = carry
            # stage 0 injects microbatch t (clipped; masked by validity)
            mb = jnp.clip(t, 0, M - 1)
            embedded = params["embed"][inputs[mb]]
            x = jnp.where(stage_id == 0, embedded, x_in)
            active = (t - stage_id >= 0) & (t - stage_id < M)
            y = body(stage_params, x)
            y = jnp.where(active, y, zero_x)
            # last stage banks its finished microbatch
            done_mb = t - (Pstages - 1)
            is_last = stage_id == Pstages - 1
            bank = (done_mb >= 0) & (done_mb < M) & is_last
            outs = jax.lax.cond(
                bank,
                lambda o: jax.lax.dynamic_update_slice(
                    o,
                    y.astype(jnp.float32)[None],
                    (jnp.clip(done_mb, 0, M - 1), 0, 0, 0),
                ),
                lambda o: o,
                outs,
            )
            # ring-shift activations to the next stage (ICI neighbor copy)
            x_next = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % Pstages) for i in range(Pstages)]
            )
            return x_next, outs

        _, outs = jax.lax.fori_loop(0, M + Pstages - 1, wave, (zero_x, outs0))

        # loss only meaningful on the last stage; psum shares it
        x = L.rms_norm(outs.reshape(B, S, D), params["norm"], cfg.rms_eps)
        logits = jnp.dot(x, params["head"]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, targets.reshape(B, S)[..., None], axis=-1
        )[..., 0]
        local_loss = jnp.where(
            stage_id == Pstages - 1, jnp.mean(nll), 0.0
        )
        loss = jax.lax.psum(local_loss, "pp")
        return jax.lax.pmean(loss, "dp")[None]

    spec = {
        "embed": P(),
        "stages": jax.tree.map(lambda _: P("pp"), params_pp["stages"]),
        "norm": P(),
        "head": P(),
    }
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P("dp")),
        out_specs=P(None),
        check_vma=False,
    )
    return fn(params_pp, tokens)[0]


def densify_llama_params(params):
    """Replace DenseLinear wrappers with raw (in, out) arrays so stage
    params are stackable/scannable plain pytrees."""
    from sparsebit_tpu.llm.quant import DenseLinear

    def conv(x):
        return x.w if isinstance(x, DenseLinear) else x

    out = {
        "tok_embed": params["tok_embed"],
        "norm": params["norm"],
        "lm_head": conv(params["lm_head"]),
        "layers": [
            {k: conv(v) for k, v in layer.items()} for layer in params["layers"]
        ],
    }
    return out
