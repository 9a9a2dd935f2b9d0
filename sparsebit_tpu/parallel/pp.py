"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

Reference: torch.distributed.pipeline.sync.Pipe wrapping an nn.Sequential
LLaMA (model_pp.py:173-191, finetune_pp.py) — single-host, p2p copies,
activation checkpointing — and crucially pipelining a *make_quant-ed*
(packed 4-bit) backbone with LoRA adapters (model_pp.py:173-191 +
utils.py:93). TPU-native redesign:

- stages are CONTIGUOUS layer blocks whose params are stacked on a leading
  axis sharded over the "pp" mesh axis (every device holds 1/P of depth);
- layer params are ANY linear containers — DenseLinear, packed QuantLinear,
  or LoraLinear-over-QuantLinear pytrees — and the stage body reuses
  ``llama.decoder_layer`` verbatim, so PP composes with quantization and
  QLoRA exactly like the single-device path (no duplicated layer math);
- the schedule is a lax.fori_loop over M + P - 1 waves inside shard_map:
  each wave every stage processes its in-flight microbatch, then the
  activation ring-shifts one stage via lax.ppermute (ICI neighbor copy —
  replacing Pipe's p2p CUDA copies);
- backward: plain jax.grad through the pipelined forward — ppermute's
  transpose is the reverse ppermute, so autodiff emits the reverse
  schedule automatically; jax.checkpoint on the stage body reproduces
  Pipe's checkpoint='always' memory behavior;
- embed/norm/head are replicated (small); only the last stage's loss term
  is nonzero and a psum shares it;
- QLoRA training (finetune_pp parity): differentiate ``pp_qlora_loss``
  w.r.t. the extracted LoRA pytree only — the frozen packed backbone rides
  along as a non-differentiated operand (reference freezes via
  requires_grad_(False); here the split does it structurally).

The same function runs the full training step under jit on a dp x pp mesh:
batch sharded over dp, depth over pp.
"""

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.qlora import LoraLinear


def stack_llama_stages(params, n_stages):
    """Split params["layers"] into n_stages contiguous blocks and stack
    leaves -> {"embed", "stages" (leading axis = n_stages), "norm", "head"}.

    Works on any per-layer linear containers (DenseLinear / QuantLinear /
    LoraLinear pytrees) as long as every layer has the SAME structure
    (bits/groupsize/targets uniform — mixed-precision-per-layer models
    must use the unrolled single-device path). Layers within a stage are
    additionally stacked on axis 1 so the stage body can lax.scan over
    them."""
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
    """Run this device's layer block (scan over the stacked layer axis),
    reusing the canonical decoder layer — quantized/LoRA containers work
    unchanged because lax.scan slices pytree nodes leaf-wise."""
    from sparsebit_tpu.llm.quant import DenseLinear

    S = x.shape[1]
    mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    inv_freq = L.rope_frequencies(cfg)

    def one_layer(x, layer):
        # densified (raw-array) layers re-wrap on the fly; containers pass
        layer = {
            k: (DenseLinear(v) if k in L._LINEAR_NAMES and not callable(v) else v)
            for k, v in layer.items()
        }
        x, _ = L.decoder_layer(layer, x, cfg, inv_freq, positions, mask)
        return x, None

    x, _ = jax.lax.scan(one_layer, x, stage_params)
    return x


def pp_llama_loss(params_pp, tokens, cfg, mesh, n_microbatches):
    """Mean next-token NLL with GPipe microbatch pipelining.

    params_pp: from stack_llama_stages. tokens: (B, S+1).
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
        head = params["head"]
        logits = (head(x) if callable(head) else jnp.dot(x, head)).astype(
            jnp.float32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, targets.reshape(B, S)[..., None], axis=-1
        )[..., 0]
        local_loss = jnp.where(
            stage_id == Pstages - 1, jnp.mean(nll), 0.0
        )
        loss = jax.lax.psum(local_loss, "pp")
        return jax.lax.pmean(loss, "dp")[None]

    # prefix specs: P("pp") shards the leading (n_stages) axis of every
    # stage leaf (incl. packed uint8 weights and LoRA factors)
    spec = {"embed": P(), "stages": P("pp"), "norm": P(), "head": P()}
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P("dp")),
        out_specs=P(None),
        check_vma=False,
    )
    return fn(params_pp, tokens)[0]


def densify_llama_params(params):
    """Replace DenseLinear wrappers with raw (in, out) arrays — an optional
    slimming for float-only pipelines (quantized/LoRA params stack as-is)."""
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


# ---- dp x tp x pp: full 3-axis composition ----------------------------------


def _stage_body_tp(stage_params, x, cfg, positions, T):
    """TP variant of the stage body: layer linears are TPLinear shards
    (col/row-parallel, psum over "tp" per residual branch) scanned over the
    stage's layer axis. Composes with packed QuantLinear and LoraLinear
    shards (parallel/tp.py shard_linear)."""
    from sparsebit_tpu.parallel.tp import _tp_attn, _tp_ffn

    S = x.shape[1]
    mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    inv_freq = L.rope_frequencies(cfg)

    def one_layer(x, layer):
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        x = x + _tp_attn(layer, h, cfg, inv_freq, positions, mask, T)
        h = L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + _tp_ffn(layer, h)
        return x, None

    x, _ = jax.lax.scan(one_layer, x, stage_params)
    return x


def pp_tp_llama_loss(params_pp, tokens, cfg, mesh, n_microbatches):
    """Mean next-token NLL on a dp x tp x pp mesh: batch sharded over dp,
    tensor (heads/FFN/vocab) over tp, depth over pp. params_pp comes from
    ``stack_llama_stages(shard_llama_params_tp(params, cfg, T, ...))`` —
    stage leaves carry (n_stages, per_stage, T, ...) with pp on axis 0 and
    tp on axis 2. The loss is vocab-parallel (never gathers full logits).
    This is the composed north-star topology; the reference's only
    parallelism is single-host Pipe (model_pp.py:173-191)."""
    from sparsebit_tpu.parallel.tp import TPLinear, _vocab_parallel_nll

    Pstages = mesh.shape["pp"]
    T = mesh.shape["tp"]
    M = n_microbatches
    V_loc = cfg.vocab_size // T

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
            lambda sp, x: _stage_body_tp(sp, x, cfg, positions, T)
        )

        D = cfg.dim
        zero_x = jnp.zeros((B // M, S, D), params["embed"].dtype)
        outs0 = jnp.zeros((M, B // M, S, D), jnp.float32)

        def wave(t, carry):
            x_in, outs = carry
            mb = jnp.clip(t, 0, M - 1)
            embedded = params["embed"][inputs[mb]]
            x = jnp.where(stage_id == 0, embedded, x_in)
            active = (t - stage_id >= 0) & (t - stage_id < M)
            y = body(stage_params, x)
            y = jnp.where(active, y, zero_x)
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
            x_next = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % Pstages) for i in range(Pstages)]
            )
            return x_next, outs

        _, outs = jax.lax.fori_loop(0, M + Pstages - 1, wave, (zero_x, outs0))

        x = L.rms_norm(outs.reshape(B, S, D), params["norm"], cfg.rms_eps)
        logits_loc = params["head"].local()(x).astype(jnp.float32)
        nll = _vocab_parallel_nll(logits_loc, targets.reshape(B, S), V_loc)
        local_loss = jnp.where(stage_id == Pstages - 1, jnp.mean(nll), 0.0)
        loss = jax.lax.psum(local_loss, "pp")
        return jax.lax.pmean(loss, "dp")[None]

    is_tpl = lambda x: isinstance(x, TPLinear)  # noqa: E731
    stage_spec = jax.tree.map(
        lambda x: P("pp", None, "tp") if is_tpl(x) else P("pp"),
        params_pp["stages"],
        is_leaf=is_tpl,
    )
    spec = {
        "embed": P(),
        "stages": stage_spec,
        "norm": P(),
        "head": P("tp"),
    }
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P("dp")),
        out_specs=P(None),
        check_vma=False,
    )
    return fn(params_pp, tokens)[0]


def pp_tp_qlora_loss(lora, params_pp, tokens, cfg, mesh, n_microbatches):
    """3-axis QLoRA loss: LoRA pytree differentiable, packed TP-sharded
    backbone frozen."""
    return pp_tp_llama_loss(
        pp_merge_lora(params_pp, lora), tokens, cfg, mesh, n_microbatches
    )


# ---- QLoRA over a pipelined quantized backbone (finetune_pp parity) ---------


def _is_lora(x):
    return isinstance(x, LoraLinear)


def pp_extract_lora(params_pp):
    """Trainable pytree: mirrors params_pp with {"lora_A","lora_B"} dicts at
    LoraLinear positions and None elsewhere (frozen leaves drop out of the
    treedef, so jax.grad over this pytree touches only the adapters)."""
    return jax.tree.map(
        lambda x: (
            {"lora_A": x.lora_A, "lora_B": x.lora_B} if _is_lora(x) else None
        ),
        params_pp,
        is_leaf=_is_lora,
    )


def pp_merge_lora(params_pp, lora):
    """Rebuild the full stacked params with ``lora`` leaves swapped in."""
    return jax.tree.map(
        lambda x, l: (
            LoraLinear(x.base, l["lora_A"], l["lora_B"], x.alpha, x.dropout)
            if _is_lora(x)
            else x
        ),
        params_pp,
        lora,
        is_leaf=_is_lora,
    )


def pp_qlora_loss(lora, params_pp, tokens, cfg, mesh, n_microbatches):
    """Pipelined causal-LM loss as a function of the LoRA pytree only —
    the packed backbone is a frozen operand (reference finetune_pp.py
    trains exactly this: LoRA over a make_quant backbone through Pipe)."""
    return pp_llama_loss(
        pp_merge_lora(params_pp, lora), tokens, cfg, mesh, n_microbatches
    )


def pp_qlora_train_step(lora, opt_state, params_pp, tokens, cfg, mesh,
                        n_microbatches, optimizer):
    """One optax step on the LoRA pytree through the pipelined model."""
    loss, grads = jax.value_and_grad(pp_qlora_loss)(
        lora, params_pp, tokens, cfg, mesh, n_microbatches
    )
    updates, opt_state = optimizer.update(grads, opt_state, lora)
    lora = jax.tree.map(lambda p, u: p + u, lora, updates)
    return lora, opt_state, loss
