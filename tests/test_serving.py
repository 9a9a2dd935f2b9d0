"""Continuous-batching engine: slot reuse + parity with the plain
generation loop."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import generate
from sparsebit_tpu.llm.serving import DecodeEngine

CFG = L.llama_tiny(dim=128, ffn_dim=256, n_layers=2, vocab_size=128,
                   max_seq_len=64, dtype="float32")


def test_engine_matches_generate():
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    prompts = [
        np.array([3, 17, 91, 30], np.int32),
        np.array([5, 9], np.int32),
        np.array([8, 1, 2, 3, 4, 5], np.int32),
    ]
    n_new = 6
    engine = DecodeEngine(params, CFG, max_batch=2, max_len=32)
    rids = [engine.add_request(p, max_new_tokens=n_new) for p in prompts]
    results = engine.run()

    for rid, prompt in zip(rids, prompts):
        ref = generate(
            params, jnp.asarray(prompt[None]), CFG,
            max_new_tokens=n_new, kv_quantized=True, max_len=32,
        )[0]
        got = results[rid]
        assert len(got) == n_new, (rid, got)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref), err_msg=str(rid))


def test_engine_slot_reuse_and_queueing():
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    engine = DecodeEngine(params, CFG, max_batch=1, max_len=32)
    r1 = engine.add_request(np.array([1, 2, 3], np.int32), max_new_tokens=3)
    r2 = engine.add_request(np.array([4, 5], np.int32), max_new_tokens=2)
    out = engine.run()
    assert len(out[r1]) == 3 and len(out[r2]) == 2
    assert not engine.has_work


def test_engine_no_double_forward_and_no_recompiles(monkeypatch):
    """VERDICT #6 acceptance: admission must take ONE bucketed forward
    (no full-model llama_forward for the last-token logits), and serving
    2x max_batch same-bucket requests must not grow the jit caches beyond
    one entry per (bucket, group-size) shape."""
    import sparsebit_tpu.llm.llama as llama_mod
    from sparsebit_tpu.llm.decode import decode_chunk, prefill_at

    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))

    def boom(*a, **k):
        raise AssertionError("engine must not run a second full forward")

    monkeypatch.setattr(llama_mod, "llama_forward", boom)

    pre0 = prefill_at._cache_size()
    dec0 = decode_chunk._cache_size()
    engine = DecodeEngine(params, CFG, max_batch=2, max_len=32, chunk=4)
    rng = np.random.default_rng(0)
    # 6 requests, 2 slots, non-bucket prompt lengths (5, 7) in one bucket
    for i in range(6):
        n = int(rng.integers(5, 8))
        engine.add_request(rng.integers(1, 100, n).astype(np.int32),
                           max_new_tokens=5)
    results = engine.run()
    assert len(results) == 6
    assert all(len(v) == 5 for v in results.values())
    # prefill: groups of 2 and of 1 (odd admissions) -> <= 2 shapes;
    # decode_chunk: chunk=4 plus possibly a shorter tail near cache-full
    assert prefill_at._cache_size() - pre0 <= 2
    assert decode_chunk._cache_size() - dec0 <= 2


def test_engine_prefix_cache_parity():
    """A prompt extending an already-served prompt admits via the prefix
    cache (tail-only prefill) and produces the same greedy tokens as a
    cold engine."""
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    base = np.array([7, 3, 9, 11, 2, 5, 13, 1], np.int32)
    ext = np.concatenate([base, [17, 4]]).astype(np.int32)

    warm = DecodeEngine(params, CFG, max_batch=1, max_len=32)
    r1 = warm.add_request(base, max_new_tokens=4)
    warm.run()
    r2 = warm.add_request(ext, max_new_tokens=4)
    out_warm = warm.run()
    assert warm.prefix_hits == 1

    cold = DecodeEngine(params, CFG, max_batch=1, max_len=32,
                        prefix_cache_size=0)
    r3 = cold.add_request(ext, max_new_tokens=4)
    out_cold = cold.run()
    assert cold.prefix_hits == 0
    np.testing.assert_array_equal(out_warm[r2], out_cold[r3])


def test_engine_per_slot_temperature():
    """Greedy and sampled requests coexist in one batch; greedy slots stay
    deterministic."""
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    p1 = np.array([3, 17, 91], np.int32)
    p2 = np.array([5, 9, 40], np.int32)

    engine = DecodeEngine(params, CFG, max_batch=2, max_len=32, seed=1)
    g = engine.add_request(p1, max_new_tokens=6, temperature=0.0)
    s = engine.add_request(p2, max_new_tokens=6, temperature=1.0)
    out = engine.run()
    ref = generate(params, jnp.asarray(p1[None]), CFG, max_new_tokens=6,
                   kv_quantized=True, max_len=32)[0]
    np.testing.assert_array_equal(np.asarray(out[g]), np.asarray(ref))
    assert len(out[s]) == 6
    assert all(0 <= t < CFG.vocab_size for t in out[s])


def _fused_quant_model(cfg, gs=64):
    from sparsebit_tpu.llm.quant import QuantLinear

    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    params = L.fuse_llama_params(params)
    return L.quantize_llama_params(
        params,
        lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=gs
        ),
    )


def test_paged_engine_matches_fixed_slot_engine():
    """PagedDecodeEngine (block-table pools, 16-row blocks) produces the
    same greedy tokens as the fixed-slot engine on the same quantized
    model — including a third request queued behind 2 slots. Both
    engines decode through the megakernel (the fixed-slot engine's
    decode_chunk_scanned fast path and the paged decode_chunk_paged are
    row-exact against each other — the int8-attention cross-path
    contract), so with the ADMISSION path pinned to the same masked
    prefill (the paged engine's cold admissions otherwise take the
    flash-bf16 prefill, a different formulation with its own ±1-code
    rounding), tokens must match EXACTLY even though the engines batch,
    page, and recycle slots differently."""
    import types

    from sparsebit_tpu.llm import decode as Dmod
    from sparsebit_tpu.llm.decode import prefill_at
    from sparsebit_tpu.llm.serving import PagedDecodeEngine

    cfg = L.llama_tiny(dim=512, n_heads=4, n_kv_heads=4, ffn_dim=384,
                       vocab_size=128, max_seq_len=48, dtype="float32")
    qparams = _fused_quant_model(cfg)
    prompts = [
        np.array([3, 17, 91, 30, 7], np.int32),
        np.array([5, 9], np.int32),
        np.array([8, 1, 2, 3, 4, 5], np.int32),
    ]
    n_new = 5

    old = Dmod.FORCE_LAYER_KERNEL
    try:
        Dmod.FORCE_LAYER_KERNEL = True
        ref_engine = DecodeEngine(qparams, cfg, max_batch=2, max_len=48)
        assert ref_engine._stacked_chunks  # megakernel-backed chunks
        rids = [ref_engine.add_request(p, max_new_tokens=n_new)
                for p in prompts]
        ref = ref_engine.run()

        eng = PagedDecodeEngine(qparams, cfg, max_batch=2, block=16,
                                n_blocks=8, max_len=48)
        # pin admissions to prefill_at (same formulation as the base
        # engine) so the comparison isolates the decode contract
        eng._prefill_call = types.MethodType(
            lambda self, tokens, scratch, lasts, offsets: prefill_at(
                self.params, tokens, scratch, self.cfg, lasts, offsets),
            eng)
        rids_p = [eng.add_request(p, max_new_tokens=n_new) for p in prompts]
        got = eng.run()
    finally:
        Dmod.FORCE_LAYER_KERNEL = old
    for r_ref, r_got in zip(rids, rids_p):
        np.testing.assert_array_equal(
            np.asarray(got[r_got]), np.asarray(ref[r_ref]),
            err_msg=str(r_ref))
    # after completion only prefix-cache entries may hold blocks; the
    # rest are back in the pool (trash block excluded from both)
    held = sum(1 for bid in range(8 - 1) if eng._ref[bid] > 0)
    cached = sum(len(e["blocks"]) for e in eng._prefix.values())
    assert held == cached, (held, cached)
    assert len(eng._free) == 8 - 1 - cached


def test_paged_engine_prefix_block_sharing():
    """Identical 20-token prompts: the second admission SHARES the first's
    full 16-row block (refcount > 1 while both live; the partial tail is
    re-prefilled) and produces identical tokens."""
    from sparsebit_tpu.llm.serving import PagedDecodeEngine

    cfg = L.llama_tiny(dim=256, n_heads=2, n_kv_heads=2, ffn_dim=384,
                       vocab_size=128, max_seq_len=48, dtype="float32")
    qparams = _fused_quant_model(cfg)
    prompt = np.arange(2, 22, dtype=np.int32)  # 20 tokens -> 1 full block

    eng = PagedDecodeEngine(qparams, cfg, max_batch=1, block=16,
                            n_blocks=6, max_len=48, prefix_cache_size=4)
    r1 = eng.add_request(prompt, max_new_tokens=4)
    out1 = eng.run()
    assert eng.prefix_hits == 0 and len(eng._prefix) >= 1
    r2 = eng.add_request(prompt.copy(), max_new_tokens=4)
    out2 = eng.run()
    assert eng.prefix_hits == 1
    np.testing.assert_array_equal(np.asarray(out1[r1]), np.asarray(out2[r2]))
    # slots freed -> only prefix-cache refs keep blocks out of the pool
    held = sum(1 for r in eng._ref if r > 0)
    assert held == sum(len(e["blocks"]) for e in eng._prefix.values())


def test_engine_int8_head():
    """head_bits=8 engine: W8A8 per-channel lm_head (halves the decode
    head stream at 7B) still produces a full, plausible generation."""
    from sparsebit_tpu.llm.quant import QuantLinear

    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    engine = DecodeEngine(params, CFG, max_batch=2, max_len=32, head_bits=8)
    assert isinstance(engine.params["lm_head"], QuantLinear)
    assert engine.params["lm_head"].bits == 8
    prompts = [np.array([3, 17, 91, 30], np.int32),
               np.array([5, 9], np.int32)]
    rids = [engine.add_request(p, max_new_tokens=5) for p in prompts]
    results = engine.run()
    for rid in rids:
        got = np.asarray(results[rid])
        assert got.shape == (5,)
        assert ((0 <= got) & (got < CFG.vocab_size)).all()


def test_engine_warns_past_pallas_batch_limit():
    """max_batch > 64 silently densified in round 2 (VERDICT r2 weak #2);
    it now runs the B-tiled prefill-grid kernel, but the regime change
    (whole-batch VMEM residency -> tiled grid, worse per-slot latency)
    must still be announced once, at construction."""
    import pytest

    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    with pytest.warns(UserWarning, match="64-row"):
        DecodeEngine(params, CFG, max_batch=65, max_len=32)


def test_paged_engine_pool_exhaustion_reclaims_then_raises():
    """VERDICT r2 #6c: the allocator's unhappy paths. (a) with the pool
    fully held by prefix-cache entries, a new admission evicts entries to
    reclaim blocks and succeeds; (b) with the pool held by LIVE slots,
    allocation must raise, not corrupt."""
    import pytest

    from sparsebit_tpu.llm.serving import PagedDecodeEngine

    cfg = L.llama_tiny(dim=256, n_heads=2, n_kv_heads=2, ffn_dim=384,
                       vocab_size=128, max_seq_len=48, dtype="float32")
    qparams = _fused_quant_model(cfg)

    # (a) 3 usable blocks (4 - trash); each 17-token prompt + 4 new tokens
    # needs 2 x 16-row blocks, and completion leaves 1 full block cached.
    eng = PagedDecodeEngine(qparams, cfg, max_batch=1, block=16,
                            n_blocks=4, max_len=48, prefix_cache_size=8)
    p1 = np.arange(2, 19, dtype=np.int32)
    p2 = np.arange(40, 57, dtype=np.int32)
    eng.add_request(p1, max_new_tokens=4)
    out = eng.run()
    assert len(eng._prefix) == 1
    # second, different prompt: needs 2 fresh blocks with only 2 free ->
    # must evict the cached prefix block, then succeed
    r2 = eng.add_request(p2, max_new_tokens=4)
    out = eng.run()
    assert len(out[r2]) == 4
    assert len(eng._prefix) >= 1  # p2's own prefix got cached after

    # (b) live slots hold everything: no eviction possible -> RuntimeError
    eng2 = PagedDecodeEngine(qparams, cfg, max_batch=2, block=16,
                             n_blocks=3, max_len=48, prefix_cache_size=0)
    eng2.add_request(np.arange(2, 19, dtype=np.int32), max_new_tokens=30)
    with pytest.raises(RuntimeError, match="exhausted"):
        eng2.run()  # 17 + 30 tokens needs a 3rd block; only 2 usable


def test_admission_dispatch_count_independent_of_depth():
    """VERDICT r2 #7 acceptance: admission (splice + prefix store/seed)
    issues a FIXED number of host->device dispatches per group/admit,
    regardless of n_layers — counted on the serving module's jit entry
    points for a 2-layer vs 4-layer model over an identical workload
    (cold admits + one prefix-hit admit)."""
    import pytest

    import sparsebit_tpu.llm.serving as S

    def run_counted(n_layers, mp):
        cfg = L.llama_tiny(dim=128, ffn_dim=256, n_layers=n_layers,
                           vocab_size=128, max_seq_len=64, dtype="float32")
        params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
        counts = {}

        def counted(name, fn):
            def wrap(*a, **k):
                counts[name] = counts.get(name, 0) + 1
                return fn(*a, **k)
            return wrap

        mp.setattr(S, "_splice_rows_jit",
                   counted("splice", S._splice_rows_jit))
        mp.setattr(S, "_stack_row_jit", counted("stack", S._stack_row_jit))
        mp.setattr(S, "_seed_rows_jit", counted("seed", S._seed_rows_jit))

        eng = DecodeEngine(params, cfg, max_batch=2, max_len=64)
        base = np.array([7, 3, 9, 11, 2, 5, 13, 1], np.int32)
        ext = np.concatenate([base, [17, 4]]).astype(np.int32)
        eng.add_request(base, max_new_tokens=3)
        eng.add_request(np.array([5, 9], np.int32), max_new_tokens=3)
        eng.run()
        eng.add_request(ext, max_new_tokens=3)  # prefix hit -> seed path
        eng.run()
        assert eng.prefix_hits == 1
        return counts

    with pytest.MonkeyPatch.context() as mp:
        c2 = run_counted(2, mp)
    with pytest.MonkeyPatch.context() as mp:
        c4 = run_counted(4, mp)
    assert c2 == c4, (c2, c4)
    assert c2["seed"] == 1


def test_tp_engine_matches_single_device_engine():
    """BASELINE configs[4] (tensor-sharded continuous batching): the
    TPDecodeEngine at tp=2 over exactly-split packed shards + head-sharded
    INT8 KV produces the same greedy tokens as the single-device engine on
    the same quantized model — including a prefix-hit admission."""
    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.llm.serving import TPDecodeEngine
    from sparsebit_tpu.parallel.mesh import make_mesh

    cfg = L.llama_tiny(dim=128, ffn_dim=256, n_layers=2, n_heads=4,
                       n_kv_heads=2, vocab_size=128, max_seq_len=64,
                       dtype="float32")
    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    qparams = L.quantize_llama_params(
        params,
        lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=32
        ),
    )
    prompts = [
        np.array([3, 17, 91, 30, 7], np.int32),
        np.array([5, 9], np.int32),
        np.array([8, 1, 2, 3, 4, 5], np.int32),
    ]
    n_new = 5

    ref_eng = DecodeEngine(qparams, cfg, max_batch=2, max_len=48)
    rids = [ref_eng.add_request(p, max_new_tokens=n_new) for p in prompts]
    ref = ref_eng.run()

    mesh = make_mesh(dp=4, tp=2)
    eng = TPDecodeEngine(qparams, cfg, mesh, max_batch=2, max_len=48)
    rids_tp = [eng.add_request(p, max_new_tokens=n_new) for p in prompts]
    got = eng.run()
    for r_ref, r_tp in zip(rids, rids_tp):
        np.testing.assert_array_equal(
            np.asarray(got[r_tp]), np.asarray(ref[r_ref]),
            err_msg=str(r_ref))

    # prefix-hit admission through the TP seed/splice path
    ext = np.concatenate([prompts[0], [17, 4]]).astype(np.int32)
    r_ref2 = ref_eng.add_request(ext, max_new_tokens=4)
    r_tp2 = eng.add_request(ext, max_new_tokens=4)
    out_ref = ref_eng.run()
    out_tp = eng.run()
    assert eng.prefix_hits == 1
    np.testing.assert_array_equal(
        np.asarray(out_tp[r_tp2]), np.asarray(out_ref[r_ref2]))


def test_paged_engine_serves_mixed_precision_checkpoint():
    """int4/3/2 mixed checkpoints serve through BOTH engines (the paged
    one decodes via the megakernel + block tables) with identical greedy
    tokens — round-2's 'mixed models can't use the megakernel' gap."""
    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.llm.serving import PagedDecodeEngine

    cfg = L.llama_tiny(dim=256, n_heads=2, n_kv_heads=2, ffn_dim=384,
                       vocab_size=128, max_seq_len=48, dtype="float32",
                       n_layers=3)
    params = L.init_llama_params(cfg, jax.random.PRNGKey(1))
    params = L.fuse_llama_params(params)
    layer_bits = {0: 4, 1: 3, 2: 2}
    qparams = L.quantize_llama_params(
        params,
        lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32),
            bits=layer_bits[int(p.split(".")[1])], groupsize=64,
        ),
    )
    prompts = [np.array([3, 17, 91, 30, 7], np.int32),
               np.array([5, 9], np.int32)]

    ref_eng = DecodeEngine(qparams, cfg, max_batch=2, max_len=48)
    assert ref_eng.params["layers"][1]["wqkv"].bits == 4  # nibble retag
    rids = [ref_eng.add_request(p, max_new_tokens=5) for p in prompts]
    ref = ref_eng.run()

    eng = PagedDecodeEngine(qparams, cfg, max_batch=2, block=16,
                            n_blocks=8, max_len=48)
    rids_p = [eng.add_request(p, max_new_tokens=5) for p in prompts]
    got = eng.run()
    for r_ref, r_got in zip(rids, rids_p):
        np.testing.assert_array_equal(
            np.asarray(got[r_got]), np.asarray(ref[r_ref]),
            err_msg=str(r_ref))
