"""Continuous-batching decode engine.

The reference serves one request at a time (inference.py greedy loop);
BASELINE.json's north star asks for continuous batching. Design:

- one fixed-shape (max_batch, max_len) KV cache; every decode_step serves
  all occupied slots in one compiled call (shapes never change, so there
  is exactly one compile for the lifetime of the engine);
- admission: a new prompt is prefilled into a batch-1 scratch cache (one
  compiled prefill per prompt-length bucket) and its K/V rows are copied
  into a free slot — sequences at different depths then share steps via
  per-slot lengths (decode.decode_step already masks per sequence);
- slots free on EOS/max-tokens and are immediately reusable.
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm.decode import decode_step, prefill, sample_logits
from sparsebit_tpu.llm.kv_cache import KVCache, init_kv_cache


@dataclass
class _Request:
    rid: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0
    generated: list = field(default_factory=list)
    done: bool = False


def _bucket(n, buckets=(16, 32, 64, 128, 256, 512, 1024, 2048)):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class DecodeEngine:
    def __init__(
        self,
        params,
        cfg,
        max_batch=8,
        max_len=None,
        kv_quantized=True,
        eos_id=None,
        seed=0,
    ):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len or cfg.max_seq_len
        self.kv_quantized = kv_quantized
        self.eos_id = eos_id
        self.cache = init_kv_cache(cfg, max_batch, self.max_len, kv_quantized)
        self.slots = [None] * max_batch  # _Request or None
        self.queue = []
        self.next_tok = jnp.zeros((max_batch,), jnp.int32)
        self._rid = 0
        self._key = jax.random.PRNGKey(seed)

    # ---- client API --------------------------------------------------------
    def add_request(self, prompt_ids, max_new_tokens=64, temperature=0.0):
        self._rid += 1
        self.queue.append(
            _Request(self._rid, np.asarray(prompt_ids, np.int32),
                     max_new_tokens, temperature)
        )
        return self._rid

    @property
    def has_work(self):
        return bool(self.queue) or any(s is not None for s in self.slots)

    def run(self):
        """Drain everything; returns {rid: [tokens...]}."""
        results = {}
        while self.has_work:
            for rid, toks in self.step().items():
                results.setdefault(rid, []).extend(toks)
        return results

    # ---- engine internals --------------------------------------------------
    def _free_slot(self):
        for i, s in enumerate(self.slots):
            if s is None:
                return i
        return None

    def _admit(self, slot, req):
        """Prefill the prompt in a scratch cache and splice into ``slot``."""
        S = len(req.prompt)
        bucket = min(_bucket(S), self.max_len)
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :S] = req.prompt
        scratch = init_kv_cache(self.cfg, 1, self.max_len, self.kv_quantized)
        logits, scratch = prefill(
            self.params, jnp.asarray(padded), scratch, self.cfg
        )
        # bucket padding ran extra positions; only rows [:S] are real.
        # logits for the LAST REAL token:
        if bucket != S:
            from sparsebit_tpu.llm.llama import llama_forward

            logits = llama_forward(
                self.params, jnp.asarray(req.prompt[None, :]), self.cfg
            )[:, -1]
        k, v = list(self.cache.k), list(self.cache.v)
        ks, vs = list(self.cache.k_scale), list(self.cache.v_scale)
        for li in range(self.cfg.n_layers):
            k[li] = k[li].at[slot, :S].set(scratch.k[li][0, :S])
            v[li] = v[li].at[slot, :S].set(scratch.v[li][0, :S])
            if self.kv_quantized:
                ks[li] = ks[li].at[slot, :S].set(scratch.k_scale[li][0, :S])
                vs[li] = vs[li].at[slot, :S].set(scratch.v_scale[li][0, :S])
        length = self.cache.length.at[slot].set(S)
        self.cache = KVCache(k, v, ks, vs, length, self.kv_quantized)
        self.slots[slot] = req
        self._key, sub = jax.random.split(self._key)
        first = sample_logits(logits, sub, req.temperature)
        self.next_tok = self.next_tok.at[slot].set(first[0])
        req.generated.append(int(first[0]))

    def step(self):
        """Admit queued prompts, run ONE decode step for all active slots.
        Returns {rid: [new_tokens]} emitted this step (an admitted request
        can emit its first token AND a decode token in the same step)."""
        emitted = {}
        while self.queue:
            slot = self._free_slot()
            if slot is None:
                break
            req = self.queue.pop(0)
            self._admit(slot, req)
            emitted.setdefault(req.rid, []).append(req.generated[-1])
            self._maybe_finish(slot)

        if not any(s is not None for s in self.slots):
            return emitted

        logits, self.cache = decode_step(
            self.params, self.next_tok, self.cache, self.cfg
        )
        logits_np = np.asarray(logits, np.float32)
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            t = self._sample_host(logits_np[slot], req.temperature)
            req.generated.append(t)
            emitted.setdefault(req.rid, []).append(t)
            self.next_tok = self.next_tok.at[slot].set(t)
            self._maybe_finish(slot)
        return emitted

    def _sample_host(self, logits, temperature):
        """Per-request sampling on host (per-slot temperatures differ; the
        device step stays one compiled call)."""
        if temperature <= 0.0:
            return int(np.argmax(logits))
        self._key, sub = jax.random.split(self._key)
        rng = np.random.default_rng(int(jax.random.randint(sub, (), 0, 2**31 - 1)))
        z = logits / temperature
        z = z - z.max()
        p = np.exp(z)
        p /= p.sum()
        return int(rng.choice(len(p), p=p))

    def _maybe_finish(self, slot):
        req = self.slots[slot]
        if req is None:
            return
        hit_eos = self.eos_id is not None and req.generated[-1] == self.eos_id
        hit_len = len(req.generated) >= req.max_new_tokens
        full = int(self.cache.length[slot]) + 1 >= self.max_len
        if hit_eos or hit_len or full:
            req.done = True
            self.slots[slot] = None
