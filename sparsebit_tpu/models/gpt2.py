"""GPT-2 decoder, NLC layout.

Parity target: the reference's PTQ wikitext example
(examples/post_training_quantization/wikitext/main.py — GPT-2-small,
NLC-layout qconfig). Causal masking is an additive bias so the traced graph
stays a pure chain of quantizable matmuls.
"""

import jax
import jax.numpy as jnp

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model
from sparsebit_tpu.nn import functional as F


class CausalSelfAttention(nn.Module):
    def __init__(self, dim, num_heads, max_len, key=None):
        super().__init__()
        ks = jax.random.split(key, 2)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.c_attn = nn.Linear(dim, dim * 3, key=ks[0])
        self.c_proj = nn.Linear(dim, dim, key=ks[1])
        mask = jnp.triu(jnp.full((max_len, max_len), -1e9, jnp.float32), k=1)
        self.buffer("causal_bias", mask)

    def forward(self, x):
        B, N, C = x.shape
        qkv = F.reshape(self.c_attn(x), (B, N, 3, self.num_heads, self.head_dim))
        qkv = F.permute(qkv, (2, 0, 3, 1, 4))
        q, k, v = F.getitem(qkv, 0), F.getitem(qkv, 1), F.getitem(qkv, 2)
        attn = F.matmul(q, F.transpose(k, 2, 3)) * (self.head_dim**-0.5)
        attn = attn + self._buffers["causal_bias"][:N, :N]
        attn = F.softmax(attn, axis=-1)
        y = F.reshape(F.permute(F.matmul(attn, v), (0, 2, 1, 3)), (B, N, C))
        return self.c_proj(y)


class GPT2Block(nn.Module):
    def __init__(self, dim, num_heads, max_len, key=None):
        super().__init__()
        ks = jax.random.split(key, 3)
        self.ln_1 = nn.LayerNorm(dim)
        self.attn = CausalSelfAttention(dim, num_heads, max_len, key=ks[0])
        self.ln_2 = nn.LayerNorm(dim)
        self.c_fc = nn.Linear(dim, dim * 4, key=ks[1])
        self.act = nn.GELU()
        self.c_proj = nn.Linear(dim * 4, dim, key=ks[2])

    def forward(self, x):
        x = x + self.attn(self.ln_1(x))
        x = x + self.c_proj(self.act(self.c_fc(self.ln_2(x))))
        return x


class GPT2Model(nn.Module):
    def __init__(
        self,
        vocab_size=50257,
        dim=768,
        depth=12,
        num_heads=12,
        max_len=1024,
        key=None,
    ):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, depth + 3)
        self.wte = nn.Embedding(vocab_size, dim, key=ks[0])
        self.wpe = nn.Embedding(max_len, dim, key=ks[1])
        self.blocks = nn.Sequential(
            *[GPT2Block(dim, num_heads, max_len, key=ks[i + 2]) for i in range(depth)]
        )
        self.ln_f = nn.LayerNorm(dim)
        self.lm_head = nn.Linear(dim, vocab_size, bias=False, key=ks[-1])

    def forward(self, input_ids):
        L = input_ids.shape[-1]
        y = self.wte(input_ids) + self.wpe(jnp.arange(L, dtype=jnp.int32))
        return self.lm_head(self.ln_f(self.blocks(y)))


@register_model
def gpt2_small(key=None):
    return GPT2Model(key=key)


@register_model
def gpt2_tiny(key=None):
    return GPT2Model(vocab_size=1024, dim=128, depth=2, num_heads=2, max_len=256, key=key)
