"""BERT encoder, NLC layout.

Parity target: the reference's PTQ GLUE/CoLA example and BertEmbeddings CI
test (examples/post_training_quantization/GLUE/CoLA/main.py,
ci/huggingface_tests/test_bert_emebddings.py).
"""

import jax
import jax.numpy as jnp

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model
from sparsebit_tpu.nn import functional as F


class BertEmbeddings(nn.Module):
    def __init__(self, vocab_size, dim, max_len=512, type_vocab=2, key=None):
        super().__init__()
        ks = jax.random.split(key, 3)
        self.word_embeddings = nn.Embedding(vocab_size, dim, key=ks[0])
        self.position_embeddings = nn.Embedding(max_len, dim, key=ks[1])
        self.token_type_embeddings = nn.Embedding(type_vocab, dim, key=ks[2])
        self.norm = nn.LayerNorm(dim)

    def forward(self, input_ids):
        L = input_ids.shape[-1]
        pos = jnp.arange(L, dtype=jnp.int32)
        y = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(pos)
            + self.token_type_embeddings(jnp.zeros((L,), jnp.int32))
        )
        return self.norm(y)


class BertSelfAttention(nn.Module):
    def __init__(self, dim, num_heads, key=None):
        super().__init__()
        ks = jax.random.split(key, 4)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.query = nn.Linear(dim, dim, key=ks[0])
        self.key = nn.Linear(dim, dim, key=ks[1])
        self.value = nn.Linear(dim, dim, key=ks[2])
        self.output = nn.Linear(dim, dim, key=ks[3])

    def _split(self, x, B, N):
        return F.permute(
            F.reshape(x, (B, N, self.num_heads, self.head_dim)), (0, 2, 1, 3)
        )

    def forward(self, x):
        B, N, C = x.shape
        q = self._split(self.query(x), B, N)
        k = self._split(self.key(x), B, N)
        v = self._split(self.value(x), B, N)
        attn = F.matmul(q, F.transpose(k, 2, 3)) * (self.head_dim**-0.5)
        attn = F.softmax(attn, axis=-1)
        y = F.reshape(F.permute(F.matmul(attn, v), (0, 2, 1, 3)), (B, N, C))
        return self.output(y)


class BertLayer(nn.Module):
    def __init__(self, dim, num_heads, ffn_dim, key=None):
        super().__init__()
        ks = jax.random.split(key, 3)
        self.attention = BertSelfAttention(dim, num_heads, key=ks[0])
        self.norm1 = nn.LayerNorm(dim)
        self.intermediate = nn.Linear(dim, ffn_dim, key=ks[1])
        self.act = nn.GELU()
        self.ffn_output = nn.Linear(ffn_dim, dim, key=ks[2])
        self.norm2 = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.norm1(x + self.attention(x))
        x = self.norm2(x + self.ffn_output(self.act(self.intermediate(x))))
        return x


class BertModel(nn.Module):
    def __init__(
        self,
        vocab_size=30522,
        dim=768,
        depth=12,
        num_heads=12,
        ffn_dim=3072,
        num_classes=2,
        key=None,
    ):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, depth + 3)
        self.embeddings = BertEmbeddings(vocab_size, dim, key=ks[0])
        self.encoder = nn.Sequential(
            *[BertLayer(dim, num_heads, ffn_dim, key=ks[i + 1]) for i in range(depth)]
        )
        self.pooler = nn.Linear(dim, dim, key=ks[-2])
        self.pooler_act = nn.Tanh()
        self.classifier = nn.Linear(dim, num_classes, key=ks[-1])

    def forward(self, input_ids):
        y = self.encoder(self.embeddings(input_ids))
        pooled = self.pooler_act(self.pooler(F.getitem(y, (slice(None), 0))))
        return self.classifier(pooled)


@register_model
def bert_base(num_classes=2, key=None):
    return BertModel(num_classes=num_classes, key=key)


@register_model
def bert_tiny(num_classes=2, key=None):
    return BertModel(
        vocab_size=1024, dim=128, depth=2, num_heads=2, ffn_dim=512,
        num_classes=num_classes, key=key,
    )


class BertForQuestionAnswering(nn.Module):
    """Extractive-QA head: per-token start/end span logits (reference:
    examples/unstructured_prune/SQuAD/model.py BertForQuestionAnswering —
    qa_outputs Linear(hidden, 2) over the full sequence)."""

    def __init__(self, vocab_size=30522, dim=768, depth=12, num_heads=12,
                 ffn_dim=3072, key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, depth + 2)
        self.embeddings = BertEmbeddings(vocab_size, dim, key=ks[0])
        self.encoder = nn.Sequential(
            *[BertLayer(dim, num_heads, ffn_dim, key=ks[i + 1])
              for i in range(depth)]
        )
        self.qa_outputs = nn.Linear(dim, 2, key=ks[-1])

    def forward(self, input_ids):
        y = self.encoder(self.embeddings(input_ids))
        logits = self.qa_outputs(y)  # (B, N, 2)
        start = F.getitem(logits, (slice(None), slice(None), 0))
        end = F.getitem(logits, (slice(None), slice(None), 1))
        return start, end


@register_model
def bert_qa(key=None, **kwargs):
    return BertForQuestionAnswering(key=key, **kwargs)


@register_model
def bert_qa_tiny(key=None, **kwargs):
    kw = dict(vocab_size=1024, dim=128, depth=2, num_heads=2, ffn_dim=512)
    kw.update(kwargs)
    return BertForQuestionAnswering(key=key, **kw)
