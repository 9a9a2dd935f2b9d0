"""QAT training utilities.

The reference trains QAT models with a plain torch loop over QuantModel
(examples/quantization_aware_training/.../main.py): fake-quant forward,
STE backward, DDP. TPU-native equivalent: a functional train step — the
trainable pytree (weights + quantizer learnables like LSQ scales) is
threaded explicitly, the QuantModel graph interpreter runs under jit, and
data parallelism is a NamedSharding on the batch (no DDP wrapper needed).
"""

from functools import partial

import jax
import jax.numpy as jnp


def merge_params(base, trainable):
    """Overlay the trainable pytree onto the full params dict."""
    merged = {n: dict(p) for n, p in base.items()}
    for n, p in trainable.items():
        merged.setdefault(n, {})
        merged[n].update(p)
    return merged


def make_qat_step(qmodel, loss_fn, optimizer):
    """Build a jitted (trainable, opt_state, *batch) -> (trainable,
    opt_state, loss) step.

    loss_fn(outputs, *batch_rest) -> scalar. The QuantModel must already be
    through init_QAT() so quantizer learnables are in trainable_params().
    """
    base = qmodel.params()

    def loss_of(trainable, *batch):
        params = merge_params(base, trainable)
        out = qmodel.apply(params, batch[0], training=True)
        return loss_fn(out, *batch[1:])

    @jax.jit
    def step(trainable, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_of)(trainable, *batch)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = jax.tree.map(lambda p, u: p + u, trainable, updates)
        return trainable, opt_state, loss

    return step


def init_qat_state(qmodel, optimizer):
    trainable = qmodel.trainable_params()
    return trainable, optimizer.init(trainable)


def commit_qat_params(qmodel, trainable):
    """Write trained values back into the stateful modules (after training)."""
    for name, p in trainable.items():
        node_op = qmodel.get_qmodule(name)
        node_op.load_state_dict(p)


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
