"""AdaRound quantizer: learnable rounding with rectified sigmoid, plus the
layer-reconstruction trainer.

Reference: sparsebit/quantization/quantizers/adaround.py:16-134 (BRECQ-derived;
zeta/gamma stretch 1.1/-0.1, LinearTempDecay beta 20->2, warmup 0.2, Adam,
rec loss |.|^2 sum(1).mean + round-loss weight 1e-3, 20k steps). The trainer
here is a jitted ``lax``-stepped optax Adam loop on device.
"""

import jax
import jax.numpy as jnp
import optax

from sparsebit_tpu.quantization.common import QuantTarget
from sparsebit_tpu.quantization.quantizers import register_quantizer
from sparsebit_tpu.quantization.quantizers.base import Quantizer as BaseQuantizer

ZETA, GAMMA = 1.1, -0.1


@register_quantizer
class Quantizer(BaseQuantizer):
    TYPE = "adaround"

    def __init__(self, config):
        super().__init__(config)
        assert (
            self.qdesc.target == QuantTarget.WEIGHT
        ), "AdaRound only supports to quant weights"
        self.v = None

    def init_variables(self, x):
        x_floor = jnp.floor(x / self.scale)
        rest = (x / self.scale) - x_floor
        rest = jnp.clip(rest, 1e-4, 1 - 1e-4)  # keep log finite
        self.v = -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)

    def trainable_params(self):
        return {"v": self.v} if self.v is not None else {}

    def _soft_round(self, v):
        return jnp.clip(jax.nn.sigmoid(v) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)

    def _forward(self, x, scale, zero_point, params=None):
        v = params.get("v", self.v) if params else self.v
        x_floor = jnp.floor(x / scale)
        if self.training and v is not None:
            x_q = x_floor + self._soft_round(v)
        elif v is not None:
            x_q = x_floor + (v >= 0).astype(x.dtype)
        else:
            x_q = jnp.round(x / scale)
        x_q = jnp.clip(x_q + zero_point, self.qdesc.qmin, self.qdesc.qmax)
        return (x_q - zero_point) * scale


def linear_temp_decay(step, max_steps, rel_start_step, start_beta, end_beta):
    start_step = rel_start_step * max_steps
    ratio = (step - start_step) / (max_steps - start_step)
    return jnp.where(
        step < start_step,
        start_beta,
        end_beta + (start_beta - end_beta) * jnp.maximum(0.0, 1.0 - ratio),
    )


def reconstruct_qlayer(
    layer,
    inputs,
    outputs,
    batch_size=32,
    max_steps=20000,
    beta_range=(20, 2),
    warmup=0.2,
    p=2.0,
    round_loss_weight=1e-3,
    a_quant=False,
    seed=0,
):
    """Optimize the layer's AdaRound variable to reconstruct float outputs.

    ``layer`` is a QuantOpr whose weight_quantizer is adaround.
    inputs/outputs: stacked calibration tensors (N, ...).
    """
    layer.eval()
    layer.set_quant(w_quant=True, a_quant=a_quant)
    wq = layer.weight_quantizer
    wq.init_variables(layer.get_weight())
    wq.train(True)

    opt = optax.adam(1e-3)

    def loss_fn(v, x, y, step):
        qparams = {"weight_quantizer.v": v}
        pred = layer.execute(x, params=qparams, training=True)
        rec_loss = jnp.mean(
            jnp.sum(jnp.abs(pred - y) ** p, axis=tuple(range(1, pred.ndim)))
        )
        beta = linear_temp_decay(
            step.astype(jnp.float32), max_steps, warmup, beta_range[0], beta_range[1]
        )
        round_vals = wq._soft_round(v)
        round_loss = jnp.sum(1.0 - jnp.abs((round_vals - 0.5) * 2.0) ** beta)
        round_loss = jnp.where(step < warmup * max_steps, 0.0, round_loss)
        return rec_loss + round_loss_weight * round_loss

    @jax.jit
    def train_step(v, opt_state, key, step):
        key, sub = jax.random.split(key)
        idx = jax.random.choice(
            sub, inputs.shape[0], (min(batch_size, inputs.shape[0]),), replace=False
        )
        x, y = inputs[idx], outputs[idx]
        grads = jax.grad(loss_fn)(v, x, y, step)
        updates, opt_state = opt.update(grads, opt_state)
        v = optax.apply_updates(v, updates)
        return v, opt_state, key

    v = wq.v
    opt_state = opt.init(v)
    key = jax.random.PRNGKey(seed)
    for step in range(max_steps):
        v, opt_state, key = train_step(v, opt_state, key, jnp.asarray(step))
    wq.v = v
    wq.train(False)
    return layer
