"""Sparser base class (reference: sparsebit/sparse/sparsers/base.py:6-23).

A Sparser turns a weight tensor into a {0,1} mask:

- ``unstructure``: elementwise mask, same shape as the weight.
- ``structure``: per-output-channel mask; the SparseModel threads it into the
  following BatchNorm and uses it to zero the bias too.

All mask math is pure jnp running on device (the reference ranks on CPU
via torch.sort; here a single jnp.quantile/top-k keeps it jittable).
"""

import jax.numpy as jnp


class Sparser:
    TYPE = "base"

    def __init__(self, config):
        self.config = config
        self.strategy = config.SPARSER.STRATEGY
        self.ratio = float(config.SPARSER.RATIO)

    @property
    def is_structured(self):
        return self.strategy == "structure"

    # ---- per-channel importance score; subclasses override -----------------
    def channel_scores(self, weight, ch_axis):
        raise NotImplementedError

    def element_scores(self, weight):
        raise NotImplementedError

    def calc_mask(self, weight, ch_axis):
        """Return (w_mask, channel_mask|None). ``ch_axis`` is the
        out-channel axis of the weight layout (HWIO conv -> 3,
        (in,out) linear -> 1)."""
        if self.ratio <= 0.0:
            full = jnp.ones_like(weight)
            return full, (
                jnp.ones((weight.shape[ch_axis],), weight.dtype)
                if self.is_structured
                else None
            )
        if self.is_structured:
            scores = self.channel_scores(weight, ch_axis)
            n = scores.shape[0]
            n_prune = int(n * self.ratio)
            if n_prune >= n:
                n_prune = n - 1
            # keep the (n - n_prune) highest-score channels
            thresh = jnp.sort(scores)[n_prune]
            ch_mask = (scores >= thresh).astype(weight.dtype)
            shape = [1] * weight.ndim
            shape[ch_axis] = -1
            return jnp.broadcast_to(ch_mask.reshape(shape), weight.shape), ch_mask
        scores = self.element_scores(weight)
        thresh = jnp.quantile(scores.reshape(-1).astype(jnp.float32), self.ratio)
        return (scores >= thresh).astype(weight.dtype), None

    def __repr__(self):
        return "{}(strategy={}, ratio={})".format(
            type(self).__name__, self.strategy, self.ratio
        )
