"""Module system + float op zoo.

TPU-native replacement for torch.nn as consumed by the reference's QuantModel.
Modules are stateful containers (ergonomic for a compression toolkit), but all
compute goes through pure ``execute(*args, params=..., training=...)``
functions so the graph interpreter can run under ``jax.jit`` with parameters
as a traced pytree.

Layout conventions (TPU-first, unlike the reference's NCHW):
- activations: NHWC for CNNs, NLC for transformers
- conv weights: HWIO  (out-channel axis = 3)
- linear weights: (in, out)  (out-channel axis = 1) so forward is ``x @ w``
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_uniform(key, shape, fan_in):
    bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class Module:
    """Base module. Leaf ops override ``execute``; containers override
    ``forward`` (which calls submodules and traceable functional ops)."""

    def __init__(self):
        object.__setattr__(self, "_params", {})
        object.__setattr__(self, "_buffers", {})
        object.__setattr__(self, "_modules", {})
        object.__setattr__(self, "training", False)
        object.__setattr__(self, "_path", None)

    # ---- registration -----------------------------------------------------
    def __setattr__(self, name, value):
        if isinstance(value, Module):
            self._modules[name] = value
            self._params.pop(name, None)
            self._buffers.pop(name, None)
            # a prior plain assignment (e.g. `self.proj = None` before the
            # conditional Module assignment) must not shadow the registry —
            # __getattr__ only fires when instance lookup misses
            self.__dict__.pop(name, None)
        elif name in self._params:
            self._params[name] = value
        elif name in self._buffers:
            self._buffers[name] = value
        else:
            self._modules.pop(name, None)
            object.__setattr__(self, name, value)

    def __getattr__(self, name):
        for store in ("_params", "_buffers", "_modules"):
            d = object.__getattribute__(self, store)
            if name in d:
                return d[name]
        raise AttributeError(
            "{} has no attribute {}".format(type(self).__name__, name)
        )

    def param(self, name, value):
        self._params[name] = jnp.asarray(value, dtype=jnp.float32) if value is not None else None
        return self._params[name]

    def buffer(self, name, value):
        self._buffers[name] = jnp.asarray(value) if value is not None else None
        return self._buffers[name]

    # ---- traversal --------------------------------------------------------
    def named_modules(self, prefix=""):
        yield prefix, self
        for name, m in self._modules.items():
            child_prefix = "{}.{}".format(prefix, name) if prefix else name
            yield from m.named_modules(child_prefix)

    def modules(self):
        for _, m in self.named_modules():
            yield m

    def state_dict(self):
        """Parameters + buffers of THIS module only (leaf state)."""
        out = {}
        for k, v in self._params.items():
            if v is not None:
                out[k] = v
        for k, v in self._buffers.items():
            if v is not None:
                out[k] = v
        return out

    def load_state_dict(self, sd):
        for k, v in sd.items():
            if k in self._params:
                self._params[k] = jnp.asarray(v)
            elif k in self._buffers:
                self._buffers[k] = jnp.asarray(v)

    def full_state_dict(self, prefix=""):
        out = {}
        for path, m in self.named_modules(prefix):
            for k, v in m.state_dict().items():
                out["{}.{}".format(path, k) if path else k] = v
        return out

    def load_full_state_dict(self, sd):
        for path, m in self.named_modules():
            local = {}
            for k in list(m._params) + list(m._buffers):
                full = "{}.{}".format(path, k) if path else k
                if full in sd:
                    local[k] = sd[full]
            m.load_state_dict(local)

    def train(self, mode=True):
        for m in self.modules():
            object.__setattr__(m, "training", mode)
        return self

    def eval(self):
        return self.train(False)

    # ---- dispatch ---------------------------------------------------------
    def is_leaf(self):
        return type(self).execute is not Module.execute

    def __call__(self, *args, **kwargs):
        from sparsebit_tpu.nn import graph as G

        if any(isinstance(a, G.SymbolicTensor) for a in args):
            tracer = G.current_tracer()
            if self.is_leaf() or (
                tracer is not None
                and self._path
                and tracer.is_skipped(self._path)
            ):
                return G.record_node(self, args, kwargs, name=self._path)
            return self.forward(*args, **kwargs)
        if self.is_leaf():
            return self.execute(*args, params=None, training=self.training, **kwargs)
        return self.forward(*args, **kwargs)

    def execute(self, *args, params=None, training=False, **kwargs):
        raise NotImplementedError

    def forward(self, *args, **kwargs):
        raise NotImplementedError(
            "{} defines neither execute nor forward".format(type(self).__name__)
        )

    def get(self, params, name):
        """Fetch a parameter, preferring the override pytree (jit path)."""
        if params is not None and name in params:
            return params[name]
        if name in self._params:
            return self._params[name]
        return self._buffers[name]

    def __repr__(self):
        return "{}()".format(type(self).__name__)


class Sequential(Module):
    def __init__(self, *mods):
        super().__init__()
        for i, m in enumerate(mods):
            setattr(self, str(i), m)

    def forward(self, x):
        for m in self._modules.values():
            x = m(x)
        return x

    def __iter__(self):
        return iter(self._modules.values())

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, idx):
        return list(self._modules.values())[idx]


class ModuleList(Module):
    def __init__(self, mods=()):
        super().__init__()
        for i, m in enumerate(mods):
            setattr(self, str(i), m)

    def append(self, m):
        setattr(self, str(len(self._modules)), m)

    def __iter__(self):
        return iter(self._modules.values())

    def __len__(self):
        return len(self._modules)

    def __getitem__(self, idx):
        return list(self._modules.values())[idx]


# ---- compute leaves ---------------------------------------------------------


class Conv2d(Module):
    """NHWC conv, HWIO weights. Reference op: nn.Conv2d -> QConv2d
    (sparsebit/quantization/modules/conv.py:8)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        dilation=1,
        groups=1,
        bias=True,
        *,
        key=None,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        key = key if key is not None else jax.random.PRNGKey(0)
        kh, kw = self.kernel_size
        fan_in = in_channels // groups * kh * kw
        k1, k2 = jax.random.split(key)
        self.param(
            "weight",
            _kaiming_uniform(k1, (kh, kw, in_channels // groups, out_channels), fan_in),
        )
        self.param("bias", _kaiming_uniform(k2, (out_channels,), fan_in) if bias else None)

    def _conv(self, x, w, b):
        ph, pw = self.padding
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if b is not None:
            out = out + b
        return out

    def execute(self, x, params=None, training=False):
        return self._conv(x, self.get(params, "weight"), self.get(params, "bias") if self._params.get("bias") is not None else None)


class ConvTranspose2d(Module):
    """Reference op: nn.ConvTranspose2d -> QConvTranspose2d (conv.py:45)."""

    def __init__(
        self,
        in_channels,
        out_channels,
        kernel_size,
        stride=1,
        padding=0,
        output_padding=0,
        groups=1,
        bias=True,
        dilation=1,
        *,
        key=None,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        key = key if key is not None else jax.random.PRNGKey(0)
        kh, kw = self.kernel_size
        fan_in = out_channels // groups * kh * kw
        k1, k2 = jax.random.split(key)
        # stored HWOI-style: (kh, kw, in, out//groups) transposed use
        self.param(
            "weight",
            _kaiming_uniform(k1, (kh, kw, out_channels // groups, in_channels), fan_in),
        )
        self.param("bias", _kaiming_uniform(k2, (out_channels,), fan_in) if bias else None)

    def execute(self, x, params=None, training=False):
        w = self.get(params, "weight")  # (kh, kw, oc//g, ic)
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        oph, opw = self.output_padding
        # gradient-style transposed conv via lhs dilation
        pad_h = (kh - 1) * self.dilation[0] - ph
        pad_w = (kw - 1) * self.dilation[1] - pw
        w_flip = jnp.flip(w, axis=(0, 1))
        out = jax.lax.conv_general_dilated(
            x,
            jnp.swapaxes(w_flip, 2, 3),  # (kh, kw, ic, oc//g) per group
            window_strides=(1, 1),
            padding=((pad_h, pad_h + oph), (pad_w, pad_w + opw)),
            lhs_dilation=(sh, sw),
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = self.get(params, "bias") if self._params.get("bias") is not None else None
        if b is not None:
            out = out + b
        return out


class Linear(Module):
    """Weights (in, out); forward x @ w + b. Reference: nn.Linear -> QLinear
    (sparsebit/quantization/modules/linear.py:8)."""

    def __init__(self, in_features, out_features, bias=True, *, key=None):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.param("weight", _kaiming_uniform(k1, (in_features, out_features), in_features))
        self.param("bias", _kaiming_uniform(k2, (out_features,), in_features) if bias else None)

    def execute(self, x, params=None, training=False):
        w = self.get(params, "weight")
        out = jnp.matmul(x, w)
        b = self.get(params, "bias") if self._params.get("bias") is not None else None
        if b is not None:
            out = out + b
        return out


class Embedding(Module):
    """Reference: nn.Embedding -> QEmbedding (modules/embedding.py:8)."""

    def __init__(self, num_embeddings, embedding_dim, *, key=None):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        key = key if key is not None else jax.random.PRNGKey(0)
        self.param(
            "weight", jax.random.normal(key, (num_embeddings, embedding_dim)) * 0.02
        )

    def execute(self, x, params=None, training=False):
        return jnp.take(self.get(params, "weight"), x, axis=0)


class BatchNorm2d(Module):
    """NHWC batchnorm. Reference: nn.BatchNorm2d -> QBatchNorm2d
    (modules/normalization.py:8); fusable into preceding conv."""

    CH_AXIS = -1

    def __init__(self, num_features, eps=1e-5, momentum=0.1):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.param("weight", jnp.ones(num_features))
        self.param("bias", jnp.zeros(num_features))
        self.buffer("running_mean", jnp.zeros(num_features))
        self.buffer("running_var", jnp.ones(num_features))

    def _stats_axes(self, x):
        return tuple(i for i in range(x.ndim) if i != (x.ndim + self.CH_AXIS) % x.ndim)

    def execute(self, x, params=None, training=False):
        gamma = self.get(params, "weight")
        beta = self.get(params, "bias")
        if training:
            axes = self._stats_axes(x)
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            # eager-only running-stat update (used by batchnorm_tuning);
            # under a jit trace the update is skipped — persisting a tracer
            # into module state would leak it out of the transformation
            if not isinstance(mean, jax.core.Tracer):
                m = self.momentum
                self._buffers["running_mean"] = (
                    (1 - m) * self._buffers["running_mean"] + m * mean
                )
                self._buffers["running_var"] = (
                    (1 - m) * self._buffers["running_var"] + m * var
                )
        else:
            mean = self.get(params, "running_mean")
            var = self.get(params, "running_var")
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * gamma + beta


class BatchNorm1d(BatchNorm2d):
    """Reference: nn.BatchNorm1d -> QBatchNorm1d (normalization.py)."""


class LayerNorm(Module):
    """Reference: nn.LayerNorm -> QLayerNorm (normalization.py; input-quantized)."""

    def __init__(self, normalized_shape, eps=1e-5, elementwise_affine=True):
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.elementwise_affine = elementwise_affine
        if elementwise_affine:
            self.param("weight", jnp.ones(self.normalized_shape))
            self.param("bias", jnp.zeros(self.normalized_shape))

    def execute(self, x, params=None, training=False):
        axes = tuple(range(x.ndim - len(self.normalized_shape), x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            out = out * self.get(params, "weight") + self.get(params, "bias")
        return out


class RMSNorm(Module):
    """LLaMA-style RMSNorm (TPU extension; used by the LLM pipeline)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.param("weight", jnp.ones(dim))

    def execute(self, x, params=None, training=False):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        out = x * jax.lax.rsqrt(var + self.eps)
        return (out * self.get(params, "weight")).astype(x.dtype)


# ---- activations ------------------------------------------------------------


class _Activation(Module):
    def execute(self, x, params=None, training=False):
        return self.fn(x)


class ReLU(_Activation):
    fn = staticmethod(jax.nn.relu)


class ReLU6(_Activation):
    fn = staticmethod(lambda x: jnp.clip(x, 0.0, 6.0))


class LeakyReLU(Module):
    def __init__(self, negative_slope=0.01):
        super().__init__()
        self.negative_slope = negative_slope

    def execute(self, x, params=None, training=False):
        return jax.nn.leaky_relu(x, self.negative_slope)


class Sigmoid(_Activation):
    fn = staticmethod(jax.nn.sigmoid)


class SiLU(_Activation):
    fn = staticmethod(jax.nn.silu)


class GELU(_Activation):
    fn = staticmethod(jax.nn.gelu)


class Mish(_Activation):
    fn = staticmethod(lambda x: x * jnp.tanh(jax.nn.softplus(x)))


class Hardsigmoid(_Activation):
    fn = staticmethod(jax.nn.hard_sigmoid)


class Tanh(_Activation):
    fn = staticmethod(jnp.tanh)


class Softmax(Module):
    def __init__(self, dim=-1):
        super().__init__()
        self.dim = dim

    def execute(self, x, params=None, training=False):
        return jax.nn.softmax(x, axis=self.dim)


# ---- pooling ----------------------------------------------------------------


class MaxPool2d(Module):
    """NHWC max-pool. Reference: nn.MaxPool2d (pool.py; not quantized)."""

    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride if stride is not None else kernel_size)
        self.padding = _pair(padding)

    def execute(self, x, params=None, training=False):
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
        )


class AvgPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        super().__init__()
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride if stride is not None else kernel_size)
        self.padding = _pair(padding)

    def execute(self, x, params=None, training=False):
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        summed = jax.lax.reduce_window(
            x,
            0.0,
            jax.lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
        )
        return summed / (kh * kw)


class AdaptiveAvgPool2d(Module):
    def __init__(self, output_size):
        super().__init__()
        self.output_size = _pair(output_size)

    def execute(self, x, params=None, training=False):
        oh, ow = self.output_size
        n, h, w, c = x.shape
        assert h % oh == 0 and w % ow == 0, (
            "AdaptiveAvgPool2d requires divisible sizes, got {}x{} -> {}x{}".format(
                h, w, oh, ow
            )
        )
        kh, kw = h // oh, w // ow
        return jnp.mean(
            x.reshape(n, oh, kh, ow, kw, c), axis=(2, 4)
        )


# ---- misc leaves ------------------------------------------------------------


class Identity(Module):
    def execute(self, x, params=None, training=False):
        return x


class Dropout(Module):
    """Identity at inference; at training uses a key from params['rng_key']
    when provided (functional training loops thread it explicitly)."""

    def __init__(self, p=0.5):
        super().__init__()
        self.p = p

    def execute(self, x, params=None, training=False):
        if not training or self.p == 0.0:
            return x
        if params is not None and "rng_key" in params:
            keep = 1.0 - self.p
            mask = jax.random.bernoulli(params["rng_key"], keep, x.shape)
            return jnp.where(mask, x / keep, 0.0)
        return x


class Flatten(Module):
    def __init__(self, start_dim=1, end_dim=-1):
        super().__init__()
        self.start_dim = start_dim
        self.end_dim = end_dim

    def execute(self, x, params=None, training=False):
        start = self.start_dim % x.ndim
        end = self.end_dim % x.ndim
        shape = x.shape[:start] + (-1,) + x.shape[end + 1 :]
        return x.reshape(shape)


class Upsample(Module):
    """Reference: nn.Upsample -> QUpsample (resize.py)."""

    def __init__(self, scale_factor=2, mode="nearest"):
        super().__init__()
        self.scale_factor = _pair(scale_factor)
        self.mode = mode

    def execute(self, x, params=None, training=False):
        n, h, w, c = x.shape
        sh, sw = self.scale_factor
        new_shape = (n, int(h * sh), int(w * sw), c)
        method = {"nearest": "nearest", "bilinear": "bilinear"}[self.mode]
        return jax.image.resize(x, new_shape, method=method)


def _pair(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)
