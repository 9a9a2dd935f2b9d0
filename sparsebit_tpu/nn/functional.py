"""Functional op-modules + SymbolicTensor operator overloads.

Every functional operation (x + y, matmul, reshape, ...) is recorded in the
graph as a node whose op is one of these parameter-free Module classes, so
QuantModel's convert-to-quant-module pass is uniform over layers and
functional calls (reference: modules/math.py, shape.py, unary.py,
matmul.py — operator.add/torch.matmul etc. map through QMODULE_MAP).
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.nn.graph import SymbolicTensor, record_node
from sparsebit_tpu.nn.modules import Module


class Add(Module):
    def execute(self, x, y, params=None, training=False):
        return x + y


class Subtract(Module):
    def execute(self, x, y, params=None, training=False):
        return x - y


class Mul(Module):
    def execute(self, x, y, params=None, training=False):
        return x * y


class Divide(Module):
    def execute(self, x, y, params=None, training=False):
        return x / y


class FloorDiv(Module):
    def execute(self, x, y, params=None, training=False):
        return x // y


class Pow(Module):
    def execute(self, x, y, params=None, training=False):
        return x**y


class Negative(Module):
    def execute(self, x, params=None, training=False):
        return -x


class MatMul(Module):
    def execute(self, x, y, params=None, training=False):
        return jnp.matmul(x, y)


class Mean(Module):
    def execute(self, x, params=None, training=False, axis=None, keepdims=False):
        return jnp.mean(x, axis=axis, keepdims=keepdims)


class Reshape(Module):
    def execute(self, x, params=None, training=False, shape=None):
        return x.reshape(shape)


class Transpose(Module):
    def execute(self, x, params=None, training=False, dim0=0, dim1=1):
        return jnp.swapaxes(x, dim0, dim1)


class Permute(Module):
    def execute(self, x, params=None, training=False, dims=None):
        return jnp.transpose(x, dims)


class Concat(Module):
    def execute(self, *xs, params=None, training=False, axis=0):
        return jnp.concatenate(xs, axis=axis)


class Split(Module):
    def execute(self, x, params=None, training=False, size=None, axis=0):
        n = x.shape[axis]
        if isinstance(size, int):
            sections = [size * i for i in range(1, -(-n // size))]
        else:
            sections = list(jnp.cumsum(jnp.array(size[:-1])))
        return tuple(jnp.split(x, sections, axis=axis))


class Expand(Module):
    def execute(self, x, params=None, training=False, shape=None):
        target = [
            x.shape[i] if s == -1 else s for i, s in enumerate(shape)
        ]
        return jnp.broadcast_to(x, target)


class GetItem(Module):
    def execute(self, x, params=None, training=False, idx=None):
        return x[idx]


class Where(Module):
    def execute(self, cond, x, y, params=None, training=False):
        return jnp.where(cond, x, y)


class Detach(Module):
    def execute(self, x, params=None, training=False):
        return jax.lax.stop_gradient(x)


class Cast(Module):
    def execute(self, x, params=None, training=False, dtype=None):
        return x.astype(dtype)


class StochasticDepth(Module):
    """torchvision.ops.StochasticDepth analogue (modules/torchvision_ops.py)."""

    def __init__(self, p=0.0, mode="row"):
        super().__init__()
        self.p = p
        self.mode = mode

    def execute(self, x, params=None, training=False):
        if not training or self.p == 0.0:
            return x
        if params is not None and "rng_key" in params:
            keep = 1.0 - self.p
            shape = (x.shape[0],) + (1,) * (x.ndim - 1) if self.mode == "row" else ()
            mask = jax.random.bernoulli(params["rng_key"], keep, shape)
            return jnp.where(mask, x / keep, 0.0)
        return x


class Interpolate(Module):
    """F.interpolate analogue (reference: modules/resize.py QInterpolate)."""

    def execute(
        self,
        x,
        params=None,
        training=False,
        size=None,
        scale_factor=None,
        mode="nearest",
    ):
        n, h, w, c = x.shape
        if size is not None:
            oh, ow = size if isinstance(size, (tuple, list)) else (size, size)
        else:
            sf = scale_factor if isinstance(scale_factor, (tuple, list)) else (
                scale_factor,
                scale_factor,
            )
            oh, ow = int(h * sf[0]), int(w * sf[1])
        return jax.image.resize(x, (n, oh, ow, c), method=mode)


# ---- tracing helpers --------------------------------------------------------


def _maybe_record(op, args, kwargs=None):
    if any(isinstance(a, SymbolicTensor) for a in args):
        return record_node(op, args, kwargs)
    return op.execute(*args, **(kwargs or {}))


def add(x, y):
    return _maybe_record(Add(), (x, y))


def subtract(x, y):
    return _maybe_record(Subtract(), (x, y))


def mul(x, y):
    return _maybe_record(Mul(), (x, y))


def divide(x, y):
    return _maybe_record(Divide(), (x, y))


def matmul(x, y):
    return _maybe_record(MatMul(), (x, y))


def concat(xs, axis=0):
    return _maybe_record(Concat(), tuple(xs), {"axis": axis})


def where(cond, x, y):
    return _maybe_record(Where(), (cond, x, y))


def split(x, size, axis=0):
    return _maybe_record(Split(), (x,), {"size": size, "axis": axis})


def mean(x, axis=None, keepdims=False):
    return _maybe_record(Mean(), (x,), {"axis": axis, "keepdims": keepdims})


def interpolate(x, size=None, scale_factor=None, mode="nearest"):
    return _maybe_record(
        Interpolate(), (x,), {"size": size, "scale_factor": scale_factor, "mode": mode}
    )


def softmax(x, axis=-1):
    from sparsebit_tpu.nn.modules import Softmax

    return _maybe_record(Softmax(dim=axis), (x,))


def relu(x):
    from sparsebit_tpu.nn.modules import ReLU

    return _maybe_record(ReLU(), (x,))


def gelu(x):
    from sparsebit_tpu.nn.modules import GELU

    return _maybe_record(GELU(), (x,))


def detach(x):
    return _maybe_record(Detach(), (x,))


# dual-mode shape helpers: work on SymbolicTensors during trace AND on raw
# jnp arrays in eager float execution (model zoo uses these, not methods)
def reshape(x, shape):
    return _maybe_record(Reshape(), (x,), {"shape": tuple(shape)})


def transpose(x, dim0, dim1):
    return _maybe_record(Transpose(), (x,), {"dim0": dim0, "dim1": dim1})


def permute(x, dims):
    return _maybe_record(Permute(), (x,), {"dims": tuple(dims)})


def expand(x, shape):
    return _maybe_record(Expand(), (x,), {"shape": tuple(shape)})


def getitem(x, idx):
    return _maybe_record(GetItem(), (x,), {"idx": idx})


def cast(x, dtype):
    return _maybe_record(Cast(), (x,), {"dtype": dtype})


# ---- operator overloads on SymbolicTensor -----------------------------------


def _install_overloads():
    st = SymbolicTensor
    st.__add__ = lambda self, o: add(self, o)
    st.__radd__ = lambda self, o: add(o, self)
    st.__sub__ = lambda self, o: subtract(self, o)
    st.__rsub__ = lambda self, o: subtract(o, self)
    st.__mul__ = lambda self, o: mul(self, o)
    st.__rmul__ = lambda self, o: mul(o, self)
    st.__truediv__ = lambda self, o: divide(self, o)
    st.__rtruediv__ = lambda self, o: divide(o, self)
    st.__floordiv__ = lambda self, o: _maybe_record(FloorDiv(), (self, o))
    st.__pow__ = lambda self, o: _maybe_record(Pow(), (self, o))
    st.__neg__ = lambda self: _maybe_record(Negative(), (self,))
    st.__matmul__ = lambda self, o: matmul(self, o)
    st.__getitem__ = lambda self, idx: (
        record_node(GetItem(), (self,), {"idx": idx})
        if self.index is None or True
        else None
    )
    st.reshape = lambda self, *shape: record_node(
        Reshape(),
        (self,),
        {"shape": shape[0] if len(shape) == 1 and isinstance(shape[0], (tuple, list)) else shape},
    )
    st.transpose = lambda self, d0, d1: record_node(
        Transpose(), (self,), {"dim0": d0, "dim1": d1}
    )
    st.permute = lambda self, *dims: record_node(
        Permute(),
        (self,),
        {"dims": dims[0] if len(dims) == 1 and isinstance(dims[0], (tuple, list)) else dims},
    )
    st.flatten = lambda self, start_dim=0, end_dim=-1: record_node(
        Reshape(),
        (self,),
        {
            "shape": self.shape[: start_dim % self.ndim]
            + (-1,)
            + self.shape[end_dim % self.ndim + 1 :]
        },
    )
    st.mean = lambda self, axis=None, keepdims=False: mean(self, axis, keepdims)
    st.split = lambda self, size, axis=0: split(self, size, axis)
    st.expand = lambda self, *shape: record_node(
        Expand(),
        (self,),
        {"shape": shape[0] if len(shape) == 1 and isinstance(shape[0], (tuple, list)) else shape},
    )
    st.astype = lambda self, dtype: cast(self, dtype)


_install_overloads()
