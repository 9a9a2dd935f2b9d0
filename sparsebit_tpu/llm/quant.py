"""LLM weight quantizer + packed linear containers.

Reference: large_language_models/llama/quantization/utils/quant.py —
``Quantizer.configure/find_params`` (:24-133, minmax + optional MSE shrink
grid, per-channel/group, asymmetric with integer zero) and ``QuantLinear``
(:147-419, packed storage + CUDA matvec dispatch). Here the packed storage
is the TPU column-plane layout (ops/packing.py) and the matmul is the
Pallas groupwise dequant kernel (ops/quant_matmul.py).

Weight convention: (in_features K, out_features N), matching the rest of
the framework (x @ w). Quantization granularity is along K (per-out-channel
= one group of size K; groupsize g = K//g groups), so scales/zeros are
(G, N).
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.ops.packing import pack_columns
from sparsebit_tpu.ops.quant_matmul import dequant_weights, quant_matmul


class LLMQuantizer:
    """find_params over a (K, N) weight (or a (n, N) slice during GPTQ)."""

    def __init__(self, bits=4, sym=False, mse=False, groupsize=-1,
                 maxshrink=0.8, grid=100, norm=2.4):
        self.bits = bits
        self.sym = sym
        self.mse = mse
        self.groupsize = groupsize
        self.maxshrink = maxshrink
        self.grid = grid
        self.norm = norm
        self.qmax = 2**bits - 1

    def find_params(self, w):
        """w: (n, N) rows to share qparams column-wise -> scale/zero (1, N)
        when called per group, or (G, N) when given the reshaped stack."""
        wmin = jnp.minimum(jnp.min(w, axis=0, keepdims=True), 0.0)
        wmax = jnp.maximum(jnp.max(w, axis=0, keepdims=True), 0.0)
        if self.sym:
            wmax = jnp.maximum(jnp.abs(wmin), wmax)
            wmin = -wmax
        degenerate = (wmin == 0) & (wmax == 0)
        wmin = jnp.where(degenerate, -1.0, wmin)
        wmax = jnp.where(degenerate, 1.0, wmax)

        if self.mse:
            scale, zero = self._mse_search(w, wmin, wmax)
        else:
            scale, zero = self._params_from_range(wmin, wmax)
        return scale, zero

    def _params_from_range(self, wmin, wmax):
        scale = (wmax - wmin) / self.qmax
        if self.sym:
            zero = jnp.full_like(scale, (self.qmax + 1) / 2.0)
        else:
            zero = jnp.round(-wmin / scale)
        return scale, zero

    def _mse_search(self, w, wmin, wmax):
        """Shrink-grid search p = 1 - i/grid (reference quant.py:84-110),
        vectorised over the grid on device."""
        def loss_for(p):
            s, z = self._params_from_range(wmin * p, wmax * p)
            q = jnp.clip(jnp.round(w / s) + z, 0, self.qmax)
            deq = (q - z) * s
            return jnp.sum(jnp.abs(deq - w) ** self.norm, axis=0)  # (N,)

        ps = 1.0 - jnp.arange(int(self.grid * self.maxshrink)) / self.grid
        losses = jax.vmap(loss_for)(ps)  # (grid, N)
        best = jnp.argmin(losses, axis=0)  # (N,)
        p_best = ps[best][None, :]  # (1, N)
        return self._params_from_range(wmin * p_best, wmax * p_best)

    def quantize(self, w, scale, zero):
        """Round to codes and dequantize (fake-quant in f32)."""
        q = jnp.clip(jnp.round(w / scale) + zero, 0, self.qmax)
        return (q - zero) * scale

    def codes(self, w, scale, zero):
        return jnp.clip(jnp.round(w / scale) + zero, 0, self.qmax).astype(jnp.uint8)


@jax.tree_util.register_pytree_node_class
class DenseLinear:
    """Plain dense linear, pytree-compatible sibling of QuantLinear."""

    def __init__(self, w, bias=None):
        self.w = w
        self.bias = bias

    @property
    def in_features(self):
        return self.w.shape[0]

    @property
    def out_features(self):
        return self.w.shape[1]

    def __call__(self, x):
        from sparsebit_tpu.ops import matvec as _mv

        if _mv.use_matvec(x, self.w, self.bias):
            # decode-shape lm_head: Pallas tile streamer runs the 7B head
            # at ~94% of the HBM roofline vs ~87% for the XLA dot (exp14)
            return _mv.matvec(x, self.w)
        out = jnp.dot(x, self.w.astype(x.dtype))
        if self.bias is not None:
            out = out + self.bias
        return out

    def tree_flatten(self):
        return (self.w, self.bias), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class QuantLinear:
    """Packed low-bit linear (reference QuantLinear, quant.py:147-419).

    Weights are packed uint8 column planes; scales/zeros (G, N) f32.
    bits/groupsize/out_features are static (pytree aux data) so jit traces
    specialise per configuration, not per value.
    """

    def __init__(self, packed, scales, zeros, bits, groupsize, out_features,
                 bias=None, impl="auto", perm=None, bwd_wq=None,
                 bwd_scale=None):
        self.packed = packed
        self.scales = scales
        self.zeros = zeros
        self.bits = bits
        self.groupsize = groupsize
        self.out_features = out_features
        self.bias = bias
        self.impl = impl
        self.perm = perm  # act-order input permutation (K,), or None
        # int8 backward operands (prepare_backward); None until training
        self.bwd_wq = bwd_wq
        self.bwd_scale = bwd_scale

    @classmethod
    def from_dense(cls, w, bits=4, groupsize=-1, sym=False, mse=False, bias=None,
                   impl="auto"):
        """Quantize + pack a dense (K, N) weight (RTN baseline; GPTQ produces
        codes itself and calls ``from_codes``)."""
        K, N = w.shape
        gs = groupsize if groupsize > 0 else K
        quantizer = LLMQuantizer(bits=bits, sym=sym, mse=mse)
        wg = w.reshape(K // gs, gs, N)
        scales, zeros = jax.vmap(quantizer.find_params)(wg)  # (G,1,N) each
        scales = scales.reshape(K // gs, N)
        zeros = zeros.reshape(K // gs, N)
        codes = quantizer.codes(
            w, jnp.repeat(scales, gs, axis=0), jnp.repeat(zeros, gs, axis=0)
        )
        return cls.from_codes(codes, scales, zeros, bits, groupsize, bias, impl)

    @classmethod
    def from_codes(cls, codes, scales, zeros, bits, groupsize, bias=None,
                   impl="auto", perm=None):
        from sparsebit_tpu.ops.packing import pallas_n_pad

        K, N = codes.shape
        # pad N to the kernel's 128-lane packed-width multiple; the pad
        # columns dequantize to exactly 0 (code 0, zero 0, scale 1) and are
        # sliced off in __call__/dequantize. out_features stays logical.
        pad = pallas_n_pad(N, bits)
        if pad:
            codes = jnp.pad(codes, ((0, 0), (0, pad)))
            scales = jnp.pad(scales, ((0, 0), (0, pad)), constant_values=1.0)
            zeros = jnp.pad(zeros, ((0, 0), (0, pad)))
        packed = pack_columns(codes, bits)
        return cls(packed, scales, zeros, bits, groupsize, N, bias, impl, perm)

    @property
    def in_features(self):
        if "u4" in self.packed:
            return self.packed["u4"].shape[0]
        if "u4r" in self.packed:
            return self.packed["u4r"].shape[0] * 2
        if "s4r" in self.packed:
            return self.packed["s4r"].shape[0] * 2
        first = next(iter(self.packed.values()))
        return first.shape[0]

    def with_u4(self):
        """Return a copy whose packed dict carries a native uint4 codes
        array: the serving-path layout (u4 tiles feed the int8 MXU with no
        shift/mask unpack — ops/quant_matmul.py u4 kernel). MUST be called
        inside jit (uint4 cannot cross the jit boundary on this runtime);
        hoist it out of the token scan so the one unpack pass amortises
        over the dispatch."""
        from sparsebit_tpu.ops.quant_matmul import codes_to_u4

        from sparsebit_tpu.ops.packing import u4_from_pairs

        if (self.bits == 8 or "u4" in self.packed or "u4r" in self.packed
                or "s4r" in self.packed):
            # u4r/s4r need no in-jit view at all: the kernels bitcast u8
            # row-pair tiles to u4/s4 internally for free
            return self
        packed = dict(self.packed)
        if "u4p" in packed:
            # nibble-pair layout (with_u4_pairs): conversion is a free
            # bitcast, not a whole-weight shift/mask unpack
            packed["u4"] = u4_from_pairs(packed.pop("u4p"))
        else:
            packed["u4"] = codes_to_u4(self.packed, self.bits, self.n_padded)
        return QuantLinear(
            packed, self.scales, self.zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            self.bwd_wq, self.bwd_scale,
        )

    def with_u4_pairs(self, drop_fold=False):
        """Return a copy carrying the uint8 NIBBLE-PAIR codes array
        (ops/packing.pack_u4_pairs): the host-side serving preparation.
        Unlike uint4, uint8 crosses the jit boundary, and with_u4 turns
        this layout into the kernel's u4 array with a free bitcast instead
        of re-unpacking the fold layout every dispatch. Works on
        layer-stacked leaves too (leading axes pass through).
        drop_fold=True removes the canonical fold container from the copy
        (halves serving HBM; 4-bit unpack_columns can still reconstruct
        codes from the pairs, so dequantize keeps working)."""
        from sparsebit_tpu.ops.packing import pack_u4_pairs, unpack_columns

        if (self.bits == 8 or "u4p" in self.packed or "u4" in self.packed
                or "s4r" in self.packed):
            return self
        codes = unpack_columns(self.packed, self.bits, self.n_padded)
        packed = {} if (drop_fold and self.bits == 4) else dict(self.packed)
        packed["u4p"] = pack_u4_pairs(codes)
        return QuantLinear(
            packed, self.scales, self.zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            self.bwd_wq, self.bwd_scale,
        )

    def with_u4_rows(self, drop_fold=False):
        """Return a copy carrying the uint8 ROW-PAIR codes array
        (ops/packing.pack_u4_rows): THE u4 serving layout. The kernels
        bitcast u8 tiles to u4 in-register for free, so — unlike with_u4
        (in-jit uint4 view) or with_u4_pairs (in-jit bitcast that XLA
        re-materialises and re-copies INSIDE the token while-loop,
        measured ~58 ms/tok at 7B) — the weights cross the jit boundary
        as plain uint8 and stay true loop invariants of the decode scan.
        Host-side (one-time repack at load). Works on layer-stacked
        leaves. drop_fold=True removes the canonical fold container
        (halves serving HBM; 4-bit only — unpack_columns reconstructs
        codes from the row-pairs, so dequantize keeps working)."""
        from sparsebit_tpu.ops.packing import pack_u4_rows, unpack_columns

        if (
            self.bits == 8
            or "u4r" in self.packed
            or "s4r" in self.packed
            or "u4" in self.packed
            or "u4p" in self.packed
        ):
            return self
        codes = unpack_columns(self.packed, self.bits, self.n_padded)
        packed = {} if (drop_fold and self.bits == 4) else dict(self.packed)
        packed["u4r"] = pack_u4_rows(codes)
        return QuantLinear(
            packed, self.scales, self.zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            self.bwd_wq, self.bwd_scale,
        )

    def with_s4_rows(self, drop_fold=False):
        """Return a copy carrying the uint8 SIGNED row-pair codes array
        (ops/packing.pack_s4_rows): the preferred 4-bit serving layout.
        Same free in-register bitcast as with_u4_rows, but the kernels
        read int4 nibbles — the int4 -> int8 widening cast measured
        ~1.4 us/call cheaper than uint4 -> int8 on the 7B wqkv tile
        (experiments/exp13_s4dot.py). Stored codes are (code - 8); the
        kernels compensate with (zero - 8) in the zero-point correction,
        so scales/zeros keep the unsigned-code convention and every
        fallback path (dequantize, deploy, export) is untouched.
        4-bit only; host-side; layer-stacked leaves pass through."""
        from sparsebit_tpu.ops.packing import pack_s4_rows, unpack_columns

        if self.bits != 4 or "s4r" in self.packed:
            return self
        codes = unpack_columns(self.packed, self.bits, self.n_padded)
        # supersedes the unsigned serving containers; keep the canonical
        # fold unless drop_fold (s4r alone can reconstruct codes)
        packed = {} if drop_fold else {
            k: v for k, v in self.packed.items()
            if k not in ("u4r", "u4p", "u4")
        }
        packed["s4r"] = pack_s4_rows(codes)
        return QuantLinear(
            packed, self.scales, self.zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            self.bwd_wq, self.bwd_scale,
        )

    def with_nibble_serving(self):
        """Repack a 2/3-bit linear into the 4-bit SIGNED row-pair serving
        container (mixed-precision megakernel serving, VERDICT r2 #2):
        sub-4-bit codes are < 16, so they ride s4 nibbles unchanged —
        dequantization is bit-free ((code - zero) * scale), and the
        returned copy is re-TAGGED bits=4 so layer stacking
        (decode.stack_layers) and the megakernel gate treat an int4/3/2
        GPTQ checkpoint as one homogeneous stack. Column padding is
        rebuilt to the 4-bit kernel multiple (the 3-bit two-plane layout
        pads to 1024 lanes, 4-bit to 256 — shapes must match across a
        mixed stack). The container streams at 4 bits/weight; the
        two-plane 3-bit kernel path (quant_matmul) remains for true
        3-bit-stream per-matmul decode. No-op semantics: dequantize()
        returns bit-identical values. The canonical fold container is
        dropped at every bit (a mixed stack must be container-homogeneous
        to layer-stack; s4r alone reconstructs codes)."""
        from sparsebit_tpu.ops.packing import (
            pack_s4_rows, pallas_n_pad, unpack_columns)

        if self.bits == 4:
            return self.with_s4_rows(drop_fold=True)
        assert self.bits in (2, 3), "nibble serving covers bits <= 4"
        codes = unpack_columns(self.packed, self.bits, self.n_padded)
        codes = codes[:, : self.out_features]
        scales = self.scales[:, : self.out_features]
        zeros = self.zeros[:, : self.out_features]
        pad = pallas_n_pad(self.out_features, 4)
        if pad:
            codes = jnp.pad(codes, ((0, 0), (0, pad)))
            scales = jnp.pad(scales, ((0, 0), (0, pad)),
                             constant_values=1.0)
            zeros = jnp.pad(zeros, ((0, 0), (0, pad)))
        return QuantLinear(
            {"s4r": pack_s4_rows(codes)}, scales, zeros, 4, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            self.bwd_wq, self.bwd_scale,
        )

    def with_plane_serving(self, drop_fold=True):
        """Return a copy carrying the TRUE-width plane-concat serving
        array ("pl", ops/packing.pack_planes_serving) for 3/2-bit
        weights: the megakernel streams the real 3 (2) bits/weight —
        int3-g128 7B ≈ 2.9 GB/token vs the nibble container's 3.7
        (round-4 VERDICT #3; reference cuda_kernel_3bit.cu). The unpack
        is in-kernel shift/mask (VPU) instead of the nibble container's
        free bitcast — bytes/token vs unpack cost is measured in
        docs/perf_notes.md; serving picks per deployment via
        prepare_params_host(sub4="planes"|"nibble")."""
        from sparsebit_tpu.ops.packing import (
            pack_planes_serving, unpack_columns)

        if self.bits not in (2, 3) or "pl" in self.packed:
            return self
        codes = unpack_columns(self.packed, self.bits, self.n_padded)
        packed = {} if drop_fold else dict(self.packed)
        packed["pl"] = pack_planes_serving(codes, self.bits)
        if self.bits == 2:
            # the 2-bit plane array IS the fold container — alias it so
            # every per-matmul dispatcher keeps its fast path (no copy)
            packed.setdefault("w", packed["pl"])
        return QuantLinear(
            packed, self.scales, self.zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            self.bwd_wq, self.bwd_scale,
        )

    def with_sz_dtype(self, dtype=jnp.bfloat16):
        """Return a copy whose scales/zeros are stored in ``dtype``
        (serving layout: bf16 halves the qparam stream — at 7B INT4-g128
        scales+zeros are 12.5% of the decode weight traffic). Zeros are
        integer codes (< 2^bits), exactly representable in bf16; scale
        rounding error is <= 2^-9 relative, ~16x below the int4
        quantization step itself. Every kernel streams bf16 qparams
        natively (16-sublane windows, quant_matmul._sz_layout) and upcasts
        the selected rows to f32, so fused/unfused/dense paths stay
        EXACTLY consistent with each other. The reference stores fp16
        scales (utils/quant.py QuantLinear), so this is parity-fair."""
        if self.scales.dtype == dtype and self.zeros.dtype == dtype:
            return self
        return QuantLinear(
            self.packed, self.scales.astype(dtype), self.zeros.astype(dtype),
            self.bits, self.groupsize, self.out_features, self.bias,
            self.impl, self.perm, self.bwd_wq, self.bwd_scale,
        )

    @property
    def n_padded(self):
        """Packed (possibly padded) output width; >= out_features.
        (shape[-1] so layer-stacked leaves — stack_layers — also work.)"""
        return self.scales.shape[-1]

    @property
    def k_padded(self):
        """Packed (possibly padded) input width; >= the logical in_features
        (with_k_pad). Derived from the scale groups so stacked leaves work."""
        if self.groupsize > 0:
            return self.scales.shape[-2] * self.groupsize
        return self.in_features

    def _pad_x(self, x):
        """Zero-pad x's channel dim up to the packed K (with_k_pad rows
        contribute exactly 0: codes 0 / zeros 0 / scales 1, and an
        all-pad group's xsum is 0 in the A8 epilogue)."""
        Kw = self.k_padded
        if x.shape[-1] < Kw:
            x = jnp.pad(
                x, [(0, 0)] * (x.ndim - 1) + [(0, Kw - x.shape[-1])]
            )
        return x

    def with_k_pad(self, mult):
        """Return a copy whose packed codes are K-padded (input-channel
        rows) to a multiple of ``mult`` with exact-zero rows (code 0,
        zero 0, scale 1). Bigger K means bigger decode-kernel K tiles when
        K has awkward factors — 7B's w2 K=11008 = 86x128 caps K_BLK at 256
        (43 k-steps/launch); padded to 11264 = 11x1024 it runs 11.
        Host-side (repacks the container); groupwise, unpermuted only.
        __call__/call_stacked zero-pad x to match, so every consumer stays
        correct."""
        from sparsebit_tpu.ops.packing import (
            pack_columns, pack_u4_pairs, pack_u4_rows, unpack_columns)

        assert self.perm is None, "with_k_pad: act-order perm indexes K"
        assert self.groupsize > 0 and self.bits != 8
        K = self.k_padded
        pad = (-K) % mult
        if pad == 0:
            return self
        assert pad % self.groupsize == 0, (
            "with_k_pad: pad {} must be whole groups (gs={})".format(
                pad, self.groupsize)
        )
        codes = unpack_columns(self.packed, self.bits, self.n_padded)
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        gpad = pad // self.groupsize
        scales = jnp.pad(self.scales, ((0, gpad), (0, 0)),
                         constant_values=1.0)
        zeros = jnp.pad(self.zeros, ((0, gpad), (0, 0)))
        if "s4r" in self.packed and self.bits == 4:
            from sparsebit_tpu.ops.packing import pack_s4_rows

            packed = {"s4r": pack_s4_rows(codes)}
        elif "u4r" in self.packed and self.bits == 4:
            packed = {"u4r": pack_u4_rows(codes)}
        elif "u4p" in self.packed and self.bits == 4:
            packed = {"u4p": pack_u4_pairs(codes)}
        else:
            packed = pack_columns(codes, self.bits)
        return QuantLinear(
            packed, scales, zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, None,
            self.bwd_wq, self.bwd_scale,
        )

    def dequantize(self):
        W = dequant_weights(
            self.packed, self.scales, self.zeros, self.bits,
            self.n_padded, self.groupsize,
        )[:, : self.out_features]
        if self.perm is not None:
            W = W[jnp.argsort(self.perm), :]  # back to original row order
        return W

    def prepare_backward(self):
        """Return a copy carrying per-input-channel int8 requantized W^T
        (reference prepare_backward_scales, utils.py:230-255 — computed
        once on .train()): forward stays the packed kernel, backward runs
        dx on the int8 MXU instead of materialising the f32 dequant
        weight per step. Call inside jit at train-prep."""
        from sparsebit_tpu.ops.quant_matmul import prepare_a8_backward

        bwd_wq, bwd_scale = prepare_a8_backward(
            self.packed, self.scales, self.zeros, self.bits,
            self.n_padded, self.groupsize,
        )
        return QuantLinear(
            self.packed, self.scales, self.zeros, self.bits, self.groupsize,
            self.out_features, self.bias, self.impl, self.perm,
            bwd_wq, bwd_scale,
        )

    def __call__(self, x):
        if self.perm is not None:
            x = x[..., self.perm]  # act-order channel permutation
        x = self._pad_x(x)  # no-op unless with_k_pad
        if self.bwd_wq is not None:
            from sparsebit_tpu.ops.quant_matmul import quant_matmul_a8bwd

            out = quant_matmul_a8bwd(
                x, self.packed, self.scales, self.zeros,
                self.bwd_wq, self.bwd_scale,
                self.bits, self.groupsize, self.n_padded, self.impl,
            )
        elif self.impl == "a8":
            from sparsebit_tpu.ops.quant_matmul import quant_matmul_a8

            out = quant_matmul_a8(
                x, self.packed, self.scales, self.zeros,
                self.bits, self.groupsize, self.n_padded,
            )
        else:
            out = quant_matmul(
                x, self.packed, self.scales, self.zeros,
                self.bits, self.groupsize, self.n_padded, self.impl,
            )
        if self.n_padded != self.out_features:
            out = out[..., : self.out_features]
        if self.bias is not None:
            out = out + self.bias
        return out.astype(x.dtype)

    def call_stacked(self, x, li):
        """Layer-indexed forward when this object's leaves are layer-STACKED
        (decode.stack_layers): packed/scales/zeros carry a leading (L,) axis
        and ``li`` (traced int32) picks the layer. On the Pallas path the
        stacked weights are indexed in place in HBM (scalar prefetch, zero
        copies) — the scan-over-layers decode's weight-resident fix."""
        from sparsebit_tpu.ops.quant_matmul import quant_matmul_a8_stacked

        if self.perm is not None:
            x = x[..., self.perm[li]]
        x = self._pad_x(x)  # no-op unless with_k_pad
        out = quant_matmul_a8_stacked(
            x, self.packed, self.scales, self.zeros, li,
            self.bits, self.groupsize, self.n_padded,
        )
        if self.n_padded != self.out_features:
            out = out[..., : self.out_features]
        if self.bias is not None:
            out = out + self.bias[li]
        return out.astype(x.dtype)

    def tree_flatten(self):
        return (
            (self.packed, self.scales, self.zeros, self.bias, self.perm,
             self.bwd_wq, self.bwd_scale),
            (self.bits, self.groupsize, self.out_features, self.impl),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scales, zeros, bias, perm, bwd_wq, bwd_scale = children
        bits, groupsize, out_features, impl = aux
        return cls(packed, scales, zeros, bits, groupsize, out_features, bias,
                   impl, perm, bwd_wq, bwd_scale)
