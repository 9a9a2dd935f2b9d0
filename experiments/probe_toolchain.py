"""Automated re-probe of the recorded toolchain blockers (VERDICT r4 #5).

Four perf ceilings in this codebase are blocked on Mosaic/libtpu features,
not on our design (docs/perf_notes.md rounds 2-4). "Blocked on toolchain"
claims rot silently, so this probe re-tests each one and prints a
capability JSON; run it at round start and after any jax/libtpu bump. If
a capability flips to true, the corresponding ceiling gets re-litigated
with measurements:

  u4_mxu_operand      -> prefill MFU (27% int8-MFU ceiling: the in-kernel
                         u4->s8 widening cast; perf_notes round 4)
  int2_bitcast        -> true 2/3-bit serving (plane unpack is VPU-bound,
                         exp25: 18 vs 150 tok/s; a free int2 bitcast would
                         make a ROW-QUAD layout unpack like the 4-bit
                         row-pairs)
  vmem_row_store_dyn  -> flat (S, Hkv*D) KV slabs patched in VMEM (the
                         round-4 flat-slab revert: vector stores at
                         dynamic sublane indices)
  vmem_row_dma_dyn    -> same, via DMA instead of a vector store
  hbm_row_dma_dyn     -> 1-row DMA WRITES to HBM at a dynamic sublane
                         offset (the round-5 flat-cache commit path; the
                         lane-padded scale-row writes already rely on it)
  epilogue_fusion     -> no Pallas API for fusing the group epilogue into
                         MXU accumulation; recorded as a version
                         fingerprint only — re-check the release notes
                         when the fingerprint changes.

Each probe compiles + runs a minimal Pallas kernel in a SUBPROCESS (a
Mosaic internal error can take down the compile process — the B=64 bf16
kernel did in round 3), so one crash doesn't kill the sweep.
"""

import json
import os
import subprocess
import sys

PROBES = ("u4_mxu_operand", "int2_bitcast", "vmem_row_store_dyn",
          "vmem_row_dma_dyn", "hbm_row_dma_dyn")


def _run_probe(name):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if name == "u4_mxu_operand":
        # dot with a u4-bitcast operand fed to the MXU directly (no
        # widening cast). Today Mosaic rejects sub-byte MXU operands.
        def kern(x_ref, w_ref, o_ref):
            w4 = pltpu.bitcast(w_ref[...], jnp.uint4)  # (256, 256) u4
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w4,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        x = jnp.ones((8, 256), jnp.int8)
        w = jnp.ones((128, 256), jnp.uint8)  # bitcast doubles sublanes
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        )(x, w)
        # u8 0x11 -> two u4 codes of 1 each; 256 ones dot 1 = 256? codes
        # here are 0x01 -> nibbles (1, 0); just require it ran + finite
        np.asarray(out)
        return True

    if name == "int2_bitcast":
        # int2 lane/vector support: bitcast u8 -> int2 (4x sublanes) then
        # a widening convert — the op sequence a ROW-QUAD 2-bit layout
        # needs. ml_dtypes has int2; Mosaic vector support is the blocker.
        def kern(w_ref, o_ref):
            w2 = pltpu.bitcast(w_ref[...], jnp.int2)  # (128, 128) int2
            o_ref[...] = w2.astype(jnp.int8)

        w = jnp.full((32, 128), 0x55, jnp.uint8)
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int8),
        )(w)
        # 0x55 = 4x the 2-bit code 0b01 -> every unpacked value must be 1
        return bool((np.asarray(out) == 1).all())

    if name == "vmem_row_store_dyn":
        # vector store of one (1, N) row into a VMEM ref at a DYNAMIC,
        # not-provably-8-aligned sublane index (the flat-slab patch).
        def kern(i_ref, x_ref, o_ref):
            o_ref[...] = jnp.zeros_like(o_ref)
            o_ref[pl.ds(i_ref[0], 1), :] = x_ref[...]

        x = jnp.ones((1, 512), jnp.int8)
        idx = jnp.array([3], jnp.int32)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((1, 512), lambda s, i: (0, 0))],
                out_specs=pl.BlockSpec((64, 512), lambda s, i: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int8),
        )(idx, x)
        return bool(np.asarray(out)[3].sum() == 512)

    if name == "vmem_row_dma_dyn":
        # DMA one row HBM -> VMEM scratch at a dynamic sublane offset of
        # the (tiled) destination.
        def kern(i_ref, x_hbm, o_ref, slab, sem):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, 1), :], slab.at[pl.ds(i_ref[0], 1), :],
                sem)
            cp.start()
            cp.wait()
            o_ref[...] = slab[...]

        x = jnp.ones((8, 512), jnp.int8)
        idx = jnp.array([3], jnp.int32)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec((64, 512), lambda s, i: (0, 0)),
                scratch_shapes=[pltpu.VMEM((64, 512), jnp.int8),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((64, 512), jnp.int8),
        )(idx, x)
        return bool(np.asarray(out)[3].sum() == 512)

    if name == "hbm_row_dma_dyn":
        # DMA one (1, N) VMEM row into an ALIASED HBM output at a dynamic
        # sublane offset — the flat-cache commit write. The lane-padded
        # scale-row writes (ops/attention.py) already do this with N=128;
        # probe the wide-N (Hkv*D) shape the flat cache needs.
        def kern(i_ref, x_ref, big_hbm, o_hbm, row, sem):
            row[...] = x_ref[...]
            cp = pltpu.make_async_copy(
                row, o_hbm.at[pl.ds(i_ref[0], 1), :], sem)
            cp.start()
            cp.wait()

        x = jnp.ones((1, 4096), jnp.int8)
        big = jnp.zeros((64, 4096), jnp.int8)
        idx = jnp.array([3], jnp.int32)
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((1, 4096), lambda s, i: (0, 0)),
                          pl.BlockSpec(memory_space=pltpu.HBM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                scratch_shapes=[pltpu.VMEM((1, 4096), jnp.int8),
                                pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((64, 4096), jnp.int8),
            # positional over ALL inputs incl. the scalar-prefetch arg
            input_output_aliases={2: 0},
        )(idx, x, big)
        a = np.asarray(out)
        return bool(a[3].sum() == 4096 and a.sum() == 4096)

    raise SystemExit(f"unknown probe {name}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        name = sys.argv[2]
        try:
            ok = _run_probe(name)
            print(json.dumps({"probe": name, "ok": bool(ok)}))
        except Exception as e:  # compile reject == capability absent
            print(json.dumps({
                "probe": name, "ok": False,
                "error": f"{type(e).__name__}: {str(e)[:200]}"}))
        return

    import jax
    import jaxlib

    caps = {}
    errors = {}
    for name in PROBES:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", name],
            capture_output=True, text=True, timeout=600,
        )
        line = None
        for ln in reversed(r.stdout.strip().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        if line is None:  # compile process crashed
            caps[name] = False
            errors[name] = (
                "subprocess died rc=%s: %s" % (r.returncode,
                                               r.stderr.strip()[-200:]))
        else:
            d = json.loads(line)
            caps[name] = d["ok"]
            if "error" in d:
                errors[name] = d["error"]
    result = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "capabilities": caps,
        # no Pallas API today; flip manually if a release adds one
        "epilogue_fusion": {"available": False,
                            "fingerprint": jax.__version__},
        "errors": errors,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
