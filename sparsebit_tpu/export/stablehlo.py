"""Export a QuantModel as a StableHLO artifact + quant metadata sidecar.

Replaces the reference's QDQ-ONNX export (quant_model.py:222-324): on TPU the
deployable artifact is a ``jax.export`` StableHLO module; quantization
metadata (true bitwidths, scales, zero-points, groupsize, per-layer bit map —
the reference's ``extra_info`` ONNX attributes) travels in a sidecar JSON +
npz so serving stacks can reconstruct the QDQ semantics.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def export_graph(graph, path, example_inputs):
    """Export a bare Graph (e.g. a pruned SparseModel, masks folded) as a
    StableHLO artifact (reference: sparse_model.py:124 export_onnx)."""
    params = graph.collect_params()

    def fn(params, *xs):
        return graph.run(params, *xs)

    exported = jax.export.export(jax.jit(fn))(
        params, *[jnp.asarray(x) for x in example_inputs]
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    return path


def export_quant_model(qmodel, path, example_inputs, extra_info=False):
    qmodel.eval()
    qmodel.set_quant(w_quant=True, a_quant=True)

    params = qmodel.params()

    def fn(params, *xs):
        return qmodel.apply(params, *xs)

    exported = jax.export.export(jax.jit(fn))(
        params, *[jnp.asarray(x) for x in example_inputs]
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())

    meta = {"nodes": {}}
    qarrays = {}
    for name, op in qmodel.qmodules():
        node_meta = {}
        for prefix, q in (
            ("input_quantizer", op.input_quantizer),
            ("weight_quantizer", op.weight_quantizer),
        ):
            if q is None or not q.is_enable:
                continue
            node_meta[prefix] = {
                "bit": int(q.bit),
                "symmetric": bool(q.is_symmetric),
                "perchannel": bool(q.is_perchannel),
                "qmin": int(q.qdesc.qmin),
                "qmax": int(q.qdesc.qmax),
                "groupsize": int(q.qdesc.groupsize),
            }
            qarrays["{}.{}.scale".format(name, prefix)] = np.asarray(q.scale)
            qarrays["{}.{}.zero_point".format(name, prefix)] = np.asarray(
                q.zero_point
            )
        if node_meta:
            meta["nodes"][name] = node_meta
    with open(os.path.join(path, "quant_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    np.savez(os.path.join(path, "quant_params.npz"), **qarrays)
    return path
