"""Shape ops.

Reference: sparsebit/quantization/modules/shape.py — all unquantized. In this
framework shapes are static under XLA, so these stay as float op-modules and
are listed in PASSTHROUGH_MODULES; no QModule wrappers are needed. The
reference's ``Size`` op (dynamic shape capture) has no TPU equivalent because
jax shapes are trace-time constants.
"""
