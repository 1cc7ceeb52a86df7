"""genfer_tpu: a TPU-native framework for exact Bayesian inference on discrete
probabilistic programs via probability generating functions (PGFs).

This is a from-scratch, TPU-first re-design of the capabilities of the
reference system fzaiser/genfer (NeurIPS 2023, arXiv 2305.17058):

* a small imperative probabilistic language (SGCL) is parsed and translated
  compositionally into a symbolic generating-function DAG,
* posterior probability masses and moments are extracted by truncated
  multivariate Taylor-series arithmetic,
* the Taylor engine ("TensorPoly") stores coefficients as dense device
  tensors; the hot operations (truncated Cauchy products, power-series
  division / exp / log recurrences) are formulated as MXU matmuls and
  triangular solves so that XLA maps them onto the TPU systolic array.

Layer map (mirrors reference layers L0-L8, see SURVEY.md):

* ``genfer_tpu.numbers``   - host scalar tower + array backends   (ref L0)
* ``genfer_tpu.taylor``    - TensorPoly Taylor/AD engine          (ref L1)
* ``genfer_tpu.gf``        - generating-function IR + evaluation  (ref L2)
* ``genfer_tpu.semantics`` - support analysis + program->GF       (ref L3/L4)
* ``genfer_tpu.lang``      - SGCL AST + parser                    (ref L5)
* ``genfer_tpu.cli``       - command line driver                  (ref L6)
* ``genfer_tpu.tools``     - auxiliary binaries                   (ref L7)
* ``genfer_tpu.parallel``  - device-mesh sharding of the engine (TPU-only)
* ``genfer_tpu.ops``       - Pallas/XLA kernels for the hot ops (TPU-only)
"""

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable 64-bit floats in JAX (the default number mode is f64,
    matching the reference's 53-bit doubles)."""
    import jax

    jax.config.update("jax_enable_x64", True)
