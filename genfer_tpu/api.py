"""Library API for programmatic inference.

The reference exposes only a CLI; this module is the framework's Python
entry point:

    from genfer_tpu import api
    result = api.infer("X ~ Poisson(10); observe 1 ~ Binomial(X, 0.2); return X")
    result.total, result.mean, result.probs(10)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .gf.extract import (
    central_to_standardized_moments,
    moments_taylor,
    moments_to_central_moments,
    probs_taylor,
)
from .lang.parser import parse_program
from .semantics.gf_transformer import GfTransformer


@dataclass
class InferenceResult:
    """Posterior summary for the program's result variable.

    Scalars are host numbers from :mod:`genfer_tpu.numbers` (call
    ``.to_float()`` / ``.display()`` as needed)."""

    program: object
    translation: object
    backend: object
    total: object  # Z (unnormalized total mass)
    raw_moments: list  # orders 1..4, normalized by Z
    var_info: object

    @property
    def mean(self):
        return self.raw_moments[0]

    @property
    def variance(self):
        _, central = moments_to_central_moments(self.raw_moments)
        return central[0]

    def standardized(self):
        """(variance, skewness, kurtosis)."""
        _, central = moments_to_central_moments(self.raw_moments)
        variance, std = central_to_standardized_moments(central)
        return variance, std[0], std[1]

    def probs(self, n: int, normalized: bool = True) -> list:
        """Posterior masses p(0..n-1) of the result variable."""
        ps = probs_taylor(
            self.translation.gf,
            self.backend,
            self.program.result,
            self.var_info,
            n,
        )
        if normalized:
            return [p / self.total for p in ps]
        return ps


def infer(
    source: str,
    *,
    mode: str = "f64",
    backend: Optional[str] = None,
    unroll: int = 8,
    simplify: bool = True,
    precision: Optional[int] = None,
) -> InferenceResult:
    """Run exact inference on an SGCL program.

    mode: "f64" | "rational" | "bigfloat" | "multiprec" | any of those
    with "-bounds" appended for interval arithmetic (e.g. "f64-bounds").
    backend: None (auto) | "jax" | "numpy" | "hybrid" | "sharded" | "object".
    """
    import argparse

    from .cli import select_mode

    bounds = mode.endswith("-bounds")
    base = mode.removesuffix("-bounds")
    args = argparse.Namespace(
        rational=base == "rational",
        precision=precision if base == "multiprec" else None,
        big_float=base == "bigfloat",
        bounds=bounds,
        backend=backend,
    )
    if base == "multiprec" and precision is None:
        args.precision = 100
    T, backend_obj, _elem = select_mode(args)
    program = parse_program(source)
    translation = GfTransformer(T, unroll=unroll).semantics(program)
    if simplify:
        translation.gf = translation.gf.simplify(backend_obj)
        translation.rest = translation.rest.simplify(backend_obj)
    total, moments = moments_taylor(
        translation.gf, backend_obj, program.result, translation.var_info, 5
    )
    return InferenceResult(
        program=program,
        translation=translation,
        backend=backend_obj,
        total=total,
        raw_moments=moments,
        var_info=translation.var_info,
    )


def infer_file(path, **kwargs) -> InferenceResult:
    with open(path, "r", encoding="utf-8") as f:
        return infer(f.read(), **kwargs)


def compile_serving(source: str, *, order: int = 128,
                    params: Optional[dict] = None,
                    max_steps: Optional[int] = None,
                    device: Optional[str] = "cpu"):
    """Compile an SGCL program to its accelerator scan form for
    repeated serving (the CLI's ``--compile-scan`` as a library call).

    Returns the compiled object, truncation-validated by grid doubling:
    ``run()`` reproduces the committed dataset, ``run_with_data`` /
    ``run_batch`` serve fresh observation datasets (one vmapped device
    dispatch for a whole batch), ``run_param_sweep`` sweeps ``$param``
    bindings without retracing, and telescoping cascades expose
    ``run_with_counts``.  Raises ``scanc.UnsupportedForScan`` when the
    program is outside the compiler's fragment (use :func:`infer`).

    ``device="cpu"`` (default) pins the program to host XLA — the
    never-loses configuration for one-shot and small-batch use.  Pass
    ``device=None`` to compile for jax's default accelerator: batched
    serving throughput at scale (15-25x measured on TPU for
    vmapped batches, bench generic_serving)."""
    from .scanc import compile_scan_program

    program = parse_program(source)
    obj, _ = compile_scan_program(
        program, order=order, params=params, max_steps=max_steps,
        device=device,
    )
    return obj
