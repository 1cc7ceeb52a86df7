"""Tests for the native C++ GF-DAG evaluator (genfer_tpu._evaltape).

The evaluator mirrors GenFun.eval_with / TaylorPoly for the
NumpyF64Backend (native/evaltape.cpp); ``GENFER_NATIVE_EVAL=check``
runs both evaluators on every eval() call and asserts parity inside
``try_native_eval`` — these tests drive diverse programs through that
mode, check bitwise agreement where the mirror claims it, and exercise
the fallback surface.
"""

import random

import pytest

from genfer_tpu import api
from genfer_tpu.gf import nativeeval

if nativeeval._evaltape is None:  # pragma: no cover
    pytest.skip("_evaltape extension not built", allow_module_level=True)

from test_differential import brute_force, random_program
from genfer_tpu.lang.parser import parse_program


def _summary(src, limit=12, discrete=True):
    r = api.infer(src, mode="f64")
    probs = (
        [p.to_float() for p in r.probs(limit, normalized=False)]
        if discrete
        else []
    )
    return (
        r.total.to_float(),
        probs,
        [m.to_float() for m in r.raw_moments],
    )


# ----------------------------------------------------------------------
# cross-check mode over random programs (the check assert fires inside
# try_native_eval on every GenFun.eval call)
# ----------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(15))
def test_native_check_random_programs(seed, monkeypatch):
    rng = random.Random(1000 + seed)
    src = random_program(rng)
    oracle = brute_force(parse_program(src))
    limit = max(oracle) + 2 if oracle else 2

    monkeypatch.setenv("GENFER_NATIVE_EVAL", "check")
    total, probs, _ = _summary(src, limit)
    total_exact = float(sum(oracle.values()))
    assert abs(total - total_exact) < 1e-9, src
    for k in range(limit):
        assert abs(probs[k] - float(oracle.get(k, 0))) < 1e-9, f"p({k})\n{src}"


# ----------------------------------------------------------------------
# observation-optimizer chains: the three recognized patterns
# (reference generating_function.rs:670-765) run as fused C++ chains
# ----------------------------------------------------------------------

OBS_CHAIN_PROGRAMS = {
    "discrete_poisson_chain": """
        Rate ~ Geometric(0.3);
        observe 3 ~ Poisson(0.7 * Rate);
        observe 1 ~ Poisson(1.3 * Rate);
        observe 4 ~ Poisson(0.5 * Rate);
        observe 2 ~ Poisson(0.9 * Rate);
        return Rate
    """,
    "continuous_poisson_chain": """
        Rate ~ Gamma(2, 1);
        observe 3 ~ Poisson(0.7 * Rate);
        observe 1 ~ Poisson(1.3 * Rate);
        observe 4 ~ Poisson(0.5 * Rate);
        return Rate
    """,
    "mixture_like": """
        Rate ~ Gamma(3, 2);
        X ~ Poisson(Rate);
        if X in [0, 1, 2] {
            observe 2 ~ Poisson(0.5 * Rate);
        } else {
            observe 5 ~ Poisson(1.5 * Rate);
        }
        observe 1 ~ Poisson(0.8 * Rate);
        return X
    """,
    "negbinomial_obs": """
        P ~ Poisson(4);
        observe 2 ~ NegBinomial(3, 0.4);
        observe 3 ~ Binomial(P, 0.5);
        return P
    """,
    "two_var_conditionals": """
        A ~ Poisson(2);
        B ~ Binomial(A, 0.6);
        if B = 2 { C ~ Bernoulli(0.3); } else { C ~ Bernoulli(0.7); }
        observe 1 ~ Poisson(0.5 * A);
        return B
    """,
}


@pytest.mark.parametrize("name", sorted(OBS_CHAIN_PROGRAMS))
def test_native_check_obs_chains(name, monkeypatch):
    src = OBS_CHAIN_PROGRAMS[name]
    discrete = "continuous" not in name
    monkeypatch.setenv("GENFER_NATIVE_EVAL", "check")
    total_c, probs_c, moms_c = _summary(src, discrete=discrete)

    # and bitwise agreement of the end-to-end pipeline with native off
    # (the C++ kernels mirror the numpy stencils with fp-contract off)
    monkeypatch.setenv("GENFER_NATIVE_EVAL", "0")
    total_p, probs_p, moms_p = _summary(src, discrete=discrete)
    assert total_c == total_p, name
    assert probs_c == probs_p, name
    assert moms_c == moms_p, name


# ----------------------------------------------------------------------
# fallback surface
# ----------------------------------------------------------------------

def test_disabled_for_non_f64_backends(monkeypatch):
    """Rational/MultiPrec modes never route through the native tape."""
    monkeypatch.setenv("GENFER_NATIVE_EVAL", "check")
    src = "X ~ Binomial(4, 1/3); observe X = 2; return X"
    r = api.infer(src, mode="rational")
    from fractions import Fraction

    assert r.total.frac == Fraction(8, 27)


def test_unsupported_dag_falls_back(monkeypatch):
    """A DAG outside the mirrored surface returns None from
    try_native_eval and the Python interpreter produces the result."""
    calls = {"n": 0}
    orig = nativeeval.try_native_eval

    def spy(root, backend, inputs, demand):
        res = orig(root, backend, inputs, demand)
        calls["n"] += 1
        return res

    monkeypatch.setattr(nativeeval, "try_native_eval", spy)
    # ShiftTaylorAtZero at a nonzero input triggers the dynamic-rewrite
    # fallback inside the tape (decrement of a sampled variable, then a
    # moment extraction which evaluates at 1)
    src = "X ~ Poisson(3); X -= 1; return X"
    r = api.infer(src, mode="f64")
    assert calls["n"] > 0
    assert abs(r.total.to_float() - 1.0) < 1e-12


def test_budget_eviction_still_correct(monkeypatch):
    """A tiny memo budget forces recomputation, never wrong results."""
    monkeypatch.setenv("GENFER_NATIVE_EVAL", "check")
    monkeypatch.setattr(nativeeval, "_BUDGET_MB", 1)
    src = OBS_CHAIN_PROGRAMS["continuous_poisson_chain"]
    total, _, _ = _summary(src, discrete=False)
    monkeypatch.setenv("GENFER_NATIVE_EVAL", "0")
    total_p, _, _ = _summary(src, discrete=False)
    assert total == total_p


def test_hybrid_backend_routes_native(monkeypatch):
    """The Hybrid backend (the default on a live accelerator) shares
    numpy host semantics: the tape must engage and agree bitwise."""
    from genfer_tpu.taylor.backend import HybridBackend

    assert nativeeval.native_eval_enabled(HybridBackend())

    src = OBS_CHAIN_PROGRAMS["discrete_poisson_chain"]
    monkeypatch.setenv("GENFER_NATIVE_EVAL", "check")
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.semantics.gf_transformer import GfTransformer
    from genfer_tpu.numbers.scalar import F64
    from genfer_tpu.gf.extract import probs_taylor

    prog = parse_program(src)
    tr = GfTransformer(F64).semantics(prog)
    hb = HybridBackend()
    from genfer_tpu.taylor.backend import NumpyF64Backend

    ph = probs_taylor(tr.gf, hb, prog.result, tr.var_info, 8)
    pn = probs_taylor(tr.gf, NumpyF64Backend(), prog.result,
                      tr.var_info, 8)
    assert [x.v for x in ph] == [x.v for x in pn]


def test_hybrid_offload_threshold_bails(monkeypatch):
    """An evaluation that reaches a conv above the backend's offload
    threshold must return None from the tape (the Python path then
    offloads it) and still produce the same posterior."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.semantics.gf_transformer import GfTransformer
    from genfer_tpu.numbers.scalar import F64
    from genfer_tpu.gf.extract import probs_taylor
    from genfer_tpu.taylor.backend import HybridBackend, NumpyF64Backend

    src = """
        A ~ Poisson(3);
        B ~ Poisson(2);
        observe 2 ~ Binomial(A, 0.4);
        observe 1 ~ Binomial(B, 0.5);
        return A
    """
    prog = parse_program(src)
    tr = GfTransformer(F64).semantics(prog)
    hb = HybridBackend()
    monkeypatch.setattr(HybridBackend, "CONV_OFFLOAD_FLOPS", 10)
    bails = {"n": 0}
    orig = nativeeval.try_native_eval

    def spy(root, backend, inputs, demand):
        res = orig(root, backend, inputs, demand)
        if res is None and nativeeval.native_eval_enabled(backend):
            bails["n"] += 1
        return res

    monkeypatch.setattr(nativeeval, "try_native_eval", spy)
    ph = probs_taylor(tr.gf, hb, prog.result, tr.var_info, 8)
    assert bails["n"] > 0, "expected the tape to bail above 10 flops"
    pn = probs_taylor(tr.gf, NumpyF64Backend(), prog.result,
                      tr.var_info, 8)
    assert [x.v for x in ph] == [x.v for x in pn]
