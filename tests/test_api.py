"""Tests for the library API and the exact-arithmetic conv fast paths."""

import numpy as np
import pytest

from genfer_tpu import api


EXAMPLE = """
calls ~ Poisson(10);
scams ~ Binomial(calls, 0.2);
observe(scams = 1);
return calls;
"""


def test_infer_f64():
    r = api.infer(EXAMPLE)
    assert r.total.to_float() == pytest.approx(0.27067056647322557, rel=1e-12)
    assert r.mean.to_float() == pytest.approx(9.0, rel=1e-12)
    v, s, k = r.standardized()
    assert v.to_float() == pytest.approx(8.0, rel=1e-9)
    ps = r.probs(3, normalized=False)
    assert ps[1].to_float() == pytest.approx(9.079985952496972e-5, rel=1e-9)


def test_infer_rational():
    r = api.infer("X ~ Bernoulli(1/3); Y ~ Binomial(4, 1/2); observe X = 1; return Y",
                  mode="rational")
    from fractions import Fraction

    assert r.total.frac == Fraction(1, 3)
    assert r.mean.frac == Fraction(2)


def test_infer_bounds():
    r = api.infer(EXAMPLE, mode="f64-bounds")
    lo, hi = r.total.lo.to_float(), r.total.hi.to_float()
    assert lo <= 0.27067056647322557 <= hi
    assert hi - lo < 1e-10


def test_infer_multiprec():
    r = api.infer("X ~ Geometric(1/4); return X", mode="multiprec",
                  precision=150)
    assert abs(r.mean.to_float() - 3.0) < 1e-12


def test_multiprec_int_conv_path():
    """The common-scale integer conv for mpf coefficients must agree with
    per-element mpf arithmetic."""
    import mpmath

    from genfer_tpu.numbers.scalar import MultiPrec, set_precision
    from genfer_tpu.taylor.backend import ObjectBackend

    set_precision(200)
    b = ObjectBackend(MultiPrec)
    rng = np.random.RandomState(0)
    a = b.from_nested([MultiPrec(x) for x in rng.rand(6)])
    c = b.from_nested([MultiPrec(x) for x in rng.rand(5)])
    out = b.conv_trunc(a, c, (8,))
    ref = b._conv_generic(a, c, (8,))
    for i in range(8):
        x, y = b.to_host(out[i]), b.to_host(ref[i])
        assert abs((x - y).to_float()) < 1e-50
    set_precision(53)


def test_rational_int_conv_path():
    from fractions import Fraction

    from genfer_tpu.numbers.scalar import Rational
    from genfer_tpu.taylor.backend import ObjectBackend

    b = ObjectBackend(Rational)
    a = b.from_nested([Rational(Fraction(i, 7)) for i in range(1, 5)])
    c = b.from_nested([Rational(Fraction(i, 3)) for i in range(1, 4)])
    out = b.conv_trunc(a, c, (6,))
    ref = b._conv_generic(a, c, (6,))
    for i in range(6):
        assert b.to_host(out[i]).frac == b.to_host(ref[i]).frac


def test_compile_serving():
    """api.compile_serving: the --compile-scan path as a library call,
    incl. fresh-data serving."""
    import math

    from genfer_tpu import api

    obs = [2, 0, 3, 1, 4]
    src = ("Rate ~ Geometric(0.4);\n"
           + "".join(f"observe {o} ~ Poisson(1/2 * Rate);\n" for o in obs)
           + "return Rate")
    obj = api.compile_serving(src, order=64)
    masses, Z = obj.run()
    r = api.infer(src)
    assert abs(Z - r.total.to_float()) <= 1e-11 * r.total.to_float()
    # fresh dataset through the same compiled program
    fresh = [1, 1, 0, 2, 3]
    _, Z2 = obj.run_with_data([fresh])
    src2 = ("Rate ~ Geometric(0.4);\n"
            + "".join(f"observe {o} ~ Poisson(1/2 * Rate);\n"
                      for o in fresh)
            + "return Rate")
    r2 = api.infer(src2)
    assert abs(Z2 - r2.total.to_float()) <= 1e-11 * r2.total.to_float()

    # While programs compile with bounded unrolling; the mass still
    # live after the unroll count is reported as last_rest (the CLI
    # prints reference-style intervals from it)
    wobj = api.compile_serving(
        "X := 0;\nwhile 0 ~ Bernoulli(1/2) { X += 1; }\nreturn X",
        order=16,
    )
    wm, wz = wobj.run()
    assert wm[0] == 0.5 and wm[7] == 2.0 ** -8
    assert wobj.last_rest == 2.0 ** -8
