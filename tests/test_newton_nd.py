"""Multivariate (>= 2 effective axes) div/exp/log via Newton lifting.

The reference computes these with per-coefficient recurrences
(multivariate_taylor.rs:1162-1231 div, 1285-1317 exp, 1319-1386 log);
the TPU-native backends lower them to O(log order) truncated
convolutions (backend._inv_nd / _poly_div_nd / _poly_exp_nd /
_poly_log_nd).  These tests pin the Newton results against the
IEEE-faithful generic recurrence (the direct port of the reference
algorithm) on random series.
"""

import numpy as np
import pytest

from genfer_tpu.taylor.backend import JaxF64Backend, NumpyF64Backend


@pytest.fixture(scope="module")
def nb():
    return NumpyF64Backend()


@pytest.fixture(scope="module")
def jb():
    return JaxF64Backend()


def _rand(rng, shape, scale=1.0):
    return rng.randn(*shape) * scale


DIV_CASES = [
    ((6, 5), (6, 5), (6, 5)),
    ((17, 13), (17, 13), (17, 13)),
    ((5, 4, 6), (5, 4, 6), (5, 4, 6)),
    ((6, 8), (4, 3), (8, 8)),          # divisor smaller than output
    ((3, 2, 4, 3), (3, 2, 4, 3), (3, 2, 4, 3)),
    ((9, 1, 7), (9, 1, 7), (9, 1, 7)),  # length-1 middle axis
]


@pytest.mark.parametrize("sx,sy,out", DIV_CASES)
def test_div_nd_matches_recurrence(nb, sx, sy, out):
    rng = np.random.RandomState(hash((sx, sy)) % 2**31)
    xs = _rand(rng, sx)
    ys = _rand(rng, sy)
    ys[(0,) * len(sy)] = 1.5 + rng.rand()
    want = nb._div_generic(xs, ys, out)
    got = nb._poly_div_nd(xs, ys, out)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


EXP_CASES = [
    ((5, 6), (5, 6)),
    ((9, 9), (9, 9)),
    ((4, 5, 3), (4, 5, 3)),
    ((3, 2), (7, 6)),                   # output larger than input
    ((1, 4, 5), (1, 4, 5)),             # leading length-1 axis
]


@pytest.mark.parametrize("sx,out", EXP_CASES)
def test_exp_nd_matches_recurrence(nb, sx, out):
    rng = np.random.RandomState(hash((sx, out)) % 2**31)
    xs = _rand(rng, sx, 0.3)
    want = nb._exp_generic(xs, out)
    got = nb._poly_exp_nd(xs, out)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


LOG_CASES = [
    ((6, 7), (6, 7)),
    ((4, 4, 5), (4, 4, 5)),
    ((3, 3), (6, 5)),
]


@pytest.mark.parametrize("sx,out", LOG_CASES)
def test_log_nd_matches_recurrence(nb, sx, out):
    rng = np.random.RandomState(hash((sx, out)) % 2**31)
    xs = _rand(rng, sx, 0.2)
    xs[(0,) * len(sx)] = 1.0 + rng.rand()
    want = nb._log_generic(xs, out)
    got = nb._poly_log_nd(xs, out)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_algebraic_identities(nb):
    """exp(f)*exp(g) == exp(f+g), log(exp(f)) == f, (x/y)*y == x —
    the reference's own kernel test style (multivariate_taylor.rs
    1388-1513) at multivariate shapes that take the Newton path."""
    rng = np.random.RandomState(0)
    shape = (9, 8)
    f = _rand(rng, shape, 0.2)
    g = _rand(rng, shape, 0.2)
    ef = nb.poly_exp(f, shape)
    eg = nb.poly_exp(g, shape)
    efg = nb.poly_exp(f + g, shape)
    np.testing.assert_allclose(
        nb.conv_trunc(ef, eg, shape), efg, rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        nb.poly_log(ef, shape), f, rtol=1e-8, atol=1e-10
    )
    x = _rand(rng, shape)
    y = _rand(rng, shape)
    y[0, 0] = 2.0
    q = nb.poly_div(x, y, shape)
    np.testing.assert_allclose(
        nb.conv_trunc(q, y, shape), x, rtol=1e-8, atol=1e-10
    )


def test_zero_lead_divisor_falls_back(nb):
    """A zero leading divisor coefficient must keep the reference's IEEE
    behavior (NaN/inf pattern of the forward recurrence)."""
    rng = np.random.RandomState(3)
    xs = _rand(rng, (4, 4))
    ys = _rand(rng, (4, 4))
    ys[0, 0] = 0.0
    got = nb.poly_div(xs, ys, (4, 4))
    want = nb._div_generic(xs, ys, (4, 4))
    assert np.array_equal(np.isnan(got), np.isnan(want))


def test_jax_backend_matches_numpy(nb, jb):
    rng = np.random.RandomState(11)
    xs = _rand(rng, (9, 8))
    ys = _rand(rng, (9, 8))
    ys[0, 0] = 1.7
    want = nb.poly_div(xs, ys, (9, 8))
    got = np.asarray(jb.poly_div(jb.jnp.asarray(xs), jb.jnp.asarray(ys),
                                 (9, 8)))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    xe = _rand(rng, (7, 6), 0.3)
    np.testing.assert_allclose(
        np.asarray(jb.poly_exp(jb.jnp.asarray(xe), (7, 6))),
        nb.poly_exp(xe, (7, 6)), rtol=1e-8, atol=1e-10,
    )
    xl = _rand(rng, (7, 6), 0.2)
    xl[0, 0] = 2.2
    np.testing.assert_allclose(
        np.asarray(jb.poly_log(jb.jnp.asarray(xl), (7, 6))),
        nb.poly_log(xl, (7, 6)), rtol=1e-8, atol=1e-10,
    )


def test_truncating_out_shape_no_recursion():
    """poly_div/exp/log with a >=2-effective-axis operand but an
    out_shape truncating those axes to 1 must reach the scalar base
    case instead of recursing (ADVICE round-2 items 1-2)."""
    import jax.numpy as jnp
    import numpy as np

    from genfer_tpu.taylor.backend import JaxF64Backend, NumpyF64Backend

    for B, conv in ((JaxF64Backend, jnp.asarray),
                    (NumpyF64Backend, np.asarray)):
        b = B()
        ys = conv(np.arange(1, 26, dtype=float).reshape(5, 5))
        xs = conv(np.ones((1, 1)))
        assert float(np.asarray(b.poly_div(xs, ys, (1, 1))).ravel()[0]) == 1.0
        assert float(np.asarray(
            b.poly_exp(conv(np.zeros((3, 3))), (1, 1))).ravel()[0]) == 1.0
        assert float(np.asarray(
            b.poly_log(conv(np.ones((3, 3))), (1, 1))).ravel()[0]) == 0.0


def test_power_factors_zero_sign_and_nan():
    """-0.0 and 0.0 must not share a power-factor cache slot
    (ADVICE round-2 item 3)."""
    import numpy as np

    from genfer_tpu.taylor.tensorpoly import _power_factors_f64

    pos = _power_factors_f64(0.0, 4)
    neg = _power_factors_f64(-0.0, 4)
    assert np.signbit(neg[1]) and not np.signbit(pos[1])
    nan1 = _power_factors_f64(float("nan"), 3)
    nan2 = _power_factors_f64(float("nan"), 3)
    assert nan1 is nan2  # NaN keys hit their own cache entry
