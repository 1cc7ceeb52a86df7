"""Unit tests for the TensorPoly engine.

Test vectors mirror the reference kernel spec
(reference: src/multivariate_taylor.rs:732-1513 inline #[test]s).
"""

import math

import pytest

from genfer_tpu.numbers import F64, Interval
from genfer_tpu.taylor import (
    INF_DEGREE,
    JaxF64Backend,
    JaxIntervalBackend,
    NumpyF64Backend,
    NumpyIntervalBackend,
    ObjectBackend,
    TaylorPoly,
)

BACKENDS = {
    "jax_f64": lambda: JaxF64Backend(),
    "jax_interval": lambda: JaxIntervalBackend(),
    "numpy_f64": lambda: NumpyF64Backend(),
    "numpy_interval": lambda: NumpyIntervalBackend(),
    "object_f64": lambda: ObjectBackend(F64),
}


@pytest.fixture(params=list(BACKENDS))
def backend(request):
    return BACKENDS[request.param]()


def tp(backend, nested, degrees=None):
    def conv(n):
        if isinstance(n, list):
            return [conv(x) for x in n]
        return backend.scalar_cls.from_ratio(*_to_ratio(n)) if False else _lift(backend, n)

    arr = backend.from_nested(_lift_nested(backend, nested))
    if degrees is None:
        return TaylorPoly.from_coeffs(backend, arr)
    return TaylorPoly.new(backend, arr, degrees)


def _lift(backend, x):
    T = backend.scalar_cls
    if T is F64:
        return F64(x)
    if issubclass(T, Interval):
        return T.precisely(F64(x))
    return T(x)


def _lift_nested(backend, nested):
    if isinstance(nested, list):
        return [_lift_nested(backend, x) for x in nested]
    return _lift(backend, nested)


def vals(poly):
    """Nested lists of floats from a TaylorPoly."""

    def conv(n):
        if isinstance(n, list):
            return [conv(x) for x in n]
        return n.to_float()

    return conv(poly.to_nested_host())


def assert_close_nested(a, b, tol=1e-9):
    if isinstance(a, list):
        assert isinstance(b, list) and len(a) == len(b), (a, b)
        for x, y in zip(a, b):
            assert_close_nested(x, y, tol)
    else:
        assert a == pytest.approx(b, rel=tol, abs=1e-8), (a, b)


def test_2d_derivative(backend):
    t = tp(backend, [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0],
                     [9.0, 10.0, 11.0, 12.0], [13.0, 14.0, 15.0, 16.0]])
    assert_close_nested(
        vals(t.derivative(0, 1)),
        [[5.0, 6.0, 7.0, 8.0], [18.0, 20.0, 22.0, 24.0], [39.0, 42.0, 45.0, 48.0]],
    )
    assert_close_nested(
        vals(t.derivative(1, 1)),
        [[2.0, 6.0, 12.0], [6.0, 14.0, 24.0], [10.0, 22.0, 36.0], [14.0, 30.0, 48.0]],
    )
    assert_close_nested(
        vals(t.derivative(0, 2)), vals(t.derivative(0, 1).derivative(0, 1))
    )
    assert_close_nested(
        vals(t.derivative(1, 2)), vals(t.derivative(1, 1).derivative(1, 1))
    )


def test_2d_taylor_expansion_of_coeff(backend):
    t = tp(backend, [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0],
                     [9.0, 10.0, 11.0, 12.0], [13.0, 14.0, 15.0, 16.0]])
    assert_close_nested(
        vals(t.taylor_expansion_of_coeff(0, 2)),
        [[9.0, 10.0, 11.0, 12.0], [39.0, 42.0, 45.0, 48.0]],
    )
    assert_close_nested(
        vals(t.taylor_expansion_of_coeff(1, 3)),
        [[4.0], [8.0], [12.0], [16.0]],
    )
    expected = [[11.0, 36.0], [45.0, 144.0]]
    assert_close_nested(
        vals(t.taylor_expansion_of_coeff(0, 2).taylor_expansion_of_coeff(1, 2)),
        expected,
    )
    assert_close_nested(
        vals(t.taylor_expansion_of_coeff(1, 2).taylor_expansion_of_coeff(0, 2)),
        expected,
    )


def test_2d_subst_var(backend):
    t = tp(backend, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    s = tp(backend, [[10.0, 11.0, 12.0], [13.0, 14.0, 15.0], [16.0, 17.0, 18.0]])
    assert_close_nested(
        vals(t.subst_var(0, s)),
        [[741.0, 2436.0, 5353.0], [1872.0, 6163.0, 13516.0], [3487.0, 11452.0, 25030.0]],
    )
    assert_close_nested(
        vals(t.subst_var(1, s)),
        [[321.0, 682.0, 1107.0], [1460.0, 3101.0, 5016.0], [4111.0, 8736.0, 14088.0]],
    )


def test_2d_mul(backend):
    f = tp(backend, [[1.0, 2.0], [3.0, 4.0]])
    g = tp(backend, [[5.0, 6.0], [7.0, 8.0]])
    assert_close_nested(vals(f * g), [[5.0, 16.0], [22.0, 60.0]])


def test_2d_mul_const(backend):
    f = tp(backend, [[1.0, 2.0], [3.0, 4.0]])
    z = TaylorPoly.zero(backend)
    o = TaylorPoly.one(backend)
    assert (f * z).is_zero()
    assert (z * f).is_zero()
    assert_close_nested(vals(f * o), [[1.0, 2.0], [3.0, 4.0]])
    assert_close_nested(vals(o * f), [[1.0, 2.0], [3.0, 4.0]])
    two = TaylorPoly.from_u32(backend, 2)
    assert_close_nested(vals(two * f), [[2.0, 4.0], [6.0, 8.0]])
    assert_close_nested(vals(f * two), [[2.0, 4.0], [6.0, 8.0]])


def test_2d_mul_factor_linear(backend):
    f = tp(backend, [[1.0, 2.0], [3.0, 4.0]])
    g0 = TaylorPoly.from_u32(backend, 2) * TaylorPoly.var_at_zero(backend, 0, 2)
    g1 = TaylorPoly.from_u32(backend, 3) * TaylorPoly.var_at_zero(backend, 1, 2)
    assert g0.extract_linear() is not None
    assert g1.extract_linear() is not None
    assert_close_nested(vals(f * g0), [[0.0, 0.0], [2.0, 4.0]])
    assert_close_nested(vals(f * g1), [[0.0, 3.0], [0.0, 9.0]])
    assert_close_nested(vals(g0 * f), [[0.0, 0.0], [2.0, 4.0]])
    assert_close_nested(vals(g1 * f), [[0.0, 3.0], [0.0, 9.0]])
    assert_close_nested(vals(g0 * g1), [[0.0, 0.0], [0.0, 6.0]])
    assert_close_nested(vals(g1 * g0), [[0.0, 0.0], [0.0, 6.0]])

    # affine factors 3 + 2v
    h0 = tp(backend, [3.0, 2.0])
    h1 = tp(backend, [[3.0, 2.0], [0.0, 0.0]])
    assert_close_nested(vals(f * h0), [[3.0, 6.0], [11.0, 16.0]])
    assert_close_nested(vals(h0 * f), [[3.0, 6.0], [11.0, 16.0]])
    assert_close_nested(vals(f * h1), [[3.0, 8.0], [9.0, 18.0]])
    assert_close_nested(vals(h1 * f), [[3.0, 8.0], [9.0, 18.0]])
    assert_close_nested(vals(h0 * h1), [[9.0, 6.0], [6.0, 4.0]])


def test_2d_div(backend):
    f = tp(backend, [[1.0, 2.0], [3.0, 4.0]])
    g = tp(backend, [[5.0, 6.0], [7.0, 8.0]])
    result = f / g
    assert_close_nested(
        vals(result),
        [[0.2, 0.15999999999999998], [0.31999999999999995, -0.1279999999999999]],
    )
    assert_close_nested(vals(result * g), vals(f), tol=1e-12)


def test_1d_div_and_exp_log(backend):
    # power-series identities in 1-D
    e = tp(backend, [1.0, 2.0, 3.0])
    assert_close_nested(vals(e.log()), [0.0, 2.0, 1.0])
    assert_close_nested(vals(e.log().exp()), [1.0, 2.0, 3.0])
    one = TaylorPoly.one(backend)
    inv = one / e
    assert_close_nested(vals(inv * e), [1.0, 0.0, 0.0], tol=1e-12)
    x = TaylorPoly.var(backend, 0, _lift(backend, 0.0), 10)
    xm1 = x - TaylorPoly.one(backend)
    r = x / xm1
    assert_close_nested(vals(r), [0.0] + [-1.0] * 9)


def test_2d_exp(backend):
    z = TaylorPoly.zero(backend)
    assert_close_nested(vals(z.exp()), 1.0)
    f = tp(backend, [[1.0, 2.0], [3.0, 4.0]])
    g = tp(backend, [[5.0, 6.0], [7.0, 8.0]])
    assert_close_nested(
        vals(f.exp()),
        [[2.718281828459045, 5.43656365691809],
         [8.154845485377136, 27.182818284590454]],
    )
    assert_close_nested(
        vals(f.exp() * (-f).exp()), [[1.0, 0.0], [0.0, 0.0]], tol=1e-12
    )
    assert_close_nested(
        vals((f + g).exp()),
        [[403.4287934927351, 3227.430347941881],
         [4034.287934927351, 37115.44900133163]],
        tol=1e-11,
    )
    assert_close_nested(
        vals(f.exp() * g.exp()),
        [[403.4287934927351, 3227.430347941881],
         [4034.287934927351, 37115.44900133163]],
        tol=1e-11,
    )


def test_2d_log(backend):
    o = TaylorPoly.one(backend)
    assert_close_nested(vals(o.log()), 0.0)
    xp1 = TaylorPoly.var(backend, 0, _lift(backend, 1.0), 5)
    assert_close_nested(
        vals(xp1.log()), [0.0, 1.0, -0.5, 0.3333333333333333, -0.25]
    )
    f = tp(backend, [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    g = tp(backend, [[5.0, 6.0, 7.0], [7.0, 8.0, 9.0], [9.0, 10.0, 11.0]])
    assert_close_nested(
        vals(f.log()),
        [[0.0, 2.0, 1.0], [4.0, -3.0, 0.0], [-1.0, 6.0, -4.5]],
    )
    assert_close_nested(vals(f.log().exp()), vals(f), tol=1e-12)
    assert_close_nested(vals(f.exp().log()), vals(f), tol=1e-12)
    assert_close_nested(
        vals(f.log() + (TaylorPoly.one(backend) / f).log()),
        [[0.0] * 3, [0.0] * 3, [0.0] * 3],
        tol=1e-9,
    )
    assert_close_nested(
        vals((f * g).log()),
        [[1.6094379124341003, 3.2, 1.68],
         [5.4, -3.08, -0.064],
         [-0.18, 5.952, -4.5416]],
        tol=1e-9,
    )


def test_mismatched_shapes_mul_add(backend):
    a = TaylorPoly.var(backend, 0, _lift(backend, 1.0), 5)
    b = TaylorPoly.var(backend, 1, _lift(backend, 1.0), 4)
    ab = a * b
    # (1 + x)(1 + y) = 1 + x + y + xy
    got = [[ab.coefficient([i, j]).to_float() for j in range(2)] for i in range(2)]
    assert_close_nested(got, [[1.0, 1.0], [1.0, 1.0]])
    s = a + b
    got = [[s.coefficient([i, j]).to_float() for j in range(2)] for i in range(2)]
    assert_close_nested(got, [[2.0, 1.0], [1.0, 0.0]])
    # result truncation is the per-axis min of the operand degrees
    # (reference min_degrees_p1, multivariate_taylor.rs:114-127)
    assert s.degrees_p1 == (4, 4)


def test_shift_down(backend):
    # shifting 2 + 3v + v^2 down by 1 yields 5 + v
    t = tp(backend, [2.0, 3.0, 1.0])
    assert_close_nested(vals(t.shift_down(0, 1)), [5.0, 1.0])
    assert_close_nested(vals(t.shift_down(0, 2)), [6.0])


def test_pow(backend):
    t = tp(backend, [1.0, 1.0], degrees=[5])
    p = t.pow(4)
    # (1+x)^4 truncated to degree 4
    assert_close_nested(vals(p), [1.0, 4.0, 6.0, 4.0, 1.0])
    assert_close_nested(vals(t.pow(0)), 1.0)


def test_evaluate_all_one_and_coefficient(backend):
    t = tp(backend, [[1.0, 2.0], [3.0, 4.0]])
    assert t.evaluate_all_one().to_float() == pytest.approx(10.0)
    assert t.coefficient([1, 1]).to_float() == pytest.approx(4.0)
    assert t.coefficient([0, 1]).to_float() == pytest.approx(2.0)


def test_interval_enclosure_properties():
    # interval backend must produce enclosures of the f64 results
    bf = JaxF64Backend()
    bi = JaxIntervalBackend()
    f64 = tp(bf, [[1.0, 2.0], [3.0, 4.0]])
    iv = tp(bi, [[1.0, 2.0], [3.0, 4.0]])
    rf = vals(f64.exp())
    ri = iv.exp()
    nested = ri.to_nested_host()
    for i in range(2):
        for j in range(2):
            lo = nested[i][j].lo.v
            hi = nested[i][j].hi.v
            assert lo <= rf[i][j] <= hi
            assert hi - lo < 1e-10
