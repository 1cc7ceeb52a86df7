"""The substitution fast paths against the reference Horner loop.

``TaylorPoly.subst_var`` (reference subst loop, multivariate_taylor.rs:
569-579) has three accelerated forms on the host backends:

* substitute exactly 1 (marginalization): sequential axis sum, bit-
  identical to the Horner accumulation;
* ``alpha + beta*v`` / ``alpha + beta*v*u``: Pascal-triangular matmul
  (tensorpoly._subst_shift_scale);
* any small replacement: the fused native Horner kernel
  (_seriesops.subst_horner), bit-identical on finite inputs.

Each is pinned here against the plain Python Horner loop.
"""

import numpy as np
import pytest

from genfer_tpu.taylor.backend import NumpyF64Backend
from genfer_tpu.taylor.tensorpoly import TaylorPoly


@pytest.fixture(scope="module")
def nb():
    return NumpyF64Backend()


def _horner_ref(p, v, subst):
    fa = TaylorPoly._subst_shift_scale
    fb = TaylorPoly._subst_horner_native
    TaylorPoly._subst_shift_scale = lambda *a, **k: None
    TaylorPoly._subst_horner_native = lambda *a, **k: None
    try:
        return p.subst_var(v, subst)
    finally:
        TaylorPoly._subst_shift_scale = fa
        TaylorPoly._subst_horner_native = fb


SHIFT_CASES = [
    ((9, 7), 0, None),
    ((6, 8), 1, None),
    ((5, 6, 4), 0, None),
    ((5, 6, 4), 2, None),
    ((7, 1, 5), 0, 2),
    ((6, 5, 3), 1, 2),
    ((6, 5, 4), 2, 0),
]


@pytest.mark.parametrize("shape,v,u", SHIFT_CASES)
def test_pascal_shift_scale(nb, shape, v, u):
    rng = np.random.RandomState(hash((shape, v)) % 2**31)
    a = rng.randn(*shape)
    deg = tuple(12 for _ in shape)
    gs = [1] * len(shape)
    gs[v] = 2
    idx = [0] * len(shape)
    idx[v] = 1
    if u is not None:
        gs[u] = 2
        idx[u] = 1
    g = np.zeros(gs)
    g.flat[0] = 0.37
    g[tuple(idx)] = -1.2
    p = TaylorPoly(nb, a, deg)
    s = TaylorPoly(nb, g, deg)
    got = p.subst_var(v, s)
    want = _horner_ref(p, v, s)
    assert got.coeffs.shape == want.coeffs.shape
    np.testing.assert_allclose(got.coeffs, want.coeffs,
                               rtol=1e-10, atol=1e-12)


NATIVE_CASES = [
    ((9, 7), 0, (2, 2), (14, 14)),
    ((6, 8, 5), 1, (2, 1, 2), (14, 14, 14)),
    ((6, 8, 5), 0, (3, 2, 1), (14, 14, 14)),
    ((7, 5), 1, (2, 2), (14, 14)),
    ((12, 1, 9), 2, (1, 1, 3), (14, 14, 14)),
    ((5, 5, 5), 0, (2, 2, 2), (6, 6, 6)),
    ((9, 4), 0, (2, 2), (9, 4)),  # degree-clipped growth
]


@pytest.mark.parametrize("shape,v,gshape,deg", NATIVE_CASES)
def test_native_horner_bit_identical(nb, shape, v, gshape, deg):
    if getattr(nb, "native", None) is None:
        pytest.skip("native kernels not built")
    rng = np.random.RandomState(hash((shape, v, gshape)) % 2**31)
    a = rng.randn(*shape)
    g = rng.randn(*gshape)
    p = TaylorPoly(nb, a, deg)
    s = TaylorPoly(nb, g, deg)
    fa = TaylorPoly._subst_shift_scale
    TaylorPoly._subst_shift_scale = lambda *x, **k: None
    try:
        got = p.subst_var(v, s)
    finally:
        TaylorPoly._subst_shift_scale = fa
    want = _horner_ref(p, v, s)
    assert got.coeffs.shape == want.coeffs.shape
    np.testing.assert_array_equal(got.coeffs, want.coeffs)


def test_subst_one_marginalization(nb):
    """Substituting exactly 1 is the probs/moments marginalization; the
    sequential sum must reproduce the Horner rounding bit for bit."""
    rng = np.random.RandomState(2)
    for shape, v in [((9, 7), 0), ((6, 8, 5), 1), ((13,), 0)]:
        a = rng.randn(*shape)
        deg = tuple(16 for _ in shape)
        p = TaylorPoly(nb, a, deg)
        one = TaylorPoly.from_scalar(nb, nb.scalar_cls.one())
        one = one.extend_to_dim(len(shape), 1)
        got = p.subst_var(v, one)
        want = _horner_ref(p, v, one)
        assert got.coeffs.shape[v] == 1
        np.testing.assert_array_equal(
            got.coeffs.reshape(-1), want.coeffs.reshape(-1)
        )


def test_nonfinite_keeps_python_path(nb):
    """inf/nan inputs must keep the IEEE-faithful Python loop."""
    a = np.ones((4, 3))
    a[2, 1] = np.inf
    g = np.zeros((2, 1))
    g[0, 0] = 0.5
    g[1, 0] = 0.25
    p = TaylorPoly(nb, a, (8, 8))
    s = TaylorPoly(nb, g, (8, 8))
    got = p.subst_var(0, s)
    want = _horner_ref(p, 0, s)
    assert np.array_equal(np.isnan(got.coeffs), np.isnan(want.coeffs))


def test_obs_chain_native_matches_numpy(nb):
    """The C obs_chain kernel (whole observation derivative chain per
    cache-resident row) must reproduce the numpy fused stencil in
    gf/ir.py:_fused_chain_f64 bit for bit (fp-contract is disabled in
    the C loop for exactly this reason)."""
    import genfer_tpu.taylor.backend as B
    from genfer_tpu.gf.ir import Demand, _fused_chain_f64
    from genfer_tpu.numbers.scalar import F64

    if B._SERIESOPS is None or not hasattr(B._SERIESOPS, "obs_chain"):
        pytest.skip("native seriesops unavailable")
    rng = np.random.default_rng(7)
    for trial in range(60):
        nd = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(2, 12)) for _ in range(nd))
        v = int(rng.integers(0, nd))
        arr = rng.standard_normal(shape)
        p = TaylorPoly(nb, arr.copy(), tuple(shape))
        order = int(rng.integers(1, 7))
        d = Demand(tuple(int(rng.integers(1, 10)) for _ in range(nd)))
        lam = F64(float(rng.standard_normal()))
        c = F64(float(rng.standard_normal()))
        discrete = bool(rng.integers(0, 2))
        csub = c if discrete else None
        r_nat = _fused_chain_f64(nb, p, v, lam, csub, order, d, discrete)
        saved = B._SERIESOPS
        B._SERIESOPS = None
        try:
            r_np = _fused_chain_f64(nb, p, v, lam, csub, order, d, discrete)
        finally:
            B._SERIESOPS = saved
        assert (r_nat is None) == (r_np is None)
        if r_nat is None:
            continue
        assert r_nat.degrees_p1 == r_np.degrees_p1
        assert r_nat.coeffs.shape == r_np.coeffs.shape
        np.testing.assert_array_equal(r_nat.coeffs, r_np.coeffs)
