"""Accuracy, guard, and routing tests for the ozaki error-free-split
MXU conv (ops/ozaki_conv.py) — the f64-accuracy device path that
replaces the ~95 GF/s XLA f64 emulation for big 2-axis products.

All tests run on the forced-CPU conftest backend (true IEEE f64 host
arithmetic, so the splitting really is error-free here); the on-device
error — where f64 is itself emulated — is measured by ``bench.py
--ozaki`` and recorded in bench-results.json.

Reference capability being beaten: the true-f64 multivariate product of
/root/reference/src/multivariate_taylor.rs:984-1012.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from genfer_tpu.ops.ozaki_conv import (
    OZAKI_MAX_K,
    estimate_bytes,
    ozaki_applicable,
    ozaki_conv2d,
    route_fingerprint,
)
from genfer_tpu.taylor.backend import NumpyF64Backend

HOST = NumpyF64Backend()


def _rel_err(got, want):
    want = np.asarray(want)
    scale = np.maximum(np.abs(want), 1e-300)
    return float(np.max(np.abs(np.asarray(got) - want) / scale))


SHAPES = [
    ((64, 64), (64, 64), (127, 127)),   # full product
    ((64, 64), (64, 64), (64, 64)),     # truncated square
    ((33, 17), (21, 45), (40, 40)),     # ragged
    ((128, 1), (1, 128), (128, 128)),   # outer product
    ((5, 128), (128, 5), (132, 132)),   # thin operands
]


@pytest.mark.parametrize("impl", ["int8", "bf16"])
def test_accuracy_uniform_operands(impl):
    """Corpus-class nonnegative operands: pair_bits=7 (default) must be
    f64-class; the documented pair_bits ladder must hold."""
    rng = np.random.RandomState(7)
    for sa, sb, out in SHAPES:
        a, b = rng.rand(*sa), rng.rand(*sb)
        want = HOST.conv_trunc(a, b, out)
        # tolerances carry ~100x headroom for small-in-column entries
        # (see test_componentwise_cliff_poisson_tail for the contract)
        for pair_bits, tol in [(7, 1e-13), (6, 5e-12), (5, 5e-10)]:
            got = ozaki_conv2d(
                jnp.asarray(a), jnp.asarray(b), out,
                pair_bits=pair_bits, impl=impl,
            )
            assert _rel_err(got, want) < tol, (sa, sb, out, pair_bits)


def test_accuracy_mixed_sign_and_column_scales():
    """Signed operands with 2^±300-spread column scales (products span
    2^±600, still finite): the per-column power-of-two scaling must
    neutralize ACROSS-column dynamic range exactly (scaling by powers
    of two is exact)."""
    rng = np.random.RandomState(3)
    a = rng.randn(96, 48)
    b = rng.randn(96, 48)
    a *= np.exp2(rng.randint(-300, 300, size=48))[None, :]
    b *= np.exp2(rng.randint(-300, 300, size=48))[None, :]
    out = (96, 95)
    want = HOST.conv_trunc(a, b, out)
    got = ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), out)
    # mixed signs cancel: compare entrywise against the column-scale
    # normwise bound, and relatively wherever the output is not tiny
    # against its anti-diagonal's scale
    want_np = np.asarray(want)
    got_np = np.asarray(got)
    norm = np.max(np.abs(want_np), axis=0, keepdims=True)
    norm = np.maximum(norm, np.max(np.abs(want_np)) * 1e-12)
    assert float(np.max(np.abs(got_np - want_np) / norm)) < 1e-12


def _poisson_pmf(lam: float, n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    logfact = np.concatenate([[0.0], np.cumsum(np.log(k[1:]))])
    return np.exp(-lam + k * np.log(lam) - logfact)


def test_componentwise_cliff_poisson_tail():
    """WITHIN-column decay (Poisson-tail corpus columns) is where the
    scheme's NORMWISE contract differs from true f64: the chunk split
    captures the top ~56 bits of each column, so an output entry is
    accurate to ~1e-15 * (colmax_a * colmax_b * k) ABSOLUTE — entries
    far below that product lose relative accuracy, where the reference's
    per-entry f64 dots (multivariate_taylor.rs:984-1012) stay
    componentwise accurate on nonnegative operands.  Pin both sides."""
    n = 128
    a = np.stack([_poisson_pmf(lam, n) for lam in (6.0, 8.0, 11.0)], axis=1)
    b = np.stack([_poisson_pmf(lam, n) for lam in (7.0, 9.0, 13.0)], axis=1)
    out = (2 * n - 1, 5)
    want = np.asarray(HOST.conv_trunc(a, b, out))
    got = np.asarray(ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), out))
    # side 1 (the guarantee): absolute error bounded by the normwise
    # contract — colmax products here are ~2e-2, so ~1e-15 absolute
    scale = np.max(a) * np.max(b) * n
    assert float(np.max(np.abs(got - want))) < 1e-13 * scale
    # in particular every entry carrying real posterior mass (>= 1e-8
    # of the output mass scale) keeps >= ~6 good digits
    mask = want >= 1e-8 * want.max()
    rel = np.abs(got[mask] - want[mask]) / want[mask]
    assert float(rel.max()) < 1e-6
    mask9 = want >= 1e-3 * want.max()
    rel9 = np.abs(got[mask9] - want[mask9]) / want[mask9]
    assert float(rel9.max()) < 1e-11
    # side 2 (the cliff is REAL — documents why deep-tail-sensitive
    # pipelines must keep the emulated-f64 or host path): the committed
    # claim would be wrong if tail entries were componentwise accurate
    tail = (want > 0) & (want < 1e-25 * want.max())
    assert tail.any()
    rel_tail = np.abs(got[tail] - want[tail]) / want[tail]
    assert float(rel_tail.max()) > 1e-4


def test_guard_propagates_nonfinite():
    """Non-finite coefficients must take the IEEE f64 branch (the
    reference's inf/NaR semantics are load-bearing in nested-inference
    normalize factors)."""
    rng = np.random.RandomState(0)
    b = rng.rand(16, 16)
    for poison in (np.inf, -np.inf, np.nan):
        a = rng.rand(16, 16)
        a[3, 5] = poison
        got = np.asarray(ozaki_conv2d(jnp.asarray(a), jnp.asarray(b),
                                      (31, 31)))
        want = np.asarray(HOST.conv_trunc(a, b, (31, 31)))
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], rtol=1e-13)


def test_zero_operands_and_zero_columns():
    rng = np.random.RandomState(1)
    a = np.zeros((32, 32))
    b = rng.rand(32, 32)
    got = np.asarray(ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), (40, 40)))
    assert np.all(got == 0.0)
    a = rng.rand(32, 32)
    a[:, 10:20] = 0.0  # zero columns exercise the all-zero scale branch
    want = HOST.conv_trunc(a, b, (40, 40))
    got = ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), (40, 40))
    assert _rel_err(got, want) < 5e-14


class TestRouting:
    def test_platform_gate_default_off_on_cpu(self, monkeypatch):
        monkeypatch.delenv("GENFER_OZAKI", raising=False)
        assert not ozaki_applicable(
            "float64", (512, 512), (512, 512), (1023, 1023), 1e12
        )

    def test_force_enables_on_cpu(self, monkeypatch):
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        assert ozaki_applicable(
            "float64", (64, 64), (64, 64), (127, 127), 1e6
        )

    def test_disabled(self, monkeypatch):
        monkeypatch.setenv("GENFER_OZAKI", "0")
        assert not ozaki_applicable(
            "float64", (512, 512), (512, 512), (1023, 1023), 1e12
        )

    def test_dtype_and_rank_gates(self, monkeypatch):
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        assert not ozaki_applicable(
            "float32", (64, 64), (64, 64), (127, 127), 1e6
        )
        assert not ozaki_applicable(
            "float64", (64, 64, 2), (64, 64, 2), (127, 127, 3), 1e6
        )

    def test_flops_crossover(self, monkeypatch):
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "1e9")
        assert not ozaki_applicable(
            "float64", (64, 64), (64, 64), (127, 127), 1e8
        )
        assert ozaki_applicable(
            "float64", (64, 64), (64, 64), (127, 127), 2e9
        )

    def test_memory_cap_routing(self, monkeypatch):
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        sa = sb = (640, 640)
        out = (1279, 1279)
        # with the staircases pinned OFF the full-conv 640 estimate
        # (~13 GB) exceeds the cap and routes to the blocked driver —
        # the pre-staircase behavior
        monkeypatch.setenv("GENFER_OZAKI_COLBLOCK", "0")
        monkeypatch.setenv("GENFER_OZAKI_ROWBLOCK", "0")
        assert estimate_bytes(sa, sb, out) > 10e9
        assert not ozaki_applicable("float64", sa, sb, out, 1e12)
        # order 512 is within the direct cap either way
        assert ozaki_applicable(
            "float64", (512, 512), (512, 512), (1023, 1023), 1e12
        )
        nostair = estimate_bytes(sa, sb, (640, 640))
        monkeypatch.delenv("GENFER_OZAKI_COLBLOCK")
        monkeypatch.delenv("GENFER_OZAKI_ROWBLOCK")
        # the default staircases shrink the transient diagonal and f64
        # buffers to one strip x block on TRUNCATED shapes: the 640
        # square fits the direct kernel now
        est = estimate_bytes(sa, sb, (640, 640))
        assert est < 10e9
        assert nostair > 1.5 * est
        assert ozaki_applicable("float64", sa, sb, (640, 640), 1e12)
        # full-conv shapes get NO staircase (both are truncation-scoped
        # — the row variant measured catastrophically slower on the
        # P-pair inner full blocks), so the full 640 estimate stays
        # ~13 GB and routes blocked
        assert estimate_bytes(sa, sb, out) > 10e9
        assert not ozaki_applicable("float64", sa, sb, out, 1e12)

    def test_contraction_cap(self, monkeypatch):
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        monkeypatch.setenv("GENFER_OZAKI_MAX_BYTES", "1e18")
        k = OZAKI_MAX_K + 1
        assert not ozaki_applicable(
            "float64", (k, 2), (k, 2), (k, 3), 1e12
        )

    def test_fingerprint_keys_conv_jit_cache(self, monkeypatch):
        """Toggling the ozaki env between calls must reach a different
        compiled kernel (round-4 lesson: routing baked into an
        lru-cached jit would silently ignore the toggle)."""
        from genfer_tpu.taylor.backend import _conv_jit

        monkeypatch.setenv("GENFER_OZAKI", "0")
        fp_off = route_fingerprint()
        f_off = _conv_jit((48, 48), (48, 48), (95, 95))
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        fp_on = route_fingerprint()
        f_on = _conv_jit((48, 48), (48, 48), (95, 95))
        assert f_off is not f_on
        assert fp_off != fp_on
        # same env again must hit the cache
        assert _conv_jit((48, 48), (48, 48), (95, 95)) is f_on

    def test_routed_end_to_end_backend(self, monkeypatch):
        """JaxF64Backend.conv_trunc with the route forced must stay
        f64-class accurate vs the host backend."""
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        from genfer_tpu.taylor.backend import JaxF64Backend

        be = JaxF64Backend()
        rng = np.random.RandomState(5)
        a, b = rng.rand(80, 80), rng.rand(80, 80)
        out = (120, 120)
        got = np.asarray(
            be.conv_trunc(jnp.asarray(a), jnp.asarray(b), out)
        )
        want = HOST.conv_trunc(a, b, out)
        assert _rel_err(got, want) < 5e-14

    def test_routed_multivariate_embedding(self, monkeypatch):
        """A 4-D tensor with exactly 2 effective axes must squeeze into
        the ozaki kernel and reshape back correctly."""
        monkeypatch.setenv("GENFER_OZAKI", "force")
        monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
        from genfer_tpu.taylor.backend import JaxF64Backend

        be = JaxF64Backend()
        rng = np.random.RandomState(6)
        a = rng.rand(1, 48, 1, 48)
        b = rng.rand(1, 48, 1, 48)
        out = (1, 70, 1, 70)
        got = np.asarray(
            be.conv_trunc(jnp.asarray(a), jnp.asarray(b), out)
        )
        want = HOST.conv_trunc(a, b, out)
        assert _rel_err(got, want) < 5e-14


def test_extreme_column_scales_handled_natively():
    """Column scales anywhere in the f64 range go through the kernel
    (review finding: the old 2^±900 clamp overflowed the int64 chunk
    conversion on the large side — silently wrong sign/magnitude — and
    zeroed everything below 2^-956 on the small side).  The
    exponent-sum undo also covers the mixed case where the individual
    scales sit near the range limits but their product does not."""
    b = np.ones((16, 2))
    for mag in (2.0 ** 950, 2.0 ** -980, 1.0):
        a = np.full((16, 2), mag)
        got = np.asarray(
            ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), (16, 3))
        )
        want = np.asarray(HOST.conv_trunc(a, b, (16, 3)))
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=str(mag))
    # mixed: 2^-980 columns against 2^300 columns — sequential scale
    # application would underflow; the exponent sum must not
    a = np.full((16, 2), 2.0 ** -980)
    b2 = np.full((16, 2), 2.0 ** 300)
    got = np.asarray(ozaki_conv2d(jnp.asarray(a), jnp.asarray(b2), (16, 3)))
    want = np.asarray(HOST.conv_trunc(a, b2, (16, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_bf16_group_fold_contraction_cap():
    """MAX_K_BF16 must stay at 512: the f32 diagonal-group fold's
    partial sums reach 8 * 2^12 * k, exact only to 2^24 (review
    finding: the old 4096 cap admitted 7.5e-12-class rounding).  Also
    pins that ozaki_applicable respects the impl-specific cap."""
    from genfer_tpu.ops.ozaki_conv import MAX_K_BF16

    assert MAX_K_BF16 == 512
    import os

    os.environ["GENFER_OZAKI"] = "force"
    os.environ["GENFER_OZAKI_MIN_FLOPS"] = "0"
    os.environ["GENFER_OZAKI_MAX_BYTES"] = "1e18"
    try:
        os.environ["GENFER_OZAKI_IMPL"] = "bf16"
        assert not ozaki_applicable(
            "float64", (4096, 2), (4096, 2), (4096, 3), 1e12
        )
        os.environ["GENFER_OZAKI_IMPL"] = "int8"
        assert ozaki_applicable(
            "float64", (4096, 2), (4096, 2), (4096, 3), 1e12
        )
    finally:
        for k in ("GENFER_OZAKI", "GENFER_OZAKI_MIN_FLOPS",
                  "GENFER_OZAKI_MAX_BYTES", "GENFER_OZAKI_IMPL"):
            os.environ.pop(k, None)
