"""Staircase-blocked truncated 2-axis conv paths (GENFER_CONV_BLOCK on
the dense XLA kernel, GENFER_OZAKI_COLBLOCK on the ozaki stacked
layout): the blocked kernels must reproduce the unblocked ones — the
dropped slices are Toeplitz-band zeros or truncated-away output
columns (backend._conv_dense_2d_blocked docstring; reference accuracy
contract: multivariate_taylor.rs:984-1012)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genfer_tpu.taylor.backend import (_conv_dense_2d_blocked, _conv_impl,
                                       _conv_jit)

SHAPES = [
    ((60, 47), (52, 61), (55, 50)),
    ((33, 64), (64, 20), (96, 83)),   # c1 > a1 + b1 - 1 on axis 0 strip
    ((64, 64), (64, 64), (64, 64)),   # square truncated (corpus shape)
    ((64, 64), (64, 64), (127, 127)),  # full, no truncation
    ((40, 30), (20, 25), (59, 54)),
    ((16, 5), (3, 40), (10, 12)),     # tiny, c0 < b0
    ((1, 33), (9, 33), (9, 40)),      # degenerate first axis
]


def _rel(got, ref):
    return float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-300))


@pytest.mark.parametrize("blk", [(8, 8), (16, 32), (128, 128), (7, 13)])
def test_dense_blocked_matches_dense(blk, monkeypatch):
    monkeypatch.delenv("GENFER_CONV_BLOCK", raising=False)
    monkeypatch.setenv("GENFER_OZAKI", "0")
    rng = np.random.default_rng(7)
    for sa, sb, out in SHAPES:
        a = jnp.asarray(rng.standard_normal(sa))
        b = jnp.asarray(rng.standard_normal(sb))
        ref = np.asarray(_conv_impl(jnp, a, b, out))
        got = np.asarray(_conv_dense_2d_blocked(jnp, a, b, out, *blk))
        assert _rel(got, ref) < 1e-13, (sa, sb, out, blk)


def test_env_routes_blocked_and_recompiles(monkeypatch):
    """GENFER_CONV_BLOCK reaches _conv_impl through the jit cache
    fingerprint: toggling it between calls must produce fresh (and
    matching) results, not a stale kernel."""
    monkeypatch.setenv("GENFER_OZAKI", "0")
    rng = np.random.default_rng(8)
    a = jnp.asarray(rng.standard_normal((48, 48)))
    b = jnp.asarray(rng.standard_normal((48, 48)))
    out = (48, 48)
    monkeypatch.delenv("GENFER_CONV_BLOCK", raising=False)
    ref = np.asarray(_conv_jit((48, 48), (48, 48), out)(a, b))
    monkeypatch.setenv("GENFER_CONV_BLOCK", "16x16")
    got = np.asarray(_conv_jit((48, 48), (48, 48), out)(a, b))
    assert _rel(got, ref) < 1e-13
    monkeypatch.setenv("GENFER_CONV_BLOCK", "16")  # RxR shorthand
    got2 = np.asarray(_conv_jit((48, 48), (48, 48), out)(a, b))
    assert _rel(got2, ref) < 1e-13


@pytest.mark.parametrize("rb,cb", [(16, 16), (16, 0), (8, 24), (13, 7)])
def test_ozaki_rowcol_staircase_matches_plain(rb, cb, monkeypatch):
    from genfer_tpu.ops.ozaki_conv import ozaki_conv2d

    monkeypatch.setenv("GENFER_OZAKI", "force")
    monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
    rng = np.random.default_rng(12)
    for sa, sb, out in SHAPES:
        a = jnp.asarray(rng.standard_normal(sa))
        b = jnp.asarray(rng.standard_normal(sb))
        monkeypatch.setenv("GENFER_OZAKI_COLBLOCK", "0")
        monkeypatch.setenv("GENFER_OZAKI_ROWBLOCK", "0")
        base = np.asarray(ozaki_conv2d(a, b, out))
        monkeypatch.setenv("GENFER_OZAKI_COLBLOCK", str(cb))
        monkeypatch.setenv("GENFER_OZAKI_ROWBLOCK", str(rb))
        got = np.asarray(ozaki_conv2d(a, b, out))
        assert _rel(got, base) < 1e-13, (sa, sb, out, rb, cb)


@pytest.mark.parametrize("width", [16, 24, 64])
def test_ozaki_colblock_matches_plain(width, monkeypatch):
    from genfer_tpu.ops.ozaki_conv import ozaki_conv2d

    monkeypatch.setenv("GENFER_OZAKI", "force")
    monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
    monkeypatch.delenv("GENFER_OZAKI_COLBLOCK", raising=False)
    rng = np.random.default_rng(9)
    for sa, sb, out in SHAPES:
        a = jnp.asarray(rng.standard_normal(sa))
        b = jnp.asarray(rng.standard_normal(sb))
        monkeypatch.delenv("GENFER_OZAKI_COLBLOCK", raising=False)
        base = np.asarray(ozaki_conv2d(a, b, out))
        monkeypatch.setenv("GENFER_OZAKI_COLBLOCK", str(width))
        got = np.asarray(ozaki_conv2d(a, b, out))
        assert _rel(got, base) < 1e-13, (sa, sb, out, width)
        ref = np.asarray(
            _conv_dense_2d_blocked(jnp, a, b, out, 16, 16)
        )
        assert _rel(got, ref) < 1e-12, (sa, sb, out, width)


def test_ozaki_colblock_extreme_column_scales(monkeypatch):
    """The staircase slices the per-column exponent vectors — the
    exponent-sum undo must still see matched (column, block) slices at
    range-limit scales (the 2^±900 family from the round-5 review)."""
    from genfer_tpu.ops.ozaki_conv import ozaki_conv2d

    monkeypatch.setenv("GENFER_OZAKI", "force")
    monkeypatch.setenv("GENFER_OZAKI_MIN_FLOPS", "0")
    rng = np.random.default_rng(10)
    a = rng.standard_normal((40, 40)) * np.exp2(
        rng.integers(-900, 900, size=(1, 40)).astype(np.float64)
    )
    b = rng.standard_normal((40, 40)) * np.exp2(
        rng.integers(-900, 900, size=(1, 40)).astype(np.float64)
    )
    out = (40, 40)
    base = np.asarray(ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), out))
    monkeypatch.setenv("GENFER_OZAKI_COLBLOCK", "16")
    got = np.asarray(ozaki_conv2d(jnp.asarray(a), jnp.asarray(b), out))
    np.testing.assert_allclose(got, base, rtol=1e-12)
