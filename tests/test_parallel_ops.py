"""Tests for the device-mesh sharding layer, the Pallas kernel (interpret
mode) and the driver entry points, on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_sharded_conv_1d():
    import jax.numpy as jnp

    from genfer_tpu.parallel.mesh import make_mesh, sharded_conv_1d

    mesh = make_mesh(8)
    a = np.random.RandomState(0).rand(100)
    b = np.random.RandomState(1).rand(80)
    out = sharded_conv_1d(mesh, jnp.asarray(a), jnp.asarray(b), 128)
    ref = np.convolve(a, b)
    ref = np.pad(ref, (0, 128 - min(128, len(ref))))[:128]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12)


def test_sharded_conv_2d():
    import jax.numpy as jnp
    from scipy.signal import convolve2d

    from genfer_tpu.parallel.mesh import make_mesh, sharded_conv_2d

    mesh = make_mesh(8)
    a = np.random.RandomState(0).rand(30, 20)
    b = np.random.RandomState(1).rand(35, 20)
    out = sharded_conv_2d(mesh, jnp.asarray(a), jnp.asarray(b), (64, 39))
    full = convolve2d(a, b)
    ref = np.zeros((64, 39))
    ref[: full.shape[0], : full.shape[1]] = full
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-11, atol=1e-12)


def test_sharded_inference_step():
    import jax.numpy as jnp

    from genfer_tpu.parallel.mesh import make_mesh, sharded_inference_step

    mesh = make_mesh(8)
    batch = 4
    a = np.random.RandomState(0).rand(batch, 8, 8)
    b = np.random.RandomState(1).rand(batch, 8, 8)
    prod, totals = sharded_inference_step(
        mesh, jnp.asarray(a), jnp.asarray(b), (16, 15)
    )
    from scipy.signal import convolve2d

    for i in range(batch):
        full = convolve2d(a[i], b[i])
        ref = np.zeros((16, 15))
        ref[: full.shape[0], : full.shape[1]] = full
        np.testing.assert_allclose(np.asarray(prod[i]), ref, rtol=1e-11)
        np.testing.assert_allclose(float(totals[i]), ref.sum(), rtol=1e-11)


def test_pallas_conv_interpret():
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv import conv1d_pallas

    a = np.random.RandomState(0).rand(100).astype(np.float32)
    b = np.random.RandomState(1).rand(37).astype(np.float32)
    out = np.asarray(
        conv1d_pallas(jnp.asarray(a), jnp.asarray(b), 120, interpret=True)
    )
    ref = np.convolve(a.astype(np.float64), b.astype(np.float64))
    ref = np.pad(ref, (0, max(0, 120 - len(ref))))[:120]
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-6)


def test_graft_entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    import jax

    fn, args = g.entry()
    quot, total = jax.jit(fn)(*args)
    assert quot.shape == (64, 64)
    assert np.isfinite(float(total))


def test_graft_dryrun_multichip():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_dryrun_multichip_cold_subprocess():
    """Run dryrun_multichip exactly as the driver does: a fresh process with
    NO conftest env inheritance (no XLA_FLAGS, no jax_platforms override), so
    the entry must self-provision the virtual 8-device CPU mesh."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "GENFER_CHECK")
    }
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_native_seriesops():
    seriesops = pytest.importorskip("genfer_tpu._seriesops")
    a = np.random.RandomState(0).rand(64)
    b = np.random.RandomState(1).rand(64)
    out = np.zeros(64)
    seriesops.conv_trunc(a, a.shape, b, b.shape, out, out.shape)
    ref = np.convolve(a, b)[:64]
    np.testing.assert_allclose(out, ref, rtol=1e-13)
