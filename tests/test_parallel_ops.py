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


def test_sharded_conv_nd_3d():
    import jax.numpy as jnp
    from scipy.signal import convolve

    from genfer_tpu.parallel.mesh import make_mesh, sharded_conv_nd

    mesh = make_mesh(8)
    a = np.random.RandomState(0).rand(16, 6, 5)
    b = np.random.RandomState(1).rand(12, 7, 4)
    out_shape = (20, 9, 6)
    out = sharded_conv_nd(mesh, jnp.asarray(a), jnp.asarray(b), out_shape)
    full = convolve(a, b)
    ref = full[: out_shape[0], : out_shape[1], : out_shape[2]]
    ref = np.pad(ref, [(0, o - s) for s, o in zip(ref.shape, out_shape)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-11, atol=1e-12)


def test_sharded_div_lanes():
    import jax.numpy as jnp

    from genfer_tpu.parallel.mesh import make_mesh, sharded_div_lanes
    from genfer_tpu.taylor.backend import NumpyF64Backend

    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    xs = rng.rand(24, 17, 3)
    ys = np.zeros((24, 1, 1))
    ys[:, 0, 0] = rng.rand(24) + 0.5
    out_shape = (24, 17, 3)
    out = sharded_div_lanes(
        mesh, jnp.asarray(xs), jnp.asarray(ys), out_shape, 0
    )
    ref = NumpyF64Backend().poly_div(xs, ys, out_shape)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10, atol=1e-12)


def test_sharded_backend_full_inference():
    """A complete 3-variable inference through --backend sharded on the
    8-device mesh must match the host backend (SURVEY §2.9 end-to-end)."""
    import io
    from contextlib import redirect_stdout

    import tempfile, os

    from genfer_tpu.cli import main as cli_main
    from genfer_tpu.tools.generators import generate_population

    src = generate_population(None, 12, 3)
    with tempfile.NamedTemporaryFile("w", suffix=".sgcl", delete=False) as f:
        f.write(src)
        path = f.name
    try:
        outs = {}
        for backend in ("sharded", "numpy"):
            buf = io.StringIO()
            with redirect_stdout(buf):
                cli_main([path, "--no-timing", "--backend", backend])
            outs[backend] = buf.getvalue()
    finally:
        os.unlink(path)
    sh = [l for l in outs["sharded"].splitlines() if "=" in l]
    np_ = [l for l in outs["numpy"].splitlines() if "=" in l]
    assert len(sh) == len(np_) and len(sh) > 5
    for a, b in zip(sh, np_):
        ta = a.split("=")[-1].strip()
        tb = b.split("=")[-1].strip()
        try:
            fa, fb = float(ta), float(tb)
            assert abs(fa - fb) <= max(1e-9 * max(abs(fa), abs(fb)), 1e-8), (
                a,
                b,
            )
        except ValueError:
            assert a == b, (a, b)


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW_TESTS"),
    reason="slow golden (set RUN_SLOW_TESTS=1)",
)
def test_sharded_population_50_3vars_golden():
    """Full population_50_3vars inference on the 8-device mesh matches its
    golden .expect (VERDICT round-1 item 3)."""
    from pathlib import Path

    from tests.test_golden import (
        _first_line_flags,
        compare_outputs,
        run_cli,
    )

    sgcl = Path("/root/reference/test/expect/slow/population_50_3vars.sgcl")
    if not sgcl.exists():
        pytest.skip("reference corpus not mounted")
    flags = _first_line_flags(sgcl) or []
    expected = sgcl.with_suffix(".expect").read_text(encoding="utf-8")
    ours = run_cli(sgcl, flags + ["--backend", "sharded"])
    compare_outputs(ours, expected, sgcl.name)


def test_sharded_newton_exp_log_div_3var():
    """Multivariate exp/log/div shard over the mesh through the
    Newton-lifted conv formulation (VERDICT round-2 item 5): the heavy
    iterations of a 3-var exp tower run as sharded_conv_nd psums, and
    the results match the host recurrence."""
    from genfer_tpu.parallel import mesh as M
    from genfer_tpu.taylor.backend import NumpyF64Backend

    m = M.make_mesh(8)
    sb = M.ShardedF64Backend(m, conv_shard_flops=100_000)
    nb = NumpyF64Backend()

    calls = {"n": 0}
    orig = M.sharded_conv_nd

    def counting(mesh, a, b, out_shape):
        calls["n"] += 1
        return orig(mesh, a, b, out_shape)

    M.sharded_conv_nd = counting
    try:
        rng = np.random.RandomState(5)
        shape = (16, 16, 16)
        xs = rng.randn(*shape) * 0.15
        got = np.asarray(sb.poly_exp(sb.jnp.asarray(xs), shape))
        want = nb.poly_exp(xs, shape)
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)
        assert calls["n"] > 0, "exp tower never reached the sharded conv"

        xl = np.abs(rng.randn(*shape)) * 0.1
        xl[0, 0, 0] = 1.5
        got = np.asarray(sb.poly_log(sb.jnp.asarray(xl), shape))
        want = nb.poly_log(xl, shape)
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)

        # quotient coefficients reach ~1e12: compare relatively
        ys = rng.randn(*shape)
        ys[0, 0, 0] = 2.0
        xd = rng.randn(*shape)
        got = np.asarray(
            sb.poly_div(sb.jnp.asarray(xd), sb.jnp.asarray(ys), shape)
        )
        want = nb.poly_div(xd, ys, shape)
        np.testing.assert_allclose(got, want, rtol=1e-7)
    finally:
        M.sharded_conv_nd = orig


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


def test_pallas_conv2d_interpret():
    """The fused MXU 2-D kernel against the host C++/generic conv on
    assorted ragged shapes (reference mul: multivariate_taylor.rs
    984-1012)."""
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv2d import conv2d_pallas
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    rng = np.random.RandomState(7)
    for sa, sb, out in [
        ((5, 7), (4, 6), (8, 12)),
        ((130, 140), (120, 100), (130, 140)),
        ((100, 120), (130, 140), (130, 140)),
        ((1, 130), (130, 1), (130, 130)),
    ]:
        a = rng.rand(*sa)
        b = rng.rand(*sb)
        want = nb.conv_trunc(a, b, out)
        got = np.asarray(
            conv2d_pallas(jnp.asarray(a), jnp.asarray(b), out,
                          interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)


def test_pallas_conv2d_batched_interpret():
    """The batched-LHS MXU kernel: every batch element must equal the
    single-pair kernel / host conv."""
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv2d import conv2d_pallas_batched
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    rng = np.random.RandomState(11)
    for nbatch, sa, sb, out in [
        (3, (5, 7), (4, 6), (8, 12)),
        (4, (70, 80), (60, 50), (70, 80)),
        (2, (1, 130), (130, 1), (130, 130)),
    ]:
        a = rng.rand(nbatch, *sa)
        b = rng.rand(*sb)
        got = np.asarray(
            conv2d_pallas_batched(jnp.asarray(a), jnp.asarray(b), out,
                                  interpret=True)
        )
        for g in range(nbatch):
            want = nb.conv_trunc(a[g], b, out)
            np.testing.assert_allclose(got[g], want, rtol=5e-5, atol=1e-6)


def test_pallas_conv2d_rowstrip_interpret():
    """The row-strip kernel must be bit-identical to the (128,128)-tile
    kernel (same per-tile MXU pass order) and match the host conv."""
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv2d import (conv2d_pallas_rowstrip,
                                              conv2d_pallas_tile)
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    rng = np.random.RandomState(13)
    for sa, sb, out in [
        ((5, 7), (4, 6), (8, 12)),
        ((70, 80), (60, 50), (70, 80)),
        ((200, 300), (150, 100), (280, 380)),
    ]:
        a, b = rng.rand(*sa), rng.rand(*sb)
        got = np.asarray(
            conv2d_pallas_rowstrip(jnp.asarray(a), jnp.asarray(b), out,
                                   interpret=True)
        )
        tile = np.asarray(
            conv2d_pallas_tile(jnp.asarray(a), jnp.asarray(b), out,
                               interpret=True)
        )
        np.testing.assert_array_equal(got, tile)
        want = nb.conv_trunc(a, b, out)
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-6)


def test_pallas_conv2d_batched_swapped_operands():
    """The transposed serving layout (one shared LHS, batch of RHS) is
    the batched kernel with operands swapped at the call site (the
    product is commutative; the dedicated shared-LHS kernel and the
    swap wrapper were both removed after benching dead-even)."""
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv2d import conv2d_pallas_batched
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    rng = np.random.RandomState(12)
    for nbatch, sa, sb, out in [
        (3, (5, 7), (4, 6), (8, 12)),
        (4, (70, 80), (60, 50), (70, 80)),
        (2, (130, 1), (1, 130), (130, 130)),
    ]:
        a = rng.rand(*sa)
        b = rng.rand(nbatch, *sb)
        got = np.asarray(
            conv2d_pallas_batched(jnp.asarray(b), jnp.asarray(a), out,
                                  interpret=True)
        )
        for g in range(nbatch):
            want = nb.conv_trunc(a, b[g], out)
            np.testing.assert_allclose(got[g], want, rtol=5e-5, atol=1e-6)


def test_pallas_backend_interpret():
    """--backend pallas end to end (interpret mode): the backend keeps
    f64 host semantics and only the offloaded products are f32."""
    from jax.experimental.pallas import tpu as pltpu

    from genfer_tpu.taylor.backend import NumpyF64Backend, PallasBackend

    pb = PallasBackend()
    pb.PALLAS_OFFLOAD_FLOPS = 1  # force the pallas path
    nb = NumpyF64Backend()
    rng = np.random.RandomState(3)
    a = rng.rand(40, 30)
    b = rng.rand(35, 25)
    want = nb.conv_trunc(a, b, (60, 50))
    with pltpu.force_tpu_interpret_mode():
        got = pb.conv_trunc(a, b, (60, 50))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=1e-7)
    # below the threshold: exact f64 host path
    pb.PALLAS_OFFLOAD_FLOPS = 10**18
    np.testing.assert_array_equal(pb.conv_trunc(a, b, (60, 50)), want)


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
        timeout=1200,
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


def test_halo_conv_2d_memory_scaled():
    """Operand-storage-sharded systolic conv (VERDICT round-2 item 4):
    matches the dense kernel exactly and compiles to ~1/tp the dense
    path's temp memory."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from genfer_tpu.parallel.mesh import halo_conv_2d, make_mesh
    from genfer_tpu.taylor.backend import JaxF64Backend

    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(0)
    n = 256
    a = jnp.asarray(rng.random((n, n)))
    b = jnp.asarray(rng.random((n, n)))
    dense = JaxF64Backend().conv_trunc(a, b, (n, n))
    halo = halo_conv_2d(mesh, a, b, (n, n))
    np.testing.assert_allclose(
        np.asarray(halo), np.asarray(dense), rtol=1e-12
    )
    ma = (
        jax.jit(lambda a, b: halo_conv_2d(mesh, a, b, (n, n)))
        .lower(a, b).compile().memory_analysis()
    )
    mb = (
        jax.jit(lambda a, b: JaxF64Backend().conv_trunc(a, b, (n, n)))
        .lower(a, b).compile().memory_analysis()
    )
    ratio = mb.temp_size_in_bytes / max(ma.temp_size_in_bytes, 1)
    assert ratio >= 4.0, f"halo temp memory only {ratio:.1f}x smaller"

def test_halo_conv_nd():
    """The systolic operand-sharded kernel generalized to n-D: trailing
    axes are truncated inside the local conv; 3- and 4-D cases match
    the host kernel at f64 roundoff."""
    import numpy as np

    from genfer_tpu.parallel.mesh import halo_conv_nd, make_mesh
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    mesh = make_mesh(8, dp=1)
    rng = np.random.RandomState(3)
    for sa, sb, out in [
        ((64, 20, 12), (64, 16, 10), (64, 24, 16)),
        ((32, 10, 6, 5), (32, 8, 6, 4), (32, 12, 8, 6)),
    ]:
        a = rng.rand(*sa)
        b = rng.rand(*sb)
        want = nb.conv_trunc(a, b, out)
        got = np.asarray(halo_conv_nd(mesh, a, b, out))
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_halo_conv_col_chunked():
    """The in-kernel P-pair column decomposition (blocked_conv routed
    through the mesh): exact at every chunk width, and per-device temp
    memory bounded by the chunk instead of the order (beyond-HBM
    scaling; SURVEY 2.9 / aux order-scaling rows)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from genfer_tpu.parallel.mesh import halo_conv_nd, make_mesh
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    mesh = make_mesh(8, dp=1)
    rng = np.random.RandomState(9)
    n = 128
    a = rng.rand(n, n)
    b = rng.rand(n, n)
    want = nb.conv_trunc(a, b, (n, n))
    for cc in (32, 48):
        got = np.asarray(halo_conv_nd(mesh, a, b, (n, n), col_chunk=cc))
        np.testing.assert_allclose(got, want, rtol=1e-12)
    n = 512
    aj = jnp.asarray(rng.rand(n, n))
    bj = jnp.asarray(rng.rand(n, n))
    mfull = (jax.jit(lambda a, b: halo_conv_nd(mesh, a, b, (n, n)))
             .lower(aj, bj).compile().memory_analysis())
    mchunk = (jax.jit(lambda a, b: halo_conv_nd(mesh, a, b, (n, n),
                                                col_chunk=64))
              .lower(aj, bj).compile().memory_analysis())
    ratio = mfull.temp_size_in_bytes / max(mchunk.temp_size_in_bytes, 1)
    assert ratio >= 4.0, f"chunked temp only {ratio:.1f}x smaller"


def test_sharded_backend_halo_nd_route():
    """ShardedF64Backend routes big >=3-D convs through the memory-
    scaled halo kernel (rows >= halo_min_rows) and stays exact."""
    import numpy as np

    from genfer_tpu.parallel.mesh import ShardedF64Backend, make_mesh
    from genfer_tpu.taylor.backend import NumpyF64Backend

    nb = NumpyF64Backend()
    mesh = make_mesh(8, dp=1)
    sb = ShardedF64Backend(
        mesh=mesh, min_rows_per_device=1, halo_min_rows=32
    )
    sb.conv_shard_flops = 1  # force the sharded paths
    rng = np.random.RandomState(5)
    a = rng.rand(48, 14, 10)
    b = rng.rand(40, 12, 8)
    out = (48, 16, 12)
    want = nb.conv_trunc(a, b, out)
    got = np.asarray(sb.conv_trunc(a, b, out))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sharded_backend_halo_route():
    """ShardedF64Backend routes big 2-axis convs through the halo
    kernel (halo_min_rows lowered for the tiny test shapes)."""
    import jax.numpy as jnp
    import numpy as np

    from genfer_tpu.parallel.mesh import ShardedF64Backend, make_mesh
    from genfer_tpu.taylor.backend import NumpyF64Backend

    mesh = make_mesh(8, dp=1)
    be = ShardedF64Backend(mesh, halo_min_rows=32)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((40, 7)))
    b = jnp.asarray(rng.random((33, 7)))
    got = np.asarray(be.conv_trunc(a, b, (40, 13)))
    ref = np.asarray(NumpyF64Backend().conv_trunc(
        np.asarray(a), np.asarray(b), (40, 13)
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_blocked_conv_matches_direct():
    """P-block decomposition (ops/blocked_conv) == direct conv, incl.
    chunked dispatch and the last-chunk mask path."""
    import jax.numpy as jnp
    import numpy as np

    from genfer_tpu.ops.blocked_conv import conv2d_blocked, spot_check
    from genfer_tpu.taylor.backend import JaxF64Backend

    be = JaxF64Backend()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((100, 90)))
    b = jnp.asarray(rng.random((80, 100)))
    ref = np.asarray(be.conv_trunc(a, b, (100, 100)))
    P = 32
    inner = lambda x, y: be.conv_trunc(x, y, (2 * P - 1, 2 * P - 1))
    got = np.asarray(
        conv2d_blocked(a, b, (100, 100), P, inner, group=7)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    assert spot_check(a, b, got, 16) < 1e-12


def test_scanc_run_batch_dp_sharded():
    """Scan-compiled serving with the batch dimension sharded over the
    mesh's dp axis (run_batch(mesh=...)): per-device batch slices,
    bitwise-class parity with the unsharded dispatch, and a clear error
    on a non-divisible batch.  The reference serves one dataset per
    process on one core (main.rs:96-143)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan_program

    n_obs = 6
    src = "X ~ Poisson(4);\n" + "".join(
        f"observe {c} ~ Poisson(1/2 * X);\n"
        for c in [1, 2, 0, 3, 1, 2]
    ) + "return X"
    obj, (_, _z) = compile_scan_program(
        parse_program(src), order=64, max_steps=n_obs, device="cpu"
    )
    ndev = len(jax.devices())
    assert ndev == 8  # conftest provisions the virtual mesh
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    rng = np.random.default_rng(3)
    B = 2 * ndev
    bc = rng.integers(0, 5, size=(B, n_obs)).astype(np.float64)
    m_ref, t_ref = obj.run_batch([bc])
    m_sh, t_sh = obj.run_batch([bc], mesh=mesh)
    np.testing.assert_allclose(m_sh, m_ref, rtol=1e-12)
    np.testing.assert_allclose(t_sh, t_ref, rtol=1e-12)
    probe = jax.device_put(
        jnp.asarray(bc), NamedSharding(mesh, PartitionSpec("dp", None))
    )
    assert len({s.device for s in probe.addressable_shards}) == ndev
    with pytest.raises(ValueError, match="not divisible"):
        obj.run_batch([bc[: ndev + 1]], mesh=mesh)
