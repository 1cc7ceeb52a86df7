"""Benchmark driver.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric (BASELINE.json north star): throughput of the truncated
Taylor-convolution kernel at order 256 (the hot op of every genfer
inference run, reference multivariate_taylor.rs:984-1012) in effective
GFLOP/s on the available accelerator.

``vs_baseline`` is the measured speedup over this repo's native C++ host
kernel (genfer_tpu/_seriesops, the same nested scalar loops the reference's
Rust engine runs) on the identical shape.  No Rust toolchain exists in this
image and the reference repo commits no wall-clock numbers
(bench-results.json is not in the snapshot), so the native host kernel is
the honest reproducible denominator.

Extra modes (results to stderr + bench-results.json):
  --suite    end-to-end wall-clock on the neurips2023 exact suite,
             mirroring the reference protocol (reference
             benchmarks/neurips2023/exact/bench.py:108-134): fp mode and
             --rational mode per model, correctness checked against
             ``<name>.expected`` (output must contain an expected string).
  --scaling  end-to-end order-scaling run on a generated 2-var population
             model per backend (hybrid offload vs numpy host).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def flops_conv_trunc(a_shape, out_shape):
    """2 flops (mul+add) per contributing (i, j) pair of the truncated
    Cauchy product with both operands of shape a_shape truncated to
    out_shape: sum over k of #{(i,j): i+j=k} = prod_d s_d*(s_d+1)/2 for
    square same-shape operands."""
    total_pairs = 1
    for s, o in zip(a_shape, out_shape):
        # pairs along this axis for full (untruncated) product
        total_pairs *= s * (s + 1) // 2 if o >= 2 * s - 1 else _pairs(s, o)
    return 2 * total_pairs


def _pairs(s, o):
    count = 0
    for k in range(o):
        lo = max(0, k + 1 - s)
        hi = min(k + 1, s)
        count += max(0, hi - lo)
    return count


def bench_kernel(order=256, ndim=1, dtype="float64", iters=8):
    """On-device scan-amortized measurement.

    Two measurement hazards in this environment, both hit in round 1:
    * ``block_until_ready`` through the remote TPU tunnel returns before
      execution completes, so per-call timing of dispatched ops measures
      dispatch only — we force materialization with np.asarray instead;
    * the terminal caches compiles persistently, so inputs are seeded
      from os.urandom and iterations are serialized *on device* inside
      one jitted lax.scan (each step consumes the previous output).
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    from genfer_tpu.taylor.backend import _conv_impl

    shape = (order,) * ndim

    def step(carry, _):
        a, b = carry
        out = _conv_impl(jnp, a, b, shape)
        out = out / jnp.max(jnp.abs(out))  # keep magnitudes bounded
        return (out, a), jnp.sum(out)

    @jax.jit
    def run(a, b):
        (_, _), sums = jax.lax.scan(step, (a, b), None, length=iters)
        return sums

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    a = jnp.asarray(rng.rand(*shape), dtype=dtype)
    b = jnp.asarray(rng.rand(*shape), dtype=dtype)
    np.asarray(run(a, b))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(a, b))
    wall = time.perf_counter() - t0
    dt = wall / iters  # includes 1/iters of the tunnel roundtrip
    flops = flops_conv_trunc(shape, shape)
    return flops / dt / 1e9, dt


def bench_host_kernel(order=256, ndim=1, iters=3):
    """The same truncated conv on the native C++ host kernel
    (genfer_tpu/_seriesops) — the measured reference-class baseline."""
    import numpy as np

    try:
        from genfer_tpu import _seriesops
    except ImportError:
        return None, None
    shape = (order,) * ndim
    rng = np.random.RandomState(0)
    a = rng.rand(*shape)
    b = rng.rand(*shape)
    out = np.zeros(shape)
    # warm-up
    _seriesops.conv_trunc(a, shape, b, shape, out, shape)
    t0 = time.perf_counter()
    for _ in range(iters):
        out.fill(0.0)
        _seriesops.conv_trunc(a, shape, b, shape, out, shape)
    dt = (time.perf_counter() - t0) / iters
    flops = flops_conv_trunc(shape, shape)
    return flops / dt / 1e9, dt


def bench_suite(num_runs=1):
    """End-to-end wall-clock on the neurips2023 exact suite.  Mirrors the
    reference protocol: fp on ``<name>.sgcl``, rational on
    ``<name>.rational.sgcl`` when present (else the same file), no extra
    flags (the ``.expected`` oracle greps probability/posterior lines from
    the full output).  Returns {model: {mode: seconds | error label}}."""
    import io
    import os
    from contextlib import redirect_stdout
    from pathlib import Path

    ref = Path(os.environ.get("GENFER_REFERENCE", "/root/reference"))
    suite = ref / "benchmarks" / "neurips2023" / "exact"
    if not suite.exists():
        return None
    from genfer_tpu.cli import main as cli_main

    # Models on which the *reference itself* fails in a mode: parity, not a
    # regression.  clinicalTrial fp: f64 rounding pushes a probability
    # outside [0, 1] and the reference panics "p(i) = ... is not a
    # probability" (reference src/main.rs:430-433).
    expected_failures = {
        ("clinicalTrial", "fp"): "is not a probability",
    }

    def run_one(path, flags):
        best = None
        err = None
        for _ in range(num_runs):
            t0 = time.perf_counter()
            buf = io.StringIO()
            try:
                with redirect_stdout(buf):
                    cli_main([str(path), "--no-timing"] + flags)
            except Exception as e:  # noqa: BLE001 - report any failure
                return None, f"crashed: {e}"
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            expected_file = path.parent / (path.parent.name + ".expected")
            if expected_file.exists():
                expected = [
                    e
                    for e in expected_file.read_text().splitlines()
                    if e.strip()
                ]
                out = buf.getvalue()
                if not any(e in out for e in expected):
                    err = "wrong result"
        return best, err

    results = {}
    total = 0.0
    n = 0
    for model_dir in sorted(p for p in suite.iterdir() if p.is_dir()):
        name = model_dir.name
        fp = model_dir / f"{name}.sgcl"
        if not fp.exists():
            continue
        results[name] = {}
        for mode, path, flags in (
            ("fp", fp, []),
            (
                "rational",
                (model_dir / f"{name}.rational.sgcl")
                if (model_dir / f"{name}.rational.sgcl").exists()
                else fp,
                ["--rational"],
            ),
        ):
            dt, err = run_one(path, flags)
            if dt is None and (name, mode) in expected_failures:
                msg = "expected failure (parity: reference also panics here)"
                results[name][mode] = msg
            elif err:
                msg = f"{dt:.3f}s ({err})"
                results[name][mode] = msg
            elif dt is None:
                msg = "crashed"
                results[name][mode] = msg
            else:
                msg = f"{dt:.3f}s"
                results[name][mode] = round(dt, 4)
                if mode == "fp":
                    total += dt
                    n += 1
            print(f"  {name} [{mode}]: {msg}", file=sys.stderr)
    print(f"suite total ({n} fp models passing): {total:.3f}s", file=sys.stderr)
    return results


def bench_order_scaling(limit=256, backends=("hybrid", "numpy")):
    """End-to-end inference on a 2-variable population model at high
    truncation order (the BASELINE.json north-star configuration), per
    backend.  The numpy backend is the host/CPU-class baseline (same
    asymptotics as the reference's native engine, C++ kernels); hybrid
    offloads the large Cauchy products to the accelerator."""
    import io
    from contextlib import redirect_stdout

    from genfer_tpu.tools.generators import generate_population

    src = generate_population(None, 200, 2)
    from genfer_tpu.cli import main as cli_main
    import tempfile
    import os

    with tempfile.NamedTemporaryFile("w", suffix=".sgcl", delete=False) as f:
        f.write(src)
        path = f.name
    results = {}
    try:
        for backend in backends:
            t0 = time.perf_counter()
            try:
                with redirect_stdout(io.StringIO()):
                    cli_main([
                        path, "--no-timing", "--limit", str(limit),
                        "--backend", backend,
                    ])
                results[backend] = round(time.perf_counter() - t0, 3)
                print(
                    f"  order-scaling limit={limit} [{backend}]: "
                    f"{results[backend]:.2f}s",
                    file=sys.stderr,
                )
            except Exception as e:  # noqa: BLE001
                results[backend] = f"FAILED {e}"
                print(f"  order-scaling [{backend}]: FAILED {e}",
                      file=sys.stderr)
    finally:
        os.unlink(path)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=256)
    ap.add_argument("--ndim", type=int, default=2)
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    gflops, dt = bench_kernel(order=args.order, ndim=args.ndim)
    print(
        f"conv_trunc order={args.order} ndim={args.ndim}: {dt*1e3:.3f} ms, "
        f"{gflops:.2f} GFLOP/s",
        file=sys.stderr,
    )
    host_gflops, host_dt = bench_host_kernel(order=args.order, ndim=args.ndim)
    if host_gflops is not None:
        print(
            f"conv_trunc host (native C++): {host_dt*1e3:.3f} ms, "
            f"{host_gflops:.2f} GFLOP/s",
            file=sys.stderr,
        )
    extra = {}
    if args.suite:
        extra["suite"] = bench_suite()
    if args.scaling:
        extra["scaling"] = bench_order_scaling()
    if extra:
        import pathlib

        out = {
            "kernel_gflops": round(gflops, 3),
            "host_kernel_gflops": (
                round(host_gflops, 3) if host_gflops is not None else None
            ),
            **extra,
        }
        pathlib.Path("bench-results.json").write_text(
            json.dumps(out, indent=2) + "\n"
        )
        print("wrote bench-results.json", file=sys.stderr)
    vs = gflops / host_gflops if host_gflops else gflops
    print(
        json.dumps(
            {
                "metric": f"taylor-conv GFLOP/s @order {args.order} "
                f"({args.ndim}-var, f64; baseline = native C++ host kernel)",
                "value": round(gflops, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
