"""Ozaki kernel device diagnostic: the A/B axes bench.py --ozaki does
not sweep — chunk pipeline (int bit-slicing vs the float
round/div/sub chain, which degrades on the device's emulated f64) and
the diagonal-stacked einsum layout (GENFER_OZAKI_STACK, committed
de248d1 without a device measurement).  Run this FIRST when the tunnel
returns, then `python bench.py --all` for the artifact.

Also runs the @256 Pallas floor decomposition (VERDICT r4 item 4): the
rowstrip kernel timed at HIGHEST (6 bf16 passes) vs DEFAULT (1 pass)
precision — identical scheduling, slab staging, window rolls and loop
structure, only the per-dot MXU pass count differs, so
``t_mxu ≈ (t_HIGHEST - t_DEFAULT) * 6/5`` and the remainder is the
launch/scheduling floor the docstring analysis attributes the @256 gap
to.

Writes one JSON line per row to stderr progress + a summary JSON to
stdout; bounded: every device program is a 6-iter scan well under the
~10 s watchdog.
"""

import json
import sys
import time

import numpy as np


def main(orders=(512, 256), iters=6, smoke=False):
    import jax

    if smoke:  # plumbing check on a dead tunnel: force the CPU backend
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, ".")
    from bench import _env_patch, flops_conv_trunc

    from genfer_tpu.ops.blocked_conv import spot_check
    from genfer_tpu.taylor.backend import _conv_impl

    force = {"GENFER_OZAKI": "force", "GENFER_OZAKI_MIN_FLOPS": "0",
             "GENFER_OZAKI_IMPL": "int8", "GENFER_OZAKI_PAIR_BITS": "7"}
    variants = [
        # COLBLOCK now defaults to 128 — pin it off on the plain rows
        # so the stack/chunk axes stay isolated
        ("int_stack", {"GENFER_OZAKI_CHUNK": "int",
                       "GENFER_OZAKI_STACK": "1",
                       "GENFER_OZAKI_COLBLOCK": "0"}),
        ("int_nostack", {"GENFER_OZAKI_CHUNK": "int",
                         "GENFER_OZAKI_STACK": "0",
                         "GENFER_OZAKI_COLBLOCK": "0"}),
        ("float_stack", {"GENFER_OZAKI_CHUNK": "float",
                         "GENFER_OZAKI_STACK": "1",
                         "GENFER_OZAKI_COLBLOCK": "0"}),
        # truncation staircases (new, unmeasured): the a1-column block
        # on the ozaki stacked layout, and row+col blocking on the
        # dense f64 emulation path
        ("int_stack_cb128", {"GENFER_OZAKI_CHUNK": "int",
                             "GENFER_OZAKI_STACK": "1",
                             "GENFER_OZAKI_COLBLOCK": "128"}),
        ("int_stack_cb256", {"GENFER_OZAKI_CHUNK": "int",
                             "GENFER_OZAKI_STACK": "1",
                             "GENFER_OZAKI_COLBLOCK": "256"}),
        ("int_stack_cb128_rb128", {"GENFER_OZAKI_CHUNK": "int",
                                   "GENFER_OZAKI_STACK": "1",
                                   "GENFER_OZAKI_COLBLOCK": "128",
                                   "GENFER_OZAKI_ROWBLOCK": "128"}),
        ("int_stack_rb128", {"GENFER_OZAKI_CHUNK": "int",
                             "GENFER_OZAKI_STACK": "1",
                             "GENFER_OZAKI_COLBLOCK": "0",
                             "GENFER_OZAKI_ROWBLOCK": "128"}),
        ("xla_f64_block128", {"GENFER_OZAKI": "0",
                              "GENFER_CONV_BLOCK": "128x128"}),
        ("xla_f64_block256", {"GENFER_OZAKI": "0",
                              "GENFER_CONV_BLOCK": "256x256"}),
    ]
    results = {}
    for order in orders:
        shape = (order, order)
        rng = np.random.RandomState(0)
        a0 = jnp.asarray(rng.rand(*shape))
        b0 = jnp.asarray(rng.rand(*shape))
        flops = flops_conv_trunc(shape, shape)
        row = {}
        for name, env in variants:
            try:
                with _env_patch({**force, **env}):
                    def step(carry, _):
                        a, b = carry
                        out = _conv_impl(jnp, a, b, shape)
                        out = out / jnp.max(jnp.abs(out))
                        return (out, a), jnp.sum(out)

                    @jax.jit
                    def run(a, b):
                        _, sums = jax.lax.scan(step, (a, b), None,
                                               length=iters)
                        return sums

                    np.asarray(run(a0, b0))  # compile + warm
                    t0 = time.perf_counter()
                    np.asarray(run(a0, b0))
                    dt = (time.perf_counter() - t0) / iters
                    out = np.asarray(
                        jax.jit(
                            lambda a, b: _conv_impl(jnp, a, b, shape)
                        )(a0, b0)
                    )
                err = spot_check(np.asarray(a0), np.asarray(b0), out, 64)
                row[name] = {
                    "ms": round(dt * 1e3, 3),
                    "gflops": round(flops / dt / 1e9, 1),
                    "spot_rel_err": float(f"{err:.3e}"),
                }
            except Exception as e:
                row[name] = f"FAILED {type(e).__name__}: {e}"
            print(f"diag {order} {name}: {row[name]}", file=sys.stderr,
                  flush=True)
        results[order] = row
    def crossover():
        """Emulation (with its default staircase) vs routed ozaki at
        SMALL orders — evidence for OZAKI_MIN_FLOPS: with the colblock
        default the @256 margin is 3x, so the crossover likely sits
        below the current ~order-256 threshold."""
        res = {}
        for order in (16,) if smoke else (128, 160, 192):
            shape = (order, order)
            rng = np.random.RandomState(3)
            va = jnp.asarray(rng.rand(*shape))
            vb = jnp.asarray(rng.rand(*shape))
            flops = flops_conv_trunc(shape, shape)
            row = {}
            for name, env in (
                ("emulation", {"GENFER_OZAKI": "0"}),
                ("ozaki", {"GENFER_OZAKI": "force",
                           "GENFER_OZAKI_MIN_FLOPS": "0"}),
            ):
                with _env_patch(env):
                    def step(carry, _):
                        x, y = carry
                        o = _conv_impl(jnp, x, y, shape)
                        return (o / jnp.max(jnp.abs(o)), x), 0.0

                    @jax.jit
                    def run(x, y):
                        (r, _), _ = jax.lax.scan(step, (x, y), None,
                                                 length=iters)
                        return r

                    np.asarray(run(va, vb))
                    t0 = time.perf_counter()
                    np.asarray(run(va, vb))
                    dt = (time.perf_counter() - t0) / iters
                row[name] = {"ms": round(dt * 1e3, 3),
                             "gflops": round(flops / dt / 1e9, 1)}
                print(f"crossover {order} {name}: {row[name]}",
                      file=sys.stderr, flush=True)
            res[order] = row
        return res

    def direct640():
        """Direct (unblocked-driver) truncated 640 square through the
        routed kernel — newly inside the memory cap via the staircase."""
        order = 24 if smoke else 640
        shape = (order, order)
        rng = np.random.RandomState(4)
        va = jnp.asarray(rng.rand(*shape))
        vb = jnp.asarray(rng.rand(*shape))
        from genfer_tpu.ops.blocked_conv import spot_check
        with _env_patch({"GENFER_OZAKI": "force",
                         "GENFER_OZAKI_MIN_FLOPS": "0"}):
            f = jax.jit(lambda x, y: _conv_impl(jnp, x, y, shape))
            np.asarray(f(va, vb))
            t0 = time.perf_counter()
            out = np.asarray(f(va, vb))
            dt = time.perf_counter() - t0
        err = spot_check(np.asarray(va), np.asarray(vb), out, 64)
        row = {"ms": round(dt * 1e3, 3),
               "gflops": round(flops_conv_trunc(shape, shape) / dt / 1e9, 1),
               "spot_rel_err": float(f"{err:.3e}")}
        print(f"direct640: {row}", file=sys.stderr, flush=True)
        return row

    for key, fn in (
        ("pallas_floor", lambda: pallas_floor_decomposition(
            orders=(32,) if smoke else (256, 512),
            iters=2 if smoke else 8, interpret=smoke)),
        ("fullblock_ab", lambda: fullblock_kernel_ab(
            order=16 if smoke else 512, iters=2 if smoke else 6,
            interpret=smoke)),
        ("crossover", crossover),
        ("direct640", direct640),
    ):
        try:
            results[key] = fn()
        except Exception as e:  # a mid-run tunnel death keeps the rows so far
            results[key] = f"FAILED {type(e).__name__}: {e}"
            print(f"{key}: {results[key]}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=2), flush=True)


def fullblock_kernel_ab(order=512, iters=6, interpret=False):
    """Rowstrip vs tile kernel at the FULL-BLOCK shape
    (order, order) -> (2*order-1, 2*order-1) that the blocked 1024
    driver dispatches — VERDICT r4 weak #6: the refreshed highorder
    1024 pallas_f32 row regressed 0.699 s -> 1.117 s with no routing
    change in sight; this A/B says whether the rowstrip default lost
    the full-block shape or the refresh was run in a degraded device
    state."""
    import jax
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv2d import (conv2d_pallas_rowstrip,
                                              conv2d_pallas_tile)

    shape = (2 * order - 1, 2 * order - 1)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(order, order), jnp.float32)
    b = jnp.asarray(rng.rand(order, order), jnp.float32)
    out = {}
    for name, fn in (("rowstrip", conv2d_pallas_rowstrip),
                     ("tile", conv2d_pallas_tile)):
        def one(x, s, _fn=fn):
            r = _fn(x, b, shape, interpret=interpret, highest=True)
            # true data dependence (not constant-foldable) so the scan
            # cannot hoist the loop-invariant conv
            return x + jnp.float32(1e-30) * r[:order, :order], s + jnp.sum(r)

        @jax.jit
        def run(x, _one=one):
            def step(c, _):
                return _one(*c), 0.0
            (r, s), _ = jax.lax.scan(step, (x, 0.0), None, length=iters)
            return s

        np.asarray(run(a))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(a))
        out[name] = round((time.perf_counter() - t0) / iters * 1e3, 3)
        print(f"fullblock {order} {name}: {out[name]} ms", file=sys.stderr,
              flush=True)
    return out


def pallas_floor_decomposition(orders=(256, 512), iters=8,
                               interpret=False):
    """Rowstrip kernel precision-delta decomposition (see module
    docstring): per order, steady ms at HIGHEST and DEFAULT precision,
    derived MXU time and launch/scheduling floor."""
    import jax
    import jax.numpy as jnp

    from genfer_tpu.ops.pallas_conv2d import conv2d_pallas

    out = {}
    for order in orders:
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(order, order), jnp.float32)
        b = jnp.asarray(rng.rand(order, order), jnp.float32)
        # truncated out == operand shape: the committed pallas_kernel
        # row convention, and it keeps the scan carry shape-invariant
        shape = (order, order)
        row = {}
        for name, highest in (("highest", True), ("default", False)):
            def one(x, y, _h=highest):
                r = conv2d_pallas(x, y, shape, interpret=interpret,
                                  highest=_h)
                return r / jnp.max(jnp.abs(r)), x

            @jax.jit
            def run(x, y, _one=one):
                def step(c, _):
                    return _one(*c), 0.0
                (r, _), _ = jax.lax.scan(step, (x, y), None, length=iters)
                return r

            np.asarray(run(a, b))  # compile + warm
            t0 = time.perf_counter()
            np.asarray(run(a, b))
            row[name] = (time.perf_counter() - t0) / iters * 1e3
        mxu = (row["highest"] - row["default"]) * 6.0 / 5.0
        out[order] = {
            "highest_ms": round(row["highest"], 3),
            "default_ms": round(row["default"], 3),
            "derived_mxu_ms": round(mxu, 3),
            "derived_floor_ms": round(row["highest"] - mxu, 3),
        }
        print(f"floor {order}: {out[order]}", file=sys.stderr, flush=True)
    return out


if __name__ == "__main__":
    smoke = "--smoke" in sys.argv
    main(orders=(16, 24) if smoke else (512, 256),
         iters=2 if smoke else 6, smoke=smoke)
