"""Fused Pallas MXU kernel for the truncated 2-D Cauchy product.

The hot op of 2-variable GF evaluation (reference
multivariate_taylor.rs:984-1012) is ``c[k0,k1] = sum a[i0,i1]*b[j0,j1]``
over ``i+j=k`` with per-axis truncation.  The XLA f64 path materializes a
(c0, b0, a1) Toeplitz tensor in HBM and runs an einsum plus an
anti-diagonal reduction (backend._conv_dense); measured on a v5e chip it
sustains ~51 GFLOP/s (f64 emulation) / ~311 GFLOP/s (f32).

This kernel keeps everything in VMEM and builds the Toeplitz *tiles* on
the fly:

    out tile C[K0:K0+128, K1:K1+128]
      = sum_{j0} sum_{i1-tiles t} AW_{j0}[:, t] @ T(j0, K1/128 - t)
    AW_{j0}      = a[K0-j0 : K0-j0+128, :] — the window slides by one
                   row per j0, so an aligned 144-row slab is loaded,
                   row-rotated into place (pltpu.roll on the sublane
                   axis) and staged in VMEM scratch
    T(j0, m)[i1', c] = b[j0, 128*m + c - i1'] — three aligned lane
                   tiles of the padded b row, rotated into Toeplitz
                   form by one strided roll (shift 256 + i1')

MXU work is (128,128)@(128,128) matmuls at f32-HIGHEST precision; all
in-kernel index arithmetic is i32 (Mosaic rejects i64).

Precision (measured on v5e, order-256 random operands, vs f64):
  * f32 DEFAULT (one bf16 pass):   ~2.5e-3  max rel err
  * f32 HIGHEST (multi-pass):      ~1.9e-7  max rel err
  * f32x2 (two-float, 3 passes):   ~1.9e-7  — identical to HIGHEST
    because the MXU accumulates in f32: compensated products cannot
    survive the per-pass f32 accumulator rounding.  1e-10-class accuracy
    is therefore unreachable on the MXU; it needs the XLA f64 emulation
    path (or a compensated VPU kernel, which measures slower than the
    emulation).  See docs/extended_precision.md.

f32 only, opt-in (``--backend pallas``); the default f64 path is the XLA
backend.  Operand sizes are capped by VMEM (~16 MB/core): both padded
operands must fit, which covers per-axis orders <= ~768.

Small-order accounting (``rowstrip_issued_flops`` + the
``issue_util``/``mfu`` fields of ``bench.py --pallas``): the triangular
truncation quantized to 128-wide MXU tiles makes the kernel issue
2.23x/1.77x/1.56x the useful MACs at orders 256/384/512 (exact tile
math), and against the ~33 TF/s 6-pass f32-HIGHEST dense ceiling the
*issued* throughput of the committed artifact rows is ~4%/15%/31% —
so below order ~512 the single-pair kernel is bound by per-j0 loop
overhead (slab staging, window rolls, accumulator-tuple carry), not by
MXU issue.  Direct decomposition measurement (v5e 2026-08-21,
scripts/ozaki_diag.py ``pallas_floor``: time the SAME kernel at
HIGHEST = 6 bf16 passes vs DEFAULT = 1 pass; the delta times 6/5 is
the MXU share, everything else is launch/scheduling): @256 the MXU
share is 0.30 ms of 4.37 ms total — **93% launch-bound** — and @512
it is 2.93 of 9.45 ms (69%).  Scheduling attacks tried and measured
on v5e: the residue-grouped variant (``conv2d_pallas_grouped``, one
slab load + roll per (strip, residue-class) instead of per j0) is
~even at 256 and slightly behind at 384/512; a contraction-fused
variant stacking F=16 residue-class windows into one
(128, F*128)@(F*128, 128) matmul per site — F times fewer MXU issues
at identical FLOPs — also measured no win and cost a 141 s Mosaic
compile from the F-unrolled body, and was removed.  With the floor
measured at 93%, further single-pair scheduling at 256 cannot reach
the round-3 1.5 TF/s bar (it would need the whole non-MXU floor gone);
the recovery path at small order is batching
(``conv2d_pallas_batched``: 4.9x the single-pair useful throughput at
256x32 in the committed rows), which amortizes exactly that floor.
"""

from __future__ import annotations

import functools

TILE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _build2d(a0: int, a1: int, b0: int, b1: int, c0: int, c1: int,
             interpret: bool, highest: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c0t = pl.cdiv(c0, TILE)
    c1t = pl.cdiv(c1, TILE)
    c0p, c1p = c0t * TILE, c1t * TILE
    a1p = _round_up(a1, TILE)
    m_t = a1p // TILE
    # top zero-padding of a so the dynamic row window K0 - j0 stays >= 0
    pt = _round_up(max(b0 - 1, 0), 8)
    r0 = pt + c0p + 16  # +16: aligned-slab slack for the row rotation
    # left zero-padding of b columns so every 256-wide Toeplitz window
    # starts at a non-negative column
    pb = TILE * m_t
    c_b = pb + TILE * c1t + 2 * TILE
    prec = (jax.lax.Precision.HIGHEST if highest
            else jax.lax.Precision.DEFAULT)
    # t-loop bounds: the Toeplitz window T(j0, m) with m = i1t - t covers
    # b-column indices [128m - 127, 128m + 128); it is all-zero unless
    # 0 <= m and 128m - 127 <= b1 - 1
    m_hi = (b1 + TILE - 2) // TILE + 1  # m < m_hi

    slab_h = TILE + 16  # aligned slab covering any 128-row window

    def kernel(a_ref, b_ref, o_ref, aw_ref):
        # all index arithmetic in i32: Mosaic cannot legalize i64 (which
        # python-int promotion produces under jax_enable_x64)
        i0t = pl.program_id(0).astype(jnp.int32)
        i1t = pl.program_id(1).astype(jnp.int32)
        k0 = i0t * jnp.int32(TILE)

        def j0_body(j0, acc):
            # a-row window k0 - j0 .. +127 slides by one per j0, but
            # Mosaic vector loads must start 8-sublane aligned: load the
            # aligned 144-row slab around it, rotate rows into place,
            # and stage the window in VMEM scratch
            aw_start = k0 + jnp.int32(pt) - j0
            off = jax.lax.rem(aw_start, jnp.int32(8))
            slab = a_ref[pl.ds(pl.multiple_of(aw_start - off, 8), slab_h), :]
            shift = jax.lax.rem(
                jnp.int32(slab_h) - off, jnp.int32(slab_h)
            )
            aw_ref[:, :] = pltpu.roll(slab, shift, 0)[:TILE]

            def t_body(t, acc):
                # Toeplitz window of b covers columns [128m-127, 128m+128)
                # (m = i1t - t): load the three aligned tiles around it
                col0 = jnp.int32(pb) + (i1t - t - jnp.int32(1)) * jnp.int32(TILE)
                w = b_ref[pl.ds(j0, 1), pl.ds(col0, 3 * TILE)]
                w2 = jnp.broadcast_to(w, (TILE, 3 * TILE))
                # T[i, c] = w[128 + c - i]: strided rotate by 256 + i
                # (shift must be i32: tpu.dynamic_rotate rejects i64
                # even when jax_enable_x64 is on)
                t128 = pltpu.roll(w2, jnp.int32(2 * TILE), 1, stride=1,
                                  stride_axis=0)[:, :TILE]
                at = aw_ref[:, pl.ds(t * TILE, TILE)]
                return acc + jax.lax.dot(
                    at, t128,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

            t_lo = jnp.maximum(jnp.int32(0), i1t + jnp.int32(1 - m_hi))
            t_hi = jnp.minimum(jnp.int32(m_t), i1t + jnp.int32(1))
            return jax.lax.fori_loop(t_lo, t_hi, t_body, acc)

        nj = jnp.minimum(jnp.int32(b0), k0 + jnp.int32(TILE))
        acc = jax.lax.fori_loop(
            jnp.int32(0), nj, j0_body, jnp.zeros((TILE, TILE), jnp.float32)
        )
        o_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(c0t, c1t),
        in_specs=[
            pl.BlockSpec((r0, a1p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b0, c_b), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c0p, c1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, a1p), jnp.float32)],
        interpret=interpret,
    )

    def run(a, b):
        ap = jnp.zeros((r0, a1p), jnp.float32)
        ap = ap.at[pt : pt + min(a0, c0p), :a1].set(
            a[: min(a0, c0p)].astype(jnp.float32)
        )
        bp = jnp.zeros((b0, c_b), jnp.float32)
        bp = bp.at[:, pb : pb + b1].set(b.astype(jnp.float32))
        # trace the pallas call in 32-bit mode: under jax_enable_x64 the
        # BlockSpec index maps produce i64 constants Mosaic cannot legalize
        with jax.enable_x64(False):
            out = call(ap, bp)
        return out[:c0, :c1]

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build2d_rowstrip(a0: int, a1: int, b0: int, b1: int, c0: int, c1: int,
                      interpret: bool, highest: bool):
    """Row-strip variant of the single-pair kernel: each grid program
    computes one (128, c1) output strip instead of one (128, 128) tile.
    The staged ``a`` window (the slab load + sublane rotation, the
    dominant non-MXU work below order ~512) is then reused across every
    output column tile, and each Toeplitz window T(j0, m) is built once
    and fed to every column tile that consumes it — the (m, column-tile)
    pairs are enumerated statically, so no dynamic output indexing is
    needed (the per-tile accumulators are a python tuple)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c0t = pl.cdiv(c0, TILE)
    c1t = pl.cdiv(c1, TILE)
    c0p, c1p = c0t * TILE, c1t * TILE
    a1p = _round_up(a1, TILE)
    m_t = a1p // TILE
    pt = _round_up(max(b0 - 1, 0), 8)
    r0 = pt + c0p + 16
    pb = TILE * m_t
    c_b = pb + TILE * c1t + 2 * TILE
    prec = (jax.lax.Precision.HIGHEST if highest
            else jax.lax.Precision.DEFAULT)
    m_hi = (b1 + TILE - 2) // TILE + 1

    slab_h = TILE + 16

    # static (m, ct) enumeration: output column tile ct consumes the
    # Toeplitz window T(j0, m) through the aw column tile t = ct - m.
    # m descends so each tile accumulates in t-ascending order —
    # bit-identical to the (TILE, TILE) kernel's t-loop.
    sites = []
    for m in reversed(range(min(m_hi, c1t))):
        uses = [ct for ct in range(c1t) if 0 <= ct - m < m_t]
        if uses:
            sites.append((m, tuple(uses)))

    def kernel(a_ref, b_ref, o_ref, aw_ref):
        i0t = pl.program_id(0).astype(jnp.int32)
        k0 = i0t * jnp.int32(TILE)

        def j0_body(j0, accs):
            aw_start = k0 + jnp.int32(pt) - j0
            off = jax.lax.rem(aw_start, jnp.int32(8))
            slab = a_ref[pl.ds(pl.multiple_of(aw_start - off, 8), slab_h), :]
            shift = jax.lax.rem(
                jnp.int32(slab_h) - off, jnp.int32(slab_h)
            )
            aw_ref[:, :] = pltpu.roll(slab, shift, 0)[:TILE]
            accs = list(accs)
            for m, uses in sites:
                col0 = jnp.int32(pb) + jnp.int32((m - 1) * TILE)
                w = b_ref[pl.ds(j0, 1), pl.ds(col0, 3 * TILE)]
                w2 = jnp.broadcast_to(w, (TILE, 3 * TILE))
                t128 = pltpu.roll(w2, jnp.int32(2 * TILE), 1, stride=1,
                                  stride_axis=0)[:, :TILE]
                for ct in uses:
                    t = ct - m
                    at = aw_ref[:, pl.ds(t * TILE, TILE)]
                    accs[ct] = accs[ct] + jax.lax.dot(
                        at, t128,
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )
            return tuple(accs)

        nj = jnp.minimum(jnp.int32(b0), k0 + jnp.int32(TILE))
        zero = jnp.zeros((TILE, TILE), jnp.float32)
        accs = jax.lax.fori_loop(
            jnp.int32(0), nj, j0_body, (zero,) * c1t
        )
        for ct in range(c1t):
            o_ref[:, ct * TILE : (ct + 1) * TILE] = accs[ct]

    call = pl.pallas_call(
        kernel,
        grid=(c0t,),
        in_specs=[
            pl.BlockSpec((r0, a1p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b0, c_b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c1p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c0p, c1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, a1p), jnp.float32)],
        interpret=interpret,
    )

    def run(a, b):
        ap = jnp.zeros((r0, a1p), jnp.float32)
        ap = ap.at[pt : pt + min(a0, c0p), :a1].set(
            a[: min(a0, c0p)].astype(jnp.float32)
        )
        bp = jnp.zeros((b0, c_b), jnp.float32)
        bp = bp.at[:, pb : pb + b1].set(b.astype(jnp.float32))
        with jax.enable_x64(False):
            out = call(ap, bp)
        return out[:c0, :c1]

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build2d_grouped(a0: int, a1: int, b0: int, b1: int, c0: int, c1: int,
                     interpret: bool, highest: bool):
    """Residue-grouped row-strip kernel: attacks the dispatch-bound
    small-order region (VERDICT r3: 0.6 TF/s @256 vs 6.4 @512).

    The rowstrip kernel pays one UNALIGNED 144-row slab load + sublane
    rotation per (strip, j0) — at order 256 that is ~400 rolls against
    a ~0.95 ms MXU floor (6-pass HIGHEST), i.e. most of the measured
    3.1 ms is per-j0 fixed overhead.  Key fact: a-window starts for j0
    and j0+8 differ by exactly 8 rows — SUBLANE-ALIGNED.  So iterate j0
    by residue class mod 8: per (strip, r) ONE big slab covering every
    window of that class is loaded and rotated ONCE (off = -r mod 8 is
    constant along the class), and the inner q-loop (j0 = r + 8q) takes
    8-aligned dynamic slices, which Mosaic loads without any roll.
    Slab rolls drop from O(b0) to 8 per strip.  Toeplitz window builds
    are unchanged (same strided-roll construction, same (m, ct) site
    enumeration as the rowstrip kernel).  Accumulation order differs
    (residue-major instead of j0-ascending), so outputs are equal to
    the tile kernel only to f32 rounding, not bit-identical."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c0t = pl.cdiv(c0, TILE)
    c1t = pl.cdiv(c1, TILE)
    c0p, c1p = c0t * TILE, c1t * TILE
    a1p = _round_up(a1, TILE)
    m_t = a1p // TILE
    b0p = _round_up(max(b0, 8), 8)
    Q = b0p // 8
    # top zero-padding of a: the deepest window start is
    # k0 + pt - (b0p - 1) at k0 = 0, so pt = b0p keeps starts positive
    pt = b0p
    r0 = pt + c0p + 16
    pb = TILE * m_t
    c_b = pb + TILE * c1t + 2 * TILE
    prec = (jax.lax.Precision.HIGHEST if highest
            else jax.lax.Precision.DEFAULT)
    m_hi = (b1 + TILE - 2) // TILE + 1

    slab_h = 8 * Q + TILE + 8  # all windows of one residue class + roll slack

    sites = []
    for m in reversed(range(min(m_hi, c1t))):
        uses = [ct for ct in range(c1t) if 0 <= ct - m < m_t]
        if uses:
            sites.append((m, tuple(uses)))

    def kernel(a_ref, b_ref, o_ref, slab_ref):
        i0t = pl.program_id(0).astype(jnp.int32)
        k0 = i0t * jnp.int32(TILE)

        def q_body(r):
            def body(q, accs):
                j0 = jnp.int32(r) + jnp.int32(8) * q
                # 8-aligned window slice: slab[i] = a[start + i] with
                # start = k0 + pt - r - 8(Q-1); window(q) begins at
                # a-row k0 + pt - j0 = start + 8(Q-1-q)
                woff = jnp.int32(8) * (jnp.int32(Q - 1) - q)
                aw = slab_ref[pl.ds(pl.multiple_of(woff, 8), TILE), :]
                accs = list(accs)
                for m, uses in sites:
                    col0 = jnp.int32(pb) + jnp.int32((m - 1) * TILE)
                    w = b_ref[pl.ds(j0, 1), pl.ds(col0, 3 * TILE)]
                    w2 = jnp.broadcast_to(w, (TILE, 3 * TILE))
                    t128 = pltpu.roll(w2, jnp.int32(2 * TILE), 1,
                                      stride=1, stride_axis=0)[:, :TILE]
                    for ct in uses:
                        t = ct - m
                        at = aw[:, t * TILE:(t + 1) * TILE]
                        accs[ct] = accs[ct] + jax.lax.dot(
                            at, t128,
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )
                return tuple(accs)
            return body

        zero = jnp.zeros((TILE, TILE), jnp.float32)
        accs = (zero,) * c1t
        for r in range(8):
            # one aligned slab load + ONE rotation per residue class
            start = k0 + jnp.int32(pt - r - 8 * (Q - 1))
            off = (-r) % 8
            slab = a_ref[
                pl.ds(pl.multiple_of(start - jnp.int32(off), 8), slab_h), :
            ]
            shift = jnp.int32((slab_h - off) % slab_h)
            slab_ref[:, :] = pltpu.roll(slab, shift, 0)
            # nonzero iterations only: the a-window is all-zero once
            # j0 >= k0 + 128 (top padding), and b rows end at b0
            q_hi_b = (b0 - r + 7) // 8  # j0 < b0
            body = q_body(r)
            # k0 is traced (grid id), so bound the loop with the traced
            # min; the compiler still hoists the constant part
            q_hi_a = (k0 + jnp.int32(TILE - r + 7)) // jnp.int32(8)
            q_hi = jnp.minimum(jnp.int32(q_hi_b), q_hi_a)
            accs = jax.lax.fori_loop(jnp.int32(0), q_hi, body, accs)
        for ct in range(c1t):
            o_ref[:, ct * TILE:(ct + 1) * TILE] = accs[ct]

    call = pl.pallas_call(
        kernel,
        grid=(c0t,),
        in_specs=[
            pl.BlockSpec((r0, a1p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b0p, c_b), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c1p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c0p, c1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((slab_h, a1p), jnp.float32)],
        interpret=interpret,
    )

    def run(a, b):
        ap = jnp.zeros((r0, a1p), jnp.float32)
        ap = ap.at[pt : pt + min(a0, c0p), :a1].set(
            a[: min(a0, c0p)].astype(jnp.float32)
        )
        bp = jnp.zeros((b0p, c_b), jnp.float32)
        bp = bp.at[:b0, pb : pb + b1].set(b.astype(jnp.float32))
        with jax.enable_x64(False):
            out = call(ap, bp)
        return out[:c0, :c1]

    return jax.jit(run)


def conv2d_pallas_grouped(a, b, out_shape, interpret: bool = False,
                          highest: bool = True):
    """Residue-grouped single-pair kernel (see _build2d_grouped)."""
    c0, c1 = int(out_shape[0]), int(out_shape[1])
    return _build2d_grouped(
        int(a.shape[0]), int(a.shape[1]),
        int(b.shape[0]), int(b.shape[1]),
        c0, c1, interpret, highest,
    )(a, b)


def conv2d_pallas_rowstrip(a, b, out_shape, interpret: bool = False,
                           highest: bool = True):
    """Row-strip single-pair kernel — the default ``conv2d_pallas``
    path (see _build2d_rowstrip).  Measured on v5e vs the tile kernel
    (bit-identical outputs): 1.04x @256, 1.29x @384, 1.69x @512
    (6.44 TFLOP/s), 1.17x @640, 1.10x @768, and 1.86x on the
    (512,512)->(1023,1023) full-block shape the high-order blocked
    driver feeds it."""
    c0, c1 = int(out_shape[0]), int(out_shape[1])
    return _build2d_rowstrip(
        int(a.shape[0]), int(a.shape[1]),
        int(b.shape[0]), int(b.shape[1]),
        c0, c1, interpret, highest,
    )(a, b)


@functools.lru_cache(maxsize=None)
def _build2d_batched(nb: int, a0: int, a1: int, b0: int, b1: int,
                     c0: int, c1: int, interpret: bool, highest: bool):
    """Batched-LHS variant: a batch of ``a`` operands convolved with one
    shared ``b``.  The batch rides the leading grid axis, so the padded
    ``b`` (and its on-the-fly Toeplitz tiles) is staged once in VMEM and
    reused across the whole batch while per-tile dispatch overhead
    amortizes — the single-pair kernel is dispatch-bound below order
    ~512 (bench: 0.57 TFLOP/s @256 vs 3.9 @512)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c0t = pl.cdiv(c0, TILE)
    c1t = pl.cdiv(c1, TILE)
    c0p, c1p = c0t * TILE, c1t * TILE
    a1p = _round_up(a1, TILE)
    m_t = a1p // TILE
    pt = _round_up(max(b0 - 1, 0), 8)
    r0 = pt + c0p + 16
    pb = TILE * m_t
    c_b = pb + TILE * c1t + 2 * TILE
    prec = (jax.lax.Precision.HIGHEST if highest
            else jax.lax.Precision.DEFAULT)
    m_hi = (b1 + TILE - 2) // TILE + 1

    slab_h = TILE + 16

    def kernel(a_ref, b_ref, o_ref, aw_ref):
        i0t = pl.program_id(1).astype(jnp.int32)
        i1t = pl.program_id(2).astype(jnp.int32)
        k0 = i0t * jnp.int32(TILE)

        def j0_body(j0, acc):
            aw_start = k0 + jnp.int32(pt) - j0
            off = jax.lax.rem(aw_start, jnp.int32(8))
            slab = a_ref[
                0, pl.ds(pl.multiple_of(aw_start - off, 8), slab_h), :
            ]
            shift = jax.lax.rem(
                jnp.int32(slab_h) - off, jnp.int32(slab_h)
            )
            aw_ref[:, :] = pltpu.roll(slab, shift, 0)[:TILE]

            def t_body(t, acc):
                col0 = (jnp.int32(pb)
                        + (i1t - t - jnp.int32(1)) * jnp.int32(TILE))
                w = b_ref[pl.ds(j0, 1), pl.ds(col0, 3 * TILE)]
                w2 = jnp.broadcast_to(w, (TILE, 3 * TILE))
                t128 = pltpu.roll(w2, jnp.int32(2 * TILE), 1, stride=1,
                                  stride_axis=0)[:, :TILE]
                at = aw_ref[:, pl.ds(t * TILE, TILE)]
                return acc + jax.lax.dot(
                    at, t128,
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

            t_lo = jnp.maximum(jnp.int32(0), i1t + jnp.int32(1 - m_hi))
            t_hi = jnp.minimum(jnp.int32(m_t), i1t + jnp.int32(1))
            return jax.lax.fori_loop(t_lo, t_hi, t_body, acc)

        nj = jnp.minimum(jnp.int32(b0), k0 + jnp.int32(TILE))
        acc = jax.lax.fori_loop(
            jnp.int32(0), nj, j0_body, jnp.zeros((TILE, TILE), jnp.float32)
        )
        o_ref[0, :, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(nb, c0t, c1t),
        in_specs=[
            pl.BlockSpec((1, r0, a1p), lambda g, i, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b0, c_b), lambda g, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, TILE), lambda g, i, j: (g, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, c0p, c1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, a1p), jnp.float32)],
        interpret=interpret,
    )

    def run(a, b):
        ap = jnp.zeros((nb, r0, a1p), jnp.float32)
        ap = ap.at[:, pt : pt + min(a0, c0p), :a1].set(
            a[:, : min(a0, c0p)].astype(jnp.float32)
        )
        bp = jnp.zeros((b0, c_b), jnp.float32)
        bp = bp.at[:, pb : pb + b1].set(b.astype(jnp.float32))
        with jax.enable_x64(False):
            out = call(ap, bp)
        return out[:, :c0, :c1]

    return jax.jit(run)


def conv2d_pallas_batched(a_batch, b, out_shape, interpret: bool = False,
                          highest: bool = True):
    """Truncated 2-D Cauchy products of a batch of ``a`` operands with a
    shared ``b``, on the TPU MXU.  ``a_batch`` has shape (B, a0, a1);
    returns (B, c0, c1).

    This is the ONE batched layout: the product is commutative, so a
    shared-LHS batch (one ``a``, batch of ``b``) is this kernel with the
    operands swapped at the call site.  A dedicated shared-LHS kernel
    (batch riding the grid with ``a`` staged grid-invariant) was built
    and measured on v5e at 5.34 vs 5.38 TF/s — no win — and removed;
    the thin ``conv2d_pallas_batched_rhs`` swap wrapper then benched
    dead-even with this kernel for two rounds (by construction: it WAS
    this kernel) and was removed under the same evidence standard."""
    c0, c1 = int(out_shape[0]), int(out_shape[1])
    return _build2d_batched(
        int(a_batch.shape[0]), int(a_batch.shape[1]), int(a_batch.shape[2]),
        int(b.shape[0]), int(b.shape[1]),
        c0, c1, interpret, highest,
    )(a_batch, b)


def conv2d_pallas_tile(a, b, out_shape, interpret: bool = False,
                       highest: bool = True):
    """The original (128,128)-tile kernel, kept for A/B benchmarking;
    superseded as the default by the row-strip variant, which is
    bit-identical and faster at every measured shape."""
    c0, c1 = int(out_shape[0]), int(out_shape[1])
    return _build2d(
        int(a.shape[0]), int(a.shape[1]),
        int(b.shape[0]), int(b.shape[1]),
        c0, c1, interpret, highest,
    )(a, b)


def rowstrip_issued_flops(a_shape, b_shape, out_shape):
    """Issued-MAC FLOPs of the row-strip kernel for these shapes: the
    number of (128,128,128) MXU dots the kernel actually launches times
    2*128^3.  Useful FLOPs divided by this is the tile-quantization
    efficiency of the triangular truncation (the gap no scheduling can
    recover); issued FLOPs over measured time against a dense-matmul
    ceiling is the kernel's MXU occupancy.  Mirrors the site/loop-bound
    math of ``_build2d_rowstrip`` exactly."""
    b0, b1 = int(b_shape[0]), int(b_shape[1])
    c0, c1 = int(out_shape[0]), int(out_shape[1])
    c0t = -(-c0 // TILE)
    c1t = -(-c1 // TILE)
    a1p = _round_up(int(a_shape[1]), TILE)
    m_t = a1p // TILE
    m_hi = (b1 + TILE - 2) // TILE + 1
    site_dots = sum(
        len([ct for ct in range(c1t) if 0 <= ct - m < m_t])
        for m in range(min(m_hi, c1t))
    )
    issued_dots = sum(
        min(b0, (i0t + 1) * TILE) * site_dots for i0t in range(c0t)
    )
    return 2.0 * issued_dots * TILE**3


def conv2d_pallas(a, b, out_shape, interpret: bool = False,
                  highest: bool = True):
    """Truncated 2-D Cauchy product of float matrices on the TPU MXU.

    Routes to the row-strip kernel (fastest at every measured order,
    bit-identical to the tile kernel; see conv2d_pallas_rowstrip).
    ``interpret=True`` runs in the Pallas interpreter (CPU testing);
    ``highest`` selects multi-pass f32 matmuls (~1.9e-7 rel error) over
    single-pass bf16 (~2.5e-3)."""
    return conv2d_pallas_rowstrip(a, b, out_shape, interpret, highest)
