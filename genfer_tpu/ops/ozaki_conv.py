"""f64-accuracy truncated 2-D Cauchy products on the TPU MXU
(Ozaki-style error-free splitting).

The default f64 conv path (taylor/backend.py ``_conv_dense``) is bound
by XLA's software f64 emulation: the hot contraction
``einsum("kji,jl->kil")`` runs at ~95 GF/s useful (measured, v5e,
order 512) because the MXU has no f64 mode.  This module routes the
SAME contraction through the MXU with every pass bit-exact:

* scale each operand column by a power of two (exact) so entries lie in
  [-1/2, 1/2];
* peel each scaled operand into T=8 integer chunks of 7 bits
  (``x = sum_t C_t 2^{-7(t+1)} + R``, |C_t| <= 64, |R| <= 2^-57).
  Every step is EXACT in f64: the scale is a power of two, the rounded
  chunk is representable, and the remainder subtraction is exact
  because the true difference spans < 53 bits;
* one MXU pass per chunk pair (t, u), in int8 with an int32
  accumulator (native on v5e, 2x bf16 throughput): products of the
  +-64 chunks are <= 2^12 and int32 addition is exact, so the pass
  returns the EXACT integer dot for contraction lengths up to 2^19
  (the bf16/f32 fallback impl is exact only to length 512 once the
  8-pass diagonal groups are folded into the f32 accumulator);
* accumulate the passes of equal total weight t+u = s into ONE integer
  buffer per diagonal (int32 adds of values <= 8 * 2^12 * k stay exact
  for k <= 2^16), so the f64 combine reads pair_bits+1 group buffers
  with power-of-two weights instead of 36 — the HBM-bound f64 step
  shrinks ~4.5x;
* undo the column scales in f64 and reduce anti-diagonals.

Keeping pairs with t + u <= P truncates at ~2^{-7(P+2)-4} relative to
the per-column scale product: P=7 (36 passes, the default) lands at the
chunk-remainder floor ~1e-16 normwise; P=6 (28 passes) at ~1e-13.  The
error is NORMWISE per output entry (k, l): relative to
``colscale_a * colscale_b * contraction length``, the same class as
f64 summation delivers on well-scaled operands.  Entries more than
~2^-50 BELOW their column-scale product lose relative accuracy — the
measured componentwise cliff on Poisson-tail corpus columns is pinned
in tests/test_ozaki_conv.py.  Column scales anywhere in the f64 range
are handled natively via exponent-sum undo (see _pow2_colexp); only
non-finite coefficients divert to the dense branch.

Cost model: 36 int8 MXU passes + 8 group-to-f64 combines vs the ~50x
slower f64 software emulation of one einsum.  Measured numbers live in
bench-results.json (``ozaki`` section) — bench.py --ozaki writes them.
Measured v5e 2026-08-21 (scripts/ozaki_diag.py + bench --ozaki), square
truncated shapes, spot-checked vs host-exact f64 dots:

    @512: emulation 364.7 ms (94.6 GF/s) -> ozaki stacked 150.0 ms
          (230 GF/s) -> + column staircase (_colblock, default 128)
          112.5 ms (306.6 GF/s) -> + row staircase (_rowblock, default
          128) 81.6 ms = 422.5 GF/s useful, spot err 4-6e-15
    @256: 44.0 -> 18.0 -> 14.4 -> 13.0 ms (166.7 GF/s), 4-6e-15
    the int-domain chunk split (_chunk_int) is what holds device
    accuracy: the float round/div/sub chain measures 9.9e-12 @512 on
    the TPU's emulated f64, int bit-slicing 4.3e-15.

Reference spec being beaten: the f64 multivariate product of
/root/reference/src/multivariate_taylor.rs:984-1012 (host Rust; the
committed f64 XLA row is already ~26x that at matched accuracy — this
path multiplies the device-side margin while keeping ~1e-14-class
normwise accuracy, where the Pallas f32 kernels cap at ~1e-6).
"""

from __future__ import annotations

import functools
import os

# 7-bit signed chunks scaled into [-64, 64]: products fit 2^12; the
# int32 accumulator is exact for contractions up to 2^19 per pass and
# 2^16 with the 8-pass diagonal groups folded in
CHUNK_BITS = 7
N_CHUNKS = 8  # 8 * 7 = 56 bits >= the 53-bit f64 mantissa
MAX_K_INT8 = 1 << 16
#: the bf16 impl folds up to 8 passes per diagonal group in the f32
#: accumulator: partial sums reach 8 * 2^12 * k, which stays under the
#: exact-integer 2^24 ceiling only for k <= 512 (measured: k = 2048
#: degrades to 7.5e-12 where int8 keeps 1.1e-13)
MAX_K_BF16 = 512


def _pow2_colexp(jnp, x):
    """Per-column power-of-two scale EXPONENT ceil(log2 max|col|) + 1,
    so x * exp2(-e) lies in [-1/2, 1/2] (e = 0 for all-zero columns).
    exp2/ceil(log2) are exact on the TPU's f64 emulation (measured;
    CLAUDE.md numeric policy) and scaling by a power of two is exact.

    Exponents (not scales) are returned so the output-side undo can
    apply exp2(ea + eb) in ONE step: applying sa then sb sequentially
    would spuriously under/overflow whenever the individual scales sit
    near the f64 range limits but their product does not (e.g. a
    2^-980-scale column times a 2^300-scale column).  No clamping:
    exp2(-e) for e in [-1075, 1025] is exactly representable (possibly
    subnormal — still an exact power of two), so the whole f64 range
    is handled natively; products whose combined exponent underflows
    the f64 range flush to zero exactly where the dense f64 path's own
    products would."""
    m = jnp.max(jnp.abs(x), axis=0)
    return jnp.ceil(jnp.log2(jnp.where(m > 0.0, m, 1.0))) + 1.0


def _chunk(jnp, x, dtype):
    """Error-free split of ``x`` (f64, |x| <= 1/2) into N_CHUNKS arrays
    of integers in [-64, 64] (as ``dtype``):
    x = sum_t chunks[t] * 2^{-7(t+1)} + R, |R| <= 2^-57.

    The float formulation (round/divide/subtract per chunk) is exact
    under IEEE f64 but NOT under the TPU's emulated f64 (measured: the
    chain degrades the @512 conv to ~1e-11); ``_chunk_int`` below does
    the same split in the integer domain with one conversion."""
    chunks = []
    r = x
    for t in range(N_CHUNKS):
        s = float(2.0 ** (CHUNK_BITS * (t + 1)))
        c = jnp.round(r * s)
        chunks.append(c.astype(dtype))
        r = r - c / s
    return chunks


def _chunk_int(jnp, x, dtype):
    """Integer-domain error-free split (device-robust variant): one
    f64 -> int64 conversion of ``x * 2^56`` (exact scaling by a power
    of two; |x| <= 1/2 keeps it under 2^55), then pure int64
    bit-slicing into 8 round-to-nearest 7-bit signed chunks.  Every
    post-conversion op is integer (exact on the TPU's int32-pair int64
    emulation), so the split cannot degrade with the quality of the
    device's f64 emulation the way the round/divide/subtract chain of
    ``_chunk`` does.  x = sum_t chunks[t] * 2^{-7(t+1)} + R with
    |R| <= 2^-56 (the conversion rounds to the nearest integer tick)."""
    y = x * float(2.0 ** (CHUNK_BITS * N_CHUNKS))
    i = jnp.round(y).astype(jnp.int64)
    chunks = []
    for t in range(N_CHUNKS):
        shift = CHUNK_BITS * (N_CHUNKS - 1 - t)
        if shift:
            half = jnp.int64(1 << (shift - 1))
            c = (i + half) >> shift
        else:
            c = i
        chunks.append(c.astype(dtype))
        i = i - (c.astype(jnp.int64) << shift)
    return chunks


def _chunk_impl():
    """Chunking pipeline selector (GENFER_OZAKI_CHUNK): 'int' (default,
    device-robust integer split) or 'float' (the IEEE-exact chain —
    correct on hosts, degraded on emulated-f64 devices)."""
    return os.environ.get("GENFER_OZAKI_CHUNK", "int").strip() or "int"


def _stack_impl() -> bool:
    """Diagonal-stacked einsum layout selector (GENFER_OZAKI_STACK,
    default on): pair_bits+1 large contractions instead of 36 small
    ones.  Identical results up to int32/f32 accumulation order (both
    exact within the caps)."""
    return os.environ.get("GENFER_OZAKI_STACK", "1").strip() != "0"


def _colblock() -> int:
    """Column-staircase width (GENFER_OZAKI_COLBLOCK, stacked layout
    only): block the a1 axis so each block contracts only the b columns
    l < c1 - p1 that survive output truncation — at square truncated
    order-512 shapes the full rectangle issues ~1.6x the useful chunk-
    pass MACs AND ~1.6x the HBM-bound f64 combine volume.  Measured
    v5e (scripts/ozaki_diag.py, 2026-08-21): width 128 takes the @512
    truncated conv 150.3 -> 112.5 ms (306.6 GF/s useful) and @256
    18.0 -> 14.4 ms, spot err 4-6e-15 unchanged; width 256 is mid
    (129.1 ms).  Default 128; "0" disables.  Dropped slices feed only
    truncated-away output columns, so the int32 passes are bit-exactly
    the same contributions; only the f64 antidiag addition order
    changes."""
    v = os.environ.get("GENFER_OZAKI_COLBLOCK", "").strip()
    return int(v) if v else 128


def _rowblock() -> int:
    """Row-staircase strip height (GENFER_OZAKI_ROWBLOCK): per output
    row strip [p0, p0+R), the chunk Toeplitz band T[k, j] = ca[k-j] is
    zero outside j in (p0 - a0, p0 + R), so the strip's contraction
    only needs that j-range — at truncated square order-512 shapes the
    full contraction issues 1.6x the band MACs.  Measured v5e
    (scripts/ozaki_diag.py, window 2): composed with the column
    staircase @512 112.5 -> 81.6 ms = 422.5 GF/s useful at 5.5e-15
    (row-only 124.2 ms; @256 14.0 -> 13.0 ms).  Default 128; "0"
    disables."""
    v = os.environ.get("GENFER_OZAKI_ROWBLOCK", "").strip()
    return int(v) if v else 128


def ozaki_conv2d_traced(jnp, a, b, out_shape, pair_bits: int = 7,
                        impl: str = "int8"):
    """Traceable body: the truncated 2-D Cauchy product of f64 ``a``
    (a0, a1) and ``b`` (b0, b1) to ``out_shape`` (c0, c1) via exact MXU
    chunk passes.  Safe to call inside jit/scan.  No finite-input
    guard — see ``ozaki_conv2d`` for the guarded entry point."""
    from genfer_tpu.taylor.backend import _antidiag_sum, _toeplitz

    c0, c1 = int(out_shape[0]), int(out_shape[1])
    b0 = int(b.shape[0])
    a1, b1 = int(a.shape[1]), int(b.shape[1])
    max_k = MAX_K_INT8 if impl == "int8" else MAX_K_BF16
    if b0 > max_k:
        raise ValueError(
            f"ozaki conv contraction length {b0} > {max_k}: the {impl} "
            "accumulator would round — route through the blocked driver"
        )
    if impl == "int8":
        in_dtype, acc_dtype = jnp.int8, jnp.int32
    else:
        in_dtype, acc_dtype = jnp.bfloat16, jnp.float32

    chunk = _chunk_int if _chunk_impl() == "int" else _chunk
    ea = _pow2_colexp(jnp, a)  # [a1]
    eb = _pow2_colexp(jnp, b)  # [b1]
    ca = chunk(jnp, a * jnp.exp2(-ea)[None, :], in_dtype)
    cb = chunk(jnp, b * jnp.exp2(-eb)[None, :], in_dtype)
    n_t = min(N_CHUNKS, pair_bits + 1)

    # one integer accumulator per diagonal s = t + u: every add is
    # exact (int32 up to the contraction caps; f32 because
    # 8 * 2^12 * k <= 2^24 for the fallback impl's k cap), so only
    # pair_bits+1 buffers reach the HBM-bound f64 combine
    n_s = min(2 * N_CHUNKS - 1, pair_bits + 1)
    a0 = int(a.shape[0])
    cb_w = _colblock()
    rb_h = _rowblock()
    # the column staircase engages only under REAL axis-1 truncation
    # (on a full conv c1 = a1 + b1 - 1 every block keeps all b columns,
    # pure dispatch overhead); the row staircase engages whenever the
    # Toeplitz band leaves whole j-slabs zero within some strip
    col_engaged = bool(cb_w) and min(a1, c1) > cb_w and c1 < a1 + b1 - 1
    # the row staircase is ALSO truncation-scoped: on full-conv shapes
    # (the blocked P-pair driver's inner products) it measured
    # catastrophically slower on device (highorder-1024 ozaki row
    # 11.4 s with it off vs 74.9-110 s on, two windows), while on
    # truncated working shapes it is the 306->422 GF/s win — the taper
    # savings on a full conv do not pay for the per-strip slab concat
    # and dispatch volume
    row_engaged = (bool(rb_h) and c0 > rb_h and c1 < a1 + b1 - 1)
    if _stack_impl() and (col_engaged or row_engaged):
        # staircase (see _colblock/_rowblock): per output row strip,
        # contract only the nonzero Toeplitz j-range; per a1 block,
        # only the surviving b columns; combine into the output slice
        tas = [_toeplitz(jnp, ca[t], c0, b0) for t in range(n_t)]
        out = jnp.zeros((c0, c1), jnp.float64)
        rstep = rb_h if row_engaged else c0
        cstep = cb_w if col_engaged else max(min(a1, c1), 1)
        for p0 in range(0, c0, rstep):
            r1 = min(c0, p0 + rstep)
            j_lo = max(0, p0 - (a0 - 1))
            j_hi = min(b0, r1)
            if j_lo >= j_hi:
                continue
            # one stacked-slab concat per (strip, diagonal), sliced per
            # column block inside the einsum operand
            ta_diag = {}
            cb_diag = {}
            for s in range(n_s):
                t0 = max(0, s - N_CHUNKS + 1)
                t1 = min(s + 1, n_t)
                ta_diag[s] = jnp.concatenate(
                    [tas[t][p0:r1, j_lo:j_hi, :] for t in range(t0, t1)],
                    axis=1,
                )
                cb_diag[s] = jnp.concatenate(
                    [cb[s - t][j_lo:j_hi, :] for t in range(t0, t1)]
                )
            for p1 in range(0, min(a1, c1), cstep):
                q1 = min(a1, p1 + cstep, c1)
                ln = min(b1, c1 - p1)
                hp = jnp.zeros((r1 - p0, q1 - p1, ln), jnp.float64)
                for s in range(n_s):
                    g = jnp.einsum(
                        "kji,jl->kil",
                        ta_diag[s][:, :, p1:q1], cb_diag[s][:, :ln],
                        preferred_element_type=acc_dtype,
                    )
                    w = 2.0 ** (-CHUNK_BITS * (s + 2))
                    hp = hp + g.astype(jnp.float64) * w
                hp = hp * jnp.exp2(
                    ea[p1:q1][None, :, None] + eb[:ln][None, None, :]
                )
                kmax = min(c1 - p1, (q1 - p1) + ln - 1)
                out = out.at[p0:r1, p1 : p1 + kmax].add(
                    _antidiag_sum(jnp, hp, kmax)
                )
        return out
    h = jnp.zeros((c0, a1, b1), jnp.float64)
    if _stack_impl():
        # diagonal-stacked layout (GENFER_OZAKI_STACK): all chunk
        # Toeplitz stacks concatenated along the contraction axis
        # once; each diagonal's pairs (a contiguous t-range) become
        # ONE einsum against the matching stacked cb rows —
        # pair_bits+1 well-shaped MXU contractions instead of 36
        # smaller ones, identical MACs, the per-diagonal group adds
        # folded into the contraction (still exact: per-entry sums
        # <= 2^12 * 8 * k)
        ta_all = jnp.concatenate(
            [_toeplitz(jnp, ca[t], c0, b0) for t in range(n_t)], axis=1
        )  # [c0, n_t*b0, a1]
        for s in range(n_s):
            t0 = max(0, s - N_CHUNKS + 1)
            t1 = min(s + 1, n_t)
            cb_stack = jnp.concatenate(
                [cb[s - t] for t in range(t0, t1)]
            )  # [(t1-t0)*b0, b1]
            g = jnp.einsum(
                "kji,jl->kil",
                ta_all[:, t0 * b0 : t1 * b0, :], cb_stack,
                preferred_element_type=acc_dtype,
            )
            w = 2.0 ** (-CHUNK_BITS * (s + 2))
            h = h + g.astype(jnp.float64) * w
    else:
        tas = [_toeplitz(jnp, ca[t], c0, b0) for t in range(n_t)]
        for s in range(n_s):
            g = None
            for t in range(max(0, s - N_CHUNKS + 1), min(s + 1, n_t)):
                u = s - t
                d = jnp.einsum(
                    "kji,jl->kil", tas[t], cb[u],
                    preferred_element_type=acc_dtype,
                )
                g = d if g is None else g + d
            w = 2.0 ** (-CHUNK_BITS * (s + 2))
            h = h + g.astype(jnp.float64) * w
    # single-step undo via the exponent SUM (see _pow2_colexp)
    h = h * jnp.exp2(ea[None, :, None] + eb[None, None, :])
    return _antidiag_sum(jnp, h, c1)


def ozaki_conv2d_guarded(jnp, a, b, out_shape, pair_bits: int | None = None,
                         impl: str | None = None):
    """Traceable guarded entry: all-finite operands run the ozaki chunk
    passes; non-finite coefficients keep IEEE f64 propagation (the
    reference's inf/NaR semantics, load-bearing in nested-inference
    normalize factors) by branching to the dense XLA f64 kernel on
    device — no host sync.  ``pair_bits``/``impl`` default from
    GENFER_OZAKI_PAIR_BITS / GENFER_OZAKI_IMPL (read at trace time;
    backend._conv_jit keys its cache on ``route_fingerprint`` so env
    toggles reach a fresh trace)."""
    import jax

    from genfer_tpu.taylor.backend import _conv_dense

    if pair_bits is None:
        pair_bits = default_pair_bits()
    if impl is None:
        impl = default_impl()
    out_shape = (int(out_shape[0]), int(out_shape[1]))
    # non-finite coefficients keep IEEE propagation semantics on the
    # dense f64 branch; finite operands of ANY magnitude are handled
    # by the exponent-sum scaling (see _pow2_colexp)
    ok = jnp.isfinite(a).all() & jnp.isfinite(b).all()
    return jax.lax.cond(
        ok,
        lambda x, y: ozaki_conv2d_traced(jnp, x, y, out_shape, pair_bits,
                                         impl),
        lambda x, y: _conv_dense(jnp, x, y, out_shape),
        a, b,
    )


@functools.lru_cache(maxsize=None)
def _build2d(a0: int, a1: int, b0: int, b1: int, c0: int, c1: int,
             pair_bits: int, impl: str, guard: bool, _variant_key):
    import jax
    import jax.numpy as jnp

    def conv(a, b):
        if not guard:
            return ozaki_conv2d_traced(jnp, a, b, (c0, c1), pair_bits, impl)
        return ozaki_conv2d_guarded(jnp, a, b, (c0, c1), pair_bits, impl)

    return jax.jit(conv)


def ozaki_conv2d(a, b, out_shape, pair_bits: int = 7, impl: str = "int8",
                 guard: bool = True):
    """Truncated 2-D Cauchy product of f64 matrices via exact integer
    MXU chunk passes (see module docstring).  ``pair_bits`` keeps chunk
    pairs with t+u <= pair_bits: 7 = 36 passes (remainder-floor
    accuracy), 6 = 28 passes (~1e-13 normwise).  ``impl`` selects the
    MXU pass type ('int8' native on v5e, 'bf16' fallback).  ``guard``
    adds a device-side all-finite cond that falls back to the XLA f64
    path for IEEE propagation semantics."""
    from genfer_tpu import enable_x64

    enable_x64()
    return _build2d(
        int(a.shape[0]), int(a.shape[1]),
        int(b.shape[0]), int(b.shape[1]),
        int(out_shape[0]), int(out_shape[1]),
        int(pair_bits), impl, bool(guard),
        (_chunk_impl(), _stack_impl(), _colblock(), _rowblock()),
    )(a, b)


# ---------------------------------------------------------------------
# routing
# ---------------------------------------------------------------------
#
# GENFER_OZAKI:           "0" disables the route entirely; "force"
#                         enables it on any platform (tests run on the
#                         forced-CPU conftest backend); "1"/unset
#                         enables it on a TPU default device above the
#                         measured crossover; a number overrides the
#                         min-flops crossover (TPU only).
# GENFER_OZAKI_IMPL:      MXU pass type, "int8" (default) or "bf16".
# GENFER_OZAKI_PAIR_BITS: kept chunk-pair cutoff P (default 7).
# GENFER_OZAKI_MIN_FLOPS: crossover override (pair multiply-adds).
# GENFER_OZAKI_MAX_BYTES: device-buffer estimate cap override.
#
# All env vars are read at TRACE time and folded into
# ``route_fingerprint()``, which backend._conv_jit keys its compile
# cache on — toggling them between calls reaches a fresh kernel.

#: measured crossover vs the XLA f64 emulation path (bench-results.json
#: `ozaki` + the diag `crossover` sweep): with the staircases the ozaki
#: kernel wins from ~order 192 (53.6 vs 34.0 GF/s @192; ~even at
#: 128-160 with one noisy inversion).  2-var order-192 truncated
#: ~= 6.9e8 pair flops; require >= ~that.
OZAKI_MIN_FLOPS_DEFAULT = 6e8
#: direct-kernel device-memory estimate cap (bytes): Toeplitz chunk
#: stacks + int32 diagonal group (x2 transient) + the f64 accumulator.
#: An order-512 pair estimates ~6.5 GB; order-640 ~13 GB exceeds the
#: cap and must go through the blocked P-pair driver.
OZAKI_MAX_BYTES_DEFAULT = 10e9
OZAKI_MAX_K = MAX_K_INT8


def default_impl() -> str:
    return os.environ.get("GENFER_OZAKI_IMPL", "int8").strip() or "int8"


def default_pair_bits() -> int:
    v = os.environ.get("GENFER_OZAKI_PAIR_BITS", "").strip()
    return int(v) if v else 7


def route_fingerprint():
    """The env state a traced conv's routing decision depends on; part
    of backend._conv_jit's compile-cache key."""
    return tuple(
        os.environ.get(k, "")
        for k in (
            "GENFER_OZAKI", "GENFER_OZAKI_IMPL", "GENFER_OZAKI_PAIR_BITS",
            "GENFER_OZAKI_MIN_FLOPS", "GENFER_OZAKI_MAX_BYTES",
            "GENFER_OZAKI_CHUNK", "GENFER_OZAKI_STACK",
            "GENFER_OZAKI_COLBLOCK", "GENFER_OZAKI_ROWBLOCK",
            "GENFER_CONV_BLOCK",
        )
    )


def _min_flops() -> float:
    v = os.environ.get("GENFER_OZAKI_MIN_FLOPS", "").strip()
    return float(v) if v else OZAKI_MIN_FLOPS_DEFAULT


def _max_bytes() -> float:
    v = os.environ.get("GENFER_OZAKI_MAX_BYTES", "").strip()
    return float(v) if v else OZAKI_MAX_BYTES_DEFAULT


def _platform_is_tpu() -> bool:
    import jax

    dd = getattr(jax.config, "jax_default_device", None)
    if dd is not None:
        plat = dd if isinstance(dd, str) else getattr(dd, "platform", None)
        return plat == "tpu"
    return jax.default_backend() == "tpu"


def estimate_bytes(a_shape, b_shape, out_shape,
                   pair_bits: int | None = None,
                   impl: str | None = None) -> float:
    """Rough peak-extra-HBM estimate of one direct ozaki conv: the
    n_t Toeplitz chunk stacks [c0, b0, a1], transient int32 diagonal
    buffers and the f64 accumulator — the latter two shrink to one
    row-strip x column-block when the staircases are engaged (which is
    what lifts the direct-kernel ceiling past order 512: the full
    [c0, a1, b1] f64 accumulator alone is ~1.7 GB at 640)."""
    if pair_bits is None:
        pair_bits = default_pair_bits()
    if impl is None:
        impl = default_impl()
    c0, c1 = out_shape[0], out_shape[1]
    a1, b0, b1 = a_shape[1], b_shape[0], b_shape[1]
    n_t = min(N_CHUNKS, pair_bits + 1)
    elem = 1 if impl == "int8" else 2
    tas = n_t * c0 * b0 * a1 * elem
    cb_w = _colblock()
    rb_h = _rowblock()
    trunc = c1 < a1 + b1 - 1
    cols = min(cb_w, a1) if (cb_w and min(a1, c1) > cb_w and trunc) else a1
    rows = min(rb_h, c0) if (rb_h and c0 > rb_h and trunc) else c0
    grp = 2 * rows * cols * b1 * 4
    acc = rows * cols * b1 * 8
    out = c0 * c1 * 8 if (cols < a1 or rows < c0) else 0
    return float(tas + grp + acc + out)


def ozaki_applicable(dtype_name: str, a_shape, b_shape, out_shape,
                     flops: float) -> bool:
    """True when the f64 device conv should route through the ozaki MXU
    kernel: f64 dtype, exactly 2 effective axes (callers pass squeezed
    shapes), the default device a TPU (or GENFER_OZAKI=force), the
    direct kernel within its memory cap, and the pair volume above the
    measured crossover."""
    mode = os.environ.get("GENFER_OZAKI", "1").strip()
    if mode == "0" or dtype_name != "float64" or len(out_shape) != 2:
        return False
    if mode == "force":
        thresh = _min_flops()
    else:
        if not _platform_is_tpu():
            return False
        try:
            thresh = float(mode) if mode not in ("", "1") else _min_flops()
        except ValueError:
            thresh = _min_flops()
    max_k = MAX_K_INT8 if default_impl() == "int8" else MAX_K_BF16
    if b_shape[0] > max_k or a_shape[0] > max_k:
        return False
    if estimate_bytes(a_shape, b_shape, out_shape) > _max_bytes():
        return False
    return flops >= thresh
