"""f64-accuracy truncated 2-D Cauchy products on the bf16 MXU
(Ozaki-style error-free splitting).

The default f64 conv path (taylor/backend.py `_conv_dense`) is bound by
XLA's software f64 emulation: the one hot contraction
``einsum("kji,jl->kil")`` runs on the VPU at ~95 GF/s useful (measured,
v5e, order 512) because the MXU has no f64 mode.  This module routes
the SAME contraction through the MXU with every pass bit-exact:

* scale each operand column by a power of two (exact), so entries lie
  in [-1, 1];
* peel each scaled operand into T=8 integer chunks of 7 bits
  (``x = sum_t C_t 2^{-7(t+1)} + R``, |C_t| <= 128, |R| <= 2^-57).
  Every step is EXACT in f64: the scaling is a power of two, the
  rounded chunk is representable, and the remainder subtraction is
  exact because the true difference spans < 53 bits;
* one single-pass bf16 matmul per chunk pair (t, u): products of 7-bit
  integers are <= 2^14 and the f32 accumulator holds sums of up to
  1024 of them (2^14 * 2^10 = 2^24) without rounding — the MXU pass
  returns the EXACT integer dot;
* combine the pair results in f64 with power-of-two weights and undo
  the column scales.

Keeping pairs with t+u <= P truncates the result at ~2^{-7(P+2)}
relative to the per-column scale product: P=7 (36 MXU passes) gives
~1e-16 normwise, P=6 (28 passes) ~1e-14.  The error is NORMWISE
(relative to column-max * column-max * k), the same class as true f64
summation delivers on the positive, well-scaled coefficient tensors of
this workload — measured max rel err vs the f64 path is ~1e-15 on
uniform operands at order 512 (see tests/test_parallel_ops.py).

Cost model: 36 single-pass bf16 matmuls vs ~6 passes for one
f32-HIGHEST matmul — i.e. ~6x one f32-HIGHEST einsum, far below the
~50x the f64 software emulation costs (364 ms vs ~7 ms of bf16-pass
time at order 512).  The f64 combine (36 weighted adds into the
[c0, a1, b1] accumulator) is HBM-bound and dominates; chunk count and
pair cutoff are tunable.

Reference spec being beaten: the f64 multivariate product of
/root/reference/src/multivariate_taylor.rs:984-1012 (host Rust; our
committed f64 XLA row is already 26x that at matched accuracy — this
path multiplies the device-side margin while keeping ~1e-14 class
accuracy, where the Pallas f32 kernels cap at ~1e-6).
"""

from __future__ import annotations

import functools

# 7-bit chunks: products fit 14 bits, f32 accumulates 2^24 exactly ->
# contraction length up to 1024 stays bit-exact per MXU pass
CHUNK_BITS = 7
N_CHUNKS = 8  # 8 * 7 = 56 bits >= the 53-bit f64 mantissa
MAX_K = 1 << (24 - 2 * CHUNK_BITS)  # 1024


def _pow2_colscale(jnp, x):
    """Per-column power-of-two scale 2^ceil(log2 max|col|) (1.0 for
    all-zero columns).  exp2/floor(log2) are exact on the TPU's f64
    emulation (measured; CLAUDE.md numeric policy), and dividing by a
    power of two is always exact."""
    m = jnp.max(jnp.abs(x), axis=0)
    e = jnp.ceil(jnp.log2(jnp.where(m > 0.0, m, 1.0)))
    return jnp.exp2(e)


def _chunk(jnp, x):
    """Error-free split of ``x`` (f64, |x| <= 1) into N_CHUNKS bf16
    arrays of integers in [-128, 128]:
    x = sum_t chunks[t] * 2^{-7(t+1)} + R, |R| <= 2^-57."""
    chunks = []
    r = x
    for t in range(N_CHUNKS):
        s = float(2.0 ** (CHUNK_BITS * (t + 1)))
        c = jnp.round(r * s)
        chunks.append(c.astype(jnp.bfloat16))
        r = r - c / s
    return chunks


@functools.lru_cache(maxsize=None)
def _build2d(a0: int, a1: int, b0: int, b1: int, c0: int, c1: int,
             pair_bits: int):
    import jax
    import jax.numpy as jnp

    from genfer_tpu.taylor.backend import _antidiag_sum, _toeplitz

    if b0 > MAX_K:
        raise ValueError(
            f"ozaki conv contraction length {b0} > {MAX_K}: the f32 "
            "accumulator would round — route through the blocked driver"
        )

    def conv(a, b):
        sa = _pow2_colscale(jnp, a)  # [a1]
        sb = _pow2_colscale(jnp, b)  # [b1]
        ca = _chunk(jnp, a / sa[None, :])
        cb = _chunk(jnp, b / sb[None, :])
        h = jnp.zeros((c0, a1, b1), jnp.float64)
        for t in range(min(N_CHUNKS, pair_bits + 1)):
            ta = _toeplitz(jnp, ca[t], c0, b0)  # bf16 [c0, b0, a1]
            for u in range(min(N_CHUNKS, pair_bits + 1 - t)):
                d = jnp.einsum(
                    "kji,jl->kil", ta, cb[u],
                    preferred_element_type=jnp.float32,
                )
                w = 2.0 ** (-CHUNK_BITS * (t + u + 2))
                h = h + d.astype(jnp.float64) * w
        h = h * sa[None, :, None] * sb[None, None, :]
        return _antidiag_sum(jnp, h, c1)

    return jax.jit(conv)


def conv2d_ozaki(a, b, out_shape, pair_bits: int = 7):
    """Truncated 2-D Cauchy product of f64 matrices via exact bf16 MXU
    chunk passes (see module docstring).  ``pair_bits`` keeps chunk
    pairs with t+u <= pair_bits: 7 = 36 passes (~1e-16 normwise),
    6 = 28 passes (~1e-14)."""
    from genfer_tpu import enable_x64

    enable_x64()
    return _build2d(
        int(a.shape[0]), int(a.shape[1]),
        int(b.shape[0]), int(b.shape[1]),
        int(out_shape[0]), int(out_shape[1]), int(pair_bits),
    )(a, b)
