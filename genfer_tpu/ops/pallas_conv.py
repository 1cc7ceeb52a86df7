"""Pallas TPU kernel for the truncated 1-D Cauchy product.

The truncated power-series product ``c[k] = sum_j b[j] * a[k-j]`` is the
hot op of GF evaluation (reference: multivariate_taylor.rs:972-982
``mul_1d``).  Strategy: one 128-wide output tile per grid step,
shift-and-accumulate over the ``b`` coefficients.  Mosaic requires
lane-aligned vector loads, so each sliding window of ``a`` is assembled
from two aligned tiles combined with a dynamic rotate
(``pltpu.roll`` lowers to tpu.dynamic_rotate):

    window(start) = roll([tile(base) | tile(base+128)], -offset)[:128]
    where base = floor(start/128)*128, offset = start - base.

f32 only — the TPU VPU has no native f64; the f64 path runs through the
XLA backend kernels (compiler f64 emulation).  This kernel is the
groundwork for an extended-precision (two-float compensated) fast mode
with the same structure.
"""

from __future__ import annotations

import functools


TILE = 128


@functools.lru_cache(maxsize=None)
def _build(la: int, lb: int, lc: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # left padding: a multiple of TILE >= lb so k - j + left >= 0
    left = ((lb + TILE - 1) // TILE) * TILE
    padded_len = left + ((max(la, lc) + 2 * TILE - 1) // TILE) * TILE + TILE
    num_tiles = pl.cdiv(lc, TILE)
    out_len = num_tiles * TILE

    def kernel(a_ref, b_ref, o_ref):
        t = pl.program_id(0)
        k0 = t * TILE

        def body(j, acc):
            start = k0 - j + left
            base = pl.multiple_of((start // TILE) * TILE, TILE)
            offset = start - base
            two = a_ref[:, pl.ds(base, 2 * TILE)]  # (1, 2*TILE)
            window = pltpu.roll(two, -offset, 1)[:, :TILE]
            return acc + b_ref[0, j] * window

        acc = jax.lax.fori_loop(
            0, lb, body, jnp.zeros((1, TILE), jnp.float32)
        )
        o_ref[:, :] = acc

    call = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, padded_len), lambda t: (0, 0)),
            # b coefficients are read one scalar at a time with a dynamic
            # index - that is an SMEM access pattern
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((1, out_len), jnp.float32),
        interpret=interpret,
    )

    def run(a, b):
        ap = jnp.zeros((1, padded_len), jnp.float32)
        ap = ap.at[0, left : left + la].set(a.astype(jnp.float32))
        bp = b.astype(jnp.float32).reshape(1, lb)
        out = call(ap, bp)
        return out[0, :lc]

    return jax.jit(run)


def conv1d_pallas(a, b, out_len: int, interpret: bool = False):
    """Truncated 1-D convolution of float vectors on the TPU VPU.

    ``interpret=True`` runs the kernel in the Pallas interpreter (for
    CPU-only testing)."""
    return _build(int(a.shape[0]), int(b.shape[0]), int(out_len), interpret)(
        a, b
    )
