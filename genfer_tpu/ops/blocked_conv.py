"""Block-decomposed truncated 2-D Cauchy products beyond the VMEM /
f64-emulation order ceiling.

Write ``a(x) = sum_I a_I(x) x^(P*I)`` with P x P coefficient blocks
(per axis); then

    a * b = sum_{I,J} (a_I * b_J) x^(P*(I+J))

where each small product ``a_I * b_J`` is a FULL (untruncated)
(2P-1, 2P-1) conv of P x P operands, computed by the existing fast
kernels — the Pallas MXU kernel (f32) or the XLA f64 Toeplitz path —
whose memory footprint is bounded by P, not by the total order:

* the Pallas kernel's VMEM residency caps per-axis orders at ~768;
  blocking with P=512 lifts it to arbitrary order (the driver below
  benches 1024 and 2048 on the real chip);
* the XLA f64 path OOMs at order-1024 2-var (the (c0, b0, a1) Toeplitz
  einsum under 8x f32 emulation buffers, CLAUDE.md); blocking with
  P=256 keeps every intermediate ~0.5 GB.

Pairs whose offset lands entirely above the truncation bound are
skipped.  Total MACs are identical to the direct truncated product up
to the boundary pairs (whose out-of-range half is computed then
dropped), so blocking is FLOP-neutral at the orders that matter.

Long products are dispatched in groups (``run_chunked``) so no single
device program exceeds the TPU watchdog (~10 s through the tunnel
kills the worker, CLAUDE.md).

Reference capability matched: host-RAM-limited order scaling of
multivariate products (multivariate_taylor.rs:984-1012).
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Sequence


def block_pairs(a_shape, b_shape, out_shape, P: int):
    """Static block-pair plan: list of (i0, i1, j0, j1) block indices
    whose product contributes below the truncation bound."""
    ma0 = -(-a_shape[0] // P)
    ma1 = -(-a_shape[1] // P)
    mb0 = -(-b_shape[0] // P)
    mb1 = -(-b_shape[1] // P)
    pairs = []
    for i0 in range(ma0):
        for j0 in range(mb0):
            if P * (i0 + j0) >= out_shape[0]:
                continue
            for i1 in range(ma1):
                for j1 in range(mb1):
                    if P * (i1 + j1) >= out_shape[1]:
                        continue
                    pairs.append((i0, i1, j0, j1))
    return pairs


def _pad_blocks(jnp, x, P: int):
    """Pad to a multiple of P per axis and cut into (m0, m1, P, P)."""
    s0, s1 = x.shape
    m0, m1 = -(-s0 // P), -(-s1 // P)
    xp = jnp.zeros((m0 * P, m1 * P), x.dtype).at[:s0, :s1].set(x)
    return xp.reshape(m0, P, m1, P).transpose(0, 2, 1, 3)


def conv2d_blocked(a, b, out_shape, P: int, inner: Callable,
                   group: int = 0, out_dtype=None):
    """Truncated 2-D Cauchy product via P-block decomposition.

    ``inner(a_blk, b_blk) -> (2P-1, 2P-1)`` computes one full small
    product (must be shape-uniform so every pair shares one compiled
    graph).  ``group > 0`` splits the pair list into host-dispatched
    chunks of that many pairs (device carry accumulates), keeping each
    device program under the watchdog; ``group == 0`` builds one graph.
    """
    import jax
    import jax.numpy as jnp

    c0, c1 = int(out_shape[0]), int(out_shape[1])
    pairs = block_pairs(a.shape, b.shape, (c0, c1), P)
    dtype = out_dtype or a.dtype
    ab = _pad_blocks(jnp, a, P)
    bb = _pad_blocks(jnp, b, P)
    # pad the accumulator so every (2P-1) small product fits at its
    # offset without clipping logic; crop at the end
    acc_shape = (c0 + 2 * P, c1 + 2 * P)

    def chunk_fn(acc, a_blocks, b_blocks, offs):
        def body(i, acc):
            small = inner(a_blocks[i], b_blocks[i]).astype(dtype)
            o0, o1 = offs[i, 0], offs[i, 1]
            cur = jax.lax.dynamic_slice(
                acc, (o0, o1), (2 * P - 1, 2 * P - 1)
            )
            return jax.lax.dynamic_update_slice(
                acc, cur + small, (o0, o1)
            )
        return jax.lax.fori_loop(0, a_blocks.shape[0], body, acc)

    chunk_jit = jax.jit(chunk_fn)

    import numpy as np

    def stage(sel):
        a_sel = jnp.stack([ab[i0, i1] for (i0, i1, _, _) in sel])
        b_sel = jnp.stack([bb[j0, j1] for (_, _, j0, j1) in sel])
        offs = jnp.asarray(
            np.array([
                [P * (i0 + j0), P * (i1 + j1)]
                for (i0, i1, j0, j1) in sel
            ], dtype=np.int32)
        )
        return a_sel, b_sel, offs

    acc = jnp.zeros(acc_shape, dtype)
    if group <= 0 or group > len(pairs):
        group = len(pairs)
    for k in range(0, len(pairs), group):
        sel = pairs[k : k + group]
        n_real = len(sel)
        if n_real < group:
            # pad the last chunk to the uniform group size (masked to
            # zero below) so every dispatch shares one compiled graph
            sel = sel + [sel[-1]] * (group - n_real)
        a_sel, b_sel, offs = stage(sel)
        if n_real < group:
            mask = np.zeros((group, 1, 1))
            mask[:n_real] = 1.0
            a_sel = a_sel * jnp.asarray(mask, dtype=a_sel.dtype)
        acc = chunk_jit(acc, a_sel, b_sel, offs)
    return acc[:c0, :c1]


def spot_check(a, b, out, n_samples: int = 64, seed: int = 0):
    """Host-exact f64 check of random output coefficients:
    c[k0,k1] = sum_{i<=k} a[i0,i1] b[k0-i0,k1-i1].  Returns max rel
    error over the sampled coefficients (ground truth for orders where
    the full host conv is infeasible)."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = np.asarray(out)
    rng = np.random.default_rng(seed)
    c0, c1 = out.shape
    worst = 0.0
    for _ in range(n_samples):
        k0 = int(rng.integers(0, c0))
        k1 = int(rng.integers(0, c1))
        i0lo = max(0, k0 - (b.shape[0] - 1))
        i0hi = min(a.shape[0] - 1, k0)
        i1lo = max(0, k1 - (b.shape[1] - 1))
        i1hi = min(a.shape[1] - 1, k1)
        if i0lo > i0hi or i1lo > i1hi:
            truth = 0.0
        else:
            aw = a[i0lo : i0hi + 1, i1lo : i1hi + 1]
            bw = b[k0 - i0hi : k0 - i0lo + 1, k1 - i1hi : k1 - i1lo + 1]
            truth = float(np.sum(aw * bw[::-1, ::-1]))
        got = float(out[k0, k1])
        denom = max(abs(truth), 1e-300)
        worst = max(worst, abs(got - truth) / denom)
    return worst
