"""Device-mesh sharding of the Taylor engine.

The reference is single-threaded Rust with no distributed backend
(SURVEY.md §2.9); the TPU-native scaling story is *intra-op*: coefficient
tensors of ``O(order^num_vars)`` elements are sharded over mesh axes and
the truncated Cauchy-product kernels become blocked MXU matmuls whose
collectives ride ICI.

Axes:

* ``dp`` - data parallel over independent evaluation points / programs
  (the batched probability-extraction dimension, reference
  main.rs:424-449 loops over extraction indices sequentially),
* ``tp`` - tensor parallel over blocks of the *output* coefficient axis:
  each device computes one block of output rows of the Cauchy product
  from (replicated) inputs; inputs are O(order^n) while compute is
  O(order^{n+1})-ish, so replicating inputs and sharding the output
  space is the bandwidth-optimal layout until orders get very large.
"""

from __future__ import annotations

import numpy as np


def _jax():
    import jax

    jax.config.update("jax_enable_x64", True)
    return jax


def make_mesh(n_devices: int | None = None, dp: int | None = None):
    """Create a (dp, tp) mesh over the available devices."""
    jax = _jax()
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None:
        dp = 2 if (n >= 4 and n % 2 == 0) else 1
    tp = n // dp
    assert dp * tp == n, f"mesh {dp}x{tp} does not cover {n} devices"
    mesh_devices = np.array(devices).reshape(dp, tp)
    from jax.sharding import Mesh

    return Mesh(mesh_devices, ("dp", "tp"))


def _toeplitz(jnp, a, out_len, b_len, row_offset=0, total_rows=None):
    """T[k, j] = a[row_offset + k - j], gather-free (skew reshape; TPU
    gathers serialize to scalar loads).  ``total_rows`` bounds
    ``row_offset + out_len`` so the band vector can be built statically;
    ``row_offset`` may be traced (e.g. ``axis_index`` inside shard_map)."""
    import jax as _jax

    rest = a.shape[1:]
    la = a.shape[0]
    total = total_rows if total_rows is not None else out_len
    # band vector over all rows: v_full[t] = a[t - (b_len - 1)]
    Lfull = total + b_len - 1
    pad_front = b_len - 1
    v_full = jnp.concatenate([
        jnp.zeros((pad_front,) + rest, a.dtype),
        a[: max(0, Lfull - pad_front)],
        jnp.zeros((max(0, Lfull - pad_front - la),) + rest, a.dtype),
    ])[:Lfull]
    L = out_len + b_len - 1
    if total_rows is None and not isinstance(row_offset, int):
        raise ValueError("traced row_offset requires total_rows")
    if isinstance(row_offset, int) and row_offset == 0:
        v = v_full[:L]
    else:
        if isinstance(row_offset, int):
            start = (row_offset,) + (0,) * len(rest)
        else:  # traced (e.g. axis_index): match its integer dtype
            zero = jnp.zeros((), row_offset.dtype)
            start = (row_offset,) + (zero,) * len(rest)
        v = _jax.lax.dynamic_slice(
            v_full, start, (L,) + tuple(rest)
        )
    w = jnp.concatenate([v, jnp.zeros((1,) + rest, a.dtype)])
    reps = out_len + 2
    flat = jnp.broadcast_to(w[None], (reps,) + w.shape).reshape(
        (reps * (L + 1),) + rest
    )
    U = flat[: out_len * (L + 2)].reshape((out_len, L + 2) + rest)
    return jnp.flip(U[:, :b_len], axis=1)


def sharded_conv_1d(mesh, a, b, out_len: int):
    """Truncated 1-D Cauchy product with the output rows sharded over the
    ``tp`` mesh axis; inputs replicated (they are O(n) vs O(n^2) compute)."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map  # jax>=0.6 top-level API (experimental path is deprecated)
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["tp"]
    assert out_len % tp == 0, "out_len must divide the tp axis"
    block = out_len // tp

    def kernel(a_full, b_full):
        r = jax.lax.axis_index("tp")
        T = _toeplitz(jnp, a_full, block, b_full.shape[0],
                      row_offset=r * block, total_rows=out_len)
        return T @ b_full

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("tp"),
        check_vma=False,
    )
    return fn(a, b)


def sharded_conv_2d(mesh, a, b, out_shape):
    """Truncated 2-D Cauchy product, output rows (axis 0) sharded over
    ``tp``.  Each device runs the two-step Toeplitz/one-hot contraction
    for its row block (see genfer_tpu.taylor.backend._conv_dense)."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map  # jax>=0.6 top-level API (experimental path is deprecated)
    from jax.sharding import PartitionSpec as P

    c0, c1 = out_shape
    tp = mesh.shape["tp"]
    assert c0 % tp == 0
    block = c0 // tp

    def kernel(a_full, b_full):
        r = jax.lax.axis_index("tp")
        a0, a1 = a_full.shape
        b0, b1 = b_full.shape
        Ta = _toeplitz(jnp, a_full, block, b0,
                       row_offset=r * block, total_rows=c0)
        H = jnp.einsum("kji,jl->kil", Ta, b_full)
        i = jnp.arange(a1)[:, None, None]
        j = jnp.arange(b1)[None, :, None]
        k = jnp.arange(c1)[None, None, :]
        E1 = ((i + j) == k).astype(a_full.dtype)
        return jnp.einsum("kij,ijl->kl", H, E1)

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P("tp"),
        check_vma=False,
    )
    return fn(a, b)


def sharded_conv_nd(mesh, a, b, out_shape):
    """Truncated n-D Cauchy product with the *first operand's* leading
    axis sharded over ``tp``: each device convolves its row block of ``a``
    with the replicated ``b`` and the partial outputs are psum-reduced.
    Works for any ndim (the 3/4-variable models of SURVEY §2.9); compute
    splits exactly 1/tp per device while communication is one psum of the
    output tensor over ICI."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map  # jax>=0.6 top-level API (experimental path is deprecated)
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape["tp"]
    a0 = a.shape[0]
    b0 = b.shape[0]
    blk = (a0 + tp - 1) // tp
    a0p = blk * tp
    if a0p != a0:
        a = jnp.pad(a, [(0, a0p - a0)] + [(0, 0)] * (a.ndim - 1))
    rest = tuple(out_shape[1:])
    # local conv runs to blk + b0 - 1 rows; the device's rows land at
    # offset r*blk in a big buffer of exactly (tp-1)*blk + blk + b0 - 1
    # rows so dynamic_update_slice never clamps, then truncate after psum
    loc_len = blk + b0 - 1
    big_len = a0p + b0 - 1

    def kernel(a_loc, b_full):
        r = jax.lax.axis_index("tp")
        from ..taylor.backend import _conv_dense

        loc = _conv_dense(jnp, a_loc, b_full, (loc_len,) + rest)
        big = jnp.zeros((big_len,) + rest, a_loc.dtype)
        start = (r * blk,) + tuple(
            jnp.zeros((), r.dtype) for _ in rest
        )
        big = jax.lax.dynamic_update_slice(big, loc, start)
        return jax.lax.psum(big, "tp")

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("tp"), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(a, b)
    return out[: out_shape[0]]


def halo_conv_nd(mesh, a, b, out_shape, col_chunk=None):
    """Truncated n-D Cauchy product with *operand storage* sharded:
    ``a``, ``b`` and the output are all row-sharded over ``tp``, so an
    8-device mesh holds ~8x the coefficients of one device (SURVEY
    §2.9's memory-scaling row; the replicated-operand kernels above
    shard only compute).

    Systolic schedule over ``tp`` steps; at step ``s`` device ``r``
    holds the accumulator block ``K = r + s`` (blocks rotate one
    neighbor down per step) and the visiting operand block ``a_s``
    (one block broadcast per step):

        P = a_s (*) b_r          spans output blocks K, K+1
        acc_K   += P[:B]         resident (masked when K >= tp)
        acc_K+1 += P[B:]         one-neighbor ppermute "halo" spill
        acc      rotates r -> r-1

    After ``tp`` steps every accumulator is back home.  Per-step
    communication is three O(block) transfers over ICI (broadcast,
    spill, rotation); per-device peak memory is O(rows/tp), verified by
    compiled memory_analysis in tests/test_parallel_ops.py."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..taylor.backend import _conv_dense

    out_shape = tuple(int(x) for x in out_shape)
    c0, rest = out_shape[0], out_shape[1:]
    tp = mesh.shape["tp"]
    assert c0 % tp == 0, "out rows must divide the tp axis"
    B = c0 // tp
    ring_up = [(i, (i + 1) % tp) for i in range(tp)]    # spill r -> r+1
    ring_down = [(i, (i - 1) % tp) for i in range(tp)]  # acc r -> r-1

    c1 = rest[0]
    a1 = int(a.shape[1])
    b1 = int(b.shape[1])
    W = -(-a1 // tp)  # axis-1 chunk: bounds the cubic intermediate of
    # the local conv at (2B, W, b1, rest[1:]) ~ 2n^3/tp^2 per device
    tail = rest[1:]
    # beyond-HBM orders: chunk BOTH operands' axis 1 (the P-pair
    # decomposition of ops/blocked_conv.py routed through the mesh).
    # The pair loop is a lax.fori_loop over uniform-shape slices, so
    # XLA reuses ONE part buffer: per-device temp is
    # (2B, col_chunk, col_chunk, rest[1:]) regardless of total order.
    if col_chunk:
        import numpy as _np

        Wa = min(max(W, 1), col_chunk)
        Wb = min(b1, col_chunk)
        na = -(-min(a1, c1) // Wa)
        nbk = -(-b1 // Wb)
        pair_offs = _np.asarray(
            [
                (ia * Wa, ib * Wb)
                for ia in range(na)
                for ib in range(nbk)
                if ia * Wa + ib * Wb < c1
            ],
            dtype=_np.int32,
        )
        wpart = Wa + Wb - 1

        def local_conv(a_vis, b_loc):
            ap = jnp.zeros(
                (a_vis.shape[0], na * Wa) + a_vis.shape[2:], a_vis.dtype
            ).at[:, : min(a1, c1)].set(a_vis[:, : min(a1, c1)])
            bp = jnp.zeros(
                (b_loc.shape[0], nbk * Wb) + b_loc.shape[2:], b_loc.dtype
            ).at[:, :b1].set(b_loc)
            offs = jnp.asarray(pair_offs)
            fullp = jnp.zeros(
                (2 * B - 1, c1 + wpart) + tuple(rest[1:]), a_vis.dtype
            )

            def body(i, fullp):
                oa, ob = offs[i, 0], offs[i, 1]
                z = jnp.zeros((), oa.dtype)
                asl = jax.lax.dynamic_slice(
                    ap, (z, oa) + (z,) * len(ap.shape[2:]),
                    (ap.shape[0], Wa) + ap.shape[2:],
                )
                bsl = jax.lax.dynamic_slice(
                    bp, (z, ob) + (z,) * len(bp.shape[2:]),
                    (bp.shape[0], Wb) + bp.shape[2:],
                )
                part = _conv_dense(
                    jnp, asl, bsl, (2 * B - 1, wpart) + tail
                )
                idx = (z, oa + ob) + (z,) * len(tail)
                cur = jax.lax.dynamic_slice(
                    fullp, idx, (2 * B - 1, wpart) + tail
                )
                return jax.lax.dynamic_update_slice(
                    fullp, cur + part, idx
                )

            fullp = jax.lax.fori_loop(0, len(pair_offs), body, fullp)
            return fullp[:, :c1]
    else:
        def local_conv(a_vis, b_loc):
            full = jnp.zeros((2 * B - 1,) + rest, a_vis.dtype)
            for t in range(tp):
                lo = t * W
                if lo >= a1 or lo >= c1:
                    break
                hi = min(a1, lo + W)
                wlen = min(hi - lo + b1 - 1, c1 - lo)
                part = _conv_dense(
                    jnp, a_vis[:, lo:hi], b_loc, (2 * B - 1, wlen) + tail
                )
                full = full.at[:, lo : lo + wlen].add(part)
            return full

    def kernel(a_loc, b_loc):
        r = jax.lax.axis_index("tp")
        acc = jnp.zeros((B,) + rest, a_loc.dtype)

        def step(s, acc):
            # broadcast block a_s: psum of the masked local block
            a_vis = jax.lax.psum(
                jnp.where(r == s, a_loc, jnp.zeros_like(a_loc)), "tp"
            )
            full = local_conv(a_vis, b_loc)
            low, high = full[:B], full[B:]
            keep = (r + s < tp)
            acc = acc + jnp.where(keep, low, jnp.zeros_like(low))
            spill = jnp.where(keep, high, jnp.zeros_like(high))
            spill = jax.lax.ppermute(spill, "tp", ring_up)
            # device 0's received spill wrapped from tp-1: block tp+s,
            # always truncated
            ok = (r > 0) & (r + s < tp)
            pad = jnp.zeros((1,) + rest, a_loc.dtype)
            acc = acc + jnp.where(
                ok, jnp.concatenate([spill, pad]), 0.0
            )
            return jax.lax.ppermute(acc, "tp", ring_down)

        acc = jax.lax.fori_loop(0, tp, step, acc)
        return acc

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("tp"), P("tp")),
        out_specs=P("tp"),
        check_vma=False,
    )
    return fn(a, b)


#: 2-D entry point kept for existing callers (tests, dryrun stage 1b)
halo_conv_2d = halo_conv_nd


def sharded_div_lanes(mesh, xs, ys, out_shape, axis):
    """Power-series division along one effective axis, with the *other*
    lanes sharded over ``tp``: the lower-triangular Toeplitz solve
    (reference recurrence multivariate_taylor.rs:1162-1192) is sequential
    only along ``axis``; every other lane is independent."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map  # jax>=0.6 top-level API (experimental path is deprecated)
    from jax.sharding import PartitionSpec as P

    from ..taylor.backend import _toeplitz

    tp = mesh.shape["tp"]
    n = out_shape[axis]
    yvec = jnp.moveaxis(ys, axis, 0).reshape(ys.shape[axis])
    xmat = jnp.moveaxis(xs, axis, 0).reshape(xs.shape[axis], -1)
    pad = n - xmat.shape[0]
    xmat = jnp.pad(xmat, ((0, pad), (0, 0))) if pad > 0 else xmat[:n]
    lanes = xmat.shape[1]
    lanesp = ((lanes + tp - 1) // tp) * tp
    if lanesp != lanes:
        xmat = jnp.pad(xmat, ((0, 0), (0, lanesp - lanes)))

    def kernel(x_loc, y_full):
        T = _toeplitz(jnp, y_full, n, n)
        return jax.lax.linalg.triangular_solve(
            T, x_loc, left_side=True, lower=True
        )

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None, "tp"), P()),
        out_specs=P(None, "tp"),
        check_vma=False,
    )
    sol = fn(xmat, yvec)[:, :lanes]
    inter_sq = [s for i, s in enumerate(out_shape) if i != axis]
    return jnp.moveaxis(sol.reshape([n] + inter_sq), 0, axis)


def sharded_inference_step(mesh, batch_a, batch_b, out_shape):
    """One full sharded inference step on a batch of 2-D coefficient
    tensors: dp-sharded batch, tp-sharded Cauchy product, followed by the
    marginalization reduction ``evaluate_all_one`` (sum of all
    coefficients, reference multivariate_taylor.rs:582-586) via a psum
    over the tp axis.

    Returns (products, totals): the batched truncated products and their
    total masses."""
    jax = _jax()
    import jax.numpy as jnp
    from jax import shard_map  # jax>=0.6 top-level API (experimental path is deprecated)
    from jax.sharding import PartitionSpec as P

    c0, c1 = out_shape
    tp = mesh.shape["tp"]
    dp = mesh.shape["dp"]
    assert c0 % tp == 0 and batch_a.shape[0] % dp == 0
    block = c0 // tp

    def kernel(a_blk, b_blk):
        # a_blk: [batch/dp, a0, a1]; compute this device's row block of the
        # product for each batch element
        r = jax.lax.axis_index("tp")

        def one(a_full, b_full):
            b0, b1 = b_full.shape
            a1 = a_full.shape[1]
            Ta = _toeplitz(jnp, a_full, block, b0,
                       row_offset=r * block, total_rows=c0)
            H = jnp.einsum("kji,jl->kil", Ta, b_full)
            i = jnp.arange(a1)[:, None, None]
            j = jnp.arange(b1)[None, :, None]
            k = jnp.arange(c1)[None, None, :]
            E1 = ((i + j) == k).astype(a_full.dtype)
            return jnp.einsum("kij,ijl->kl", H, E1)

        prod = jax.vmap(one)(a_blk, b_blk)
        # total mass: local partial sum, then reduce over the sharded axis
        totals = jax.lax.psum(jnp.sum(prod, axis=(1, 2)), "tp")
        return prod, totals

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp", "tp"), P("dp")),
        check_vma=False,
    )
    return fn(batch_a, batch_b)


class ShardedF64Backend:
    """JAX f64 backend whose large Cauchy products run sharded over a
    device mesh (output-row blocks on the ``tp`` axis).  Small ops stay
    single-device; the crossover is sized so the per-device work still
    saturates the MXU.

    Power-series recurrences: multivariate (>=2 effective axes) div, exp
    and log are Newton-lifted into truncated convolutions
    (taylor/backend.py) and therefore shard through ``conv_trunc``
    automatically.  Single-effective-axis exp/log need no sharding: the
    input is a vector, so the recurrence IS the only lane — there is no
    independent work to distribute (1-axis div is different: the
    dividend's other lanes are independent, hence sharded_div_lanes).

    Construct with ``ShardedF64Backend(make_mesh())`` or let the CLI build
    it via ``--backend sharded``."""

    #: minimum multiply-adds before a conv is worth sharding (per-device
    #: dispatch + the output psum must amortize)
    CONV_SHARD_FLOPS = 4_000_000
    #: minimum independent lanes per device for the sharded solve
    MIN_LANES_PER_DEVICE = 8
    #: column-chunk width of the in-kernel P-pair decomposition for
    #: beyond-HBM orders (applied when out cols > 2x this)
    HALO_COL_CHUNK = 512

    #: output rows from which the memory-scaled halo kernel replaces the
    #: replicated-operand kernel (the replicated Toeplitz intermediate is
    #: cubic; the halo kernel holds O(rows/tp) operand + O(n^3/tp^2) temp)
    HALO_MIN_ROWS = 1024

    def __new__(cls, mesh=None, min_rows_per_device: int = 64,
                conv_shard_flops: int | None = None,
                min_lanes_per_device: int | None = None,
                shape_bucket: int = 64,
                halo_min_rows: int | None = None):
        from ..taylor.backend import HybridBackend, JaxF64Backend

        shard_flops = (
            cls.CONV_SHARD_FLOPS if conv_shard_flops is None
            else conv_shard_flops
        )
        min_lanes = (
            cls.MIN_LANES_PER_DEVICE if min_lanes_per_device is None
            else min_lanes_per_device
        )
        halo_rows = (
            cls.HALO_MIN_ROWS if halo_min_rows is None else halo_min_rows
        )

        class _Impl(JaxF64Backend):
            def __init__(self, mesh, min_rows):
                super().__init__()
                self.mesh = mesh or make_mesh()
                self.min_rows = min_rows
                self.conv_shard_flops = shard_flops
                self.min_lanes_per_device = min_lanes
                self.shape_bucket = shape_bucket
                self.HALO_COL_CHUNK = ShardedF64Backend.HALO_COL_CHUNK

            def _bucket(self, n: int) -> int:
                # bucket to a coarse grid to bound shard_map compiles,
                # but never inflate small axes onto the full-size grid:
                # padding a 3-var conv from 16^3 to 64^3 is a 70x blowup
                bk = min(self.shape_bucket,
                         max(8, 1 << (max(int(n), 1) - 1).bit_length()))
                return ((int(n) + bk - 1) // bk) * bk

            def _pad_to(self, arr, shape):
                if tuple(arr.shape) == tuple(shape):
                    return arr
                return self.jnp.pad(
                    arr, [(0, t - s) for s, t in zip(arr.shape, shape)]
                )

            def conv_trunc(self, a, b, out_shape):
                # Sharded convs run on zero-padded shapes bucketed to
                # multiples of shape_bucket: extra zero coefficients do
                # not change the truncated product's low-order outputs,
                # and the mesh compiles one shard_map program per bucket
                # instead of one per exact shape (a GF eval touches
                # dozens of near-identical shapes from pow towers and
                # per-variable substitutions).
                out_shape = tuple(int(s) for s in out_shape)
                tp = self.mesh.shape["tp"]
                eff = [i for i, s in enumerate(out_shape) if s != 1]
                big = (
                    HybridBackend._conv_flops(
                        tuple(a.shape), tuple(b.shape), out_shape
                    )
                    >= self.conv_shard_flops
                )
                if (
                    tp > 1
                    and len(eff) == 2
                    and eff[0] == 0
                    and out_shape[0] >= halo_rows
                ):
                    # memory-scaled path: operand storage sharded 1/tp
                    rows = ((out_shape[0] + tp - 1) // tp) * tp
                    cols = out_shape[1]
                    # operand rows >= out rows never contribute below
                    # the truncation bound: cut, then zero-pad to blocks
                    a2 = a.reshape(a.shape[0], -1)[:rows]
                    b2 = b.reshape(b.shape[0], -1)[:rows]
                    a2 = self._pad_to(a2, (rows, a2.shape[1]))
                    b2 = self._pad_to(b2, (rows, b2.shape[1]))
                    # beyond-HBM orders: bound the per-device temp with
                    # the in-kernel P-pair column decomposition
                    cc = (self.HALO_COL_CHUNK
                          if cols > 2 * self.HALO_COL_CHUNK else None)
                    out = halo_conv_2d(
                        self.mesh, a2, b2, (rows, cols), col_chunk=cc
                    )
                    return out[: out_shape[0]].reshape(out_shape)
                if (
                    tp > 1
                    and len(eff) == 2
                    and eff[0] == 0
                    and out_shape[0] >= tp * self.min_rows
                ):
                    rows = self._bucket(out_shape[0])
                    rows = ((rows + tp - 1) // tp) * tp
                    cols = self._bucket(out_shape[1])
                    a2 = a.reshape(a.shape[0], -1)
                    b2 = b.reshape(b.shape[0], -1)
                    a2 = self._pad_to(a2, (self._bucket(a2.shape[0]),
                                           self._bucket(a2.shape[1])))
                    b2 = self._pad_to(b2, (self._bucket(b2.shape[0]),
                                           self._bucket(b2.shape[1])))
                    out = sharded_conv_2d(self.mesh, a2, b2, (rows, cols))
                    out = out[: out_shape[0], : out_shape[1]]
                    return out.reshape(out_shape)
                if (
                    tp > 1
                    and len(eff) == 1
                    and out_shape[eff[0]] >= tp * 4 * self.min_rows
                ):
                    n = out_shape[eff[0]]
                    rows = ((self._bucket(n) + tp - 1) // tp) * tp
                    av = a.reshape(-1)
                    bv = b.reshape(-1)
                    av = self._pad_to(av, (self._bucket(av.shape[0]),))
                    bv = self._pad_to(bv, (self._bucket(bv.shape[0]),))
                    out = sharded_conv_1d(self.mesh, av, bv, rows)[:n]
                    shape = [1] * len(out_shape)
                    shape[eff[0]] = n
                    return out.reshape(out_shape)
                if tp > 1 and len(eff) >= 3 and big:
                    # shard operand rows of the leading effective axis
                    # (works for any ndim; psum-reduced partial outputs)
                    a_sq = a.reshape([a.shape[i] for i in eff])
                    b_sq = b.reshape([b.shape[i] for i in eff])
                    eff_out = tuple(out_shape[i] for i in eff)
                    if eff_out[0] >= halo_rows:
                        # memory-scaled n-D path: operand storage 1/tp
                        rows = ((eff_out[0] + tp - 1) // tp) * tp
                        a2 = self._pad_to(
                            a_sq[:rows], (rows,) + a_sq.shape[1:]
                        )
                        b2 = self._pad_to(
                            b_sq[:rows], (rows,) + b_sq.shape[1:]
                        )
                        out = halo_conv_nd(
                            self.mesh, a2, b2, (rows,) + eff_out[1:]
                        )
                        return out[: eff_out[0]].reshape(out_shape)
                    # shard the larger operand's leading axis
                    if b_sq.shape[0] > a_sq.shape[0]:
                        a_sq, b_sq = b_sq, a_sq
                    if a_sq.shape[0] >= tp:
                        a_sq = self._pad_to(
                            a_sq, tuple(self._bucket(s) for s in a_sq.shape)
                        )
                        b_sq = self._pad_to(
                            b_sq, tuple(self._bucket(s) for s in b_sq.shape)
                        )
                        big_out = tuple(self._bucket(s) for s in eff_out)
                        out = sharded_conv_nd(self.mesh, a_sq, b_sq, big_out)
                        out = out[tuple(slice(0, s) for s in eff_out)]
                        return out.reshape(out_shape)
                return super().conv_trunc(a, b, out_shape)

            def poly_div(self, xs, ys, out_shape):
                out_shape = tuple(int(s) for s in out_shape)
                tp = self.mesh.shape["tp"]
                from ..taylor.backend import _effective_axes

                eff_ys = _effective_axes(tuple(ys.shape))
                if tp > 1 and len(eff_ys) == 1:
                    axis = eff_ys[0]
                    lanes = 1
                    for i, s in enumerate(out_shape):
                        if i != axis:
                            lanes *= s
                    if lanes >= tp * self.min_lanes_per_device:
                        return sharded_div_lanes(
                            self.mesh, xs, ys, out_shape, axis
                        )
                return super().poly_div(xs, ys, out_shape)

        return _Impl(mesh, min_rows_per_device)
