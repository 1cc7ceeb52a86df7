"""Scan-compiled 2-state Poisson HMM and Poisson-mixture families
(reference: generate_hmm.rs / generate_mixture.rs,
benchmarks/neurips2023/approx/{hmm,mixture}).

The generated hmm model unrolls, per observation ``c_t``:

    if State = 0 { observe c_t ~ Poisson(f * Rate1); State ~ Bernoulli(p01); }
    else         { observe c_t ~ Poisson(f * Rate2); State ~ Bernoulli(p11); }

with Geometric priors on the two rates.  The joint posterior state is
the tensor ``g[s, r1, r2]`` (s the hidden state, r_i the latent integer
rates); each round is a *diagonal* likelihood reweighting along the
active rate axis followed by a 2x2 state-transition mix, so the whole
observation sequence is one ``lax.scan`` and the graph is independent
of its length.  The reference instead builds a ~200-node GF per round
and runs compound-Poisson derivative chains
(generating_function.rs:670-711) at evaluation time (~7 s per dataset
for the committed 30-observation benchmark).

The mixture model (coal-mining disasters, 109 observations) is the same
family without the hidden state: each observation reweights the joint
rate grid by ``q pmf(c; f r1) + (1-q) pmf(c; f r2)``; the interpreter
needs ~20 minutes on it.

TPU numeric policy (measured; see CLAUDE.md): the device f64 emulation
has f32-like dynamic range and ~3.5e-8-accurate ``exp``, so the Poisson
pmf tables are precomputed on the host in real f64 (indexed by the
runtime counts on device), the scan carry max-rescales each step with
an accumulated log-scale, and the final ``marginal * exp(logz)``
happens on the host.

Truncation: Geometric rates are truncated at ``n_rates`` (tail mass
0.9^N; the reference truncates the same tail at its Taylor evaluation
degree).  Both families are validated against the committed golden
outputs in tests/test_population_scan.py.
"""

from __future__ import annotations

import numpy as np


def _geometric(p: float, n: int) -> np.ndarray:
    rs = np.arange(n, dtype=np.float64)
    return p * (1.0 - p) ** rs


def _poisson_pmf_table(factor: float, n_rates: int,
                       max_count: int) -> np.ndarray:
    """W[c, r] = e^{-f r} (f r)^c / c!  computed on the host in real
    f64 by the stable ratio recurrence W[c] = W[c-1] * (f r) / c."""
    lam = factor * np.arange(n_rates, dtype=np.float64)
    W = np.zeros((max_count + 1, n_rates))
    W[0] = np.exp(-lam)
    for c in range(1, max_count + 1):
        W[c] = W[c - 1] * lam / c
    return W


class CompiledHMM:
    """One-compile scan inference for the 2-state Poisson HMM family.

    Parameters mirror the generated model: ``geo_p`` the Geometric prior
    parameter of both rates, ``factor`` the Poisson rate multiplier,
    ``trans = (p01, p11)`` the probability that the next state is 1
    given the current state, ``init_state`` the deterministic initial
    state.  ``max_count`` bounds the observable counts (table size).
    """

    def __init__(self, geo_p: float = 0.1, factor: float = 0.1,
                 trans=(0.2, 0.8), init_state: int = 1,
                 n_rates: int = 256, max_steps: int = 32,
                 result: str = "rate2", limit: int | None = None,
                 max_count: int = 64):
        import jax

        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        self.n_rates = int(n_rates)
        self.max_steps = int(max_steps)
        self.max_count = int(max_count)
        N = self.n_rates
        geo = _geometric(geo_p, N)
        Wt = jnp.asarray(_poisson_pmf_table(factor, N, self.max_count))
        p01, p11 = float(trans[0]), float(trans[1])
        self.result = result
        self.limit = int(limit) if limit is not None else N
        lim = self.limit
        init_prior = np.outer(geo, geo)

        def step(carry, xs):
            # scaled forward recursion: per-cell masses would leave the
            # device's representable range over long sequences, so each
            # step renormalizes by its max and accumulates the log-scale
            g, logz = carry
            c, valid = xs
            w = Wt[c]
            g0 = g[0] * w[:, None]      # state 0 observes via Rate1
            g1 = g[1] * w[None, :]      # state 1 observes via Rate2
            new0 = (1.0 - p01) * g0 + (1.0 - p11) * g1
            new1 = p01 * g0 + p11 * g1
            gn = jnp.stack([new0, new1])
            m = jnp.max(gn)
            # power-of-two rescaling: the division is exact, and the
            # accumulated exponent is integer arithmetic (no device
            # log/exp involved at all)
            e = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
            gn = gn / jnp.exp2(e)
            return (
                jnp.where(valid, gn, g),
                jnp.where(valid, logz + e, logz),
            ), None

        def run(g0, cs, valids):
            (g, logz), _ = jax.lax.scan(
                step, (g0, jnp.zeros(())), (cs, valids)
            )
            # return-variable marginal (the benchmark returns Rate2)
            if result == "state":
                marg = jnp.sum(g, axis=(1, 2))
            elif result == "rate1":
                marg = jnp.sum(g, axis=(0, 2))[:lim]
            else:
                marg = jnp.sum(g, axis=(0, 1))[:lim]
            return marg, logz

        self._run = jax.jit(run)
        self._g0 = np.zeros((2, N, N))
        self._g0[int(init_state)] = init_prior

    def probs(self, counts):
        """Unnormalized posterior masses of the result variable after
        the observation sequence ``counts``."""
        cs = np.asarray(counts, dtype=np.int64)
        assert cs.max(initial=0) <= self.max_count
        k = cs.shape[0]
        assert k <= self.max_steps
        pad = self.max_steps - k
        cs = np.concatenate([cs, np.zeros(pad, dtype=cs.dtype)])
        valid = np.concatenate(
            [np.ones(k, dtype=bool), np.zeros(pad, dtype=bool)]
        )
        marg, logz = self._run(self._g0, cs, valid)
        return np.asarray(marg) * 2.0 ** float(logz)


class CompiledMixture:
    """Scan-compiled 50/50 Poisson mixture over two latent Geometric
    rates (reference: generate_mixture.rs, the coal-mining-disasters
    benchmark).  On the joint rate grid ``g[r1, r2]`` each observation
    is the diagonal reweighting
    ``q * pmf(c; f r1) + (1-q) * pmf(c; f r2)``, so the whole dataset
    is one lax.scan of elementwise ops — the interpreter runs ~20
    minutes of compound-Poisson derivative chains on this model; the
    scan form is milliseconds steady-state."""

    def __init__(self, geo_p: float = 0.1, factor: float = 0.1,
                 q: float = 0.5, n_rates: int = 256,
                 max_steps: int = 128, result: str = "rate1",
                 limit: int | None = None, max_count: int = 64):
        import jax

        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        self.n_rates = int(n_rates)
        self.max_steps = int(max_steps)
        self.max_count = int(max_count)
        N = self.n_rates
        geo = _geometric(geo_p, N)
        Wt = jnp.asarray(_poisson_pmf_table(factor, N, self.max_count))
        self.limit = int(limit) if limit is not None else N
        lim = self.limit
        q_ = float(q)

        def step(carry, xs):
            # scaled forward recursion (see CompiledHMM.step)
            g, logz = carry
            c, valid = xs
            w = Wt[c]
            gn = g * (q_ * w[:, None] + (1.0 - q_) * w[None, :])
            m = jnp.max(gn)
            # power-of-two rescaling: the division is exact, and the
            # accumulated exponent is integer arithmetic (no device
            # log/exp involved at all)
            e = jnp.where(m > 0, jnp.floor(jnp.log2(m)), 0.0)
            gn = gn / jnp.exp2(e)
            return (
                jnp.where(valid, gn, g),
                jnp.where(valid, logz + e, logz),
            ), None

        def run(g0, cs, valids):
            (g, logz), _ = jax.lax.scan(
                step, (g0, jnp.zeros(())), (cs, valids)
            )
            axis = 1 if result == "rate1" else 0
            return jnp.sum(g, axis=axis)[:lim], logz

        self._run = jax.jit(run)
        self._g0 = np.outer(geo, geo)

    def probs(self, counts):
        """Unnormalized posterior masses of the result rate."""
        cs = np.asarray(counts, dtype=np.int64)
        assert cs.max(initial=0) <= self.max_count
        k = cs.shape[0]
        assert k <= self.max_steps
        pad = self.max_steps - k
        cs = np.concatenate([cs, np.zeros(pad, dtype=cs.dtype)])
        valid = np.concatenate(
            [np.ones(k, dtype=bool), np.zeros(pad, dtype=bool)]
        )
        marg, logz = self._run(self._g0, cs, valid)
        return np.asarray(marg) * 2.0 ** float(logz)
