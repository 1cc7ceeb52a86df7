"""Scan-compiled 2-state Poisson HMM (reference: generate_hmm.rs /
benchmarks/neurips2023/approx/hmm).

The generated model unrolls, per observation ``c_t``:

    if State = 0 { observe c_t ~ Poisson(f * Rate1); State ~ Bernoulli(p01); }
    else         { observe c_t ~ Poisson(f * Rate2); State ~ Bernoulli(p11); }

with Geometric priors on the two rates.  The joint posterior state is
the tensor ``g[s, r1, r2]`` (s the hidden state, r_i the latent integer
rates); each round is

* a *diagonal* likelihood reweighting — the Poisson pmf
  ``e^{-f r} (f r)^{c_t} / c_t!`` along the active rate axis (the
  observation count is runtime data), then
* a 2x2 state-transition mix,

so the whole observation sequence is one ``lax.scan`` and the graph is
independent of its length.  The reference instead builds a ~200-node GF
per round and runs compound-Poisson derivative chains
(generating_function.rs:670-711) at evaluation time.

Truncation: Geometric rates are truncated at ``n_rates`` (tail mass
0.9^N; the reference truncates the same tail at its Taylor evaluation
degree).  Validated against the CLI on the full 30-observation hmm
benchmark in tests/test_population_scan.py.
"""

from __future__ import annotations

import numpy as np


class CompiledHMM:
    """One-compile scan inference for the 2-state Poisson HMM family.

    Parameters mirror the generated model: ``geo_p`` the Geometric prior
    parameter of both rates, ``factor`` the Poisson rate multiplier,
    ``p_stay`` the probability that the next state is 1 given current
    state (p01, p11), ``init_state`` the deterministic initial state.
    """

    def __init__(self, geo_p: float = 0.1, factor: float = 0.1,
                 trans=(0.2, 0.8), init_state: int = 1,
                 n_rates: int = 256, max_steps: int = 32,
                 result: str = "rate2", limit: int | None = None):
        import jax

        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        self.n_rates = int(n_rates)
        self.max_steps = int(max_steps)
        N = self.n_rates
        rs = jnp.arange(N, dtype=jnp.float64)
        geo = geo_p * (1.0 - geo_p) ** rs
        lam = factor * rs
        p01, p11 = float(trans[0]), float(trans[1])

        def pois_pmf(c):
            # e^{-lam} lam^c / c! along the rate axis, traced count c
            cf = c.astype(jnp.float64)
            logp = -lam + cf * jnp.where(lam > 0, jnp.log(lam), 0.0) \
                - jax.lax.lgamma(cf + 1.0)
            p = jnp.exp(logp)
            # lam == 0: pmf is 1 if c == 0 else 0
            zero = jnp.where(cf == 0, 1.0, 0.0)
            return jnp.where(lam > 0, p, zero)

        def step(g, xs):
            c, valid = xs
            w = pois_pmf(c)
            g0 = g[0] * w[:, None]      # state 0 observes via Rate1
            g1 = g[1] * w[None, :]      # state 1 observes via Rate2
            new0 = (1.0 - p01) * g0 + (1.0 - p11) * g1
            new1 = p01 * g0 + p11 * g1
            gn = jnp.stack([new0, new1])
            return jnp.where(valid, gn, g), None

        self.result = result
        self.limit = int(limit) if limit is not None else N
        lim = self.limit

        def run(cs, valids):
            g0 = jnp.zeros((2, N, N))
            prior = jnp.outer(geo, geo)
            g0 = g0.at[int(init_state)].set(prior)
            g, _ = jax.lax.scan(step, g0, (cs, valids))
            # return-variable marginal (the benchmark returns Rate2)
            if result == "state":
                return jnp.sum(g, axis=(1, 2))
            if result == "rate1":
                return jnp.sum(g, axis=(0, 2))[:lim]
            return jnp.sum(g, axis=(0, 1))[:lim]

        self._run = jax.jit(run)

    def probs(self, counts):
        """Unnormalized posterior masses of the result variable after
        the observation sequence ``counts``."""
        import jax.numpy as jnp

        cs = jnp.asarray(counts, dtype=jnp.int64)
        k = cs.shape[0]
        assert k <= self.max_steps
        pad = self.max_steps - k
        cs = jnp.concatenate([cs, jnp.zeros(pad, dtype=cs.dtype)])
        valid = jnp.concatenate(
            [jnp.ones(k, dtype=bool), jnp.zeros(pad, dtype=bool)]
        )
        return self._run(cs, valid)
