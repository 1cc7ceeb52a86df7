"""Randomized differential testing.

Random finite-support SGCL programs are checked against an independent
brute-force enumeration oracle (exact Fractions over all execution paths),
in exact rational mode (must agree exactly) and in f64 mode (tolerance).
This exercises the transformer/event semantics far beyond the golden corpus.
"""

import random
from fractions import Fraction

import pytest

from genfer_tpu.lang import ast
from genfer_tpu.lang.parser import parse_program


# ----------------------------------------------------------------------
# brute-force oracle: enumerate all paths with exact probabilities
# ----------------------------------------------------------------------

def _dist_pmf(dist, env):
    """Return list of (value, Fraction prob) for finite discrete dists."""
    def r(x):
        return Fraction(x.numer, x.denom)

    if isinstance(dist, ast.Bernoulli):
        p = r(dist.p)
        return [(0, 1 - p), (1, p)]
    if isinstance(dist, ast.Binomial):
        p = r(dist.p)
        from math import comb

        return [
            (k, comb(dist.n, k) * p**k * (1 - p) ** (dist.n - k))
            for k in range(dist.n + 1)
        ]
    if isinstance(dist, ast.BinomialVarTrials):
        n = env[dist.var]
        p = r(dist.p)
        from math import comb

        return [
            (k, comb(n, k) * p**k * (1 - p) ** (n - k)) for k in range(n + 1)
        ]
    if isinstance(dist, ast.Categorical):
        return [(i, r(q)) for i, q in enumerate(dist.rs)]
    if isinstance(dist, ast.UniformDisc):
        n = dist.end - dist.start
        return [(k, Fraction(1, n)) for k in range(dist.start, dist.end)]
    if isinstance(dist, ast.Dirac):
        return [(dist.a.as_integer(), Fraction(1))]
    if isinstance(dist, ast.BernoulliVarProb):
        raise NotImplementedError
    raise NotImplementedError(str(dist))


def _event_holds(event, env):
    if isinstance(event, ast.InSet):
        return env[event.var] in event.set
    if isinstance(event, ast.VarComparison):
        a, b = env[event.v1], env[event.v2]
        return {"=": a == b, "<": a < b, "<=": a <= b}[event.comp]
    if isinstance(event, ast.Complement):
        return not _event_holds(event.event, env)
    if isinstance(event, ast.Intersection):
        return all(_event_holds(e, env) for e in event.events)
    if isinstance(event, ast.DataFromDist):
        raise NotImplementedError
    raise NotImplementedError(str(event))


def brute_force(program):
    """Unnormalized distribution of the result variable as
    {value: Fraction}."""
    n = program.used_vars()
    states = {tuple([0] * n): Fraction(1)}

    def run_block(stmts, states):
        for stmt in stmts:
            states = run_stmt(stmt, states)
        return states

    def run_stmt(stmt, states):
        out = {}

        def add(env, p):
            if p:
                out[env] = out.get(env, Fraction(0)) + p

        if isinstance(stmt, ast.Sample):
            for env, p in states.items():
                for v, q in _dist_pmf(stmt.distribution, env):
                    e = list(env)
                    e[stmt.var] = (
                        env[stmt.var] + v if stmt.add_previous_value else v
                    )
                    add(tuple(e), p * q)
        elif isinstance(stmt, ast.Assign):
            for env, p in states.items():
                val = 0 if not stmt.add_previous_value else env[stmt.var]
                if stmt.addend is not None:
                    f, w = stmt.addend
                    val += f * env[w]
                val += stmt.offset
                e = list(env)
                e[stmt.var] = val
                add(tuple(e), p)
        elif isinstance(stmt, ast.Decrement):
            for env, p in states.items():
                e = list(env)
                e[stmt.var] = max(0, env[stmt.var] - stmt.offset)
                add(tuple(e), p)
        elif isinstance(stmt, ast.IfThenElse):
            then_states, else_states = {}, {}
            for env, p in states.items():
                (then_states if _event_holds(stmt.cond, env) else else_states)[
                    env
                ] = p
            for env, p in run_block(stmt.then, then_states).items():
                add(env, p)
            for env, p in run_block(stmt.els, else_states).items():
                add(env, p)
        elif isinstance(stmt, ast.Fail):
            pass  # all mass discarded
        elif isinstance(stmt, ast.Normalize):
            assert not stmt.given_vars
            total_before = sum(states.values())
            inner = run_block(stmt.stmts, states)
            total_after = sum(inner.values())
            scale = (
                total_before / total_after if total_after else Fraction(0)
            )
            for env, p in inner.items():
                add(env, p * scale)
        else:
            raise NotImplementedError(str(stmt))
        return out

    states = run_block(program.stmts, states)
    dist = {}
    for env, p in states.items():
        v = env[program.result]
        dist[v] = dist.get(v, Fraction(0)) + p
    return dist


# ----------------------------------------------------------------------
# random program generator (finite supports only)
# ----------------------------------------------------------------------

def random_program(rng: random.Random) -> str:
    names = ["A", "B"]
    lines = [f"{v} := 0;" for v in names]

    def ratio():
        d = rng.choice([2, 3, 4, 5, 8])
        n = rng.randrange(0, d + 1)
        return f"{n}/{d}"

    def dist():
        c = rng.randrange(6)
        if c == 0:
            return f"Bernoulli({ratio()})"
        if c == 1:
            return f"Binomial({rng.randrange(1, 4)}, {ratio()})"
        if c == 2:
            ps = [rng.randrange(1, 4) for _ in range(rng.randrange(2, 4))]
            tot = sum(ps)
            return "Categorical(" + ", ".join(f"{p}/{tot}" for p in ps) + ")"
        if c == 3:
            a = rng.randrange(0, 3)
            return f"UniformDisc({a}, {a + rng.randrange(1, 4)})"
        if c == 4:
            return f"Binomial({rng.choice(names)}, {ratio()})"
        return f"Dirac({rng.randrange(0, 3)})"

    def event():
        c = rng.randrange(4)
        v = rng.choice(names)
        if c == 0:
            vals = sorted(rng.sample(range(4), rng.randrange(1, 3)))
            return f"{v} in [{', '.join(map(str, vals))}]"
        if c == 1:
            return f"{v} {rng.choice(['=', '<', '<=', '>', '>='])} {rng.randrange(0, 4)}"
        if c == 2:
            return f"{names[0]} {rng.choice(['=', '<', '<='])} {names[1]}"
        return f"not ({v} = {rng.randrange(0, 3)})"

    def stmt(depth):
        c = rng.randrange(8)
        v = rng.choice(names)
        if c in (0, 1):
            op = rng.choice(["~", "+~"])
            return f"{v} {op} {dist()};"
        if c == 2:
            w = rng.choice(names)
            return f"{v} := {rng.randrange(1, 3)} * {w} + {rng.randrange(0, 3)};"
        if c == 3:
            return f"{v} -= {rng.randrange(1, 3)};"
        if c == 4 and depth < 2:
            body = " ".join(stmt(depth + 1) for _ in range(rng.randrange(1, 3)))
            els = (
                " else { " + stmt(depth + 1) + " }"
                if rng.random() < 0.5
                else ""
            )
            return f"if {event()} {{ {body} }}{els}"
        if c == 5:
            return f"observe {event()};"
        if c == 6:
            return f"{v} += {rng.randrange(0, 3)};"
        return f"{v} ~ {dist()};"

    for _ in range(rng.randrange(3, 7)):
        lines.append(stmt(0))
    lines.append(f"return {rng.choice(names)};")
    return "\n".join(lines)


# ----------------------------------------------------------------------

def _infer_dist(src, mode, limit):
    from genfer_tpu import api

    r = api.infer(src, mode=mode)
    probs = r.probs(limit, normalized=False)
    return r.total, probs


@pytest.mark.parametrize("seed", range(40))
def test_random_program_vs_bruteforce(seed):
    rng = random.Random(seed)
    src = random_program(rng)
    program = parse_program(src)
    oracle = brute_force(program)
    limit = max(oracle) + 2 if oracle else 2
    total_exact = sum(oracle.values())

    # exact rational mode must agree exactly (probs are unnormalized)
    total, probs = _infer_dist(src, "rational", limit)
    assert total.frac == total_exact, f"Z mismatch\n{src}"
    for k in range(limit):
        expected = oracle.get(k, Fraction(0))
        assert probs[k].frac == expected, (
            f"p({k}) mismatch: {probs[k].frac} vs {expected}\n{src}"
        )

    # f64 mode within tolerance
    total_f, probs_f = _infer_dist(src, "f64", limit)
    assert abs(total_f.to_float() - float(total_exact)) < 1e-9, src
    for k in range(limit):
        expected = float(oracle.get(k, Fraction(0)))
        assert abs(probs_f[k].to_float() - expected) < 1e-9, f"p({k})\n{src}"


# ----------------------------------------------------------------------
# continuous distributions vs independent analytic / high-precision
# oracles (VERDICT round-2 item 8): Exponential and Gamma priors with
# Poisson observations have closed-form posteriors; UniformCont is
# checked against an mpmath numeric integral, and every program is also
# cross-checked f64 vs MultiPrec.
# ----------------------------------------------------------------------

def _run_cli_text(src, *flags):
    import io
    import tempfile
    from contextlib import redirect_stdout

    from genfer_tpu.cli import main as cli_main

    with tempfile.NamedTemporaryFile(
        "w", suffix=".sgcl", delete=False
    ) as f:
        f.write(src)
        path = f.name
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main([path, "--no-timing", *flags])
    return buf.getvalue()


def _probs_of(out):
    import re

    probs = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", out
        )
    }
    z = float(re.search(r"Z = ([\d.e+-]+|inf|nan)", out).group(1))
    return z, probs


@pytest.mark.parametrize("seed", range(12))
def test_exponential_poisson_analytic(seed):
    """x ~ Exponential(lam); observe c ~ Poisson(f x); y ~ Poisson(g x):
    Z = lam f^c/(lam+f)^(c+1) and p(y=n)/Z = C(n+c,n) q^n (1-q)^(c+1)
    with q = g/(lam+f+g) — the Gamma-Poisson (NegBinomial) conjugacy,
    an oracle fully independent of the GF engine."""
    import math

    rng = random.Random(400 + seed)
    lam = rng.randint(1, 5)
    f = rng.randint(1, 4)
    g = rng.randint(1, 4)
    c = rng.randint(0, 6)
    src = (
        f"x ~ Exponential({lam});\n"
        f"observe {c} ~ Poisson({f} * x);\n"
        f"y ~ Poisson({g} * x);\n"
        "return y"
    )
    out = _run_cli_text(src, "--limit", "12", "--backend", "numpy")
    Z, probs = _probs_of(out)
    Z_exact = lam * f**c / (lam + f) ** (c + 1)
    assert abs(Z - Z_exact) / Z_exact < 1e-11, (Z, Z_exact)
    q = g / (lam + f + g)
    for n, p in probs.items():
        want = (
            Z_exact * math.comb(n + c, n) * q**n * (1 - q) ** (c + 1)
        )
        if want > 1e-300:
            assert abs(p - want) / want < 1e-9, (n, p, want)
    # cross-check against the MultiPrec tower (same programs, different
    # scalar arithmetic end to end)
    out_mp = _run_cli_text(src, "--limit", "12", "--precision", "192")
    Z_mp, probs_mp = _probs_of(out_mp)
    assert abs(Z - Z_mp) / Z_mp < 1e-12
    for n, p in probs.items():
        if probs_mp.get(n, 0.0) > 1e-300:
            assert abs(p - probs_mp[n]) / probs_mp[n] < 1e-11


@pytest.mark.parametrize("seed", range(8))
def test_gamma_poisson_analytic(seed):
    """x ~ Gamma(s, r) (integer shape); observe c ~ Poisson(f x);
    y ~ Poisson(g x): NegBinomial posterior predictive with s+c
    successes."""
    import math

    rng = random.Random(500 + seed)
    s = rng.randint(1, 4)
    r = rng.randint(1, 4)
    f = rng.randint(1, 3)
    g = rng.randint(1, 3)
    c = rng.randint(0, 5)
    src = (
        f"x ~ Gamma({s}, {r});\n"
        f"observe {c} ~ Poisson({f} * x);\n"
        f"y ~ Poisson({g} * x);\n"
        "return y"
    )
    out = _run_cli_text(src, "--limit", "10", "--backend", "numpy")
    Z, probs = _probs_of(out)
    # Z = r^s f^c Gamma(s+c) / (Gamma(s) c! (r+f)^(s+c))
    Z_exact = (
        r**s * f**c * math.gamma(s + c)
        / (math.gamma(s) * math.factorial(c) * (r + f) ** (s + c))
    )
    assert abs(Z - Z_exact) / Z_exact < 1e-11
    q = g / (r + f + g)
    for n, p in probs.items():
        want = (
            Z_exact
            * math.gamma(n + s + c) / (math.gamma(s + c)
                                       * math.factorial(n))
            * q**n * (1 - q) ** (s + c)
        )
        if want > 1e-300:
            assert abs(p - want) / want < 1e-9, (n, p, want)


@pytest.mark.parametrize("seed", range(6))
def test_uniformcont_poisson_mpmath(seed):
    """x ~ UniformCont(0, b); observe c ~ Poisson(f x); y ~ Poisson(g x)
    against an mpmath numeric quadrature oracle."""
    mpmath = pytest.importorskip("mpmath")

    rng = random.Random(600 + seed)
    b = rng.randint(1, 3)
    f = rng.randint(1, 3)
    g = rng.randint(1, 3)
    c = rng.randint(0, 4)
    src = (
        f"x ~ UniformCont(0, {b});\n"
        f"observe {c} ~ Poisson({f} * x);\n"
        f"y ~ Poisson({g} * x);\n"
        "return y"
    )
    out = _run_cli_text(src, "--limit", "8", "--backend", "numpy")
    Z, probs = _probs_of(out)
    mpmath.mp.dps = 40

    def pois(k, lamx):
        return lamx**k * mpmath.e**(-lamx) / mpmath.factorial(k)

    Z_num = mpmath.quad(
        lambda x: pois(c, f * x) / b, [0, b]
    )
    assert abs(Z - float(Z_num)) / float(Z_num) < 1e-9
    for n, p in probs.items():
        want = float(mpmath.quad(
            lambda x: pois(c, f * x) * pois(n, g * x) / b, [0, b]
        ))
        if want > 1e-300:
            assert abs(p - want) / want < 1e-8, (n, p, want)


@pytest.mark.parametrize("seed", range(40))
def test_random_program_scan_vs_bruteforce(seed):
    """The generic mass-semantics compiler (scanc, straight-line mode)
    against the exact enumeration oracle on the same random finite-
    support corpus: exercises the Decrement / affine-Assign /
    VarComparison / InSet / complement / Dirac / Categorical mass
    operators far beyond the approx-benchmark shapes."""
    import numpy as np

    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    rng = random.Random(seed)
    src = random_program(rng)
    program = parse_program(src)
    oracle = brute_force(program)
    try:
        masses, Z, _ = compile_scan(program, order=32)
    except UnsupportedForScan as e:
        pytest.skip(f"outside scan fragment: {e}")
    total_exact = float(sum(oracle.values()))
    assert abs(Z - total_exact) <= 1e-12 * max(total_exact, 1e-30), src
    for k, v in oracle.items():
        vf = float(v)
        got = float(masses[k]) if k < len(masses) else 0.0
        assert abs(got - vf) <= 1e-12 * max(vf, 1e-30), (k, got, vf, src)


@pytest.mark.parametrize("seed", range(15))
def test_random_cascade_vs_interpreter(seed):
    """Random telescoping cascades (random discrete priors, Poisson
    rate factors, observation counts, uneven Bernoulli chains, shuffled
    assign values, multi-observe units) through the cascade scan
    compiler vs the generic GF interpreter."""
    import numpy as np

    rng = np.random.RandomState(1000 + seed)
    n_units = int(rng.randint(3, 8))
    obs_per_unit = int(rng.randint(1, 3))
    prior = rng.choice(["Geometric(0.4)", "Poisson(3)",
                        "Geometric(0.25)"])
    pivot_prior = rng.choice(["Geometric(0.3)", "Poisson(2)"])
    f_num = int(rng.randint(1, 5))
    units = []
    for _ in range(n_units):
        lines = []
        for _ in range(obs_per_unit):
            kind = rng.choice(["pois", "binom", "negbinom", "inset",
                               "notin"])
            if kind == "pois":
                lines.append(
                    f"observe {int(rng.poisson(2.0))} ~ "
                    f"Poisson({f_num}/4 * r);"
                )
            elif kind == "binom":
                lines.append(
                    f"observe {int(rng.randint(0, 3))} ~ "
                    f"Binomial(r, 0.4);"
                )
            elif kind == "negbinom":
                lines.append(
                    f"observe {int(rng.poisson(1.5))} ~ "
                    f"NegBinomial(r, 0.6);"
                )
            elif kind == "inset":
                lo = int(rng.randint(0, 4))
                members = ", ".join(
                    str(x) for x in range(lo, lo + int(rng.randint(2, 6)))
                )
                lines.append(f"observe r in [{members}];")
            else:
                hi = int(rng.randint(1, 6))
                members = ", ".join(str(x) for x in range(hi))
                lines.append(f"observe r not in [{members}];")
        units.append(lines)
    n_br = n_units + 1
    vals = rng.permutation(n_br)
    src = f"r ~ {prior};\n"
    for k in range(n_br):
        body = [ln for u in units[:k] for ln in u]
        body.append(f"r ~ {pivot_prior};")
        body += [ln for u in units[k:] for ln in u]
        body.append(f"sp := {int(vals[k])};")
        kw = "if" if k == 0 else "} else if"
        src += f"{kw} 1 ~ Bernoulli(1 / {n_br - k}) {{\n"
        src += "\n".join(body) + "\n"
    src += "} else {}\nreturn sp;"
    # the detector must fire (not silently fall back)
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import detect_cascade

    form = detect_cascade(parse_program(src).stmts)
    assert form is not None and form.n_units == n_units * obs_per_unit

    z_s, p_s = _probs_of(_run_cli_text(src, "--compile-scan"))
    z_i, p_i = _probs_of(_run_cli_text(src))
    assert abs(z_s - z_i) / z_i < 1e-9
    for k in sorted(set(p_s) & set(p_i)):
        denom = max(abs(p_i[k]), z_i * 1e-12)
        assert abs(p_s[k] - p_i[k]) / denom < 1e-8, (k, p_s[k], p_i[k])


@pytest.mark.parametrize("seed", range(10))
def test_random_multivar_cascade_vs_interpreter(seed):
    """Multi-variable telescoping cascades: units spread over several
    independent prologue priors; the pivot refreshes a random subset of
    them.  Pivot-refreshed vars telescope (forward/backward scans),
    never-refreshed vars must factor out of every branch weight as one
    constant product."""
    import numpy as np

    rng = np.random.RandomState(7000 + seed)
    priors = {"r": "Geometric(0.4)", "s": "Poisson(2)",
              "t": "Geometric(0.3)"}
    vars_used = ["r", "s"] + (["t"] if rng.rand() < 0.5 else [])
    # pivot refreshes a random non-empty subset of the used vars
    n_piv = int(rng.randint(1, len(vars_used) + 1))
    pivot_vars = list(rng.choice(vars_used, size=n_piv, replace=False))
    n_units = int(rng.randint(3, 7))
    unit_lines = []
    for _ in range(n_units):
        v = vars_used[int(rng.randint(len(vars_used)))]
        kind = rng.choice(["pois", "binom", "inset"])
        if kind == "pois":
            unit_lines.append(
                f"observe {int(rng.poisson(2.0))} ~ Poisson(1/2 * {v});"
            )
        elif kind == "binom":
            unit_lines.append(
                f"observe {int(rng.randint(0, 3))} ~ Binomial({v}, 0.4);"
            )
        else:
            lo = int(rng.randint(0, 3))
            members = ", ".join(
                str(x) for x in range(lo, lo + int(rng.randint(2, 6)))
            )
            unit_lines.append(f"observe {v} in [{members}];")
    n_br = n_units + 1
    vals = rng.permutation(n_br)
    src = "".join(f"{v} ~ {priors[v]};\n" for v in vars_used)
    pivot = "".join(f"{v} ~ {priors[v]};\n" for v in pivot_vars)
    for k in range(n_br):
        body = "".join(ln + "\n" for ln in unit_lines[:k])
        body += pivot
        body += "".join(ln + "\n" for ln in unit_lines[k:])
        body += f"sp := {int(vals[k])};\n"
        kw = "if" if k == 0 else "} else if"
        src += f"{kw} 1 ~ Bernoulli(1 / {n_br - k}) {{\n{body}"
    src += "} else {}\nreturn sp;"
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import detect_cascade

    form = detect_cascade(parse_program(src).stmts)
    assert form is not None and form.n_units == n_units

    z_s, p_s = _probs_of(_run_cli_text(src, "--compile-scan"))
    z_i, p_i = _probs_of(_run_cli_text(src))
    assert abs(z_s - z_i) / z_i < 1e-9
    for k in sorted(set(p_s) & set(p_i)):
        denom = max(abs(p_i[k]), z_i * 1e-12)
        assert abs(p_s[k] - p_i[k]) / denom < 1e-8, (k, p_s[k], p_i[k])


@pytest.mark.parametrize("seed", range(8))
def test_random_comparison_cascade_vs_interpreter(seed):
    """Cascades with two-variable comparison units (`observe r <= s`
    etc.): the comparison couples its vars into one group — telescoping
    on the joint grid when both are pivot-refreshed, coupled-spectator
    vector scans when only one is.  Finite-support priors so the
    interpreter (which panics on infinite-support comparisons, matching
    the reference) can serve as the oracle."""
    import numpy as np

    rng = np.random.RandomState(9000 + seed)
    refresh_both = bool(rng.rand() < 0.5)
    comp = rng.choice(["<", "<=", "="])
    n_units = int(rng.randint(3, 6))
    unit_lines = []
    for i in range(n_units):
        kind = rng.choice(["cmp", "pois_r", "binom_s", "inset_r"])
        if kind == "cmp" or i == 0:  # ensure at least one comparison
            a, b = ("r", "s") if rng.rand() < 0.5 else ("s", "r")
            unit_lines.append(f"observe {a} {comp} {b};")
        elif kind == "pois_r":
            unit_lines.append(
                f"observe {int(rng.poisson(1.5))} ~ Poisson(1/2 * r);"
            )
        elif kind == "binom_s":
            unit_lines.append(
                f"observe {int(rng.randint(0, 3))} ~ Binomial(s, 0.4);"
            )
        else:
            lo = int(rng.randint(0, 3))
            members = ", ".join(
                str(x) for x in range(lo, lo + int(rng.randint(2, 5)))
            )
            unit_lines.append(f"observe r in [{members}];")
    pivot = "r ~ Binomial(7, 0.45);\n"
    if refresh_both:
        pivot += "s ~ UniformDisc(0, 6);\n"
    n_br = n_units + 1
    vals = rng.permutation(n_br)
    src = "r ~ Binomial(7, 0.45);\ns ~ UniformDisc(0, 6);\n"
    for k in range(n_br):
        body = "".join(ln + "\n" for ln in unit_lines[:k]) + pivot
        body += "".join(ln + "\n" for ln in unit_lines[k:])
        body += f"sp := {int(vals[k])};\n"
        kw = "if" if k == 0 else "} else if"
        src += f"{kw} 1 ~ Bernoulli(1 / {n_br - k}) {{\n{body}"
    src += "} else {}\nreturn sp;"
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import detect_cascade

    form = detect_cascade(parse_program(src).stmts)
    assert form is not None and form.n_units == n_units

    z_s, p_s = _probs_of(_run_cli_text(src, "--compile-scan"))
    z_i, p_i = _probs_of(_run_cli_text(src))
    assert abs(z_s - z_i) / z_i < 1e-9
    for k in sorted(set(p_s) & set(p_i)):
        denom = max(abs(p_i[k]), z_i * 1e-12)
        assert abs(p_s[k] - p_i[k]) / denom < 1e-8, (k, p_s[k], p_i[k])


def test_comparison_cascade_infinite_support_vs_bruteforce():
    """Beyond-reference capability: a cascade whose comparison units
    couple two INFINITE-support priors (the reference and our
    interpreter both refuse infinite-support comparisons).  Oracle: a
    truncated exact enumeration at a tail cutoff far past the compiled
    grid."""
    import math

    import numpy as np

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import CascadeCompiled, compile_scan_program

    n_units, p_geom, lam = 4, 0.4, 2.0
    units = [("cmp",), ("pois", 2), ("cmp",), ("pois", 1)]

    def unit_src(u):
        return ("observe r <= s;" if u[0] == "cmp"
                else f"observe {u[1]} ~ Poisson(1/2 * r);")

    src = f"r ~ Geometric({p_geom});\ns ~ Poisson(2);\n"
    for k in range(n_units + 1):
        body = "".join(unit_src(u) + "\n" for u in units[:k])
        body += f"r ~ Geometric({p_geom});\n"
        body += "".join(unit_src(u) + "\n" for u in units[k:])
        body += f"sp := {k};\n"
        kw = "if" if k == 0 else "} else if"
        src += f"{kw} 1 ~ Bernoulli(1 / {n_units + 1 - k}) {{\n{body}"
    src += "} else {}\nreturn sp;"
    obj, (masses, Z) = compile_scan_program(parse_program(src), order=64)
    assert isinstance(obj, CascadeCompiled)
    assert any(g["rows"].ndim == 3 for g in obj._groups)

    # truncated exact enumeration (cutoff 400: geometric/poisson tails
    # are < 1e-80 there)
    N = 400
    geom = (1 - p_geom) ** np.arange(N) * p_geom
    pois = np.asarray([
        math.exp(i * math.log(lam) - lam - math.lgamma(i + 1))
        for i in range(N)
    ])

    def urow(u, x):
        if u[0] == "cmp":
            return (x[:, None] <= np.arange(N)[None, :]).astype(float)
        c, f = u[1], 0.5
        lamx = f * x
        with np.errstate(divide="ignore"):
            lg = np.where(lamx > 0, np.log(np.where(lamx > 0, lamx, 1)),
                          -np.inf)
            row = np.exp(c * lg - lamx - math.lgamma(c + 1))
        return np.nan_to_num(row)[:, None] * np.ones((1, N))

    x = np.arange(N, dtype=float)
    expected = np.zeros(n_units + 1)
    q_rest = 1.0
    for k in range(n_units + 1):
        q = q_rest / (n_units + 1 - k)
        q_rest -= q
        fwd = geom[:, None] * np.ones((1, N))
        for u in units[:k]:
            fwd = fwd * urow(u, x)
        bwd = geom[:, None] * np.ones((1, N))
        for u in units[k:]:
            bwd = bwd * urow(u, x)
        expected[k] = q * float(
            (pois * fwd.sum(axis=0) * bwd.sum(axis=0)).sum()
        )
    np.testing.assert_allclose(masses, expected, rtol=1e-9)
    assert abs(Z - expected.sum()) / expected.sum() < 1e-9


# ----------------------------------------------------------------------
# While loops mixed with the rest of the fragment (VERDICT r3 item 5)
# ----------------------------------------------------------------------


def _while_interval(out):
    import re

    m = re.search(r"Z ∈ \[([\d.e+-]+), ([\d.e+-]+|inf)\]", out)
    if m is None:  # loop drained completely: exact Z
        m = re.search(r"Z = ([\d.e+-]+)", out)
        z = float(m.group(1))
        return z, z
    return float(m.group(1)), float(m.group(2))


def _random_while_program(rng):
    """Random program mixing a bounded-unroll while loop with the other
    mass-compiler features: discrete/continuous priors, compound
    samples, observes, if/else, normalize (with and without given
    vars), and scanned repeated blocks."""
    shape = rng.randint(0, 4)
    p_cond = rng.choice(["1/3", "1/2", "2/5"])
    body_ops = []
    body_ops.append("X += 1;")
    if rng.randint(0, 2):
        body_ops.append(f"X +~ Bernoulli({rng.choice(['1/4', '1/3'])});")
    if rng.randint(0, 2):
        body_ops.append("if Y > 0 { Y -= 1; } else { X += 1; }")
    loop = ("while 0 ~ Bernoulli(%s) { %s }\n"
            % (p_cond, " ".join(body_ops)))
    prior = (f"X := {rng.randint(0, 3)};\n"
             f"Y ~ Geometric({rng.choice(['1/2', '2/5'])});\n")
    obs = (f"observe {rng.randint(0, 3)} ~ "
           f"Poisson({rng.choice(['1/2', '1/4'])} * X);\n")
    if shape == 0:  # plain top-level while
        return prior + loop + obs + "return X"
    if shape == 1:  # while inside a given-vars normalize
        c = rng.choice(["1/2", "1/3"])
        return (f"c ~ Bernoulli({c});\n" + prior
                + "normalize c {\n" + loop + obs + "}\n"
                + "if c = 1 { X += 1; }\n"
                + "return X")
    if shape == 2:  # while reading a continuous quadrature grid
        return (
            "P ~ UniformCont(0, 1);\n" + prior + loop
            + f"observe {rng.randint(0, 2)} ~ Bernoulli(P);\n"
            + obs + "return X"
        )
    # shape 3: while inside a scanned repeated template
    blocks = "".join(
        "X +~ Bernoulli(1/4);\n" + loop
        + f"observe {rng.randint(0, 3)} ~ Poisson(1/2 * X);\n"
        for _ in range(10)
    )
    return prior + blocks + "return X"


def _random_while_contwrite_program(rng):
    """Random while programs whose loop bodies WRITE continuous state —
    the last fragment edge: fresh density re-samples (grid-exact
    marginalize+outer), affine writes onto Dirac value grids (absorbed
    by the unrolled value-set may-analysis), fresh Dirac re-samples,
    exact copy-assigns from a quadrature grid, and (round 5, the final
    refusal closed) `v +~ Bernoulli(v)` additive compounds per
    iteration — the value-set analysis closes the grid over the x+1
    images, one per unrolled body application.  Each compound is
    preceded by a fresh [0,1]-supported sample so every application is
    a VALID Bernoulli parameter (applying the compound to mass above 1
    yields formally negative masses in BOTH engines — the interpreter's
    own probability assert rejects such programs)."""
    shape = rng.randint(0, 6)
    p_cond = rng.choice(["1/3", "1/2", "2/5"])
    if shape == 0:  # density resample + observe inside the loop
        rate = rng.choice(["1", "2", "3"])
        c_obs = int(rng.randint(0, 2))
        return (
            f"flip ~ Bernoulli({p_cond});\n"
            "c := 0;\n"
            "while flip = 1 {\n"
            f"    X ~ Exponential({rate});\n"
            f"    observe {c_obs} ~ Poisson(1 * X);\n"
            f"    flip ~ Bernoulli({p_cond});\n"
            "    c += 1;\n"
            "}\n"
            "return c"
        )
    if shape == 1:  # affine write onto a dirac value grid
        a = int(rng.randint(2, 4))  # 2 or 3
        den = a ** 8 * int(rng.randint(1, 3))
        return (
            f"P ~ Dirac(1/{den});\n"
            f"flip ~ Bernoulli({p_cond});\n"
            "c := 0;\n"
            "while flip = 1 {\n"
            f"    P := {a} * P + 0;\n"
            f"    flip ~ Bernoulli({rng.choice(['1/3', '1/4'])});\n"
            "    c += 1;\n"
            "}\n"
            "observe 1 ~ Bernoulli(P);\n"
            "return c"
        )
    if shape == 2:  # fresh Dirac re-sample (value union across visits)
        f1, f2 = rng.choice(["1/4", "1/2", "2/3", "1/3"], 2, False)
        return (
            f"P ~ Dirac({f1});\n"
            "c := 0;\n"
            f"while 0 ~ Bernoulli({p_cond}) {{\n"
            f"    P ~ Dirac({f2});\n"
            f"    observe 1 ~ Bernoulli(P);\n"
            "    c += 1;\n"
            "}\n"
            "observe 1 ~ Bernoulli(P);\n"
            "return c"
        )
    if shape == 3:  # copy-assign from a quadrature grid inside the loop
        return (
            "X ~ UniformCont(0, 1);\n"
            "c := 0;\n"
            f"while 0 ~ Bernoulli({p_cond}) {{\n"
            "    Y := X;\n"
            f"    observe {int(rng.randint(0, 2))} ~ Bernoulli(Y);\n"
            "    c += 1;\n"
            "}\n"
            "return c"
        )
    if shape == 4:  # additive compound on a quadrature grid per iteration
        f = rng.choice(["1/2", "1/4", "1/3"])
        return (
            "c := 0;\n"
            f"while 0 ~ Bernoulli({p_cond}) {{\n"
            "    X ~ UniformCont(0, 1);\n"
            "    X +~ Bernoulli(X);\n"
            f"    observe {int(rng.randint(0, 2))} ~ Poisson({f} * X);\n"
            "    c += 1;\n"
            "}\n"
            "return c"
        )
    # shape 5: additive compound on a Dirac value grid per iteration
    f1, f2 = rng.choice(["1/4", "1/2", "2/3", "1/3"], 2, False)
    return (
        f"P ~ Dirac({f1});\n"
        "c := 0;\n"
        f"while 0 ~ Bernoulli({p_cond}) {{\n"
        f"    P ~ Dirac({f2});\n"
        "    P +~ Bernoulli(P);\n"
        f"    observe {int(rng.randint(0, 2))} ~ Poisson(1/2 * P);\n"
        "    c += 1;\n"
        "}\n"
        f"observe {int(rng.randint(0, 2))} ~ Poisson(1/2 * P);\n"
        "return c"
    )


def _random_affine_quadrature_program(rng):
    """Random programs with affine writes onto QUADRATURE grids (the
    round-4 fragment extension: image nodes join the grid with zero
    quadrature weight, affine ops compile as value-lookup kernels):
    straight-line chains, writes inside bounded while loops, fresh
    dirac-class targets fed from a quadrature source, and interleaved
    fresh density re-samples."""
    shape = rng.randint(0, 4)
    a = int(rng.randint(1, 4))
    b = int(rng.randint(0, 3))
    r = rng.choice(["1/2", "1/4", "1/3"])
    c_obs = int(rng.randint(0, 3))
    if shape == 0:  # straight-line affine chain
        a2, b2 = int(rng.randint(1, 3)), int(rng.randint(0, 2))
        return (
            "Y ~ UniformCont(0, 1);\n"
            f"Y := {a} * Y + {b};\n"
            + (f"Y += {b2};\n" if rng.randint(0, 2)
               else f"Y := {a2} * Y + {b2};\n")
            + f"observe {c_obs} ~ Poisson({r} * Y);\n"
            f"W ~ Poisson({rng.choice(['1/4', '1/2'])} * Y);\n"
            "return W"
        )
    if shape == 1:  # affine write inside a counter-bounded while
        return (
            "Y ~ UniformCont(0, 1);\n"
            f"n ~ Binomial(2, {rng.choice(['1/2', '1/3'])});\n"
            "c := 0;\n"
            "while n > 0 {\n"
            f"    Y := {a} * Y + {b};\n"
            f"    observe {int(rng.randint(0, 2))} ~ "
            f"Poisson({r} * Y);\n"
            "    c += 1;\n"
            "    n -= 1;\n"
            "}\n"
            f"W ~ Poisson(1/4 * Y);\n"
            "return W"
        )
    if shape == 2:  # fresh dirac-class target from a quadrature source
        return (
            "Y ~ UniformCont(0, 1);\n"
            f"Z := {a} * Y + {b};\n"
            f"observe {c_obs} ~ Poisson({r} * Z);\n"
            f"W ~ Poisson({rng.choice(['1/4', '1/2'])} * Z);\n"
            "return W"
        )
    # shape 3: affine write, then a fresh density re-sample on the
    # same (extended) grid — re-concentrates on the weighted nodes
    return (
        "Y ~ UniformCont(0, 1);\n"
        f"Y := {a} * Y + {b};\n"
        f"observe {c_obs} ~ Poisson({r} * Y);\n"
        "Y ~ UniformCont(0, 1);\n"
        f"observe {int(rng.randint(0, 2))} ~ Poisson({r} * Y);\n"
        "W ~ Poisson(1/2 * Y);\n"
        "return W"
    )


@pytest.mark.parametrize("seed", range(15))
def test_random_affine_quadrature_vs_interpreter(seed):
    """Random affine-on-quadrature-grid programs (round-4 fragment
    extension) vs the interpreter: Z and every exact p(k)."""
    import re as _re

    import numpy as np

    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    rng = np.random.RandomState(7000 + seed)
    src = _random_affine_quadrature_program(rng)
    program = parse_program(src)
    try:
        masses, Z, obj = compile_scan(program, order=32, unroll=4)
    except UnsupportedForScan as e:
        pytest.fail(f"must compile (shape is in-fragment): {e}\n{src}")
    out = _run_cli_text(src, "--limit", "8", "--unroll", "4")
    if "while" in src:
        z_lo, z_hi = _while_interval(out)
        assert abs(Z - z_lo) <= 1e-8 * max(z_lo, 1e-30), src
        if np.isfinite(z_hi):
            got_hi = Z + obj.last_rest
            assert abs(got_hi - z_hi) <= 1e-8 * max(z_hi, 1e-30), src
    else:
        m = _re.search(r"Z = ([-\d.e+]+)", out)
        assert m is not None, out
        assert abs(Z - float(m.group(1))) <= 1e-8 * max(
            float(m.group(1)), 1e-30
        ), src
    probs = {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", out
        )
    } or {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(r"^p\((\d+)\) = ([\d.e+-]+)", out, _re.M)
    }
    assert probs, out
    for k, v in probs.items():
        got = float(masses[k]) if k < len(masses) else 0.0
        if v > 1e-280:
            assert abs(got - v) <= 1e-8 * v, (k, got, v, src)


@pytest.mark.parametrize("seed", range(18))
def test_random_while_contwrite_vs_interpreter(seed):
    """Random while programs writing continuous state in the loop body
    (the closed fragment edge) vs the interpreter: Z lower bound,
    Z + rest == upper bound, every exact p(k) below the horizon."""
    import numpy as np

    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    rng = np.random.RandomState(5000 + seed)
    src = _random_while_contwrite_program(rng)
    program = parse_program(src)
    try:
        masses, Z, obj = compile_scan(program, order=64, unroll=8)
    except UnsupportedForScan as e:
        pytest.fail(f"must compile (shape is in-fragment): {e}\n{src}")
    out = _run_cli_text(src, "--limit", "8", "--unroll", "8")
    z_lo, z_hi = _while_interval(out)
    assert abs(Z - z_lo) <= 1e-9 * max(z_lo, 1e-30), src
    if np.isfinite(z_hi):
        got_hi = Z + obj.last_rest
        assert abs(got_hi - z_hi) <= 1e-9 * max(z_hi, 1e-30), src
    import re as _re

    probs = {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", out
        )
    }
    for k, v in probs.items():
        got = float(masses[k]) if k < len(masses) else 0.0
        if v > 1e-280:
            assert abs(got - v) <= 1e-8 * v, (k, got, v, src)


@pytest.mark.parametrize("seed", range(12))
def test_random_while_vs_interpreter(seed):
    """Random while programs (all four structural shapes: top-level,
    inside given-vars normalize, alongside continuous grids, inside a
    scanned template) through the mass compiler vs the GF interpreter:
    Z lower bound, Z + rest == upper bound, and every exact p(k) the
    interpreter prints below the unroll horizon."""
    import numpy as np

    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    rng = np.random.RandomState(3000 + seed)
    src = _random_while_program(rng)
    program = parse_program(src)
    try:
        masses, Z, obj = compile_scan(program, order=128, unroll=8)
    except UnsupportedForScan as e:
        pytest.fail(f"must compile (shape is in-fragment): {e}\n{src}")
    out = _run_cli_text(src, "--limit", "8", "--unroll", "8")
    z_lo, z_hi = _while_interval(out)
    assert abs(Z - z_lo) <= 1e-11 * max(z_lo, 1e-30), src
    if np.isfinite(z_hi):
        got_hi = Z + obj.last_rest
        assert abs(got_hi - z_hi) <= 1e-11 * max(z_hi, 1e-30), src
    import re as _re

    probs = {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", out
        )
    } or {
        int(m.group(1)): float(m.group(2))
        for m in _re.finditer(r"^p\((\d+)\) = ([\d.e+-]+)", out, _re.M)
    }
    for k, v in probs.items():
        got = float(masses[k]) if k < len(masses) else 0.0
        if v > 1e-280:
            assert abs(got - v) <= 1e-10 * v, (k, got, v, src)


# ----------------------------------------------------------------------
# Dirac value grids / affine assigns / SSA renames / additive compounds
# (VERDICT r3 item 8: the surfaces shipped in a3da2ef + 5979ed7)
# ----------------------------------------------------------------------


def _moments_of(out):
    """Z, E, and raw moments 2-4 from exact (loop-free) CLI output."""
    import re

    vals = {}
    for key, pat in (
        ("Z", r"Z = ([-\d.e+]+)"),
        ("E", r"E = ([-\d.e+]+)"),
        ("m2", r"μ'_2 = ([-\d.e+]+)"),
        ("m3", r"μ'_3 = ([-\d.e+]+)"),
        ("m4", r"μ'_4 = ([-\d.e+]+)"),
    ):
        m = re.search(pat, out)
        if m:
            vals[key] = float(m.group(1))
    return vals


def _random_valuegrid_program(rng):
    """Random straight-line program over dirac-class continuous vars:
    fractional Dirac priors (possibly branch-dependent), affine
    assignments (incl. self- and two-axis +=), additive Bernoulli
    compounds on quadrature/value grids, type-changing self-resamples
    (SSA-lite rename), and observes at node values."""
    fracs = ["1/4", "1/2", "3/4", "2/3", "1/3", "3/5"]
    lines = [f"c ~ Bernoulli({rng.choice(['1/3', '1/2'])});\n"]
    # P: a prob-class var (values stay in [0,1]) — branch-dependent
    # Dirac prior exercises value-set union across branches
    if rng.randint(0, 2):
        lines.append(
            "if c = 1 { P ~ Dirac(%s); } else { P ~ Dirac(%s); }\n"
            % (rng.choice(fracs), rng.choice(fracs))
        )
    else:
        lines.append(f"P ~ Dirac({rng.choice(fracs)});\n")
    # Y: an affine-chain var (values roam)
    lines.append(f"Y ~ Dirac({rng.choice(fracs)});\n")
    n_affine = rng.randint(1, 4)
    for _ in range(n_affine):
        kind = rng.randint(0, 4)
        a, b = int(rng.randint(1, 4)), int(rng.randint(0, 3))
        if kind == 0:
            lines.append(f"Y := {a} * Y + {b};\n")      # self affine
        elif kind == 1:
            lines.append(f"Y += {a} * P + {b};\n")      # two-axis +=
        elif kind == 2:
            lines.append(f"Z := {a} * Y + {b};\n")      # fresh target
            lines.append("Y += Z;\n")
        else:
            lines.append(f"Y := {a} * P + {b};\n")      # overwrite
    # observes at node values
    if rng.randint(0, 2):
        lines.append(f"observe {int(rng.randint(0, 2))} ~ Bernoulli(P);\n")
    lines.append(
        f"observe {int(rng.randint(0, 3))} ~ "
        f"Poisson({rng.choice(['1/2', '1/4'])} * Y);\n"
    )
    # one of: additive compound on P, or a type-changing self-resample
    tail = rng.randint(0, 3)
    if tail == 0:
        lines.append("P +~ Bernoulli(P);\n")    # value grid doubles
        ret = "P"
    elif tail == 1:
        lines.append("P ~ Bernoulli(P);\n")     # SSA rename: discrete
        ret = "P"
    elif tail == 2:
        lines.append(f"W ~ Poisson({rng.choice(['1/2', '1'])} * Y);\n")
        ret = "W"
    else:
        ret = "Y"
    lines.append(f"return {ret}")
    return "".join(lines)


@pytest.mark.parametrize("seed", range(18))
def test_random_valuegrid_vs_interpreter(seed):
    """Random value-grid programs through the mass compiler vs the GF
    interpreter's exact output: Z and raw moments 1-4 (moments compare
    the full distribution incl. fractional node values, so they cover
    the value-grid bookkeeping, not just total mass)."""
    import numpy as np

    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    rng = np.random.RandomState(4000 + seed)
    src = _random_valuegrid_program(rng)
    program = parse_program(src)
    try:
        masses, Z, obj = compile_scan(program, order=64)
    except UnsupportedForScan as e:
        pytest.fail(f"must compile (shape is in-fragment): {e}\n{src}")
    out = _run_cli_text(src, "--no-probs")
    ref = _moments_of(out)
    assert abs(Z - ref["Z"]) <= 1e-11 * max(ref["Z"], 1e-30), src
    vals = (obj.result_vals if obj.result_vals is not None
            else np.arange(len(masses), dtype=float))
    for k, key in ((1, "E"), (2, "m2"), (3, "m3"), (4, "m4")):
        if key not in ref or not np.isfinite(ref[key]):
            continue
        mk = float((masses * vals ** k).sum()) / Z
        assert abs(mk - ref[key]) <= 1e-9 * max(abs(ref[key]), 1e-30), (
            key, mk, ref[key], src)
