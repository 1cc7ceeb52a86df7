"""Generic scan compiler (genfer_tpu.scanc): AST repetition detection +
mass-semantics lax.scan compilation, validated against the committed
reference goldens (benchmarks/neurips2023/approx) and the interpreter.

VERDICT round-2 item 2: the committed hmm/mixture/population*.sgcl
files — parsed, not hand-modeled — must produce scan programs whose
output matches their goldens at <=1e-12.
"""

import io
import os
import re
import sys
import tempfile
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np
import pytest

APPROX = Path("/root/reference/benchmarks/neurips2023/approx")


def _expect_values(name):
    """Z and E from the committed .expect file."""
    text = (APPROX / name / f"{name}.expect").read_text()
    z = float(re.search(r"Z = ([\d.e+-]+)", text).group(1))
    e = float(re.search(r"E = ([\d.e+-]+)", text).group(1))
    return z, e


def _scan_run(name, order=256):
    from genfer_tpu.lang.parser import parse_file
    from genfer_tpu.scanc import compile_scan

    prog = parse_file(str(APPROX / name / f"{name}.sgcl"))
    masses, Z, _ = compile_scan(prog, order=order)
    ns = np.arange(len(masses), dtype=np.float64)
    E = float((masses * ns).sum() / Z)
    return masses, Z, E


@pytest.mark.parametrize("name", [
    "hmm", "mixture", "population", "population_modified",
])
def test_approx_goldens(name):
    Z_exp, E_exp = _expect_values(name)
    masses, Z, E = _scan_run(name)
    assert abs(Z - Z_exp) / Z_exp <= 1e-12, (Z, Z_exp)
    assert abs(E - E_exp) / E_exp <= 1e-12, (E, E_exp)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="two_populations doubles to order 512 (~1 min)",
)
def test_two_populations_golden():
    """Also covers the reference's two_populations2000 stress case
    (test/expect/slow/two_populations2000.sgcl is the same program; the
    name is the Taylor order the reference's degree-inflating engine
    needs — mass-space truncation converges at 512): the posterior
    masses are pinned against that expect file."""
    Z_exp, E_exp = _expect_values("two_populations")
    masses, Z, E = _scan_run("two_populations")
    assert abs(Z - Z_exp) / Z_exp <= 1e-12
    assert abs(E - E_exp) / E_exp <= 1e-12
    expect2000 = Path(
        "/root/reference/test/expect/slow/two_populations2000.expect"
    ).read_text()
    pinned = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", expect2000
        )
    }
    assert pinned, "expect file format changed"
    for k, v in pinned.items():
        if v > 1e-200:
            assert abs(masses[k] - v) / v <= 1e-11, (k, masses[k], v)


def test_detection_shape():
    from genfer_tpu.lang.parser import parse_file
    from genfer_tpu.scanc import detect_repetition

    prog = parse_file(str(APPROX / "hmm" / "hmm.sgcl"))
    rep = detect_repetition(prog.stmts)
    assert rep.n_iters == 30 and len(rep.template) == 1
    assert len(rep.data) == 2  # the two per-branch observe counts
    prog = parse_file(str(APPROX / "population" / "population.sgcl"))
    rep = detect_repetition(prog.stmts)
    assert len(rep.template) == 3 and len(rep.data) == 2


REAL_WORLD = Path("/root/reference/test/expect/real_world")


def test_cascade_switchpoint_discrete_golden():
    """The telescoping-cascade compiler on the committed discrete
    switchpoint (Geometric prior): forward/backward factorized scans
    must reproduce the reference golden."""
    from genfer_tpu.lang.parser import parse_file
    from genfer_tpu.scanc import compile_scan

    prog = parse_file(str(REAL_WORLD / "switchpoint.sgcl"))
    masses, Z, obj = compile_scan(prog, order=128)
    assert obj.rep.n_iters == 109
    text = (REAL_WORLD / "switchpoint.expect").read_text()
    z_exp = float(re.search(r"Z = ([\d.e+-]+)", text).group(1))
    p41 = float(re.search(r"p\(41\) / Z = ([\d.e+-]+)", text).group(1))
    assert abs(Z - z_exp) / z_exp <= 1e-11
    assert abs(masses[41] / Z - p41) <= 1e-11


def test_cascade_switchpoint_continuous_exact():
    """Continuous-latent switchpoint (Exponential prior) through the
    composite-quadrature grid, checked against the EXACT Gamma-Poisson
    conjugacy closed form: prefix_lik(P) = Gamma(A+1)/(P+1)^(A+1)/prod
    c_i! with A = sum of the prefix counts.  (The committed reference
    golden itself is ~1.2e-8 off this exact value; the quadrature
    matches it to ~1e-15.)"""
    import math

    from genfer_tpu.lang.parser import parse_file
    from genfer_tpu.scanc import (CascadeCompiled, _cascade_units_poisson,
                                  detect_cascade)

    prog = parse_file(str(APPROX / "switchpoint" / "switchpoint.sgcl"))
    form = detect_cascade(prog.stmts)
    assert form is not None and form.n_units == 109
    obj = CascadeCompiled(prog, form, 512)
    masses, Z = obj.run()

    units = _cascade_units_poisson(form.units)
    cs = [c for c, _, _ in units]
    assert all(f == 1.0 for _, f, _ in units)
    n = len(cs)

    def loglik(cseg, nseg):
        A = sum(cseg)
        return (math.lgamma(A + 1) - (A + 1) * math.log(nseg + 1)
                - sum(math.lgamma(c + 1) for c in cseg))

    import numpy as np
    logws = []
    for q, P in zip(form.qs, form.prefix_lens):
        logws.append(math.log(float(q)) + loglik(cs[:P], P)
                     + loglik(cs[P:], n - P))
    logws = np.asarray(logws)
    m = logws.max()
    ws = np.exp(logws - m)
    Z_exact = ws.sum() * math.exp(m)
    assert abs(Z - Z_exact) / Z_exact <= 1e-12, (Z, Z_exact)


def test_cascade_synthetic_vs_interpreter():
    """A small hand-written cascade (irregular prefix lengths and
    assign values) against the generic interpreter."""
    units = ["observe 2 ~ Poisson(0.5 * r);", "observe 0 ~ Poisson(0.5 * r);",
             "observe 3 ~ Poisson(0.5 * r);", "observe 1 ~ Poisson(0.5 * r);",
             "observe 4 ~ Poisson(0.5 * r);"]
    n = len(units)
    branches = []
    for k in range(n + 1):
        body = units[:k] + ["r ~ Geometric(0.3);"] + units[k:]
        body.append(f"sp := {10 + 2 * k};")
        p = f"1 ~ Bernoulli(1 / {n + 1 - k})"
        branches.append((p, body))
    src = "r ~ Geometric(0.3);\n"
    for i, (p, body) in enumerate(branches):
        kw = "if" if i == 0 else "} else if"
        src += f"{kw} {p} {{\n" + "\n".join(body) + "\n"
    src += "} else {}\n"
    src += "return sp;"
    out_scan = _cli(src, "--compile-scan")
    out_interp = _cli(src)
    ps = _parse_probs(out_scan)
    pi = _parse_probs(out_interp)
    zs = re.search(r"Z = ([\d.e+-]+)", out_scan)
    zi = re.search(r"Z = ([\d.e+-]+)", out_interp)
    assert zs and zi
    Zi = float(zi.group(1))
    assert abs(float(zs.group(1)) - Zi) / Zi <= 1e-9
    assert set(pi) <= set(ps)
    for k in sorted(set(ps) & set(pi)):
        denom = max(abs(pi[k]), Zi * 1e-12)
        assert abs(ps[k] - pi[k]) / denom <= 1e-8, (k, ps[k], pi[k])


def _cli(src, *flags):
    from genfer_tpu.cli import main as cli_main

    with tempfile.NamedTemporaryFile("w", suffix=".sgcl",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main([path, "--no-timing", *flags])
    return buf.getvalue()


def _parse_probs(out):
    probs = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", out
        )
    }
    if not probs:  # normalized printing (no observe)
        probs = {
            int(m.group(1)): float(m.group(2))
            for m in re.finditer(r"p\((\d+)\) = ([\d.e+-]+)", out)
        }
    return probs


SYNTH = """
state := 1;
count ~ Poisson(3.25);
count ~ Binomial(count, 1/4);
count +~ Geometric(0.7);
if state = 1 {
    observe 2 ~ Poisson(0.5 * count);
    state ~ Bernoulli(1/3);
}
count +~ Poisson(1.5);
observe 1 ~ Binomial(count, 0.3);
if state = 1 {
    observe 3 ~ Poisson(0.5 * count);
    state ~ Bernoulli(1/3);
}
count +~ Poisson(2.5);
observe 2 ~ Binomial(count, 0.3);
if state = 1 {
    observe 1 ~ Poisson(0.5 * count);
    state ~ Bernoulli(1/3);
}
count +~ Poisson(0.5);
observe 0 ~ Binomial(count, 0.3);
if state = 1 {
    observe 2 ~ Poisson(0.5 * count);
    state ~ Bernoulli(1/3);
}
count +~ Poisson(1.25);
observe 1 ~ Binomial(count, 0.3);
return count
"""


def test_cli_scan_matches_interpreter():
    """--compile-scan output numerically equals the interpreter's on a
    mixed synthetic program (thinning, increments, var-rate observe,
    state branching)."""
    ref = _parse_probs(_cli(SYNTH, "--limit", "25"))
    got = _parse_probs(_cli(SYNTH, "--limit", "25", "--compile-scan"))
    assert set(got) == set(ref)
    for k, v in ref.items():
        if v > 1e-280:
            assert abs(got[k] - v) / v <= 1e-11, (k, got[k], v)


def test_cli_scan_fallback():
    """Programs outside the fragment silently fall back."""
    src = "x ~ Geometric(1/2);\nwhile x > 0 { x -= 1; }\nreturn x"
    # while-loop program: scan path must fall back, output still valid
    out = _cli(src, "--compile-scan")
    assert "p(0)" in out


def test_increment_binary_decomposition():
    """v +~ Binomial(w, p) via bit-decomposition == brute-force band
    operator on a small grid."""
    import jax
    import jax.numpy as jnp

    from genfer_tpu.lang import ast
    from genfer_tpu.scanc import _MassCompiler, _binom_vec

    rng = np.random.default_rng(0)
    nw, nv = 13, 17
    g = rng.random((nw, nv))
    mc = _MassCompiler([nw, nv])
    op = mc._stmt_op(ast.Sample(
        var=1,
        distribution=ast.BinomialVarTrials(var=0, p=ast.PosRatio(3, 10)),
        add_previous_value=True,
    ))
    got = np.asarray(op(jnp.asarray(g), ()))
    want = np.zeros_like(g)
    for n in range(nw):
        pmf = _binom_vec(n, 0.3, nv)
        for m in range(nv):
            want[n, m] = sum(
                g[n, m - k] * pmf[k] for k in range(m + 1)
            )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_skew_add():
    """v += w skew-reshape == brute-force shift."""
    import jax.numpy as jnp

    from genfer_tpu.scanc import _MassCompiler

    rng = np.random.default_rng(1)
    for R, C in [(5, 9), (8, 8), (11, 4)]:
        g = rng.random((R, C))
        mc = _MassCompiler([R, C])
        got = np.asarray(mc._skew_add(jnp.asarray(g), 0, 1))
        want = np.zeros_like(g)
        for r in range(R):
            for c in range(C):
                if 0 <= c - r:
                    want[r, c] = g[r, c - r]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_nested_normalize_batched():
    """Nested inference (normalize given vars) batches over the given
    axes in mass space — one vectorized pass instead of the per-value
    enumeration of gf.rs:589-634 — and matches the committed golden."""
    from genfer_tpu.lang.parser import parse_file
    from genfer_tpu.scanc import compile_scan

    prog = parse_file(
        "/root/reference/test/expect/slow/nested_infer_expensive.sgcl"
    )
    masses, Z, _ = compile_scan(prog, order=128)
    assert abs(Z - 0.014520434896172203) / 0.014520434896172203 <= 1e-12
    assert abs(masses[0] / Z - 0.3067209034541812) <= 1e-12
    assert abs(masses[1] / Z - 0.6932790965458189) <= 1e-12


NESTED_WIDE = """
Class ~ Binomial(15, 0.5);
normalize Class {
    Rate ~ Geometric(0.1);
    observe 5 ~ Poisson(0.2 * Rate);
    if Class <= 7 {
        observe 3 ~ Poisson(0.2 * Rate);
    } else {
        observe 8 ~ Poisson(0.2 * Rate);
    }
}
observe 4 ~ Poisson(0.1 * Rate);
return Class
"""


def test_nested_normalize_wide_matches_interpreter():
    """Wider given-variable range: the mass path's single vectorized
    renormalization equals the interpreter's 16-way enumeration."""
    ref = _parse_probs(_cli(NESTED_WIDE, "--limit", "16"))
    got = _parse_probs(
        _cli(NESTED_WIDE, "--limit", "16", "--compile-scan")
    )
    assert set(got) == set(ref)
    for k, v in ref.items():
        if v > 1e-280:
            assert abs(got[k] - v) / v <= 1e-10, (k, got[k], v)


def test_scan_serving_batch():
    """Generic serving: compile once from the parsed benchmark, then
    re-run on new datasets (padded shorter ones) and a vmapped batch;
    batch rows equal individual runs exactly."""
    from genfer_tpu.lang.parser import parse_file
    from genfer_tpu.scanc import compile_scan_program

    prog = parse_file(str(APPROX / "mixture" / "mixture.sgcl"))
    obj, (masses, Z) = compile_scan_program(prog, order=128,
                                            max_steps=128)
    assert abs(Z - 8.714656341711538e-85) / 8.714656341711538e-85 < 1e-11
    rng = np.random.default_rng(3)
    B = 4
    bc = rng.integers(0, 7, size=(B, 40)).astype(np.float64)
    mb, zb = obj.run_batch([bc, bc])
    for i in range(B):
        mi, zi = obj.run_with_data([bc[i], bc[i]])
        np.testing.assert_allclose(mb[i], mi, rtol=1e-12)
    assert np.isfinite(zb).all() and (zb > 0).all()


def test_param_ratio_serving_sweep():
    """$param programs compile once and serve parameter sweeps: every
    binding must match a fresh interpreter run with the value inlined
    (reference parity surface: the compile.py scam-calls serving mode)."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan_program

    src_tpl = """nr ~ Poisson(6);
observe 2 ~ Binomial(nr, {p});
nr +~ Poisson(3);
observe 1 ~ Binomial(nr, {p});
nr +~ Poisson(3);
observe 3 ~ Binomial(nr, {p});
nr +~ Poisson(3);
observe 2 ~ Binomial(nr, {p});
nr +~ Poisson(3);
observe 4 ~ Binomial(nr, {p});
return nr;"""
    prog = parse_program(src_tpl.format(p="$p"))
    obj, (m0, Z0) = compile_scan_program(
        prog, order=64, params={"p": 0.3}
    )
    sweeps = [{"p": 0.2}, {"p": 0.3}, {"p": 0.5}]
    masses, totals = obj.run_param_sweep(sweeps)
    # binding used at compile time must agree with the committed run
    np.testing.assert_allclose(masses[1], m0, rtol=1e-12)
    for row, setting in zip(masses, sweeps):
        out = _cli(src_tpl.format(p=repr(setting["p"])))
        probs = _parse_probs(out)
        Z = float(re.search(r"Z = ([\d.e+-]+)", out).group(1))
        tot = row.sum()
        for k, pv in probs.items():
            if k < len(row):
                assert abs(row[k] - pv) <= 1e-9 * max(Z, 1e-300), (
                    setting, k, row[k], pv
                )
        assert abs(tot - Z) / Z <= 1e-9, (setting, tot, Z)


def test_cascade_serving_fresh_counts():
    """Cascade serving: new observation counts through the compiled
    object must match a fresh interpreter run on the rewritten source."""
    import numpy as np

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan_program

    units = [2, 0, 3, 1, 4, 2]
    n = len(units)

    def src_for(cs):
        out = "r ~ Geometric(0.3);\n"
        for k in range(n + 1):
            body = [f"observe {c} ~ Poisson(0.5 * r);" for c in cs[:k]]
            body.append("r ~ Geometric(0.3);")
            body += [f"observe {c} ~ Poisson(0.5 * r);" for c in cs[k:]]
            body.append(f"sp := {k};")
            kw = "if" if k == 0 else "} else if"
            out += f"{kw} 1 ~ Bernoulli(1 / {n + 1 - k}) {{\n"
            out += "\n".join(body) + "\n"
        out += "} else {}\nreturn sp;"
        return out

    prog = parse_program(src_for(units))
    obj, (m0, Z0) = compile_scan_program(prog, order=64)
    fresh = [1, 2, 0, 4, 3, 1]
    masses, Z = obj.run_with_counts(fresh)
    out = _cli(src_for(fresh))
    probs = _parse_probs(out)
    Zi = float(re.search(r"Z = ([\d.e+-]+)", out).group(1))
    assert abs(Z - Zi) / Zi <= 1e-9
    for k, pv in probs.items():
        if k < len(masses):
            assert abs(masses[k] - pv) <= 1e-9 * Zi
    # the committed dataset still reproduces the original result
    m1, Z1 = obj.run_with_counts(units)
    np.testing.assert_allclose(m1, m0, rtol=1e-12)


def test_cascade_multivar_serving_fresh_counts():
    """Multi-variable cascade serving: units on a pivot-refreshed var
    (telescoping group) and on a never-refreshed var (static factor
    group), rerun with fresh observation counts."""
    import numpy as np

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import CascadeCompiled, compile_scan_program

    # unit i targets r (refreshed by the pivot) for even i, s for odd i
    def src_for(cs):
        n = len(cs)

        def unit(i, c):
            v = "r" if i % 2 == 0 else "s"
            return f"observe {c} ~ Poisson(0.5 * {v});"

        out = "r ~ Geometric(0.3);\ns ~ Poisson(2);\n"
        for k in range(n + 1):
            body = [unit(i, c) for i, c in enumerate(cs[:k])]
            body.append("r ~ Geometric(0.3);")
            body += [unit(k + i, c) for i, c in enumerate(cs[k:])]
            body.append(f"sp := {k};")
            kw = "if" if k == 0 else "} else if"
            out += f"{kw} 1 ~ Bernoulli(1 / {n + 1 - k}) {{\n"
            out += "\n".join(body) + "\n"
        out += "} else {}\nreturn sp;"
        return out

    units = [2, 0, 3, 1, 4, 2]
    prog = parse_program(src_for(units))
    obj, (m0, Z0) = compile_scan_program(prog, order=64)
    assert isinstance(obj, CascadeCompiled)
    kinds = {(g["h0"] is None) for g in obj._groups}
    assert kinds == {True, False}, "expected one static + one scan group"
    fresh = [1, 2, 0, 4, 3, 1]
    masses, Z = obj.run_with_counts(fresh)
    out = _cli(src_for(fresh))
    probs = _parse_probs(out)
    Zi = float(re.search(r"Z = ([\d.e+-]+)", out).group(1))
    assert abs(Z - Zi) / Zi <= 1e-9
    for k, pv in probs.items():
        if k < len(masses):
            assert abs(masses[k] - pv) <= 1e-9 * Zi
    m1, _ = obj.run_with_counts(units)
    np.testing.assert_allclose(m1, m0, rtol=1e-12)


def test_scan_compiler_corpus_coverage():
    """Corpus-wide generality pin: every golden program in the mass-
    semantics fragment must compile (no silent shrinkage of the
    fragment) and reproduce its committed golden Z / unnormalized
    masses.  Programs outside the fragment must fall back with
    UnsupportedForScan — never crash."""
    import os
    import re as _re
    from pathlib import Path

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_golden import CASES, _first_line_flags

    # flag modes whose goldens print non-f64 values, and heavyweight
    # compiles: mixture/hmm/switchpoint/populations have dedicated
    # scanc-path golden tests elsewhere in this file;
    # digitRecognition is interpreter-verified only (test_golden.py) —
    # its 10-way split program is outside the scan fragment and falls
    # back by design
    skip_flags = ("--rational", "-r", "-s", "--precision", "-p",
                  "--bounds", "-b")
    heavy = {"mixture.sgcl", "hmm.sgcl", "switchpoint.sgcl",
             "two_populations.sgcl", "population.sgcl",
             "population_modified.sgcl", "digitRecognition.sgcl"}
    compiled = fallbacks = 0
    for sgcl in CASES:
        if sgcl.name in heavy:
            continue
        flags = _first_line_flags(sgcl)
        if flags is None or any(f in flags for f in skip_flags):
            continue
        prog = parse_program(sgcl.read_text(encoding="utf-8"))
        try:
            masses, Z, obj = compile_scan(prog, order=64)
        except UnsupportedForScan:
            fallbacks += 1
            continue
        compiled += 1
        exp = sgcl.with_suffix(".expect").read_text(encoding="utf-8")
        mz = _re.search(r"Total measure:\s+Z = ([0-9.eE+-]+)\s", exp)
        if mz:
            z_exp = float(mz.group(1))
            assert abs(Z - z_exp) <= max(1e-8 * abs(z_exp), 1e-14), (
                sgcl, Z, z_exp
            )
        me = _re.search(r"Expected value:\s+E = ([0-9.eE+-]+)\s", exp)
        if me and Z > 0:
            vals = getattr(obj, "result_vals", None)
            import numpy as _np
            ns = (vals if vals is not None
                  else _np.arange(len(masses), dtype=float))
            e_got = float((masses * ns).sum()) / Z
            e_exp = float(me.group(1))
            # 1e-7: the committed cont_switchpoint golden is itself
            # ~1.2e-8 off the exact Gamma-Poisson value (the quadrature
            # is closer to ground truth than the golden; see
            # test_cascade_switchpoint_continuous_exact)
            assert abs(e_got - e_exp) <= max(1e-7 * abs(e_exp), 1e-10), (
                sgcl, e_got, e_exp
            )
        for k, v in _re.findall(
            r"Unnormalized: p\((\d+)\)\s*= ([0-9.eE+-]+)", exp
        ):
            k, v = int(k), float(v)
            if k < len(masses):
                assert abs(masses[k] - v) <= max(1e-8 * abs(v), 1e-12), (
                    sgcl, k, masses[k], v
                )
    # fragment-size pin: since the dirac-value-grid / Gamma-shape<1 /
    # SSA-rename / affine-value-assignment extensions the compiler
    # covers EVERY program in this set (the full 122-file corpus less
    # the exact-mode flag skips and the heavy set, both golden-verified
    # elsewhere) — a real regression shows up as any fallback at all
    assert compiled >= 94, f"only {compiled} corpus programs compiled"
    assert fallbacks == 0, f"{fallbacks} fallbacks — fragment shrank?"


@pytest.mark.parametrize("seed", range(8))
def test_continuous_grid_beta_bernoulli_exact(seed):
    """Continuous quadrature grids vs the EXACT Beta-Bernoulli closed
    form: a UniformCont(0,1) prior with random Bernoulli(P) observation
    strings has Z = B(1+h, 1+t) and posterior moments
    E[P^k] = prod (1+h+i)/(2+h+t+i) — Gauss-Legendre is exact for the
    polynomial likelihood, so the compiled result must match to
    machine precision."""
    import math
    import random

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    rng = random.Random(4200 + seed)
    obs = [rng.randrange(2) for _ in range(rng.randrange(1, 12))]
    src = "P ~ UniformCont(0, 1);\n"
    src += "".join(f"observe {o} ~ Bernoulli(P);\n" for o in obs)
    src += "return P"
    masses, Z, obj = compile_scan(parse_program(src), order=64)
    h, t = sum(obs), len(obs) - sum(obs)
    z_exact = math.gamma(1 + h) * math.gamma(1 + t) / math.gamma(2 + h + t)
    assert abs(Z - z_exact) <= 1e-13 * z_exact, (Z, z_exact)
    vals = obj.result_vals
    e = float((masses * vals).sum()) / Z
    e2 = float((masses * vals ** 2).sum()) / Z
    e_exact = (1 + h) / (2 + h + t)
    e2_exact = e_exact * (2 + h) / (3 + h + t)
    assert abs(e - e_exact) <= 1e-12 * e_exact
    assert abs(e2 - e2_exact) <= 1e-12 * e2_exact


def test_continuous_copy_assign_clickgraph_shape():
    """The clickGraph pattern (continuous copy-assign `b2 := b1` inside
    a branch) compiles; posterior of the similarity flag matches the
    independent closed form: P(same) ~ q*B-terms integral."""
    import math

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = """
same ~ Bernoulli(1/2);
if same = 1 {
    b1 ~ UniformCont(0, 1);
    b2 := b1;
} else {
    b1 ~ UniformCont(0, 1);
    b2 ~ UniformCont(0, 1);
}
observe 1 ~ Bernoulli(b1);
observe 0 ~ Bernoulli(b2);
observe 1 ~ Bernoulli(b1);
return same
"""
    masses, Z, _ = compile_scan(parse_program(src), order=64)
    # same=1: ∫ p^2(1-p) dp = B(3,2) = 1/12; same=0: ∫p^2 ∫(1-q) = 1/3*1/2
    w1, w0 = 0.5 / 12.0, 0.5 / 6.0
    assert abs(Z - (w0 + w1)) <= 1e-13
    assert abs(masses[1] - w1) <= 1e-13
    assert abs(masses[0] - w0) <= 1e-13


def test_continuous_serving_fresh_data():
    """Continuous-grid serving: fresh Bernoulli observation strings
    through run_with_data / run_batch match the exact Beta integral."""
    import math

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan_program

    obs = [1, 0, 1, 1, 0, 1]
    src = ("P ~ UniformCont(0, 1);\n"
           + "".join(f"observe {o} ~ Bernoulli(P);\n" for o in obs)
           + "return P")
    obj, _ = compile_scan_program(parse_program(src), order=64)

    def z_exact(b):
        h, t = int(sum(b)), int(len(b) - sum(b))
        return (math.gamma(1 + h) * math.gamma(1 + t)
                / math.gamma(2 + h + t))

    fresh = [0, 0, 1, 0, 0, 0]
    _, Z = obj.run_with_data([fresh])
    assert abs(Z - z_exact(fresh)) <= 1e-13 * z_exact(fresh)
    batch = np.asarray([[1, 1, 1, 0, 1, 1], [0, 1, 0, 0, 1, 0]])
    _, Zs = obj.run_batch([batch])
    for Zb, b in zip(Zs, batch):
        assert abs(Zb - z_exact(b)) <= 1e-12 * z_exact(b)


def test_continuous_grid_review_regressions():
    """Pins for three reviewed defects of the continuous-grid
    extension: impossible Bernoulli observations must kill all mass, a
    continuous RESULT unsampled on some path must fall back (its error
    is grid-independent, invisible to doubling), and small starting
    orders must keep doubling past quadrature grids that came out
    identical (identical grids validate nothing)."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import UnsupportedForScan, compile_scan

    _, Z, _ = compile_scan(parse_program(
        "P ~ UniformCont(0,1);\nobserve 2 ~ Bernoulli(P);\nreturn P"
    ), order=64)
    assert Z == 0.0

    with pytest.raises(UnsupportedForScan):
        compile_scan(parse_program(
            "c ~ Bernoulli(1/2);\n"
            "if c = 1 { P ~ UniformCont(0,1); } else { }\n"
            "return P"
        ), order=128)

    m, Z, obj = compile_scan(parse_program(
        "P ~ UniformCont(0,1);\n"
        "observe 1 ~ Bernoulli(P);\nobserve 1 ~ Bernoulli(P);\n"
        "return P"
    ), order=8)
    assert abs(Z - 1.0 / 3.0) <= 1e-14
    e = float((m * obj.result_vals).sum()) / Z
    assert abs(e - 0.75) <= 1e-13


def test_dirac_value_grids_exact():
    """Fractional Dirac supports are EXACT value grids (unit weights at
    the support values): they validate on the first doubling like
    integer grids instead of tripping the identical-quadrature-grid
    rule (which once pushed them past max_order).  Expected values from
    the committed reference goldens (test/expect/sample/
    dirac-fractional.expect, test/expect/observe/dirac-bernoulli.expect:
    Z = 1, E = 0.5 and Z = 0.25, E = 0.5)."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = Path(
        "/root/reference/test/expect/sample/dirac-fractional.sgcl"
    ).read_text()
    m, Z, obj = compile_scan(parse_program(src), order=16)
    assert Z == 1.0
    assert float((m * obj.result_vals).sum()) / Z == 0.5

    src = Path(
        "/root/reference/test/expect/observe/dirac-bernoulli.sgcl"
    ).read_text()
    m, Z, obj = compile_scan(parse_program(src), order=16)
    assert abs(Z - 0.25) <= 1e-15
    assert abs(float((m * obj.result_vals).sum()) / Z - 0.5) <= 1e-15


@pytest.mark.parametrize("shape", [0.25, 0.5, 0.7])
def test_gamma_shape_lt1_exact_conjugacy(shape):
    """Gamma priors with shape < 1 (singular pdf at 0) run on the
    power-warped grid u = x^shape, which cancels the singularity
    analytically — the raw-x grid plateaued and FOOLED the doubling
    validation (measured Z = 0.9307 stable across doublings, truth 1).
    Cross-checked against exact Gamma moments and exact Gamma-Poisson
    conjugacy (reference corpus: sample/gamma.sgcl,
    observe/poisson-conjugate-prior-gamma.sgcl)."""
    import math

    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    b = 0.1
    m, Z, obj = compile_scan(parse_program(
        f"X ~ Gamma({shape}, {b});\nreturn X"
    ), order=64)
    assert abs(Z - 1.0) <= 1e-11
    for k in (1, 2, 3, 4):
        mk = float((m * obj.result_vals ** k).sum()) / Z
        exact = math.prod((shape + i) / b for i in range(k))
        assert abs(mk - exact) <= 1e-10 * exact, (k, mk, exact)

    # conjugate update: observe c ~ Poisson(X) => Gamma(shape+c, 1+b)
    c = 4
    m, Z, obj = compile_scan(parse_program(
        f"X ~ Gamma({shape}, {b});\nobserve {c} ~ Poisson(X);\nreturn X"
    ), order=64)
    ap, bp = shape + c, 1.0 + b
    z_exact = (math.gamma(ap) / math.gamma(shape)) * (
        b ** shape / bp ** ap
    ) / math.factorial(c)
    assert abs(Z - z_exact) <= 1e-11 * z_exact
    for k in (1, 2, 3):
        mk = float((m * obj.result_vals ** k).sum()) / Z
        exact = math.prod((ap + i) / bp for i in range(k))
        assert abs(mk - exact) <= 1e-10 * exact, (k, mk, exact)


def test_type_changing_self_resample():
    """`X ~ D(X)` with X continuous — the variable is overwritten by a
    discrete draw parameterized by its own (continuous) old value — is
    handled by the SSA-lite rename pre-pass: the redraw gets a fresh
    integer axis and the existing continuous-parent kernels apply.
    Expected values from the committed goldens (test/expect/sample/
    bernoulli-compound-same-var.expect: E = 0.25;
    exponential-poisson.expect: E = 10, exact Geometric(1/11))."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = Path(
        "/root/reference/test/expect/sample/bernoulli-compound-same-var"
        ".sgcl"
    ).read_text()
    m, Z, obj = compile_scan(parse_program(src), order=64)
    assert obj.result_vals is None  # integer grid after the redraw
    assert abs(Z - 1.0) <= 1e-13
    assert abs(m[1] - 0.25) <= 1e-13 and abs(m[0] - 0.75) <= 1e-13

    src = Path(
        "/root/reference/test/expect/sample/exponential-poisson.sgcl"
    ).read_text()
    m, Z, obj = compile_scan(parse_program(src), order=64)
    assert abs(Z - 1.0) <= 1e-12
    # X ~ Geometric(0.1 / 1.1) exactly (the reference file's own note)
    p = 0.1 / 1.1
    ks = np.arange(min(len(m), 40))
    exact = p * (1 - p) ** ks
    np.testing.assert_allclose(m[:len(ks)], exact, rtol=1e-11)
    E = float((m * np.arange(len(m))).sum()) / Z
    assert abs(E - 10.0) <= 1e-9


@pytest.mark.parametrize("name,e_exp", [
    ("assign-cont", 2.0),          # Y := 2*0.5 + 1
    ("add-assign-cont", 2.5),      # Y = 0.5 + (2*0.5 + 1)
    ("self-assign-cont", 2.0),     # Y := 2*Y + 1
    ("self-add-assign-cont", 2.5),  # Y += 2*Y + 1
])
def test_affine_assign_on_value_grids(name, e_exp):
    """Affine assignments among fractional-Dirac variables compile via
    the forward value-set analysis (grid = union of reachable values;
    ops become index kernels).  Expected values from the committed
    test/expect/assign/*-cont.expect goldens."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = Path(
        f"/root/reference/test/expect/assign/{name}.sgcl"
    ).read_text()
    m, Z, obj = compile_scan(parse_program(src), order=16)
    assert abs(Z - 1.0) <= 1e-14
    e = float((m * obj.result_vals).sum()) / Z
    assert abs(e - e_exp) <= 1e-13, (e, e_exp)


def test_additive_bernoulli_compound_on_quadrature():
    """`X +~ Bernoulli(X)` with continuous X: the value grid doubles to
    {x, x+1} (shifted nodes carry zero quadrature weight) and the
    compound becomes a stay/move kernel.  X = U + B with U uniform and
    B|U ~ Bernoulli(U) has exact raw moments E[X] = 1, E[X^2] = 3/2,
    E[X^3] = 5/2, E[X^4] = 13/3 (the committed
    sample/bernoulli-compound-same-var-add.expect golden)."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = Path(
        "/root/reference/test/expect/sample/"
        "bernoulli-compound-same-var-add.sgcl"
    ).read_text()
    m, Z, obj = compile_scan(parse_program(src), order=64)
    assert abs(Z - 1.0) <= 1e-12
    for k, exact in ((1, 1.0), (2, 1.5), (3, 2.5), (4, 13.0 / 3.0)):
        mk = float((m * obj.result_vals ** k).sum()) / Z
        assert abs(mk - exact) <= 1e-11 * exact, (k, mk, exact)


# ----------------------------------------------------------------------
# While loops: bounded unrolling with rest-mass intervals
# ----------------------------------------------------------------------

WHILE_DIR = Path("/root/reference/test/expect/while")


@pytest.mark.parametrize("name,flags", [
    ("geometric-loop", ["--limit", "11"]),
    ("geometric-loop-normalize", ["--limit", "11"]),
    ("rw-asymm-0.75", ["--limit", "12"]),
    ("rw-symm", ["--limit", "31"]),
])
def test_while_scan_cli_matches_golden(name, flags):
    """The scan compiler's While support (bounded unrolling + rest-mass
    taps) through the CLI must reproduce the committed interval goldens
    line for line: interval moments (E in [lo, inf]), exact p(k) below
    the unroll horizon, p(k) in [0, rest] beyond it, and the tail
    bound (reference: semantics/gf.rs while rule; printing
    main.rs:384-473)."""
    from genfer_tpu.cli import main as cli_main

    src = WHILE_DIR / f"{name}.sgcl"
    expect = (WHILE_DIR / f"{name}.expect").read_text(encoding="utf-8")
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main([str(src), "--no-timing", "--compile-scan", *flags])
    got = buf.getvalue()
    assert "falling back" not in got
    def lines(t):
        return [l for l in t.splitlines()
                if not l.startswith("Time") and l.strip()]
    assert lines(got) == lines(expect)


def test_while_scan_rest_mass_direct():
    """compile_scan on a geometric while loop: done masses are exact
    powers of two and last_rest is the mass still live after the
    unroll count."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    prog = parse_program(
        "X := 0;\n"
        "while 0 ~ Bernoulli(1/2) { X += 1; }\n"
        "return X"
    )
    for unroll, order in ((8, 64), (14, 64)):
        masses, Z, obj = compile_scan(prog, order=order, unroll=unroll)
        for k in range(unroll):
            assert masses[k] == 2.0 ** -(k + 1), (k, masses[k])
        assert obj.last_rest == 2.0 ** -unroll
        assert abs(Z - (1.0 - 2.0 ** -unroll)) <= 1e-15


def _interp_interval_Z(out):
    """[Z_lo, Z_hi] from interval-mode interpreter output."""
    m = re.search(r"Z ∈ \[([\d.e+-]+), ([\d.e+-]+)\]", out)
    return float(m.group(1)), float(m.group(2))


def test_while_in_given_normalize_matches_interpreter():
    """While inside a normalize WITH given variables: the threaded
    rest tensor is reduced to the given-axes granularity, mirroring
    the reference's per-given-value slice enumeration that hands each
    slice the scalar rest and joins slice results by max
    (gf_transformer.transform_normalize).  Z_lo, masses, and
    Z_lo + rest == Z_hi must all match the interpreter."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = (
        "c ~ Bernoulli(1/2);\n"
        "normalize c {\n"
        "  X := 0;\n"
        "  while 0 ~ Bernoulli(1/2) { X += 1; }\n"
        "}\n"
        "return X"
    )
    masses, Z, obj = compile_scan(parse_program(src), order=64)
    out = _cli(src, "--limit", "8", "--unroll", "8")
    z_lo, z_hi = _interp_interval_Z(out)
    assert abs(Z - z_lo) <= 1e-14
    assert abs((Z + obj.last_rest) - z_hi) <= 1e-14
    for k, pv in _parse_probs(out).items():
        assert abs(masses[k] - pv) <= 1e-14, (k, masses[k], pv)


def test_while_reads_continuous_matches_interpreter():
    """While alongside continuous quadrature grids compiles as long as
    the loop body never WRITES a continuous-grid variable: reads
    (condition weights / rates at node values) are grid-exact per
    iteration."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = (
        "P ~ UniformCont(0, 1);\n"
        "X := 0;\n"
        "while 0 ~ Bernoulli(1/2) { X += 1; }\n"
        "observe 1 ~ Bernoulli(P);\n"
        "return X"
    )
    masses, Z, obj = compile_scan(parse_program(src), order=64)
    out = _cli(src, "--limit", "8", "--unroll", "8")
    z_lo, z_hi = _interp_interval_Z(out)
    assert abs(Z - z_lo) <= 1e-14
    assert abs((Z + obj.last_rest) - z_hi) <= 1e-14
    for k, pv in _parse_probs(out).items():
        assert abs(masses[k] - pv) <= 1e-14, (k, masses[k], pv)


def test_while_in_scanned_template_matches_interpreter():
    """While inside a lax.scan'd repeated block: the rest rides the
    scan carry and shares its per-step power-of-two rescaling, so its
    unit scale stays aligned with logz.  Each template iteration's
    geometric loop leaves nonzero live mass, so this exercises the
    carry-rescaled rest accumulation, not just zero-rest threading."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan, detect_repetition

    data = (1, 2, 0, 1, 3, 0, 2, 1, 0, 0, 1, 2)
    src = "X := 1;\n" + "".join(
        "X +~ Bernoulli(1/4);\n"
        "while 0 ~ Bernoulli(1/3) { X += 1; }\n"
        "observe %d ~ Poisson(0.3 * X);\n" % c
        for c in data
    ) + "return X"
    prog = parse_program(src)
    rep = detect_repetition(prog.stmts)
    assert rep.n_iters == len(data) and len(rep.template) == 3, \
        "program must exercise the scan-template path"
    masses, Z, obj = compile_scan(prog, order=96, unroll=8)
    out = _cli(src, "--limit", "6", "--unroll", "8")
    z_lo, z_hi = _interp_interval_Z(out)
    assert abs(Z - z_lo) <= 1e-12 * z_lo
    assert abs((Z + obj.last_rest) - z_hi) <= 1e-12 * z_hi
    for k, pv in _parse_probs(out).items():
        if pv > 1e-280:
            assert abs(masses[k] - pv) <= 1e-11 * pv, (k, masses[k], pv)


def test_while_additive_compound_on_quadrature_grid():
    """Round-5: the LAST while-body refusal closed — `P +~
    Bernoulli(P)` per unrolled iteration.  The value-set analysis
    closes the grid over the x -> x+1 images (one per body
    application) and the kernel applies the engine's FORMAL algebra
    G + (t-1)*dG, so even re-applications to shifted mass (Bernoulli
    parameters above 1, formally negative stay-weights) match the
    interpreter exactly.  This exact program was the round-4 refusal
    pin (reference: uniform while handling, semantics/gf.rs:318-334)."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = (
        "P ~ UniformCont(0, 1/2);\n"
        "X := 0;\n"
        "while 0 ~ Bernoulli(1/2) { X += 1; P +~ Bernoulli(P); }\n"
        "observe 1 ~ Bernoulli(P);\n"
        "return X"
    )
    masses, Z, obj = compile_scan(parse_program(src), order=64, unroll=8)
    out = _cli(src, "--limit", "8", "--unroll", "8")
    z_lo, z_hi = _interp_interval_Z(out)
    assert abs(Z - z_lo) <= 1e-12 * max(z_lo, 1e-30)
    # the formal mean DOUBLES per application here, so every unrolled
    # exit contributes exactly 1/8 and the true Z diverges; the CLI
    # clamps its upper bound at 1.0 (sound only for valid programs),
    # so scanc's wider Z + rest must CONTAIN the CLI's interval, not
    # equal it
    assert (Z + obj.last_rest) >= z_hi - 1e-12
    import re

    probs = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", out
        )
    }
    assert probs, out
    for k, v in probs.items():
        got = float(masses[k]) if k < len(masses) else 0.0
        assert abs(got - v) <= 1e-10 * max(v, 1e-30), (k, got, v)


def test_straightline_compound_support_above_one():
    """A single compound applied to mass with support above 1 (the
    UniformCont(0, 2) prior): the engine's formal rule preserves total
    mass ((1-x) + x = 1 even where 1-x < 0), so Z = 1 exactly.  The
    round-4 zero-row kernel LOST that mass and the doubling validation
    refused the program; the formal kernel matches the interpreter."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = (
        "X ~ UniformCont(0, 2);\n"
        "X +~ Bernoulli(X);\n"
        "Y ~ Poisson(X);\n"
        "return Y"
    )
    masses, Z, obj = compile_scan(parse_program(src), order=64)
    assert abs(Z - 1.0) <= 1e-12
    out = _cli(src, "--limit", "8")
    import re

    probs = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(r"p\((\d+)\)\s*=\s*([\d.e+-]+)", out)
    }
    assert probs, out
    for k, v in probs.items():
        if k < len(masses):
            assert abs(float(masses[k]) - v) <= 1e-10 * max(v, 1e-30), k


def test_while_writes_affine_quadrature_grid():
    """An affine write onto a quadrature grid inside a while body: the
    value-set may-analysis absorbs the body once per unrolled
    exit-split, so the image nodes (zero quadrature weight) cover every
    reachable iteration depth.  Closed form: exiting after k iterations
    has path weight (1/2)^(k+1) and the final observe multiplies by
    E[2^k * U] = 2^(k-1), so UNNORMALIZED p(k) = 1/4 exactly for every
    k below the unroll horizon.  (The interpreter is no oracle here:
    its moment intervals blow up through the unbounded rest weight and
    it panics at the reference-parity non-negative-moments assert,
    main.rs:520.)"""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    masses, Z, obj = compile_scan(parse_program(
        "P ~ UniformCont(0, 1);\n"
        "X := 0;\n"
        "while 0 ~ Bernoulli(1/2) { X += 1; P := 2 * P + 0; }\n"
        "observe 1 ~ Bernoulli(P);\n"
        "return X"
    ), order=32, unroll=6, device="cpu")
    for k in range(6):
        assert abs(masses[k] - 0.25) <= 1e-12, (k, masses[k])
    assert abs(Z - 1.5) <= 1e-12
    assert abs(obj.last_rest - 0.5 ** 6) <= 1e-12


def test_while_writes_continuous_fresh_resample():
    """A loop body that RE-SAMPLES a continuous var from a density is
    grid-exact per iteration (marginalize+outer re-concentrates on the
    same static quadrature grid), so it now compiles; p(c = k) has the
    closed form (1/2)^{k+1} * (2/9)^k here (each iteration's observe
    contributes E[X e^-X] = int 2e^-2x * x e^-x dx = 2/9)."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = (
        "flip ~ Bernoulli(1/2);\n"
        "c := 0;\n"
        "while flip = 1 {\n"
        "    X ~ Exponential(2);\n"
        "    observe 1 ~ Poisson(1 * X);\n"
        "    flip ~ Bernoulli(1/2);\n"
        "    c += 1;\n"
        "}\n"
        "return c"
    )
    masses, Z, obj = compile_scan(parse_program(src), order=64, unroll=8)
    for k in range(8):
        want = 0.5 ** (k + 1) * (2.0 / 9.0) ** k
        assert abs(masses[k] - want) <= 1e-11 * want, (k, masses[k], want)
    out = _cli(src, "--limit", "8", "--unroll", "8")
    z_lo, z_hi = _interp_interval_Z(out)
    assert abs(Z - z_lo) <= 1e-11 * z_lo
    assert abs((Z + obj.last_rest) - z_hi) <= 1e-11 * z_hi


def test_while_writes_dirac_value_grid():
    """Affine writes onto a Dirac VALUE grid inside a loop body: the
    forward value-set may-analysis absorbs the body once per unrolled
    exit-split, so the union grid covers every reachable value; the
    geometric doubling P := 2P from 1/1024 matches the interpreter's
    interval output exactly."""
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.scanc import compile_scan

    src = (
        "P ~ Dirac(1/1024);\n"
        "flip ~ Bernoulli(1/2);\n"
        "while flip = 1 {\n"
        "    P := 2 * P + 0;\n"
        "    flip ~ Bernoulli(1/3);\n"
        "}\n"
        "observe 1 ~ Bernoulli(P);\n"
        "return flip"
    )
    masses, Z, obj = compile_scan(parse_program(src), order=64, unroll=8)
    # closed form: unroll=8 exit-splits retain k = 0..7 body runs, so
    # Z_lo = 1/2048 + sum_{k=1..7} (1/2)(2/3)(1/3)^(k-1) 2^k/1024
    want = 1.0 / 2048.0 + sum(
        0.5 * (2.0 / 3.0) * (1.0 / 3.0) ** (k - 1) * 2.0 ** k / 1024.0
        for k in range(1, 8)
    )
    assert abs(Z - want) <= 1e-14, (Z, want)
    out = _cli(src, "--limit", "4", "--unroll", "8")
    z_lo, z_hi = _interp_interval_Z(out)
    assert abs(Z - z_lo) <= 1e-13 * z_lo
    assert abs((Z + obj.last_rest) - z_hi) <= 1e-13 * z_hi
    # deterministic bounded loop: exact (rest-free) result
    src_det = (
        "P ~ Dirac(1/16);\n"
        "n := 0;\n"
        "while n < 3 {\n"
        "    P := 2 * P + 0;\n"
        "    n += 1;\n"
        "}\n"
        "Q ~ Bernoulli(P);\n"
        "return Q"
    )
    masses, Z, obj = compile_scan(parse_program(src_det), order=64)
    assert obj.last_rest == 0.0
    assert abs(Z - 1.0) <= 1e-15
    assert abs(masses[1] - 0.5) <= 1e-15  # P ends at 1/2
