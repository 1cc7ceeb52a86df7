"""Scan-compiled population pipeline vs the generic GF interpreter.

``genfer_tpu.models.CompiledPopulation`` runs the population family
(reference generate_population_examples.rs) as one ``lax.scan`` over
(rate, count) pairs — the "parameterized observation counts" serving
mode.  These tests pin it against the CLI/interpreter on the same
programs at <=1e-10 relative deviation, including padded shorter
datasets and a batched run.
"""

import io
import re
import tempfile
from contextlib import redirect_stdout

import numpy as np
import pytest

DELTA = 0.2636
RHO = 0.2


def _sgcl(init_lam, lams, cs):
    lines = [f"population ~ Poisson({init_lam!r});"]
    for lam, c in zip(lams, cs):
        lines += [
            f"arrivals ~ Poisson({lam!r});",
            f"population ~ Binomial(population, {DELTA});",
            "population += arrivals;",
            f"observe {c} ~ Binomial(population, {RHO});",
        ]
    lines.append("return population")
    return "\n".join(lines)


def _cli_probs(src, limit):
    from genfer_tpu.cli import main as cli_main

    with tempfile.NamedTemporaryFile("w", suffix=".sgcl",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main([path, "--no-timing", "--limit", str(limit),
                  "--backend", "numpy"])
    return {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)", buf.getvalue()
        )
    }


@pytest.mark.parametrize("limit,slack", [(40, 64), (64, 96)])
def test_population_scan_matches_interpreter(limit, slack):
    from genfer_tpu.models import CompiledPopulation

    init_lam = 1.285
    lams = [5.815, 10.52, 7.52, 2.14]
    cs = [3, 1, 4, 0]
    ref = _cli_probs(_sgcl(init_lam, lams, cs), limit)
    cp = CompiledPopulation(DELTA, RHO, limit=limit, max_steps=6,
                            init_lambda=init_lam, slack=slack)
    got = np.asarray(cp.probs(np.asarray(lams), np.asarray(cs)))
    for k, v in ref.items():
        if v > 1e-290:
            assert abs(got[k] - v) / v <= 1e-10, (k, got[k], v)


def test_two_populations_scan_matches_interpreter():
    """2-species joint state (migration + two thinnings + two arrival
    convs + two observations per round) as one scan, vs the CLI on the
    equivalent generated SGCL (reference generate_two_populations.rs)."""
    from genfer_tpu.models import CompiledTwoPopulations

    d1, d2, mig, rho = 0.23724, 0.2636, 0.1, 0.2
    init = (2.313, 0.257)
    lam1s, lam2s = [10.467, 18.936], [1.163, 2.104]
    c1s, c2s = [1, 5], [1, 0]
    lines = [
        f"population1 ~ Poisson({init[0]});",
        f"population2 ~ Poisson({init[1]});",
    ]
    for l1, l2, c1, c2 in zip(lam1s, lam2s, c1s, c2s):
        lines += [
            f"population2 +~ Binomial(population1, {mig});",
            f"population1 ~ Binomial(population1, {d1});",
            f"population2 ~ Binomial(population2, {d2});",
            f"population1 +~ Poisson({l1});",
            f"population2 +~ Poisson({l2});",
            f"observe {c1} ~ Binomial(population1, {rho});",
            f"observe {c2} ~ Binomial(population2, {rho});",
        ]
    lines.append("return population2")
    ref = _cli_probs("\n".join(lines), 24)
    cp = CompiledTwoPopulations(d1, d2, mig, rho, rho, limit=24,
                                max_steps=3, init_lams=init, slack=72)
    got = np.asarray(cp.probs(np.asarray(lam1s), np.asarray(lam2s),
                              np.asarray(c1s), np.asarray(c2s)))
    for k, v in ref.items():
        if v > 1e-290:
            assert abs(got[k] - v) / v <= 1e-10, (k, got[k], v)


def test_hmm_scan_matches_committed_golden():
    """The scan-compiled 2-state Poisson HMM against the reference's
    committed 30-observation benchmark output (approx/hmm/hmm.expect):
    the full Rate2 posterior to <=1e-9 relative.  (The interpreter
    needs ~7 s per dataset; the scan pipeline serves repeat datasets in
    milliseconds and its graph is independent of the sequence length.)"""
    from pathlib import Path

    from genfer_tpu.models import CompiledHMM

    expect = Path(
        "/root/reference/benchmarks/neurips2023/approx/hmm/hmm.expect"
    )
    sgcl = expect.with_suffix(".sgcl")
    if not expect.exists():
        pytest.skip("reference corpus not mounted")
    counts = [
        int(x) for x in re.search(r"\[(.*?)\]", sgcl.read_text())
        .group(1).split(",")
    ]
    ref = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)",
            expect.read_text(),
        )
    }
    h = CompiledHMM(n_rates=256, max_steps=32, limit=max(ref) + 1)
    got = np.asarray(h.probs(np.asarray(counts)))
    for k, v in ref.items():
        if v > 1e-290:
            assert abs(got[k] - v) / v <= 1e-9, (k, got[k], v)


def test_mixture_scan_matches_committed_golden():
    """The scan-compiled 50/50 Poisson mixture (coal-mining benchmark,
    109 observations) against the committed approx/mixture/mixture.expect
    posterior.  The interpreter needs ~20 minutes of compound-Poisson
    derivative chains on this model; the scan form runs in about a
    second including compilation."""
    from pathlib import Path

    from genfer_tpu.models import CompiledMixture

    base = Path("/root/reference/benchmarks/neurips2023/approx/mixture")
    if not (base / "mixture.expect").exists():
        pytest.skip("reference corpus not mounted")
    sgcl = (base / "mixture.sgcl").read_text()
    counts = [
        int(m.group(1))
        for m in re.finditer(
            r"observe (\d+) ~ Poisson\(0\.1 \* Rate1\)", sgcl
        )
    ]
    assert len(counts) == 109
    ref = {
        int(m.group(1)): float(m.group(2))
        for m in re.finditer(
            r"Unnormalized: p\((\d+)\)\s*=\s*([\d.e+-]+)",
            (base / "mixture.expect").read_text(),
        )
    }
    m = CompiledMixture(n_rates=320, max_steps=128, limit=max(ref) + 1)
    got = np.asarray(m.probs(np.asarray(counts)))
    for k, v in ref.items():
        if v > 1e-290:
            assert abs(got[k] - v) / v <= 1e-9, (k, got[k], v)


def test_population_scan_padding_and_batch():
    """Shorter datasets pad with masked steps; a batch is one vmapped
    dispatch and each row matches its own single run."""
    from genfer_tpu.models import CompiledPopulation

    cp = CompiledPopulation(DELTA, RHO, limit=32, max_steps=5,
                            init_lambda=2.0, slack=48)
    lams2, cs2 = [4.0, 6.0], [2, 1]
    ref2 = _cli_probs(_sgcl(2.0, lams2, cs2), 32)
    got2 = np.asarray(cp.probs(np.asarray(lams2), np.asarray(cs2)))
    for k, v in ref2.items():
        if v > 1e-290:
            assert abs(got2[k] - v) / v <= 1e-10

    batch_l = np.asarray([[4.0, 6.0, 1.0], [3.0, 2.0, 5.0]])
    batch_c = np.asarray([[2, 1, 0], [0, 2, 3]])
    got_b = np.asarray(cp.probs_batch(batch_l, batch_c))
    assert got_b.shape == (2, 32)
    for row, (ls, csx) in enumerate(zip(batch_l, batch_c)):
        single = np.asarray(cp.probs(ls, csx))
        np.testing.assert_allclose(got_b[row], single, rtol=1e-12)
