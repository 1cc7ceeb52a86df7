"""Tests for the auxiliary tools (stats, translate, generators, baselines)."""

import io
import os
from contextlib import redirect_stdout
from pathlib import Path

import pytest

REFERENCE = Path(os.environ.get("GENFER_REFERENCE", "/root/reference"))


def test_stats_output():
    from genfer_tpu.tools.stats import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        main([str(REFERENCE / "example.sgcl")])
    out = buf.getvalue()
    # observe desugars to if/fail, so 4 statements including nesting
    assert "2 variables, 4 statements (including nesting)" in out
    assert "Contains observations: true" in out
    assert "Support size: infinite" in out


def test_translate_webppl_and_anglican():
    from genfer_tpu.tools.translate import main

    for target in ("webppl", "anglican"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            main([target, str(REFERENCE / "example.sgcl")])
        out = buf.getvalue()
        if target == "webppl":
            assert "globalStore.a = sample(Poisson({mu: 10}));" in out
            assert "condition(globalStore.b === 1);" in out
        else:
            assert "(defquery model" in out
            assert "(sample (poisson 10" in out


def test_generators_parse():
    from genfer_tpu.lang.parser import parse_program
    from genfer_tpu.tools.generators import (
        generate_hmm,
        generate_mixture,
        generate_population,
        generate_switchpoint,
        generate_two_populations,
    )

    for txt in (
        generate_hmm(None, n_steps=5),
        generate_mixture(None),
        generate_switchpoint(None),
        generate_population(None, 50, 4),
        generate_two_populations(None, 50),
    ):
        prog = parse_program(txt)
        assert prog.size() > 0


def test_baselines_reproduce_reference_corpus():
    """The digitRecognition baselines must match the committed benchmark
    files byte-for-byte modulo whitespace (reference: generate_baselines.rs)."""
    data = REFERENCE / "benchmarks/neurips2023/exact/digitRecognition/data"
    if not data.exists():
        pytest.skip("reference corpus not available")
    from genfer_tpu.tools.baselines import generate_digits

    priors = [x.strip() for x in (data / "digitPriors.csv").read_text().strip().split(",")]
    obs = [int(x) for x in (data / "digitObservations.csv").read_text().strip().split(",")]
    params = [
        [x.strip() for x in line.split(",")]
        for line in (data / "digitParams.csv").read_text().strip().splitlines()
    ]
    sgcl, psi, dice, prodigy = generate_digits(priors, obs, params)
    for ours, refname in [
        (sgcl, "digitRecognition.sgcl"),
        (psi, "digitRecognition.psi"),
        (dice, "digitRecognition.dice"),
        (prodigy, "digitRecognition.pgcl"),
    ]:
        ref = (data.parent / refname).read_text()
        o_l = [l.strip() for l in ours.splitlines() if l.strip()]
        r_l = [
            l.strip()
            for l in ref.splitlines()
            if l.strip() and "skip integration test" not in l
        ]
        assert o_l == r_l, f"{refname} mismatch"
