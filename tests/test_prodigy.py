"""Prodigy-suite correctness tests.

The reference ships the 16 prodigy comparison models
(benchmarks/prodigy/*.sgcl) but has no committed expected outputs for
them; the exact posteriors below were computed with this repo's
``--rational`` mode (GMP-exact, differentially validated against the f64
path) and act as a pinned oracle:

* ``--rational`` must reproduce the exact Z and E strings,
* f64 mode must agree with the exact values at reference tolerance
  (is_close: rel 1e-9 / abs 1e-8, reference number/number.rs:69-77),
* the two modes therefore cross-check each other on every model.

telephone_operator uses a Poisson observation, whose likelihood has no
rational closed form — the reference's rational mode prints
"(not a rational)" there too (rational.rs:329-337 exp()).

External validation (beyond the self-pinned rational oracle):

* burglar_alarm — Z and E match the reference's own committed exact
  oracle ``benchmarks/neurips2023/exact/alarm/alarm.expected``
  (P(burglary=1) = 2969983/992160802; Z = 0.1984321604 =
  496080401/2500000000): the same Bayes net, independent provenance.
* piranha — hand-computed: Z = P(observe piranha drawn) = ½·1 + ½·½ =
  3/4; posterior P(added piranha) = (½)/(¾) = 2/3.  The classic
  bowl puzzle from the Prodigy paper's example set.
* twocoins — hand-computed: Z = P(¬both heads) = 3/4; E[firstCoin] =
  (¼)/(¾) = 1/3.  The upstream pgcl source itself carries the comment
  "expected: firstCoin/3 + secondCoin/3 + 1/3" (marginal 1/3).
* monty_hall — result encodes 1 = staying wins (P = 1/3), 2 = switching
  wins (P = 2/3), so E = 1·(1/3) + 2·(2/3) = 5/3, the textbook
  Monty Hall posterior; Z = 1 (no observe).
* evidence1/evidence2 — structurally the twocoins posterior (Z = 3/4,
  E = 1/3), hand-checkable the same way.
"""

from __future__ import annotations

import io
import math
import os
import re
from contextlib import redirect_stdout
from fractions import Fraction
from pathlib import Path

import pytest

PRODIGY = Path(
    os.environ.get("GENFER_REFERENCE", "/root/reference")
) / "benchmarks" / "prodigy"

# model -> (exact Z, exact E) as printed by --rational
EXPECTED = {
    "burglar_alarm": ("496080401/2500000000", "2969983/992160802"),
    "dnd_handicap": ("1", "67171/46656"),
    "evidence1": ("3/4", "1/3"),
    "evidence2": ("3/4", "1/3"),
    "function": ("1", "42"),
    "fuzzy_or": ("1", "130307/160000"),
    "grass": ("6471/10000", "509/719"),
    "infer_geom_mix": ("56837/750000", "516929/227348"),
    "lin_regression_unbiased": ("1/100", "3"),
    "lucky_throw": ("1/21", "671/1296"),
    "max": ("1", "3/4"),
    "monty_hall": ("1", "5/3"),
    "monty_hall_nested": ("1", "2/3"),
    "piranha": ("3/4", "2/3"),
    "telephone_operator": ("(not a rational)", "(not a rational)"),
    "twocoins": ("3/4", "1/3"),
}


def test_prodigy_corpus_present():
    assert PRODIGY.exists(), f"prodigy corpus missing at {PRODIGY}"
    models = {p.stem for p in PRODIGY.glob("*.sgcl")}
    assert models == set(EXPECTED), models ^ set(EXPECTED)


def _run(path: Path, flags: list[str]) -> str:
    from genfer_tpu.cli import main as cli_main

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main([str(path), "--no-timing", "--no-probs", *flags])
    return buf.getvalue()


_Z_RE = re.compile(r"Total measure:\s+Z [=∈] (.+)")
_E_RE = re.compile(r"Expected value:\s+E [=∈] (.+)")


def _extract(out: str) -> tuple[str, str]:
    mz = _Z_RE.search(out)
    me = _E_RE.search(out)
    assert mz and me, out
    return mz.group(1).strip(), me.group(1).strip()


def _close(a: float, b: float) -> bool:
    # reference is_close (number.rs:69-77)
    return abs(a - b) <= max(1e-9 * max(abs(a), abs(b)), 1e-8)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_prodigy_rational_exact(name):
    z, e = _extract(_run(PRODIGY / f"{name}.sgcl", ["--rational"]))
    assert z == EXPECTED[name][0], f"Z: {z} != {EXPECTED[name][0]}"
    assert e == EXPECTED[name][1], f"E: {e} != {EXPECTED[name][1]}"


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_prodigy_f64_matches_exact(name):
    out = _run(PRODIGY / f"{name}.sgcl", [])
    z_s, e_s = _extract(out)

    def first_float(s: str) -> float:
        m = re.search(r"-?\d+(?:\.\d+)?(?:e-?\d+)?", s)
        assert m, s
        return float(m.group(0))

    z_f, e_f = first_float(z_s), first_float(e_s)
    exp_z, exp_e = EXPECTED[name]
    if exp_z != "(not a rational)":
        assert _close(z_f, float(Fraction(exp_z))), (z_f, exp_z)
        assert _close(e_f, float(Fraction(exp_e))), (e_f, exp_e)
    else:
        # no rational oracle (Poisson exp); pin the f64 values instead
        assert _close(z_f, 0.12504207470944195), z_f
        assert _close(e_f, 0.08246232077587151), e_f
