"""Tests for the compiled/batched inference mode (genfer_tpu.compile)."""

import numpy as np
import pytest


SRC = """
calls ~ Poisson(10);
scams ~ Binomial(calls, $p);
observe(scams = 1);
return calls;
"""


@pytest.fixture(scope="module")
def compiled():
    from genfer_tpu.compile import compile_program

    return compile_program(SRC, params=["p"], limit=26)


def test_compiled_matches_interpreter(compiled):
    import jax.numpy as jnp

    from genfer_tpu import api

    probs = np.asarray(compiled.probs(jnp.array([0.2])))
    r = api.infer(SRC.replace("$p", "0.2"))
    ref = [x.to_float() for x in r.probs(26, normalized=False)]
    np.testing.assert_allclose(probs, ref, rtol=1e-9)
    total, raw = compiled.moments(jnp.array([0.2]))
    assert float(total) == pytest.approx(r.total.to_float(), rel=1e-9)
    assert float(raw[0]) == pytest.approx(9.0, rel=1e-9)


def test_compiled_batch(compiled):
    import jax.numpy as jnp

    from genfer_tpu import api

    grid = jnp.array([[0.1], [0.2], [0.5]])
    batch = np.asarray(compiled.probs_batch(grid))
    assert batch.shape == (3, 26)
    for row, p in zip(batch, (0.1, 0.2, 0.5)):
        r = api.infer(SRC.replace("$p", str(p)))
        ref = [x.to_float() for x in r.probs(26, normalized=False)]
        np.testing.assert_allclose(row, ref, rtol=1e-9)


def test_compiled_multi_param():
    import jax.numpy as jnp

    from genfer_tpu import api
    from genfer_tpu.compile import compile_program

    src = """
    x ~ Bernoulli($q);
    y ~ Binomial(6, $p);
    observe x = 1;
    return y;
    """
    c = compile_program(src, params=["q", "p"], limit=7)
    out = np.asarray(c.probs(jnp.array([0.25, 0.5])))
    r = api.infer(src.replace("$q", "0.25").replace("$p", "0.5"))
    ref = [x.to_float() for x in r.probs(7, normalized=False)]
    np.testing.assert_allclose(out, ref, rtol=1e-12)


def test_compiled_rejects_while():
    from genfer_tpu.compile import CompiledProgram

    with pytest.raises(AssertionError):
        CompiledProgram(
            "X := 0; while 0 ~ Bernoulli($p) { X += 1; } return X",
            ["p"],
            5,
        )
