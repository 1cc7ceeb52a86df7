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


def test_digit_serving_batch():
    """The naive-Bayes digitRecognition serving demo (examples/
    digit_serving.py): the per-class/per-pixel model compiled once with
    the image folded into the evidence-parameter vector, served as a
    vmapped batch, validated per image against the interpreter on the
    concrete SGCL program."""
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "examples")
    )
    from digit_serving import evidence_params, load_theta, model_source

    from genfer_tpu import api
    from genfer_tpu.compile import compile_program

    n_pixels = 12
    src, params = model_source(n_pixels)
    c = compile_program(src, params=params, limit=10)
    try:
        theta = load_theta(n_pixels)
    except FileNotFoundError:
        pytest.skip("reference digit data not mounted")
    rng = np.random.RandomState(1)
    images = (rng.rand(3, n_pixels) < 0.3).astype(np.float64)
    ev = np.asarray(evidence_params(images, theta))
    batch = np.asarray(c.probs_batch(jnp.asarray(ev)))
    assert batch.shape == (3, 10)
    for img, row in zip(images, batch):
        concrete = src
        for cdig in range(10):
            for i in range(n_pixels):
                e = (
                    theta[cdig, i]
                    if img[i] else 1.0 - theta[cdig, i]
                )
                concrete = concrete.replace(
                    f"$e{cdig}_{i})", repr(float(e)) + ")"
                )
        r = api.infer(concrete)
        ref = [x.to_float() for x in r.probs(10, normalized=False)]
        np.testing.assert_allclose(row, ref, rtol=1e-9, atol=1e-300)


def test_compiled_while_with_rest_bound():
    """While loops compile through unrolling; the unfinished-iteration
    mass is exposed via rest_bound (reference main.rs:171-173,424-449:
    probs are lower bounds, p + rest upper bounds)."""
    import jax.numpy as jnp

    from genfer_tpu.compile import compile_program

    src = """
    X := 0;
    while 1 ~ Bernoulli($p) {
        X += 1;
    }
    return X
    """
    c = compile_program(src, params=["p"], limit=8, unroll=8)
    assert c.has_rest
    out = np.asarray(c.probs(jnp.array([0.5])))
    rest = float(c.rest_bound(jnp.array([0.5])))
    # geometric(1/2): p(k) = 2^-(k+1) exactly for unrolled iterations
    ref = [2.0 ** -(k + 1) for k in range(8)]
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    assert 0.0 < rest <= 2.0 ** -8 + 1e-12
    # batched rest bounds
    rb = np.asarray(c.rest_bound_batch(jnp.array([[0.25], [0.5]])))
    assert rb.shape == (2,)
    assert rb[0] < rb[1]
