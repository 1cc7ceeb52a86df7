"""Compiled / batched inference (TPU serving mode).

The reference re-runs its whole interpreter for every dataset.  Here a
*parameterized* SGCL program (``$name`` placeholders in probability
positions) is translated once into a GF DAG over **symbolic** constants
and then traced into a single XLA program ``params -> posterior``:

    from genfer_tpu.compile import compile_program
    c = compile_program(\"\"\"
        calls ~ Poisson(10);
        scams ~ Binomial(calls, $p);
        observe(scams = 1);
        return calls;
    \"\"\", params=["p"], limit=26)
    probs = c.probs(jnp.array([0.2]))          # one dataset
    batch = c.probs_batch(jnp.array([[0.1], [0.2], [0.3]]))  # vmapped

Everything under ``jit`` is one fused XLA computation: re-running with new
parameters costs one device dispatch, and batching over thousands of
parameter vectors rides a single ``vmap``.  This is the natural way to
serve e.g. the naive-Bayes digitRecognition model over many images.

``while`` loops compile through the same unrolling as the CLI
(``--unroll``/per-loop annotations); the probability mass left in
unfinished iterations is exposed as ``rest_bound(params)`` — posteriors
are exact lower bounds and ``p + rest`` the matching upper bounds,
mirroring the reference's interval output (main.rs:424-449).

Limitations (v1): f64 only, result variable must be discrete for
``probs``, observation outcomes are structural constants (parameters
may appear in any probability position).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

from .gf.symbolic import SymGenFun
from .lang import ast
from .lang.parser import parse_program
from .numbers.scalar import F64
from .semantics.gf_transformer import GfTransformer
from .taylor.backend import JaxF64Backend


# ----------------------------------------------------------------------
# symbolic host scalars over named parameters
# ----------------------------------------------------------------------

def make_param_scalar(param_names: Sequence[str]):
    """Create a host-scalar class whose values are closed-form expressions
    over the named parameters (implemented on SymGenFun nodes over F64
    literals)."""
    index = {name: i for i, name in enumerate(param_names)}

    class ParamScalar:
        __slots__ = ("expr",)
        _param_index = index
        #: not an exact ring: the IR's constant-folding smart constructors
        #: must not re-associate symbolic parameter expressions
        EXACT_RING = False

        def __init__(self, expr: SymGenFun):
            self.expr = expr

        # -- constructors ---------------------------------------------
        #: literal/param scalars are interned so that equal values are
        #: the *same object*: the GF evaluation cache keys inputs by
        #: hash/identity, and fresh zero()/one() objects per lookup
        #: (e.g. from TaylorCoeffAtZero rebuilding its input vector)
        #: would miss the cache and turn shared-DAG evaluation
        #: exponential (measured: the 10-way class split of the
        #: naive-Bayes model evaluated 2^10 times instead of 10)
        _interned: dict = {}

        @classmethod
        def _lit(cls, v: float):
            key = ("lit", v)
            hit = cls._interned.get(key)
            if hit is None:
                hit = cls._interned[key] = cls(SymGenFun.lit(F64, F64(v)))
            return hit

        @classmethod
        def zero(cls):
            return cls._lit(0.0)

        @classmethod
        def one(cls):
            return cls._lit(1.0)

        @classmethod
        def from_u32(cls, n: int):
            return cls._lit(float(n))

        @classmethod
        def from_ratio(cls, numer: int, denom: int):
            x = F64.from_ratio(numer, denom)
            return cls(SymGenFun.lit(F64, x))

        @classmethod
        def param(cls, name: str):
            if name not in index:
                raise KeyError(
                    f"program uses undeclared parameter ${name}; "
                    f"declared: {list(index)}"
                )
            key = ("param", name)
            hit = cls._interned.get(key)
            if hit is None:
                hit = cls._interned[key] = cls(
                    SymGenFun.var_(F64, index[name])
                )
            return hit

        # -- predicates (literal-only; conservative) --------------------
        def is_zero(self):
            return self.expr.is_lit_zero()

        def is_one(self):
            return self.expr.is_lit_one()

        def is_nan(self):
            return False

        # -- arithmetic --------------------------------------------------
        def __add__(self, other):
            return ParamScalar(self.expr + other.expr)

        def __sub__(self, other):
            return ParamScalar(self.expr - other.expr)

        def __neg__(self):
            return ParamScalar(-self.expr)

        def __mul__(self, other):
            return ParamScalar(self.expr * other.expr)

        def __truediv__(self, other):
            return ParamScalar(self.expr / other.expr)

        def exp(self):
            return ParamScalar(self.expr.exp())

        def log(self):
            return ParamScalar(self.expr.log())

        def pow_u32(self, n: int):
            return ParamScalar(self.expr.pow_u32(n))

        def maximum(self, other):
            return ParamScalar(self.expr.maximum(other.expr))

        def display(self):
            return str(self.expr)

        __str__ = display

        def __repr__(self):
            return f"ParamScalar({self.expr})"

    return ParamScalar


def _eval_sym(expr: SymGenFun, params, cache: dict):
    """Evaluate a SymGenFun over jnp values (params is a vector tracer)."""
    import jax.numpy as jnp

    key = id(expr)
    hit = cache.get(key)
    if hit is not None and hit[0] is expr:
        return hit[1]
    k = expr.kind
    if k == "Variable":
        out = params[expr.var]
    elif k == "Lit":
        out = jnp.asarray(expr.value.v, dtype=jnp.float64)
    elif k == "Add":
        out = _eval_sym(expr.a, params, cache) + _eval_sym(expr.b, params, cache)
    elif k == "Mul":
        out = _eval_sym(expr.a, params, cache) * _eval_sym(expr.b, params, cache)
    elif k == "Div":
        out = _eval_sym(expr.a, params, cache) / _eval_sym(expr.b, params, cache)
    elif k == "Exp":
        out = jnp.exp(_eval_sym(expr.a, params, cache))
    elif k == "Log":
        out = jnp.log(_eval_sym(expr.a, params, cache))
    elif k == "Pow":
        out = _eval_sym(expr.a, params, cache) ** expr.n
    elif k == "Max":
        out = jnp.maximum(
            _eval_sym(expr.a, params, cache), _eval_sym(expr.b, params, cache)
        )
    else:
        raise AssertionError(k)
    cache[key] = (expr, out)
    return out


class TracedF64Backend(JaxF64Backend):
    """JAX f64 backend for tracing: host "scalars" are symbolic parameter
    expressions evaluated against the traced parameter vector.  Marked
    non-concrete so the engine never tries to materialize device values
    into host constants (tensorpoly._materialize_const)."""

    concrete = False

    def __init__(self, params, param_scalar_cls):
        super().__init__()
        self.params = params
        self.scalar_cls = param_scalar_cls
        self._sym_cache: dict = {}

    def scalar(self, x):
        if isinstance(x, F64):
            return self.jnp.asarray(x.v, dtype=self.dtype)
        if hasattr(x, "expr"):
            return _eval_sym(x.expr, self.params, self._sym_cache)
        return self.jnp.asarray(float(x), dtype=self.dtype)

    def to_host(self, arr0d):
        raise AssertionError(
            "compiled mode cannot lower traced values to host scalars"
        )

    def from_nested(self, nested):
        def build(n):
            if isinstance(n, (list, tuple)):
                return [build(x) for x in n]
            return self.scalar(n)

        def stack(n):
            if isinstance(n, list):
                return self.jnp.stack([stack(x) for x in n])
            return n

        return stack(build(nested))

    def scale_axis(self, arr, axis, factors):
        f = self.jnp.stack([self.scalar(x) for x in factors])
        shape = [1] * arr.ndim
        shape[axis] = len(factors)
        return arr * f.reshape(shape)


def _translate_big_stack(work, stack_mb: int = 256,
                         limit: int = 100_000):
    """Run ``work`` on a dedicated thread with a large stack and a
    scoped recursion limit (mirrors cli.main / reference main.rs:96-106);
    restores the process-wide limit afterwards."""
    import sys
    import threading

    out: list = []

    def runner():
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, limit))
        try:
            out.append(("ok", work()))
        except BaseException as e:
            out.append(("err", e))
        finally:
            sys.setrecursionlimit(old)

    threading.stack_size(stack_mb * 1024 * 1024)
    try:
        t = threading.Thread(target=runner)
        t.start()
        t.join()
    finally:
        threading.stack_size(0)
    kind, val = out[0]
    if kind == "err":
        raise val
    return val


class CompiledProgram:
    """A parameterized SGCL program compiled to XLA."""

    def __init__(self, source: str, params: Sequence[str], limit: int,
                 unroll: int = 8):
        import sys

        import jax

        self.param_names = list(params)
        self.limit = limit
        SP = make_param_scalar(self.param_names)
        self.SP = SP
        self.program = parse_program(source)
        # deep observation chains (e.g. the 784-pixel naive-Bayes model)
        # nest the GF DAG deeper than the default recursion limit.
        # Translate on a dedicated big-stack thread (like cli.main): a
        # raised recursion limit on a small-stack thread would turn a
        # catchable RecursionError into a hard C-stack overflow, and the
        # process-wide limit must not leak past the constructor.
        self.translation = _translate_big_stack(
            lambda: GfTransformer(SP, unroll=unroll).semantics(
                self.program
            )
        )
        rest = self.translation.rest
        self.has_rest = not (
            rest.kind == "Const" and rest.value.is_zero()
        )
        self.var_info = self.translation.var_info
        self.num_vars = self.var_info.num_vars()
        self.result = self.program.result
        assert self.var_info[self.result].is_discrete(), (
            "probs require a discrete result variable"
        )
        self._probs = jax.jit(self._probs_impl)
        self._moments = jax.jit(self._moments_impl)
        self._probs_batch = jax.jit(jax.vmap(self._probs_impl))
        self._moments_batch = jax.jit(jax.vmap(self._moments_impl))
        self._rest = jax.jit(self._rest_impl)
        self._rest_batch = jax.jit(jax.vmap(self._rest_impl))

    # -- traced pipelines ------------------------------------------------
    def _eval_expansion(self, params, substs_hint, degree):
        backend = TracedF64Backend(params, self.SP)
        SP = self.SP
        substs = []
        for i in range(self.num_vars):
            if i == self.result and substs_hint == "probs":
                substs.append(SP.zero())
            elif self.var_info[i].is_discrete():
                substs.append(SP.one())
            else:
                substs.append(SP.zero())
        expansion = self.translation.gf.eval(backend, substs, degree)
        return expansion

    def _coeff_vector(self, expansion, length):
        import jax.numpy as jnp

        arr = expansion.coeffs
        # index 0 on every axis except the result variable's
        ndim = arr.ndim
        for axis in reversed(range(ndim)):
            if axis != self.result:
                arr = jnp.take(arr, 0, axis=axis)
        if self.result >= ndim:
            arr = arr.reshape(1)
        vec = arr.reshape(-1)[: length]
        if vec.shape[0] < length:
            vec = jnp.pad(vec, (0, length - vec.shape[0]))
        return vec

    def _rest_impl(self, params):
        """Upper bound on the probability mass lost to unfinished while
        iterations (reference rest handling, main.rs:171-173): the rest
        GF evaluated at the all-zero point to degree 1."""
        import jax.numpy as jnp

        if not self.has_rest:
            return jnp.zeros(())
        backend = TracedF64Backend(params, self.SP)
        SP = self.SP
        substs = [SP.zero() for _ in range(self.num_vars)]
        expansion = self.translation.rest.eval(backend, substs, 1)
        arr = expansion.coeffs
        return arr.reshape(-1)[0]

    def _probs_impl(self, params):
        expansion = self._eval_expansion(params, "probs", self.limit + 1)
        return self._coeff_vector(expansion, self.limit)

    def _moments_impl(self, params):
        import jax.numpy as jnp

        expansion = self._eval_expansion(params, "moments", 5)
        coeffs = self._coeff_vector(expansion, 5)
        factorials = jnp.asarray([1.0, 1.0, 2.0, 6.0, 24.0])
        fm = coeffs * factorials  # factorial moments
        # Stirling transform (reference generating_function.rs:1008-1033)
        S = np.zeros((5, 5))
        for n in range(5):
            S[n][n] = 1.0
            for kk in range(1, n):
                S[n][kk] = S[n - 1][kk - 1] + kk * S[n - 1][kk]
        total = fm[0]
        raw = (jnp.asarray(S) @ fm)[1:] / total
        return total, raw

    # -- public API --------------------------------------------------------
    def probs(self, params, normalized: bool = False):
        """Unnormalized (or normalized) posterior masses p(0..limit-1)."""
        out = self._probs(params)
        if normalized:
            total, _ = self._moments(params)
            return out / total
        return out

    def probs_batch(self, params_batch, normalized: bool = False):
        out = self._probs_batch(params_batch)
        if normalized:
            totals, _ = self._moments_batch(params_batch)
            return out / totals[:, None]
        return out

    def moments(self, params):
        """(total Z, raw moments 1..4 normalized by Z)."""
        return self._moments(params)

    def moments_batch(self, params_batch):
        return self._moments_batch(params_batch)

    def rest_bound(self, params):
        """Mass not accounted for by unrolled while iterations: probs are
        exact lower bounds, probs + rest_bound upper bounds."""
        return self._rest(params)

    def rest_bound_batch(self, params_batch):
        return self._rest_batch(params_batch)


def _has_while(stmts) -> bool:
    for s in stmts:
        if isinstance(s, ast.While):
            return True
        for attr in ("then", "els", "body", "stmts"):
            sub = getattr(s, attr, None)
            if sub and _has_while(sub):
                return True
    return False


@functools.lru_cache(maxsize=None)
def _compile_cached(source: str, params: tuple, limit: int, unroll: int):
    return CompiledProgram(source, list(params), limit, unroll)


def compile_program(source: str, params: Sequence[str], limit: int,
                    unroll: int = 8) -> CompiledProgram:
    return _compile_cached(source, tuple(params), limit, unroll)
