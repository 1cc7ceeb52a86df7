import math

from fractions import Fraction

from genfer_tpu.numbers import F64, BigFloat, Interval, Rational, format_f64
from genfer_tpu.numbers.scalar import MultiPrec, set_precision


def test_format_f64_ryu_conventions():
    # conventions from the reference golden files (ryu crate output)
    assert format_f64(0.0) == "0.0"
    assert format_f64(1.0) == "1.0"
    assert format_f64(42.0) == "42.0"
    assert format_f64(0.5) == "0.5"
    assert format_f64(0.27067056647322557) == "0.27067056647322557"
    assert format_f64(9.079985952496972e-5) == "0.00009079985952496972"
    assert format_f64(0.0000152587890625) == "0.0000152587890625"
    assert format_f64(3.1727834072246485e-7) == "3.1727834072246485e-7"
    assert format_f64(1.0005553587972932e-13) == "1.0005553587972932e-13"
    assert format_f64(1e-7) == "1e-7"
    assert format_f64(math.inf) == "inf"
    assert format_f64(-math.inf) == "-inf"
    assert format_f64(math.nan) == "NaN"
    assert format_f64(-0.5) == "-0.5"
    assert format_f64(2.8284271247461876) == "2.8284271247461876"
    assert format_f64(123456.75) == "123456.75"
    assert format_f64(1e16) == "1e16"
    assert format_f64(1e22) == "1e22"
    assert format_f64(1234567890123456.0) == "1234567890123456.0"


def test_f64_ops():
    a = F64(2.0)
    b = F64(3.0)
    assert (a + b).v == 5.0
    assert (a - b).v == -1.0
    assert (a * b).v == 6.0
    assert (a / b).v == 2.0 / 3.0
    assert F64.from_ratio(1, 3).v == 1.0 / 3.0
    assert a.pow_u32(10).v == 1024.0
    assert F64(1.0).next_up().v > 1.0
    assert F64(1.0).next_up().next_down().v == 1.0
    assert F64(2.0).is_close(F64(2.0 + 1e-12))
    assert not F64(2.0).is_close(F64(2.1))


def test_bigfloat_normalization_and_ops():
    x = BigFloat(3.0)
    assert x.factor == 1.5 and x.exponent == 1
    assert BigFloat(0.75).exponent == -1
    assert (BigFloat(2.0) * BigFloat(4.0)).to_f64() == 8.0
    assert (BigFloat(2.0) + BigFloat(0.5)).to_f64() == 2.5
    assert (BigFloat(1.0) / BigFloat(8.0)).to_f64() == 0.125
    assert BigFloat.zero().exp().to_f64() == 1.0
    assert abs(BigFloat(2.0).exp().to_f64() - math.exp(2.0)) < 1e-12
    assert abs(BigFloat(math.exp(1.0)).log().to_f64() - 1.0) < 1e-12
    # huge exponents do not overflow
    big = BigFloat(1.5, 100000)
    assert (big * big).exponent > 100000
    assert big > BigFloat(1.0)
    assert BigFloat(100.0).sqrt().to_f64() == 10.0


def test_rational_ops():
    a = Rational.from_frac(1, 3)
    b = Rational.from_frac(1, 6)
    assert (a + b).frac == Fraction(1, 2)
    assert (a * b).frac == Fraction(1, 18)
    assert (a / b).frac == Fraction(2)
    assert a.display() == "1/3"
    assert (a / Rational.zero()).is_infinite()
    assert Rational.zero().exp().is_one()
    assert Rational.from_frac(2).exp().is_nan()
    assert Rational.from_frac(9, 4).sqrt().frac == Fraction(3, 2)
    assert Rational.from_frac(2).sqrt().is_nan()
    assert Rational.infinity().display() == "∞"
    assert not (Rational.not_a_rational() == Rational.not_a_rational())
    assert Rational.from_frac(5).pow_u32(3).frac == 125


def test_multiprec():
    set_precision(200)
    x = MultiPrec.from_ratio(1, 3)
    y = x * MultiPrec.from_u32(3)
    assert y.is_close(MultiPrec.one())
    assert MultiPrec(2).sqrt().is_close(MultiPrec(math.sqrt(2)))
    set_precision(53)


def test_interval_f64():
    IV = Interval.over(F64)
    a = IV.precisely(F64(0.5))
    b = IV.precisely(F64(0.25))
    c = a + b
    assert c.lo.v <= 0.75 <= c.hi.v
    assert c.hi.v - c.lo.v < 1e-15
    # zero fast path keeps exactness
    z = IV.zero() + a
    assert z.extract_point() is not None
    p = a * a
    assert p.lo.v <= 0.25 <= p.hi.v
    # one fast path
    assert (a * IV.one()).extract_point().v == 0.5
    d = IV.one() / IV.precisely(F64(3.0))
    assert d.lo.v < 1.0 / 3.0 < d.hi.v or (d.lo.v <= 1 / 3 <= d.hi.v)
    # division by interval containing zero: [1,1]/[-1,1] -> [-1-ulp, inf]
    # (mirrors reference interval.rs:199-233 semantics)
    q = IV.one() / IV.exact(F64(-1.0), F64(1.0))
    assert q.hi.is_infinite() and q.lo.v <= -1.0
    assert IV.zero().exp().is_one()
    # from_ratio goes through interval arithmetic (slightly widened)
    r = IV.from_ratio(1, 2)
    assert r.lo.v <= 0.5 <= r.hi.v


def test_interval_partial_order():
    IV = Interval.over(F64)
    a = IV.exact(F64(0.0), F64(1.0))
    b = IV.exact(F64(2.0), F64(3.0))
    assert a < b
    assert b > a
    assert not (a < IV.exact(F64(0.5), F64(2.0)))
    assert a == IV.exact(F64(0.0), F64(1.0))
