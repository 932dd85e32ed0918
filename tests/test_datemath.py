"""DateMathParser parity — vectors ported from the reference's
solr/core/src/test/org/apache/solr/util/DateMathParserTest.java
(testRound, testAdd, testParseMath incl. the "tricky" month-clamp cases,
testParseMathTz, testParseMathExceptions token positions)."""

from __future__ import annotations

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

import pytest

from lucene_spark.relational.datemath import (
    CALENDAR_UNITS, DateMathParseError, iso_z, parse_iso_instant,
    parse_math, parse_math_expr)


def dt(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


NOW = dt("1234-07-04T12:08:56.235")


def m(expr: str, now: datetime = NOW, tz=None) -> datetime:
    return parse_math_expr(now, expr, tz=tz)


# ------------------------------------------------------- testRound
@pytest.mark.parametrize("expect,unit", [
    ("1234-07-04T12:08:56.000", "SECOND"),
    ("1234-07-04T12:08:00.000", "MINUTE"),
    ("1234-07-04T12:00:00.000", "HOUR"),
    ("1234-07-04T00:00:00.000", "DAY"),
    ("1234-07-01T00:00:00.000", "MONTH"),
    ("1234-01-01T00:00:00.000", "YEAR"),
    ("1234-07-04T12:08:56.235", "MILLIS"),
])
def test_round(expect, unit):
    assert m("/" + unit) == dt(expect)


def test_round_millis_floors_micros():
    now = dt("1234-07-04T12:08:56").replace(microsecond=235_999)
    assert m("/MILLIS", now=now).microsecond == 235_000


# --------------------------------------------------------- testAdd
@pytest.mark.parametrize("expect,val,unit", [
    ("1234-07-04T12:08:56.236", 1, "MILLISECOND"),
    ("1234-07-04T12:08:57.235", 1, "SECOND"),
    ("1234-07-04T12:09:56.235", 1, "MINUTE"),
    ("1234-07-04T13:08:56.235", 1, "HOUR"),
    ("1234-07-05T12:08:56.235", 1, "DAY"),
    ("1234-08-04T12:08:56.235", 1, "MONTH"),
    ("1235-07-04T12:08:56.235", 1, "YEAR"),
    # simple subtraction
    ("1234-07-04T12:08:56.234", -1, "MILLISECOND"),
    ("1234-07-04T12:08:55.235", -1, "SECOND"),
    ("1234-07-04T12:07:56.235", -1, "MINUTE"),
    ("1234-07-04T11:08:56.235", -1, "HOUR"),
    ("1234-07-03T12:08:56.235", -1, "DAY"),
    ("1234-06-04T12:08:56.235", -1, "MONTH"),
    ("1233-07-04T12:08:56.235", -1, "YEAR"),
])
def test_add(expect, val, unit):
    sign = "+" if val >= 0 else "-"
    assert m(f"{sign}{abs(val)}{unit}") == dt(expect)


def test_add_zero_every_unit_alias():
    for u in CALENDAR_UNITS:
        assert m(f"+0{u}") == NOW
        assert m(f"/{u}") is not None  # every alias rounds without error


# --------------------------------------------------- testParseMath
@pytest.mark.parametrize("expect,expr", [
    ("1234-07-04T12:08:56.235", ""),
    ("1234-07-04T12:08:56.235", "+1MILLISECOND-1MILLISECOND"),
    ("1234-07-04T12:08:56.235", "-1YEAR+1YEAR"),
    ("1233-07-04T12:08:56.236", "+1MILLISECOND-1YEAR"),
    ("1233-08-04T12:08:56.235", "-1YEAR+1MONTH"),
    ("1233-07-01T00:00:00.000", "-1YEAR+1MILLISECOND/MONTH"),
    ("1233-07-04T00:00:00.000", "-1YEAR+1SECOND/DAY"),
    ("1233-07-04T13:00:00.000", "-1YEAR+1HOUR/HOUR"),
    ("1233-07-05T12:08:56.000", "-1YEAR+1DAY/SECOND"),
])
def test_parse_math_chains(expect, expr):
    assert m(expr) == dt(expect)


@pytest.mark.parametrize("expect,expr", [
    # "tricky" cases: month-end clamping and cascades
    ("2006-02-28T17:09:59.999", "+1MONTH"),
    ("2008-02-29T17:09:59.999", "+25MONTH"),
    ("2006-02-01T00:00:00.000", "/MONTH+35DAYS/MONTH"),
    ("2006-01-31T17:10:00.000", "+3MILLIS/MINUTE"),
])
def test_parse_math_tricky(expect, expr):
    assert m(expr, now=dt("2006-01-31T17:09:59.999")) == dt(expect)


# ------------------------------------------------- testParseMathTz
def test_parse_math_tz_positive_offset_dst():
    la = ZoneInfo("America/Los_Angeles")
    now = dt("2001-07-04T12:08:56.235")
    assert m("/DAY", now, la) == dt("2001-07-04T07:00:00.000")
    assert m("/MONTH", now, la) == dt("2001-07-01T07:00:00.000")
    assert m("/YEAR", now, la) == dt("2001-01-01T08:00:00.000")   # no DST jan
    assert m("+4MONTH/DAY", now, la) == dt("2001-11-04T08:00:00.000")
    assert m("+9YEAR+4MONTH/DAY", now, la) == dt("2010-11-04T07:00:00.000")


def test_parse_math_tz_negative_offset_dst():
    paris = ZoneInfo("Europe/Paris")
    now = dt("2001-07-04T12:08:56.235")
    assert m("/DAY", now, paris) == dt("2001-07-03T22:00:00.000")
    assert m("/MONTH", now, paris) == dt("2001-06-30T22:00:00.000")
    assert m("/YEAR", now, paris) == dt("2000-12-31T23:00:00.000")
    assert m("+4MONTH/DAY", now, paris) == dt("2001-11-03T23:00:00.000")


# ----------------------------------------- testParseMathExceptions
@pytest.mark.parametrize("bad,pos", [
    ("/", 1), ("+", 1), ("-", 1), ("/BOB", 1), ("+SECOND", 1),
    ("-2MILLI/", 4), (" +BOB", 0), ("+2SECONDS ", 3), ("/4", 1),
    ("?SECONDS", 0),
])
def test_parse_math_exceptions(bad, pos):
    with pytest.raises(DateMathParseError) as ei:
        m(bad)
    assert ei.value.pos == pos


# ----------------------------------------------- full-string forms
def test_full_string_forms():
    assert parse_math(NOW, "NOW/DAY") == dt("1234-07-04T00:00:00")
    assert (parse_math(None, "2006-01-31T17:09:59.999Z+1MONTH")
            == dt("2006-02-28T17:09:59.999"))
    assert parse_math(None, "2020-05-05T00:00:00Z") == dt("2020-05-05T00:00:00")
    with pytest.raises(ValueError):
        parse_math(None, "2020-05-05")          # no Z
    with pytest.raises(ValueError):
        parse_math(None, "NOW/DAY")             # NOW without a now


def test_iso_parse_and_render_roundtrip():
    assert parse_iso_instant("2020-01-02t03:04:05.250z") == dt(
        "2020-01-02T03:04:05.250")
    assert iso_z(dt("2020-01-02T03:04:05")) == "2020-01-02T03:04:05Z"
    assert iso_z(dt("2020-01-02T03:04:05.250")) == "2020-01-02T03:04:05.250Z"


def test_fraction_digit_exactness():
    # float('.250206')*1e6 floors to 250205 — digit parsing must not
    assert parse_iso_instant("2020-01-02T03:04:05.250206Z").microsecond == 250206
    assert parse_iso_instant("2020-01-02T03:04:05.1Z").microsecond == 100000
    # >6 digits: floored to micros (Java keeps nanos; we keep micros)
    assert parse_iso_instant("2020-01-02T03:04:05.123456789Z").microsecond == 123456


def test_lowercase_z_split_parity():
    # reference parity: parseMath splits on UPPERCASE 'Z' only (:245),
    # while the parseNoMath twin is case-insensitive when called directly
    assert parse_iso_instant("2020-01-02t03:04:05z") is not None
    with pytest.raises(ValueError):
        parse_math(None, "2020-01-02t03:04:05z+1DAY")
