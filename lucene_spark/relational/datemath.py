"""Solr date math — `NOW/DAY+6MONTHS`-style expressions.

Role analogue: solr/core/src/java/org/apache/solr/util/DateMathParser.java
(tokenizer regex :430, unit table :152-174, add :182-190, round :199-216,
command loop :363-427) with the same token-position error contract as the
reference's ParseException (DateMathParserTest.testParseMathExceptions).

Everything is driver-side arithmetic over naive local datetimes — exactly
the reference's LocalDateTime model: the instant is moved into the math
timezone (default UTC), commands apply to the wall-clock fields
(month/year adds clamp the day-of-month like java.time's plusMonths), and
the result converts back to an instant.  Timezone-sensitive rounding
(/DAY in America/Los_Angeles) therefore reproduces the reference's DST
behavior via zoneinfo.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

__all__ = ["DateMathParseError", "parse_math", "parse_math_expr", "iso_z"]

# DateMathParser.CALENDAR_UNITS (:152-174): aliases → one logical unit.
CALENDAR_UNITS: dict[str, str] = {
    "YEAR": "YEARS", "YEARS": "YEARS",
    "MONTH": "MONTHS", "MONTHS": "MONTHS",
    "DAY": "DAYS", "DAYS": "DAYS", "DATE": "DAYS",
    "HOUR": "HOURS", "HOURS": "HOURS",
    "MINUTE": "MINUTES", "MINUTES": "MINUTES",
    "SECOND": "SECONDS", "SECONDS": "SECONDS",
    "MILLI": "MILLIS", "MILLIS": "MILLIS",
    "MILLISECOND": "MILLIS", "MILLISECONDS": "MILLIS",
}

# the reference's splitter (:430) — word boundaries plus digit→non-digit.
_SPLIT = re.compile(r"\b|(?<=\d)(?=\D)")

_ISO = re.compile(
    r"^(\d{4,5})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})(\.\d{1,9})?[Zz]$")


class DateMathParseError(ValueError):
    """ParseException twin; `pos` is the TOKEN index, as in the reference
    (ParseException positions are token positions, not characters)."""

    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} (token {pos})")
        self.pos = pos


def parse_iso_instant(s: str) -> datetime:
    """DateMathParser.parseNoMath: lenient ISO-8601 instant (the mandatory
    trailing Z, case-insensitive, optional fractional seconds).  Returns a
    tz-aware UTC datetime (microsecond floor of the fraction)."""
    m = _ISO.match(s)
    if m is None:
        raise ValueError(f"Invalid Date String:'{s}'")
    frac = m.group(7)
    # digit parsing, not float math: float('.250206')*1e6 = 250205.999…
    # would floor a microsecond away for ~0.2% of 6-digit fractions
    micros = int(frac[1:7].ljust(6, "0")) if frac else 0
    return datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)),
                    int(m.group(4)), int(m.group(5)), int(m.group(6)),
                    micros, tzinfo=timezone.utc)


def _plus_months(t: datetime, n: int) -> datetime:
    """java.time plusMonths: calendar month shift with day-of-month clamp
    (2006-01-31 +1MONTH → 2006-02-28)."""
    m0 = t.year * 12 + (t.month - 1) + n
    y, m = divmod(m0, 12)
    day = min(t.day, calendar.monthrange(y, m + 1)[1])
    return t.replace(year=y, month=m + 1, day=day)


def _add(t: datetime, val: int, unit: str) -> datetime:
    uu = CALENDAR_UNITS.get(unit)
    if uu is None:
        raise KeyError(unit)
    if uu == "YEARS":
        return _plus_months(t, 12 * val)
    if uu == "MONTHS":
        return _plus_months(t, val)
    kw = {"DAYS": "days", "HOURS": "hours", "MINUTES": "minutes",
          "SECONDS": "seconds", "MILLIS": "milliseconds"}[uu]
    return t + timedelta(**{kw: val})


def _round(t: datetime, unit: str) -> datetime:
    uu = CALENDAR_UNITS.get(unit)
    if uu is None:
        raise KeyError(unit)
    if uu == "YEARS":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0)
    if uu == "MONTHS":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if uu == "DAYS":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if uu == "HOURS":
        return t.replace(minute=0, second=0, microsecond=0)
    if uu == "MINUTES":
        return t.replace(second=0, microsecond=0)
    if uu == "SECONDS":
        return t.replace(microsecond=0)
    # MILLIS: floor micros to the millisecond
    return t.replace(microsecond=t.microsecond - t.microsecond % 1000)


def _tokens(math: str) -> list[str]:
    ops = _SPLIT.split(math)
    # Java 8+ split: no empty leading substring for a zero-width match at
    # position 0, and trailing empties are discarded.
    if ops and ops[0] == "":
        ops = ops[1:]
    while ops and ops[-1] == "":
        ops.pop()
    return ops


def parse_math_expr(now: datetime, math: str, tz=None) -> datetime:
    """DateMathParser.parseMath(:363-427): apply a chain of
    `/UNIT`, `+N UNIT`, `-N UNIT` commands to `now` (an aware datetime),
    doing the wall-clock arithmetic in `tz` (zoneinfo/timezone; default
    UTC).  Returns an aware UTC datetime."""
    if now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    if math == "":
        return now.astimezone(timezone.utc)
    zone = tz or timezone.utc
    local = now.astimezone(zone).replace(tzinfo=None)

    ops = _tokens(math)
    pos = 0
    while pos < len(ops):
        if len(ops[pos]) != 1:
            raise DateMathParseError(
                f'Multi character command found: "{ops[pos]}"', pos)
        command = ops[pos]
        pos += 1
        if command == "/":
            if len(ops) < pos + 1:
                raise DateMathParseError(
                    f'Need a unit after command: "{command}"', pos)
            try:
                local = _round(local, ops[pos])
                pos += 1
            except KeyError:
                raise DateMathParseError(
                    f'Unit not recognized: "{ops[pos]}"', pos) from None
        elif command in "+-":
            if len(ops) < pos + 2:
                raise DateMathParseError(
                    f'Need a value and unit for command: "{command}"', pos)
            try:
                val = int(ops[pos])
                pos += 1
            except ValueError:
                raise DateMathParseError(
                    f'Not a Number: "{ops[pos]}"', pos) from None
            if command == "-":
                val = -val
            try:
                local = _add(local, val, ops[pos])
                pos += 1
            except KeyError:
                raise DateMathParseError(
                    f'Unit not recognized: "{ops[pos]}"', pos) from None
        else:
            raise DateMathParseError(
                f'Unrecognized command: "{command}"', pos - 1)
    # fold=0 == ZonedDateTime.of: ambiguous local times take the earlier
    # offset; gap times resolve to the same instant as java.time's shift.
    return local.replace(tzinfo=zone, fold=0).astimezone(timezone.utc)


def parse_math(now: datetime | None, val: str, tz=None) -> datetime:
    """DateMathParser.parseMath(Date,String) (:238-269): `val` is either
    `NOW<math>` or `<ISO-8601-instant>Z<math>`.

    Reference parity note: the instant/math split is `val.indexOf('Z')`
    — UPPERCASE only, exactly like the reference (:245) — so a
    lowercase-z instant is rejected HERE even though parse_iso_instant
    (the parseNoMath twin) accepts it when called directly."""
    if val.startswith("NOW"):
        if now is None:
            raise ValueError("NOW-relative date math needs an explicit now")
        return parse_math_expr(now, val[len("NOW"):], tz=tz)
    zz = val.find("Z")
    if zz == -1:
        raise ValueError(f"Invalid Date String:'{val}'")
    base = parse_iso_instant(val[:zz + 1])
    return parse_math_expr(base, val[zz + 1:], tz=tz)


def iso_z(t: datetime) -> str:
    """Render an aware datetime the way Solr renders date facet labels:
    seconds precision, trailing Z; milliseconds appended only if set."""
    t = t.astimezone(timezone.utc)
    base = t.strftime("%Y-%m-%dT%H:%M:%S")
    if t.microsecond:
        base += f".{t.microsecond // 1000:03d}"
    return base + "Z"
