"""Term enumeration over the dictionary — Solr's TermsComponent
(solr/core/src/java/org/apache/solr/handler/component/TermsComponent
.java) restated over the engine's termdict DataFrame.

Parameter parity: terms.prefix / terms.lower / terms.upper (+ include
flags, exclusive upper by default per TermsParams), terms.regex,
terms.mincount (default 1) / terms.maxcount (-1 = unbounded),
terms.limit (default 10), terms.sort = 'count' (df desc, the default)
or 'index' (term asc). Ties in count order break by term asc
(deterministic; the reference's BoundedTreeSet is count-then-term too).

The termdict is Parquet sorted by term, so prefix / range predicates
are pushed into the scan (the BlockTree FST role — SURVEY §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def terms_enum(reader, field: str | None = None, prefix: str | None = None,
               lower: str | None = None, upper: str | None = None,
               include_lower: bool = True, include_upper: bool = False,
               regex: str | None = None, mincount: int = 1,
               maxcount: int | None = None, limit: int = 10,
               sort: str = "count") -> DataFrame:
    """Returns (term, df) — the top `limit` dictionary terms under the
    given constraints, ranked by `sort`."""
    td = reader.termdict()
    if field is not None:
        td = td.filter(F.col("field") == field)
    t = F.col("term")
    if prefix is not None:
        td = td.filter(t.startswith(prefix))
    if lower is not None:
        td = td.filter(t >= lower if include_lower else t > lower)
    if upper is not None:
        td = td.filter(t <= upper if include_upper else t < upper)
    if regex is not None:
        # Solr applies Pattern.matcher(term).matches() — a FULL match
        # (TermsComponent.java, terms.regex) — while rlike is a
        # substring find; anchor unless the caller already did.
        td = td.filter(t.rlike("^(?:" + regex + ")$"))
    td = td.filter(F.col("df") >= mincount)
    if maxcount is not None and maxcount >= 0:
        td = td.filter(F.col("df") <= maxcount)
    if sort == "count":
        order = [F.col("df").desc(), t.asc()]
    elif sort == "index":
        order = [t.asc()]
    else:
        raise ValueError(f"unknown terms sort {sort!r}")
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k merge, not a single-partition global window
    # (the dictionary after a weak mincount filter can be huge).
    return td.select("term", "df").orderBy(*order).limit(limit)
