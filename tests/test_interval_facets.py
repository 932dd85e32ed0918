"""Solr interval faceting (facet.interval) — solr/core/src/java/org/
apache/solr/request/IntervalFacets.java. Contract under test (:58-64):
each interval's count equals the count of the equivalent range query
over the same match set; plus the interval-string syntax (:70-92)."""

import pytest

from lucene_spark.relational.facets import _parse_interval, interval_facets


def test_parse_syntax_forms():
    assert _parse_interval("[1,10)") == ("[1,10)", "1", "10", False, True)
    assert _parse_interval("(1,10]") == ("(1,10]", "1", "10", True, False)
    assert _parse_interval("(1,10)") == ("(1,10)", "1", "10", True, True)
    assert _parse_interval("[*,10]") == ("[*,10]", None, "10", False, False)
    assert _parse_interval("[*,*]") == ("[*,*]", None, None, False, False)
    # whitespace around values is omitted (:88)
    assert _parse_interval("[ 1 , 10 ]")[1:3] == ("1", "10")


def test_parse_local_params_key():
    key, start, end, so, eo = _parse_interval("{!key='First Half'}[0,5)")
    assert key == "First Half" and (start, end, so, eo) == ("0", "5", False, True)


def test_parse_escapes():
    # commas and brackets escaped with backslash (:87)
    key, start, end, _, _ = _parse_interval(r"[Buenos\, Aires,New York]")
    assert start == "Buenos, Aires" and end == "New York"


def test_parse_rejects():
    with pytest.raises(ValueError):
        _parse_interval("1,10")          # no brackets
    with pytest.raises(ValueError):
        _parse_interval("[1 10]")        # no comma
    with pytest.raises(ValueError):
        _parse_interval("[,10]")         # empty limit (:78)
    with pytest.raises(ValueError):
        _parse_interval("[A,B,C]")       # extra unescaped comma (:~583)


def test_parse_multi_local_params():
    """key= is found among other local params, and extra params don't
    leak into the label (ex= tags are standard with interval facets)."""
    assert _parse_interval("{!key='First' ex=dt}[0,5)")[0] == "First"
    assert _parse_interval("{!ex=dt key=x}[0,5)")[0] == "x"
    # no key param at all → the interval itself is the label
    assert _parse_interval("{!ex=dt}[0,5)")[0] == "[0,5)"


def test_string_inverted_interval_rejected(spark):
    df = spark.createDataFrame([(1, "m")], "id long, v string")
    with pytest.raises(ValueError):
        interval_facets(df, "v", ["[zebra,apple]"], numeric=False).collect()


def test_parse_roundtrip_property():
    """Hypothesis: any generated (bounds, brackets) combination parses
    back to exactly its components — including escape-needing limit
    strings."""
    from hypothesis import given, settings, strategies as st

    limit = st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        min_size=1, max_size=12).map(str.strip).filter(
        lambda s: s and s != "*")

    def esc(s):
        out = []
        for ch in s:
            if ch in ",[]()\\":
                out.append("\\" + ch)
            else:
                out.append(ch)
        return "".join(out)

    @settings(max_examples=200, deadline=None)
    @given(a=limit, b=limit, so=st.booleans(), eo=st.booleans())
    def check(a, b, so, eo):
        spec = ("(" if so else "[") + esc(a) + "," + esc(b) + \
               (")" if eo else "]")
        key, start, end, s_open, e_open = _parse_interval(spec)
        assert (start, end) == (a, b)
        assert (s_open, e_open) == (so, eo)

    check()


def test_counts_match_range_queries(spark):
    rows = [(i, None if v is None else float(v))
            for i, v in enumerate([1, 2, 3, 5, 5, 8, 10, 12, None])]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r["interval"]: r["count"] for r in interval_facets(
        df, "v",
        ["[1,5)", "[1,5]", "(5,10)", "[*,3]", "(8,*]", "[*,*]",
         "{!key=empty}(5,5)"]).collect()}
    # contract: same count as the equivalent range filter (:58-64)
    assert out["[1,5)"] == df.filter("v >= 1 and v < 5").count() == 3
    assert out["[1,5]"] == 5
    assert out["(5,10)"] == 1
    assert out["[*,3]"] == 3
    assert out["(8,*]"] == 2
    assert out["[*,*]"] == 8          # NULLs never match
    assert out["empty"] == 0          # equal open limits: impossible


def test_start_after_end_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        interval_facets(df, "v", ["[10,1]"]).collect()


def test_single_pass_plan(spark):
    """All intervals count in ONE aggregate over one scan — no
    per-interval jobs, no shuffle beyond the scalar agg (the class's
    point versus N facet.query filters)."""
    df = spark.range(100).selectExpr("id", "cast(id as double) v")
    plan = interval_facets(df, "v", ["[0,10)", "[10,50)", "(50,*]"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2  # partial + final, once
