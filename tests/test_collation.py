"""ICU collation sort keys (ICUCollationKeyAnalyzer role) — validated
against REAL ICU via DuckDB's COLLATE (analysis/collation.py)."""

from __future__ import annotations

import duckdb
import pytest

from lucene_spark.analysis.collation import collation_key, collation_key_udf

WORDS = ["zebra", "älg", "apple", "Örn", "okay", "Apple", "côte", "cote",
         "coté", "côté", "über", "uber", "Ärlig", "årlig", "zzz", "resume",
         "résumé", "Resume", "muller", "müller", "Müller", "mueller",
         "banan", "Banan", "123", "a b", "ab", "ceļš", "cêla", "čar",
         "nação", "nacao", "peña", "pena", "penä", "Ångström", "angstrom"]


@pytest.mark.parametrize("locale", ["sv", "de", "en", "fi"])
def test_matches_real_icu(locale):
    con = duckdb.connect()
    vals = ", ".join(f"'{w}'" for w in WORDS)
    icu = [r[0] for r in con.execute(
        f"SELECT w FROM (SELECT unnest([{vals}]) w) "
        f"ORDER BY w COLLATE {locale}, w").fetchall()]
    mine = sorted(WORDS, key=lambda w: (collation_key(w, locale), w))
    assert mine == icu


def test_levels_ordering():
    # primary beats secondary beats tertiary (UTS #10 §3.3)
    assert collation_key("ab") < collation_key("b")        # prefix first
    assert collation_key("cote") < collation_key("coté")   # accent later
    assert collation_key("cote") < collation_key("Cote")   # lower first
    # and a primary difference dominates any accent pile-up
    assert collation_key("côté") < collation_key("cotz")


def test_unsupported_locale_raises():
    with pytest.raises(ValueError):
        collation_key("abc", "xx")


def test_udf_sorts_dataframe(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "w string")
    key = collation_key_udf("sv")
    got = [r["w"] for r in
           df.select("w", key("w").alias("k")).orderBy("k", "w").collect()]
    con = duckdb.connect()
    vals = ", ".join(f"'{w}'" for w in WORDS)
    icu = [r[0] for r in con.execute(
        f"SELECT w FROM (SELECT unnest([{vals}]) w) "
        "ORDER BY w COLLATE sv, w").fetchall()]
    assert got == icu
