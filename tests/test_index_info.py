"""Luke overview + RealTimeGet committed-view fetch."""

from __future__ import annotations

from lucene_spark.index.info import get_by_keys, index_info


def test_index_info_overview(reader, corpus_pdf):
    info = index_info(reader)
    assert info["doc_count"] == len(corpus_pdf) == 400
    f = info["fields"][info["default_field"]]
    assert f["terms"] > 0 and f["sum_df"] >= f["terms"]
    assert f["sum_cf"] >= f["sum_df"]
    # exact-doclen engine: field sum_ttf equals the doclen sum
    assert info["sum_doclen"] == f["sum_ttf"]
    assert info["avg_doclen"] == info["sum_doclen"] / info["doc_count"]
    assert info["analyzer_chains"]            # drift-guard material present
    assert set(info["derived_generations"]) == {
        "postings", "termdict", "docstats", "fieldstats"}


def test_get_by_keys(reader, corpus_pdf):
    some = corpus_pdf["repo"].iloc[0]
    out = get_by_keys(reader, [some]).collect()
    want = (corpus_pdf["repo"] == some).sum()
    assert len(out) == want
    assert all(r["repo"] == some for r in out)
    assert get_by_keys(reader, []).count() == 0


def test_get_by_keys_plan_pushes_filter(reader, corpus_pdf):
    plan = get_by_keys(reader, ["nope"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "repo" in plan
