"""Similarity property suite — the BaseSimilarityTestCase contract
(test-framework/.../similarities/BaseSimilarityTestCase.java:354-374)
restated with hypothesis: over random collection stats and (tf, doclen),
every registered similarity must produce scores that are
  1. finite,
  2. non-negative,
  3. monotone non-decreasing in tf (docs with more occurrences never
     score lower, all else equal),
  4. bounded above by its own block-max bound at (max_tf, min_doclen)
     (the Impacts.java:43-45 admissibility contract the pruning kernel
     relies on)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.search.similarity import SIMILARITIES


@st.composite
def world(draw):
    N = draw(st.integers(min_value=1, max_value=1_000_000))
    df = draw(st.integers(min_value=1, max_value=N))
    avg = draw(st.floats(min_value=1.0, max_value=500.0,
                         allow_nan=False, allow_infinity=False))
    sum_ttf = max(int(avg * N), N)
    cf = draw(st.integers(min_value=df, max_value=max(df, sum_ttf)))
    boost = draw(st.sampled_from([0.5, 1.0, 2.0]))
    tf = draw(st.integers(min_value=1, max_value=1000))
    dl = draw(st.integers(min_value=1, max_value=100_000))
    return N, df, cf, sum_ttf, boost, tf, max(dl, tf)


@settings(max_examples=300, deadline=None)
@given(w=world(), name=st.sampled_from(sorted(SIMILARITIES)))
def test_similarity_contract(w, name):
    N, df, cf, sum_ttf, boost, tf, dl = w
    sim = SIMILARITIES[name]
    avgdl = np.float32(sum_ttf / N)
    wt = sim.weight(df, N, boost, cf=cf, sum_ttf=sum_ttf)
    tfs = np.array([tf, tf + 1], dtype=np.int64)
    dls = np.array([dl, dl + 1], dtype=np.int64)   # dl+1 ≥ tf+1 holds
    s = sim.score(tfs, dls[:1].repeat(2), wt, avgdl)
    assert np.all(np.isfinite(s)), (name, s)
    assert np.all(s >= 0) or name == "dfi", (name, s)
    if name == "dfi":
        assert np.all(s >= 0), (name, s)
    # tf-monotone at fixed dl
    assert s[1] >= s[0] - 1e-6, (name, s)
    # block-max admissibility: bound at (max_tf, min_dl) dominates both
    bound = sim.max_score(np.array([tf + 1]), np.array([dl]), wt, avgdl)
    assert bound[0] >= s.max() - 1e-5, (name, bound, s)


def test_registry_complete():
    # SURVEY §2.5 similarity families all registered
    for k in ("bm25", "classic", "boolean", "lmdirichlet", "dfr_inl2",
              "lmjelinekmercer", "dfi", "ib_ll", "axiomatic_f2exp"):
        assert k in SIMILARITIES
    # full DFR (4×2×4) and IB (2×2×4) matrices (DFRSimilarity.java:33-80)
    for bm in ("if", "in", "ine", "g"):
        for ae in ("b", "l"):
            for nz in ("h1", "h2", "h3", "z"):
                assert f"dfr_{bm}_{ae}_{nz}" in SIMILARITIES
    for dist in ("ll", "spl"):
        for lam in ("df", "ttf"):
            for nz in ("h1", "h2", "h3", "z"):
                assert f"ib_{dist}_{lam}_{nz}" in SIMILARITIES
    # full axiomatic family (AxiomaticF{1,2}{EXP,LOG}, F3{EXP,LOG})
    for ax in ("f1exp", "f1log", "f2exp", "f2log", "f3exp", "f3log"):
        assert f"axiomatic_{ax}" in SIMILARITIES


def test_axiomatic_reference_points():
    """Hand-computed reference values for the per-variant components
    (Axiomatic.java:96-106 with the defaults s=0.25, queryLen=1,
    k=0.35)."""
    import math

    N, df, tf, dl, avgdl = 1000, 10, 4.0, 50.0, 100.0
    exp_idf = ((N + 1) / df) ** 0.35
    log_idf = math.log((N + 1) / df)
    tf_c = 1 + math.log(1 + math.log(tf + 1))
    ln_c = (avgdl + 0.25) / (avgdl + dl * 0.25)
    tfln_c = tf / (tf + 0.25 + 0.25 * dl / avgdl)
    gamma = (dl - 1) * 0.25 * 1 / avgdl
    want = {
        "axiomatic_f1exp": tf_c * ln_c * exp_idf,
        "axiomatic_f1log": tf_c * ln_c * log_idf,
        "axiomatic_f2exp": tfln_c * exp_idf,
        "axiomatic_f2log": tfln_c * log_idf,
        "axiomatic_f3exp": max(0.0, tf_c * exp_idf - gamma),
        "axiomatic_f3log": max(0.0, tf_c * log_idf - gamma),
    }
    for name, w in want.items():
        sim = SIMILARITIES[name]
        wt = sim.weight(df, N, 1.0, cf=50, sum_ttf=int(avgdl * N))
        got = sim.score(np.array([tf]), np.array([dl]), wt,
                        np.float32(avgdl))[0]
        assert abs(got - w) < 1e-5, (name, got, w)


def test_dfr_matrix_matches_dedicated_combos():
    """The composable matrix reproduces the pre-existing dedicated
    classes bit-for-bit on their combos (In/L/H2, G/L/H2, LL/DF/H2)."""
    cases = [("dfr_in_l_h2", "dfr_inl2"), ("dfr_g_l_h2", "dfr_gl2"),
             ("ib_ll_df_h2", "ib_ll")]
    N, df, cf, sttf = 10_000, 37, 120, 2_500_000
    tfs = np.array([1, 2, 5, 40], dtype=np.int64)
    dls = np.array([10, 100, 1000, 5000], dtype=np.int64)
    avgdl = np.float32(sttf / N)
    for a, b in cases:
        sa, sb = SIMILARITIES[a], SIMILARITIES[b]
        wa = sa.weight(df, N, 1.5, cf=cf, sum_ttf=sttf)
        wb = sb.weight(df, N, 1.5, cf=cf, sum_ttf=sttf)
        ra = sa.score(tfs, dls, wa, avgdl)
        rb = sb.score(tfs, dls, wb, avgdl)
        np.testing.assert_allclose(ra, rb, rtol=1e-6), (a, b)


def test_per_field_similarity(spark, tmp_path_factory):
    """PerFieldSimilarityWrapper role: each field scores with its own
    similarity in one mixed-field query."""
    import numpy as np

    from lucene_spark.corpus import make_corpus
    from lucene_spark.index import IndexBuilder, IndexConfig, IndexReader
    from lucene_spark.index.builder import FieldSpec
    from lucene_spark.search import IndexSearcher

    idx = str(tmp_path_factory.mktemp("pfs")) + "/idx"
    src = spark.createDataFrame(make_corpus(60, seed=9))
    cfg = IndexConfig(
        key_cols=("repo", "path", "commit"), content_col="content",
        partitions=2, num_buckets=4,
        fields=(FieldSpec(name="content", analyzer="code"),
                FieldSpec(name="path", analyzer="code")),
    )
    IndexBuilder(spark, cfg).build(src, idx, overwrite=True)
    r = IndexReader(spark, idx)

    s = IndexSearcher(r, similarity={"content": "bm25", "path": "boolean"})
    # path clause scores constant 1.0 (boolean sim); content clause BM25
    path_only = s.matches("path:src").collect()
    assert path_only and all(np.float32(x["score"]) == np.float32(1.0)
                             for x in path_only)
    both = {x["doc_id"]: x["score"] for x in s.matches("index AND path:src").collect()}
    bm25_only = {x["doc_id"]: x["score"]
                 for x in IndexSearcher(r).matches("index").collect()}
    for d, sc in both.items():
        # sum of float32 clause scores accumulated in double → float32
        want = np.float32(np.float64(np.float32(bm25_only[d])) + 1.0)
        assert np.float32(sc) == want
