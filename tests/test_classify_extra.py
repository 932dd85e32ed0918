"""BM25-NB, boolean perceptron, and fuzzy-kNN classifiers vs brute-force
pure-Python twins implementing the reference algorithms independently
(BM25NBClassifier.java, BooleanPerceptronClassifier.java,
KNearestFuzzyClassifier.java + utils/NearestFuzzyQuery.java)."""

from __future__ import annotations

import math

import pytest

from lucene_spark.pipeline import classify

K1, B = 1.2, 0.75

TRAIN = [
    (1, "spark index merge segment merge", "eng"),
    (2, "spark shuffle join network", "eng"),
    (3, "le chat noir dort bien", "fra"),
    (4, "le chien mange le chat", "fra"),
    (5, "index scan table spark", "eng"),
    (6, "la table ronde", "fra"),
]
TEST = [
    (10, "spark merge table"),
    (11, "le chat mange"),
    (12, "spark spark spark"),
    (13, "tab1e mergs"),  # fuzzy-only matches
]


def _toks(s):
    return [t for t in s.lower().split() if t]


def _stats():
    tf = {}   # (key, term) -> tf
    dl = {}
    for k, txt, _ in TRAIN:
        ts = _toks(txt)
        dl[k] = len(ts)
        for t in ts:
            tf[(k, t)] = tf.get((k, t), 0) + 1
    df = {}
    for (k, t) in tf:
        df[t] = df.get(t, 0) + 1
    n_text = len(dl)
    avgdl = sum(dl.values()) / n_text
    return tf, dl, df, n_text, avgdl


def _bm25(tfv, dlv, dfv, n, avgdl):
    idf = math.log(1 + (n - dfv + 0.5) / (dfv + 0.5))
    return idf * tfv / (tfv + K1 * (1 - B + B * dlv / avgdl))


def brute_bm25_nb():
    tf, dl, df, n_text, avgdl = _stats()
    n_docs = len(TRAIN)
    labels = {k: lab for k, _, lab in TRAIN}
    classes = sorted({lab for _, _, lab in TRAIN})
    out = {}
    for tk, txt in [(k, t) for k, t in TEST]:
        scores = {}
        for c in classes:
            df_c = sum(1 for v in labels.values() if v == c)
            idf_c = math.log(1 + (n_docs - df_c + 0.5) / (df_c + 0.5))
            class_score = idf_c / (1 + K1)
            s = math.log(class_score)
            for w in _toks(txt):
                best = 0.0
                for k, lab in labels.items():
                    if lab == c and (k, w) in tf:
                        best = max(best, _bm25(tf[(k, w)], dl[k], df[w],
                                               n_text, avgdl))
                s += math.log(class_score + best)
            scores[c] = s
        smax = max(scores.values())
        lse = smax + math.log(sum(math.exp(v - smax) for v in scores.values()))
        win = min(scores, key=lambda c: (-scores[c], c))
        out[tk] = (win, math.exp(scores[win] - lse))
    return out


def test_bm25_nb_matches_bruteforce(spark):
    train = spark.createDataFrame(TRAIN, "key long, text string, label string")
    test = spark.createDataFrame(TEST, "key long, text string")
    got = {r["key"]: (r["predicted"], r["prob"])
           for r in classify.bm25_nb_classify(
               train, test, "text", "label", "key").collect()}
    want = brute_bm25_nb()
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def brute_perceptron(batch_size):
    # independent replay of BooleanPerceptronClassifier's training pass
    tf, dl, df, n_text, avgdl = _stats()
    ttf = {}
    for (k, t), v in tf.items():
        ttf[t] = ttf.get(t, 0) + v
    bias = sum(ttf.values()) / len(TRAIN)
    fst = dict(ttf)
    weights = dict(ttf)
    batch = 0
    for k, txt, lab in sorted(TRAIN):
        correct = lab == "eng"
        out = sum(fst[t] for t in _toks(txt) if t in fst)
        assigned = out >= bias
        modifier = (correct > assigned) - (correct < assigned)
        if modifier != 0:
            doc_tf = {}
            for t in _toks(txt):
                doc_tf[t] = doc_tf.get(t, 0) + 1
            for t, f in doc_tf.items():
                prev = fst.get(t)
                weights[t] = 0 if prev is None else max(0, prev + modifier * f)
            if batch % batch_size == 0:
                fst = dict(weights)
        batch += 1
    return weights, bias


@pytest.mark.parametrize("batch_size", [1, 2, 32])
def test_perceptron_single_partition_parity(spark, batch_size):
    train = spark.createDataFrame(
        [(k, t, lab == "eng") for k, t, lab in TRAIN],
        "key long, text string, y boolean")
    wdf, bias = classify.perceptron_train(
        train, "text", "y", "key", batch_size=batch_size, num_partitions=1)
    want_w, want_bias = brute_perceptron(batch_size)
    assert bias == pytest.approx(want_bias)
    got = {r["term"]: r["weight"] for r in wdf.collect()}
    assert got == {t: float(v) for t, v in want_w.items()}

    test = spark.createDataFrame(TEST, "key long, text string")
    res = {r["key"]: (r["assigned"], r["score"])
           for r in classify.perceptron_classify(
               wdf, test, "text", "key", bias).collect()}
    assert set(res) == {k for k, _ in TEST}  # unknown-token doc kept
    for tk, txt in TEST:
        out = sum(want_w.get(t, 0.0) for t in _toks(txt))
        assert res[tk][0] == (out >= want_bias)
        assert res[tk][1] == pytest.approx(
            1 - math.exp(-abs(want_bias - out) / want_bias), rel=1e-9)


def test_perceptron_multi_partition_averages(spark):
    train = spark.createDataFrame(
        [(k, t, lab == "eng") for k, t, lab in TRAIN],
        "key long, text string, y boolean")
    wdf, _ = classify.perceptron_train(
        train, "text", "y", "key", num_partitions=3)
    got = {r["term"]: r["weight"] for r in wdf.collect()}
    # averaged weights stay within the convex hull of possible updates:
    # nonnegative, and vocabulary is complete
    tf, *_ = _stats()
    vocab = {t for _, t in tf}
    assert set(got) == vocab
    assert all(v >= 0 for v in got.values())


def _lev(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def brute_knn_fuzzy(k=3):
    tf, dl, df, n_text, avgdl = _stats()
    n_docs = len(TRAIN)
    labels = {key: lab for key, _, lab in TRAIN}
    vocab = sorted(df)
    idf1 = math.log(1 + (n_text - 1 + 0.5) / 1.5)
    out = {}
    for tk, txt in TEST:
        legs = []  # (st_score, cand)
        for q in sorted(set(_toks(txt))):
            plen = min(2, len(q))
            vs = []
            for c in vocab:
                if c[:plen] != q[:plen]:
                    continue
                ed = _lev(q, c)
                if ed > 1:
                    continue
                boost = 1.0 if ed == 0 else 1 - 1 / min(len(q), len(c))
                vs.append((boost, c))
            if not vs:
                continue
            vs.sort(key=lambda x: (-x[0], x[1]))
            vs = vs[:50]
            exact = df.get(q, 0)
            use_df = exact if exact > 0 else int(
                sum(df[c] for _, c in vs) / len(vs))
            idf = math.log((n_docs + 1) / (use_df + 1)) + 1
            for boost, c in vs:
                legs.append((boost * boost * idf, c))
        if not legs:
            continue
        legs.sort(key=lambda x: (-x[0], x[1]))
        legs = legs[:300]
        dscore = {}
        for st, c in legs:
            for key in labels:
                if (key, c) in tf:
                    leg = st * idf1 * tf[(key, c)] / (
                        tf[(key, c)] + K1 * (1 - B + B * dl[key] / avgdl))
                    dscore[key] = dscore.get(key, 0.0) + leg
        top = sorted(dscore.items(), key=lambda x: (-x[1], x[0]))[:k]
        maxscore = top[0][1]
        agg = {}
        for key, s in top:
            lab = labels[key]
            agg[lab] = agg.get(lab, 0.0) + s / maxscore
        denom = min(k, len(top))
        win = min(agg, key=lambda c: (-agg[c], c))
        out[tk] = (win, agg[win] / denom)
    return out


def test_knn_fuzzy_matches_bruteforce(spark):
    train = spark.createDataFrame(TRAIN, "key long, text string, label string")
    test = spark.createDataFrame(TEST, "key long, text string")
    got = {r["key"]: (r["predicted"], r["score"])
           for r in classify.knn_fuzzy_classify(
               train, test, "text", "label", "key", k=3).collect()}
    want = brute_knn_fuzzy(k=3)
    assert set(got) == set(want)
    for tk in want:
        assert got[tk][0] == want[tk][0], (tk, got[tk], want[tk])
        assert got[tk][1] == pytest.approx(want[tk][1], rel=1e-9)


def test_knn_fuzzy_typo_doc_still_classified(spark):
    """Doc 13 has only misspelled tokens ('tab1e', 'mergs') — the whole
    point of the fuzzy expansion is that it still reaches 'table'/'merge'."""
    train = spark.createDataFrame(TRAIN, "key long, text string, label string")
    test = spark.createDataFrame(TEST, "key long, text string")
    got = {r["key"]: r["predicted"]
           for r in classify.knn_fuzzy_classify(
               train, test, "text", "label", "key", k=3).collect()}
    assert 13 in got
