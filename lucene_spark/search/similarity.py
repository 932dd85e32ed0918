"""Similarity functions — vectorized numpy scoring kernels.

Role analogue: search/similarities/Similarity.java SimScorer contract —
`score(freq, norm) -> float` — specialized here to vectorized
`(tf: ndarray, doclen: ndarray) -> float32 ndarray`.

BM25 parity contract (the north-star gate), from
search/similarities/BM25Similarity.java:
- idf  = ln(1 + (docCount − df + 0.5)/(df + 0.5))        (:104-107, double→float)
- avgdl = sumTotalTermFreq / docCount                     (:114-117, double→float)
- LOSSY-NORM-FREE EXACT VARIANT: doclen is the exact post-filter token
  count (int64), NOT SmallFloat-quantized (:129-135 is deliberately skipped
  per BASELINE.json north_star "lossy-norm-free exact variant")
- score = weight − weight/(1 + tf · normInverse), float32, where
  normInverse = 1/(k1·((1−b) + b·doclen/avgdl)) and weight = boost·idf
  (:246-258 — note Lucene dropped the classic (k1+1) numerator factor)
- defaults k1=1.2, b=0.75 (:100-102)
- multi-clause scores are per-clause float32 values accumulated in double
  and cast back to float32 (search/DisjunctionSumScorer.java /
  BlockMaxConjunctionScorer score() accumulate in double)

All kernels are pure functions usable on the driver (planning), inside
Arrow UDF workers (scoring), and in the oracle (tests) — a single source
of truth for parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Similarity:
    k1: float = 1.2
    b: float = 0.75

    def idf(self, df: int, doc_count: int) -> np.float32:
        # BM25Similarity.java:104-107 — Math.log in double, cast to float
        return np.float32(math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)))

    def avgdl(self, sum_total_term_freq: int, doc_count: int) -> np.float32:
        # BM25Similarity.java:114-117
        return np.float32(sum_total_term_freq / float(doc_count))

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0) -> np.float32:
        return np.float32(np.float32(boost) * self.idf(df, doc_count))

    def norm_inverse(self, doclen: np.ndarray, avgdl: np.float32) -> np.ndarray:
        """float32 1/(k1*((1-b) + b*dl/avgdl)) — the exact-doclen analogue of
        the 256-entry norm cache at BM25Similarity.java:202-216."""
        dl = doclen.astype(np.float32)
        k1 = np.float32(self.k1)
        b = np.float32(self.b)
        one = np.float32(1.0)
        return one / (k1 * ((one - b) + b * dl / np.float32(avgdl)))

    def score(self, tf: np.ndarray, doclen: np.ndarray, weight: np.float32, avgdl: np.float32) -> np.ndarray:
        """BM25Similarity.java:246-258: w − w/(1 + tf·normInverse), float32."""
        ni = self.norm_inverse(np.asarray(doclen), avgdl)
        tff = np.asarray(tf).astype(np.float32)
        one = np.float32(1.0)
        return weight - weight / (one + tff * ni)

    def max_score(self, max_tf: np.ndarray, min_doclen: np.ndarray, weight: np.float32, avgdl: np.float32) -> np.ndarray:
        """Admissible per-block upper bound: score at (max_tf, min_doclen).
        Monotone ↑ in tf, ↓ in doclen ⇒ bound ≥ every true score in the
        block (contract of index/Impacts.java:43-45)."""
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class ClassicSimilarity:
    """TF-IDF classic: sqrt(tf) · idf² · (1/sqrt(dl)) —
    search/similarities/ClassicSimilarity.java / TFIDFSimilarity.java."""

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0) -> np.float32:
        idf = np.float32(math.log((doc_count + 1) / (df + 1)) + 1.0)
        return np.float32(boost) * idf * idf

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        tff = np.sqrt(np.asarray(tf).astype(np.float32))
        norm = np.float32(1.0) / np.sqrt(np.asarray(doclen).astype(np.float32))
        return weight * tff * norm

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class BooleanSimilarity:
    """Constant 1·boost per matching clause —
    search/similarities/BooleanSimilarity.java."""

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0) -> np.float32:
        return np.float32(boost)

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        return np.full(np.asarray(tf).shape, weight, dtype=np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class LMDirichletSimilarity:
    """Dirichlet-smoothed language model —
    search/similarities/LMDirichletSimilarity.java (mu=2000 default):
    score = boost · max(0, ln(1 + tf/(mu·p)) + ln(mu/(dl + mu))),
    p = (cf + 1)/(sumTotalTermFreq + 1) (LMSimilarity collection model;
    negative scores clamped to 0 per the SimScorer non-negativity
    contract)."""

    mu: float = 2000.0

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        p = (cf + 1.0) / (sum_ttf + 1.0)
        return (np.float32(boost), np.float64(p))

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, p = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        s = np.log(1.0 + tff / (self.mu * p)) + np.log(self.mu / (dl + self.mu))
        return (np.float64(boost) * np.maximum(s, 0.0)).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class DFRInL2Similarity:
    """Divergence-from-randomness, the standard In/L/H2 combination —
    search/similarities/DFRSimilarity.java with BasicModelIn (inverse
    document frequency model), AfterEffectL (Laplace), NormalizationH2
    (term frequency density; c=1), per the published DFR framework
    (Amati & van Rijsbergen):

        tfn   = tf · log2(1 + c·avgdl/dl)              (H2)
        info  = tfn · log2((N+1)/(df+0.5))             (In)
        score = boost · info / (tfn + 1)               (L)
    """

    c: float = 1.0

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        import math as _m

        info_per_tfn = _m.log2((doc_count + 1) / (df + 0.5))
        return (np.float32(boost), np.float64(info_per_tfn))

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, info = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        tfn = tff * np.log2(1.0 + self.c * float(avgdl) / dl)
        return (np.float64(boost) * info * tfn / (tfn + 1.0)).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class IndriDirichletSimilarity:
    """search/similarities/IndriDirichletSimilarity.java (mu=2000):
    score = boost · ln((tf + mu·p)/(dl + mu)) with
    p = cf/sumTotalTermFreq (IndriCollectionModel:60-68 — no +1
    smoothing). Unlike the clamped LMDirichlet this keeps the raw
    (negative) log-probability: IndriAndQuery's combiner needs the
    freq-0 smoothing score of absent terms (TermScorer.smoothingScore:
    79-81 = score(doc, 0)), so non-negativity is deliberately not
    enforced and the class is NOT in SIMILARITIES (the registry
    contract requires score ≥ 0 for block-max pruning)."""

    mu: float = 2000.0

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        return (np.float32(boost), np.float64(cf) / max(float(sum_ttf), 1.0))

    def score(self, tf, doclen, weight, avgdl=None) -> np.ndarray:
        boost, p = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        s = np.log((tff + self.mu * p) / (dl + self.mu))
        return (np.float64(boost) * s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl=None):
        # monotone ↑ in tf and ↓ in dl, so the corner bound is admissible
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class LMJelinekMercerSimilarity:
    """Jelinek-Mercer smoothed language model —
    search/similarities/LMJelinekMercerSimilarity.java:62-67:
    score = boost · ln(1 + ((1−λ)·tf/dl) / (λ·p)),
    p = (cf+1)/(sumTotalTermFreq+1) (LMSimilarity.DefaultCollectionModel).
    λ default 0.1 (optimal for short queries per the cited paper)."""

    lam: float = 0.1

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        p = (cf + 1.0) / (sum_ttf + 1.0)
        return (np.float32(boost), np.float64(p))

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, p = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        s = np.log(1.0 + ((1.0 - self.lam) * tff / dl) / (self.lam * p))
        return (np.float64(boost) * s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class DFISimilarity:
    """Divergence-from-independence —
    search/similarities/DFISimilarity.java:58-68:
    expected = (cf+1)·dl/(sumTTF+1); freq ≤ expected → 0; else
    score = boost · log2(measure + 1) with the chi-squared measure
    (IndependenceChiSquared.java:34: (freq−expected)²/expected)."""

    measure: str = "chisquared"

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        return (np.float32(boost), np.float64(cf), np.float64(sum_ttf))

    def _measure(self, freq, expected):
        if self.measure == "chisquared":
            return (freq - expected) ** 2 / expected
        if self.measure == "standardized":   # IndependenceStandardized.java:34
            return (freq - expected) / np.sqrt(expected)
        return (freq - expected) / expected  # saturated (IndependenceSaturated.java:33)

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, cf, sum_ttf = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        expected = (cf + 1.0) * dl / (sum_ttf + 1.0)
        m = self._measure(tff, expected)
        s = np.where(tff <= expected, 0.0, np.log2(np.maximum(m, 0.0) + 1.0))
        return (np.float64(boost) * s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class IBLLSimilarity:
    """Information-based, log-logistic distribution × DF lambda × H2
    normalization — search/similarities/IBSimilarity.java with
    DistributionLL.java:34 (−ln(λ/(tfn+λ))), LambdaDF.java:33
    (λ = (df+1)/(N+1)), NormalizationH2.java:58
    (tfn = tf·log2(1 + c·avgdl/dl), c=1)."""

    c: float = 1.0

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        lam = (df + 1.0) / (doc_count + 1.0)
        return (np.float32(boost), np.float64(lam))

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, lam = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        tfn = tff * np.log2(1.0 + self.c * float(avgdl) / dl)
        s = -np.log(lam / (tfn + lam))
        return (np.float64(boost) * s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class AxiomaticSimilarity:
    """The Axiomatic retrieval family — search/similarities/
    Axiomatic.java:96-106 plus the six concrete models
    AxiomaticF1EXP/F1LOG/F2EXP/F2LOG/F3EXP/F3LOG.java:

        score = max(0, boost · (tf · ln · tfln · idf − gamma))

    with per-variant components (each subclass overrides exactly these):
        tf    (F1*, F3*) = 1 + ln(1 + ln(freq + 1));      (F2*) = 1
        ln    (F1*) = (avgdl + s) / (avgdl + dl·s);       else  = 1
        tfln  (F2*) = freq / (freq + s + s·dl/avgdl);     else  = 1
        idf   (*EXP) = ((N+1)/df)^k;   (*LOG) = ln((N+1)/df)
        gamma (F3*) = (dl − queryLen) · s · queryLen / avgdl;  else 0

    Reference defaults s=0.25, queryLen=1, k=0.35 (Axiomatic.java:91-93;
    every no-arg subclass constructor delegates to them). The max(0, ·)
    clamp only bites for the F3 models, whose gamma can exceed the
    retrieval term (AxiomaticF3EXP.java:24-26 note)."""

    variant: str = "F2EXP"
    s: float = 0.25
    query_len: int = 1
    k: float = 0.35

    def __post_init__(self):
        if self.variant not in ("F1EXP", "F1LOG", "F2EXP", "F2LOG",
                                "F3EXP", "F3LOG"):
            raise ValueError(f"unknown axiomatic variant {self.variant!r}")

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        ratio = (doc_count + 1.0) / df
        idf = ratio ** self.k if self.variant.endswith("EXP") else math.log(ratio)
        return (np.float32(boost), np.float64(idf))

    def _components(self, tff, dl, av: float):
        """The five per-variant functions (tf, ln, tfln, gamma) — the
        ONE implementation both score() and explain_components() use, so
        explain can never drift from scoring. Vectorized over numpy
        arrays and exact for python floats alike."""
        fam = self.variant[:2]
        tfc = (1.0 + np.log(1.0 + np.log(tff + 1.0))) if fam in ("F1", "F3") \
            else 1.0
        lnc = (av + self.s) / (av + dl * self.s) if fam == "F1" else 1.0
        tflnc = tff / (tff + self.s + self.s * dl / av) if fam == "F2" else 1.0
        gamma = ((dl - self.query_len) * self.s * self.query_len / av) \
            if fam == "F3" else 0.0
        return tfc, lnc, tflnc, gamma

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, idf = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        tfc, lnc, tflnc, gamma = self._components(tff, dl, float(avgdl))
        s = np.float64(boost) * (tfc * lnc * tflnc * idf - gamma)
        return np.maximum(0.0, s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        # every component is non-decreasing in tf and non-increasing in
        # dl (gamma grows with dl, entering negated), so (max_tf,
        # min_doclen) bounds the block
        return self.score(max_tf, min_doclen, weight, avgdl)

    def explain_components(self, tf: float, dl: float, weight, avgdl) -> list[dict]:
        """Sub-explanations mirroring Axiomatic.explain's five-function
        breakdown (search/similarities/Axiomatic.java:109-131 — tfExpl /
        lnExpl / tflnExpl / idfExpl and the gamma term). Values come
        from the same _components() score() uses."""
        _, idf = weight
        tfc, lnc, tflnc, gamma = self._components(
            np.float64(tf), np.float64(dl), float(avgdl))
        return [
            {"value": float(tfc), "description":
                f"tf, {self.variant} term-frequency function"},
            {"value": float(lnc), "description":
                f"ln, {self.variant} length-normalization (s={self.s})"},
            {"value": float(tflnc), "description":
                f"tfln, {self.variant} mixed tf/length function (s={self.s})"},
            {"value": float(idf), "description":
                f"idf, {'((N+1)/df)^k' if self.variant.endswith('EXP') else 'ln((N+1)/df)'}"
                f" (k={self.k})"},
            {"value": float(gamma), "description":
                f"gamma, query-length penalty (queryLen={self.query_len})"},
        ]


@dataclass(frozen=True)
class DFRGL2Similarity:
    """DFR G/L/H2 — BasicModelG (geometric Bose-Einstein limit) with the
    Laplace after-effect and H2 normalization
    (search/similarities/BasicModelG.java:36-50, AfterEffectL.java:33,
    NormalizationH2.java:58):

        F      = cf + 1;  N = docCount;  λ = F / (N + F)
        A      = log2(λ + 1);  B = log2((1 + λ) / λ)
        tfn    = tf · log2(1 + c·avgdl/dl)                 (H2, c=1)
        score  = boost · (B − (B − A) / (1 + tfn))
                 # BasicModelG.score with AfterEffectL's aeTimes1pTfn = 1:
                 # the (A + B·tfn)/(1+tfn) rewrite that keeps the result
                 # non-decreasing in tfn (B ≥ A).
    """

    c: float = 1.0

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        import math as _m

        f = cf + 1.0
        lam = f / (float(doc_count) + f)
        a = _m.log2(lam + 1.0)
        b = _m.log2((1.0 + lam) / lam)
        return (np.float32(boost), np.float64(a), np.float64(b))

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, a, b = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        tfn = tff * np.log2(1.0 + self.c * float(avgdl) / dl)
        return (np.float64(boost) * (b - (b - a) / (1.0 + tfn))).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        return self.score(max_tf, min_doclen, weight, avgdl)


@dataclass(frozen=True)
class SweetSpotSimilarity:
    """SweetSpotSimilarity (misc/SweetSpotSimilarity.java) — Classic
    TF-IDF with a plateau length norm and a baselined tf:

        lengthNorm(dl) = 1 / sqrt(steepness·(|dl−ln_min| + |dl−ln_max|
                                             − (ln_max−ln_min)) + 1)
            (flat 1.0 inside [ln_min, ln_max], hyperbolic falloff
             outside — computeLengthNorm, SweetSpotSimilarity.java:120)
        baselineTf(tf) = 0 if tf == 0
                         base         if 0 < tf ≤ min
                         sqrt(base² + tf − min)  otherwise
            (baselineTf, SweetSpotSimilarity.java:163)
        score = boost · idf² · baselineTf(tf) · lengthNorm(dl)

    with Classic's idf = ln((docCount+1)/(df+1)) + 1. Defaults mirror
    the reference's field-tuning idiom: a doclen sweet spot and a tf
    floor. Unlike Lucene (which bakes lengthNorm into the lossy norm
    byte at index time), the exact doclen sidecar lets us compute it
    losslessly at query time."""

    ln_min: int = 1
    ln_max: int = 1
    steepness: float = 0.5
    tf_base: float = 0.0
    tf_min: float = 0.0

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0) -> np.float32:
        idf = np.float32(math.log((doc_count + 1) / (df + 1)) + 1.0)
        return np.float32(boost) * idf * idf

    def _length_norm(self, dl: np.ndarray) -> np.ndarray:
        lo, hi, s = float(self.ln_min), float(self.ln_max), float(self.steepness)
        return (1.0 / np.sqrt(
            s * (np.abs(dl - lo) + np.abs(dl - hi) - (hi - lo)) + 1.0))

    def _baseline_tf(self, tf: np.ndarray) -> np.ndarray:
        b, m = float(self.tf_base), float(self.tf_min)
        out = np.sqrt(np.maximum(b * b + tf - m, 0.0))
        out = np.where(tf <= m, b, out)
        return np.where(tf == 0.0, 0.0, out)

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        return (np.float64(weight) * self._baseline_tf(tff)
                * self._length_norm(dl)).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        # lengthNorm is NOT monotone in dl (plateau) — bound it by its
        # maximum value 1.0 so the block bound stays admissible
        tff = np.asarray(max_tf, dtype=np.float64)
        return (np.float64(weight) * self._baseline_tf(tff)).astype(np.float32)


@dataclass(frozen=True)
class DFRSimilarity:
    """Composable divergence-from-randomness — the FULL
    BasicModel × AfterEffect × Normalization matrix of
    search/similarities/DFRSimilarity.java:33-80:

      basic_model: 'if'  A = log2(1 + (N+1)/(F+0.5))      (BasicModelIF.java:36)
                   'in'  A = log2((N+1)/(n+0.5))          (BasicModelIn.java:35)
                   'ine' ne = N·(1−((N−1)/N)^F),
                         A = log2((N+1)/(ne+0.5))         (BasicModelIne.java:37)
                   'g'   λ = (F+1)/(N+F+1), A = log2(λ+1),
                         B = log2((1+λ)/λ)                (BasicModelG.java:38)
      after_effect: 'l' ae×(1+tfn) = 1                    (AfterEffectL.java:32)
                    'b' ae×(1+tfn) = (F+2)/(n+1)          (AfterEffectB.java:33)
      normalization: 'h1' tfn = tf·c·avgdl/dl             (NormalizationH1.java:50)
                     'h2' tfn = tf·log2(1 + c·avgdl/dl)   (NormalizationH2.java:58)
                     'h3' tfn = (tf + μ·(F+1)/(T+1))/(dl+μ)·μ
                                                          (NormalizationH3.java:49)
                     'z'  tfn = tf·(avgdl/dl)^z           (NormalizationZ.java:50)

      score = boost · A·ae1p·(1 − 1/(1+tfn))       (I* models)
              boost · (B − (B−A)/(1+tfn))·ae1p     (G model)

    with N = docCount, n = df, F = cf (totalTermFreq of the term),
    T = sumTotalTermFreq. Defaults c=1, μ=800, z=0.30 mirror the
    reference constructors. The dedicated DFRInL2Similarity /
    DFRGL2Similarity classes predate this matrix and stay registered
    for their combos (numerically identical)."""

    basic_model: str = "if"
    after_effect: str = "l"
    normalization: str = "h2"
    c: float = 1.0
    mu: float = 800.0
    z: float = 0.30

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        n = float(doc_count)
        b = 0.0
        if self.basic_model == "if":
            a = math.log2(1.0 + (n + 1.0) / (cf + 0.5))
        elif self.basic_model == "in":
            a = math.log2((n + 1.0) / (df + 0.5))
        elif self.basic_model == "ine":
            ne = n * (1.0 - ((n - 1.0) / n) ** cf) if n > 0 else 0.0
            a = math.log2((n + 1.0) / (ne + 0.5))
        elif self.basic_model == "g":
            f = cf + 1.0
            lam = f / (n + f)
            a = math.log2(lam + 1.0)
            b = math.log2((1.0 + lam) / lam)
        else:
            raise ValueError(f"unknown DFR basic model: {self.basic_model}")
        if self.after_effect == "l":
            ae1p = 1.0
        elif self.after_effect == "b":
            ae1p = (cf + 2.0) / (df + 1.0)
        else:
            raise ValueError(f"unknown DFR after effect: {self.after_effect}")
        return (np.float32(boost), np.float64(a), np.float64(b),
                np.float64(ae1p), np.float64(cf), np.float64(sum_ttf))

    def _tfn(self, tff: np.ndarray, dl: np.ndarray, avgdl,
             cf: float, sttf: float) -> np.ndarray:
        if self.normalization == "h1":
            return tff * self.c * (float(avgdl) / dl)
        if self.normalization == "h2":
            return tff * np.log2(1.0 + self.c * float(avgdl) / dl)
        if self.normalization == "h3":
            return ((tff + self.mu * ((cf + 1.0) / (sttf + 1.0)))
                    / (dl + self.mu) * self.mu)
        if self.normalization == "z":
            return tff * np.power(float(avgdl) / dl, self.z)
        raise ValueError(f"unknown DFR normalization: {self.normalization}")

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, a, b, ae1p, cf, sttf = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        tfn = self._tfn(tff, dl, avgdl, float(cf), float(sttf))
        if self.basic_model == "g":
            s = (b - (b - a) / (1.0 + tfn)) * ae1p
        else:
            s = a * ae1p * (1.0 - 1.0 / (1.0 + tfn))
        return (np.float64(boost) * s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        # tfn is non-decreasing in tf and non-increasing in dl for every
        # normalization; the combined model score is non-decreasing in
        # tfn (the reference's rewrites guarantee it) — so (max_tf,
        # min_doclen) bounds the block
        return self.score(max_tf, min_doclen, weight, avgdl)

    def explain_components(self, tf: float, dl: float, weight, avgdl) -> list[dict]:
        """Per-component Explanation details — the sub-explanations
        DFRSimilarity.explain assembles from BasicModel.explain /
        AfterEffect.explain / Normalization.explain
        (search/similarities/DFRSimilarity.java:115-131)."""
        boost, a, b, ae1p, cf, sttf = weight
        tfn = float(self._tfn(np.float64(tf), np.float64(dl), avgdl,
                              float(cf), float(sttf)))
        out = [
            {"value": tfn, "description":
                f"tfn, normalization '{self.normalization}' "
                f"(c={self.c}, mu={self.mu}, z={self.z})"},
            {"value": float(a), "description":
                f"A, basic model '{self.basic_model}' information content"},
            {"value": float(ae1p), "description":
                f"(1+tfn)*aeTimes1pTfn, after effect '{self.after_effect}'"},
        ]
        if self.basic_model == "g":
            out.insert(2, {"value": float(b), "description":
                           "B, geometric model upper information bound"})
        return out


@dataclass(frozen=True)
class IBSimilarity:
    """Composable information-based model — the Distribution × Lambda ×
    Normalization matrix of search/similarities/IBSimilarity.java:

      distribution: 'll'  −ln(λ/(tfn+λ))              (DistributionLL.java:34)
                    'spl' −ln((λ^q − λ)/(1 − λ)),
                          q = 1 − 1/(tfn+1)           (DistributionSPL.java:36)
      lambda: 'df'  λ = (df+1)/(N+1)                  (LambdaDF.java:33)
              'ttf' λ = (F+1)/(N+1)                   (LambdaTTF.java:33)
      normalization: same four as DFRSimilarity.

    SPL's two floating-point guards are kept: q is clamped below 1.0 and
    λ^q is nudged off λ (np.nextafter plays Math.nextUp/nextDown)."""

    distribution: str = "ll"
    lam: str = "df"
    normalization: str = "h2"
    c: float = 1.0
    mu: float = 800.0
    z: float = 0.30

    def weight(self, df: int, doc_count: int, boost: float = 1.0,
               cf: int = 0, sum_ttf: int = 0):
        if self.lam == "df":
            lam = np.float32((df + 1.0) / (doc_count + 1.0))
            if lam == 1.0:
                lam = np.nextafter(lam, 0.0, dtype=np.float32)
        elif self.lam == "ttf":
            lam = np.float32((cf + 1.0) / (doc_count + 1.0))
            if lam == 1.0:
                lam = np.nextafter(lam, 2.0, dtype=np.float32)
        else:
            raise ValueError(f"unknown IB lambda: {self.lam}")
        return (np.float32(boost), np.float64(lam),
                np.float64(cf), np.float64(sum_ttf))

    def score(self, tf, doclen, weight, avgdl) -> np.ndarray:
        boost, lam, cf, sttf = weight
        tff = np.asarray(tf, dtype=np.float64)
        dl = np.asarray(doclen, dtype=np.float64)
        tfn = DFRSimilarity._tfn(self, tff, dl, avgdl, float(cf), float(sttf))
        if self.distribution == "ll":
            s = -np.log(lam / (tfn + lam))
        elif self.distribution == "spl":
            q = np.minimum(1.0 - 1.0 / (tfn + 1.0), np.nextafter(1.0, 0.0))
            pw = np.power(lam, q)
            bump = np.nextafter(lam, 2.0) if lam < 1 else np.nextafter(lam, 0.0)
            pw = np.where(pw == lam, bump, pw)
            s = -np.log((pw - lam) / (1.0 - lam))
        else:
            raise ValueError(f"unknown IB distribution: {self.distribution}")
        return (np.float64(boost) * s).astype(np.float32)

    def max_score(self, max_tf, min_doclen, weight, avgdl):
        # both distributions are non-decreasing in tfn (SPL via the q
        # rewrite, DistributionSPL.java comment), tfn monotone as in DFR
        return self.score(max_tf, min_doclen, weight, avgdl)

    def explain_components(self, tf: float, dl: float, weight, avgdl) -> list[dict]:
        """Sub-explanations mirroring IBSimilarity.explain's
        lambda/distribution/normalization breakdown
        (search/similarities/IBSimilarity.java:108-124)."""
        boost, lam, cf, sttf = weight
        tfn = float(DFRSimilarity._tfn(self, np.float64(tf), np.float64(dl),
                                       avgdl, float(cf), float(sttf)))
        return [
            {"value": tfn, "description":
                f"tfn, normalization '{self.normalization}' "
                f"(c={self.c}, mu={self.mu}, z={self.z})"},
            {"value": float(lam), "description":
                f"lambda '{self.lam}' = "
                f"{'(df+1)/(N+1)' if self.lam == 'df' else '(F+1)/(N+1)'}"},
            {"value": float(self.score(np.array([tf]), np.array([dl]),
                                       weight, avgdl)[0]) / float(boost),
             "description":
                f"distribution '{self.distribution}' information content"},
        ]


SIMILARITIES = {
    "bm25": BM25Similarity(),
    "classic": ClassicSimilarity(),
    "boolean": BooleanSimilarity(),
    "lmdirichlet": LMDirichletSimilarity(),
    "dfr_inl2": DFRInL2Similarity(),
    "dfr_gl2": DFRGL2Similarity(),
    # doclen sweet spot tuned to the synthetic corpora's typical body
    # (docs shorter/longer than the band are softly penalized)
    "sweetspot": SweetSpotSimilarity(ln_min=100, ln_max=400, steepness=0.5,
                                     tf_base=1.0, tf_min=1.0),
    "lmjelinekmercer": LMJelinekMercerSimilarity(),
    "dfi": DFISimilarity(),
    "ib_ll": IBLLSimilarity(),
    "axiomatic_f2exp": AxiomaticSimilarity("F2EXP"),
}

# the rest of the axiomatic family (AxiomaticF1EXP/F1LOG/F2LOG/F3EXP/
# F3LOG.java) — same reference defaults s=0.25, queryLen=1, k=0.35
for _ax in ("F1EXP", "F1LOG", "F2LOG", "F3EXP", "F3LOG"):
    SIMILARITIES[f"axiomatic_{_ax.lower()}"] = AxiomaticSimilarity(_ax)

# the full DFR BasicModel×AfterEffect×Normalization and IB
# Distribution×Lambda×Normalization matrices (DFRSimilarity.java:33-80,
# IBSimilarity.java) — 32 + 16 combos, all factory-selectable like
# Solr's <similarity class="solr.DFRSimilarityFactory"> basicModel/
# afterEffect/normalization attributes
for _bm in ("if", "in", "ine", "g"):
    for _ae in ("b", "l"):
        for _nz in ("h1", "h2", "h3", "z"):
            SIMILARITIES[f"dfr_{_bm}_{_ae}_{_nz}"] = DFRSimilarity(
                basic_model=_bm, after_effect=_ae, normalization=_nz)
for _dist in ("ll", "spl"):
    for _lam in ("df", "ttf"):
        for _nz in ("h1", "h2", "h3", "z"):
            SIMILARITIES[f"ib_{_dist}_{_lam}_{_nz}"] = IBSimilarity(
                distribution=_dist, lam=_lam, normalization=_nz)
