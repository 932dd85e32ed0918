"""Document-based completion suggester — the suggest/document package.

Role analogue: lucene/suggest/src/java/org/apache/lucene/search/suggest/
document/ — SuggestField / ContextSuggestField carry (suggestion, weight,
contexts) per document; PrefixCompletionQuery / RegexCompletionQuery
match suggestions; ContextQuery (ContextQuery.java:30-147) filters and
boosts by context with exact or prefix matching; CompletionScorer.java:
105 scores ``weight * boost``; TopSuggestDocsCollector keeps the top-n.

Spark restatement: the "suggest index" is simply a DataFrame with
columns (suggestion string, weight long, contexts array<string> —
nullable for plain SuggestFields).  Matching, context filtering,
boosting and the top-n are one JVM-side plan: a prefix/regex predicate,
a transform+array_max over the contexts column against a literal
boost table, and an ordered limit.  Nothing leaves the executors.

Reference semantics preserved:
- no contexts requested (and not match_all) → every suggestion matches
  at boost 1 (ContextQuery javadoc: "When no context is added, the
  default behaviour is to suggest across all contexts").
- contexts requested → suggestions whose contexts intersect match at
  the MAX matching boost (each (context, suggestion) pair is its own
  FST path in the reference; the collector's per-doc dedup keeps the
  highest-scoring path); context-less suggestions do NOT match.
- match_all_contexts=True → addAllContexts(): everything matches at
  boost 1, context boosts ignored.
- a context entry may be exact (default) or a prefix (addContext(...,
  exact=false)).
- score = weight * boost, descending, suggestion ascending tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["complete"]


def _context_boost(entries) -> Column:
    """contexts array<string> → max matching boost (null if none match).
    `entries`: list of (context, boost, exact)."""
    def per_elem(c: Column) -> Column:
        whens = None
        for ctx, boost, exact in entries:
            cond = (c == ctx) if exact else c.startswith(ctx)
            whens = (F.when(cond, F.lit(float(boost))) if whens is None
                     else whens.when(cond, F.lit(float(boost))))
        return whens
    return F.array_max(F.filter(
        F.transform(F.coalesce(F.col("contexts"), F.array()), per_elem),
        lambda b: b.isNotNull()))


def complete(suggestions: DataFrame, query: str, n: int = 10,
             mode: str = "prefix", contexts=None,
             match_all_contexts: bool = False) -> DataFrame:
    """Top-n completions.

    suggestions: DataFrame(suggestion string, weight long,
        contexts array<string> | null).
    query: the typed prefix (mode='prefix', PrefixCompletionQuery) or a
        regular expression (mode='regex', RegexCompletionQuery — full
        match, like the reference's automaton).
    contexts: optional — an iterable of context names (boost 1), a
        {context: boost} mapping, or (context, boost, exact) triples
        for prefix contexts (addContext(ctx, boost, exact=False)).

    Returns (suggestion, weight, score) ordered by score desc,
    suggestion asc."""
    s = F.col("suggestion")
    if mode == "prefix":
        matched = suggestions.filter(s.startswith(query))
    elif mode == "regex":
        matched = suggestions.filter(s.rlike(f"^(?:{query})$"))
    else:
        raise ValueError(f"unknown completion mode {mode!r}")

    if match_all_contexts or not contexts:
        boost = F.lit(1.0)
    else:
        if isinstance(contexts, dict):
            entries = [(k, v, True) for k, v in contexts.items()]
        else:
            entries = [e if isinstance(e, tuple) else (e, 1.0, True)
                       for e in contexts]
            entries = [e if len(e) == 3 else (e[0], e[1], True)
                       for e in entries]
        boost = _context_boost(entries)
        matched = matched.withColumn("__boost", boost).filter(
            F.col("__boost").isNotNull())
        boost = F.col("__boost")
    return (matched
            .withColumn("score", F.col("weight").cast("double") * boost)
            .select("suggestion", "weight", "score")
            .orderBy(F.col("score").desc(), s.asc())
            .limit(n))
