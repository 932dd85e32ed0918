"""Query plan tree + logical rewrite.

Role analogue: search/Query.java subclasses (TermQuery, BooleanQuery with
Occur MUST/SHOULD/FILTER/MUST_NOT — search/BooleanClause.java:90-98) and
the rewrite fixpoint in IndexSearcher.rewrite / BooleanQuery.rewrite
(search/BooleanQuery.java:236+): 1-clause unwrap, duplicate dedup,
MUST ∧ MUST_NOT on same subquery → MatchNoDocs, nested flattening.

Catalyst performs this class of simplification for SQL predicates but not
for our query algebra (it lives above the relational layer), so this is a
small driver-side rewriter (SURVEY.md §4).
"""

from __future__ import annotations

import enum
import re as _re
from dataclasses import dataclass, field, replace


def wildcard_regexp(pattern: str) -> str:
    """`*`/`?` wildcard → anchored-regex over the dictionary
    (WildcardQuery.java translation) — the single source of truth for
    both the classic parser's te?m/t*m atoms and Intervals.wildcard."""
    return "".join(".*" if ch == "*" else "." if ch == "?"
                   else _re.escape(ch.lower()) for ch in pattern)


class Occur(enum.Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    FILTER = "FILTER"      # matches like MUST but does not contribute score
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class Node:
    boost: float = 1.0


@dataclass(frozen=True)
class FieldedNode(Node):
    """Base for queries targeting a named document field — Lucene's Term is
    a (field, text) pair (index/Term.java); field='' means 'the default
    field', resolved by the searcher against the index config (classic QP
    default-field behavior, queryparser/classic/QueryParserBase.java)."""
    field: str = ""


@dataclass(frozen=True)
class TermNode(FieldedNode):
    term: str = ""


@dataclass(frozen=True)
class TermInSetNode(FieldedNode):
    """search/TermInSetQuery.java — constant-score disjunction over a term set."""
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class SynonymNode(FieldedNode):
    """search/SynonymQuery.java:52 — terms scored as one (tf summed, df = max)."""
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class CommonTermsNode(FieldedNode):
    """queries/CommonTermsQuery.java:54-204 — terms are classified by
    document frequency at plan time: df > ceil(max_term_frequency ·
    maxDoc) (or > max_term_frequency directly when it is an absolute
    count ≥ 1) is "high frequency". Low-frequency terms form a required
    group (occur = low_freq_occur, its own minimum-should-match), high-
    frequency terms an optional group that only contributes to scores of
    docs already matched by the low group. With NO low-frequency terms
    the high group is promoted to a conjunction (buildQuery:172-180) to
    keep stopword-only queries from scanning the corpus. msm values
    follow minNrShouldMatch(float, n): ≥1 or 0 → absolute,
    else round(f·n). Terms absent from the index classify as low
    frequency (buildQuery:149-151). MUST_NOT occurs are rejected like
    the reference constructor."""
    terms: tuple[str, ...] = ()
    max_term_frequency: float = 0.01
    low_freq_occur: "Occur" = None  # default MUST, set in __post_init__
    high_freq_occur: "Occur" = None  # default SHOULD
    low_freq_msm: float = 0.0
    high_freq_msm: float = 0.0
    low_freq_boost: float = 1.0
    high_freq_boost: float = 1.0

    def __post_init__(self):
        if self.low_freq_occur is None:
            object.__setattr__(self, "low_freq_occur", Occur.MUST)
        if self.high_freq_occur is None:
            object.__setattr__(self, "high_freq_occur", Occur.SHOULD)
        if Occur.MUST_NOT in (self.low_freq_occur, self.high_freq_occur):
            raise ValueError(
                "CommonTermsQuery occur must be MUST or SHOULD, not MUST_NOT")


@dataclass(frozen=True)
class BlendedTermNode(FieldedNode):
    """search/BlendedTermQuery.java:56-300 — several (possibly cross-
    field) terms scored as if they shared blended statistics: df = max
    df, ttf = Σ ttf over all terms (rewrite:281-291, adjustFrequencies),
    each leg a TermQuery over its OWN postings/norms but weighted with
    the blended stats, combined like DisjunctionMaxQuery with
    tie_breaker (DISJUNCTION_MAX_REWRITE's default 0.01f,
    BlendedTermQuery.java:190). `fields` parallels `terms` for cross-
    field blending (the cross-field-synonym use case; '' entries fall
    back to node.field), `boosts` parallels `terms` (the BoostQuery
    wrap at rewrite:295-298); empty tuples mean node.field / all-1.0."""
    terms: tuple[str, ...] = ()
    fields: tuple[str, ...] = ()
    boosts: tuple[float, ...] = ()
    tie_breaker: float = 0.01

    def legs(self, default_field: str) -> tuple[tuple[str, str, float], ...]:
        """Resolved (field, term, leg_boost) triples."""
        out = []
        for i, t in enumerate(self.terms):
            f = self.fields[i] if i < len(self.fields) and self.fields[i] \
                else (self.field or default_field)
            b = self.boosts[i] if i < len(self.boosts) else 1.0
            out.append((f, t, b))
        return tuple(out)


@dataclass(frozen=True)
class PrefixNode(FieldedNode):
    """search/PrefixQuery.java — expanded against the term dictionary at plan
    time (MultiTermQuery rewrite, search/MultiTermQuery.java:55)."""
    prefix: str = ""


@dataclass(frozen=True)
class RegexpNode(FieldedNode):
    """search/RegexpQuery.java / WildcardQuery — dictionary-expanded."""
    pattern: str = ""


@dataclass(frozen=True)
class FuzzyNode(FieldedNode):
    """search/FuzzyQuery.java — Levenshtein ≤ max_edits dictionary expansion."""
    term: str = ""
    max_edits: int = 2


@dataclass(frozen=True)
class TermRangeNode(FieldedNode):
    """search/TermRangeQuery.java — lexicographic range over the sorted dict."""
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class PhraseNode(FieldedNode):
    """search/PhraseQuery.java — slop=0: terms at consecutive positions
    (ExactPhraseMatcher: freq = number of phrase occurrences); slop>0:
    sloppy min-window matching (kernel.sloppy_phrase_freq — greedy
    non-overlapping smallest-range windows with span ≤ slop, sloppyFreq
    weight 1/(1+span); phrases with repeated terms fall back to exact).
    Scored via the similarity with the BLENDED weight of all terms —
    idf sum per BM25Similarity.java:191-199. Requires an index built with
    index_positions=True (IndexOptions DOCS_AND_FREQS_AND_POSITIONS).

    positions: explicit query positions per term (PhraseQuery.Builder
    add(term, position) — gapped phrases like "AB"/0 "CD"/2); empty =
    consecutive 0..n-1."""
    terms: tuple[str, ...] = ()
    slop: int = 0
    positions: tuple[int, ...] = ()


@dataclass(frozen=True)
class NGramPhraseNode(FieldedNode):
    """search/NGramPhraseQuery.java:30-76 — a phrase of character
    n-grams. rewrite:46-75: when slop=0, n ≥ 2, ≥3 terms and the
    positions are consecutive, intermediate grams are implied by their
    overlapping neighbors, so only every n-th gram plus the last is kept
    (AT THEIR ORIGINAL positions — a gapped PhraseQuery); otherwise it
    is a plain phrase. Fewer postings to intersect, identical matches."""
    n: int = 2
    terms: tuple[str, ...] = ()
    slop: int = 0


@dataclass(frozen=True)
class MultiPhraseNode(FieldedNode):
    """search/MultiPhraseQuery.java:53 — a phrase where each position
    admits a SET of alternative terms (synonym-expanded phrases:
    "(big|large) table"). Matching: slot j's positions are the union of
    its alternatives' position lists; then the exact/sloppy phrase
    machinery applies unchanged. Scored like PhraseQuery with the blended
    idf-sum weight over ALL alternative terms (MultiPhraseWeight uses the
    combined term stats)."""
    positions: tuple[tuple[str, ...], ...] = ()
    slop: int = 0


@dataclass(frozen=True)
class PhraseWildcardNode(FieldedNode):
    """sandbox/search/PhraseWildcardQuery.java:61-108 — a phrase whose
    slots may be multi-term sub-queries (prefix/wildcard/fuzzy/range),
    with a SHARED expansion budget across all multi-term slots
    (maxMultiTermExpansions). Plan-time rewrite resolves single terms
    first (early stop if one matches nothing — the reference's
    single-term-first optimization), then expands multi-term slots
    sequentially against the term dictionary, each drawing from the
    remaining budget; an empty expansion kills the phrase. The result
    lowers to MultiPhraseNode — the reference documents the same
    equivalence ("similar to MultiPhraseQuery, but it handles, controls
    and optimizes the multi-term expansions"). Per-segment expansion
    (segmentOptimizationEnabled) has no Spark analogue: the dictionary
    is global, so one global expansion IS the optimized form."""
    slots: tuple[Node, ...] = ()   # TermNode or multi-term leaves
    slop: int = 0
    max_multi_term_expansions: int = 128


@dataclass(frozen=True)
class TermAutomatonNode(FieldedNode):
    """sandbox/search/TermAutomatonQuery.java:67-209 — a proximity
    automaton whose transitions are terms; generalizes Phrase/
    MultiPhrase/SpanNear. State 0 is the initial state; a `None` term is
    the ANY transition (addAnyTransition: matches any query term at that
    position AND any position holding no query term). Matching follows
    TermAutomatonScorer.countMatches:231-345: the automaton is
    determinized, one match thread starts at every query-term position,
    threads advance one token (or one ANY gap) per position, and freq
    increments every time a thread lands in an accept state (threads are
    counted as a MULTISET — converging threads each count). Scored like
    a phrase pseudo-term: similarity weight over the blended stats of
    every query term present in the index (TermAutomatonWeight:378-399),
    tf = automaton freq, norm = doclen. The reference's finish()
    constraints hold (finish:150-208): no leading ANY, no trailing ANY
    into an accept, and the empty string must not be accepted."""
    transitions: tuple = ()     # (src: int, dst: int, term: str | None)
    accepts: tuple = ()
    max_determinized_states: int = 10000

    def __post_init__(self):
        if 0 in self.accepts:
            raise ValueError("term automaton cannot accept the empty string")
        acc = set(self.accepts)
        for src, dst, t in self.transitions:
            if t is None and src == 0:
                raise ValueError(
                    "automaton cannot lead with an ANY transition")
            if t is None and dst in acc:
                raise ValueError(
                    "automaton cannot end with an ANY transition")


@dataclass(frozen=True)
class IntervalNode(FieldedNode):
    """Interval/proximity query (subset of queries/intervals/
    IntervalQuery.java:59): docs containing a minimal interval that covers
    one position of every term, with gaps = width − #terms ≤ max_gaps
    (Intervals.maxgaps over Intervals.ordered / Intervals.unordered).
    ordered=True requires strictly increasing positions in term order
    (Intervals.ordered); unordered allows any arrangement including
    overlapping positions (Intervals.unordered semantics — the
    no-overlaps variant is out of scope). Matching only — scored as a
    constant-score query (boost); Lucene's IntervalScoreFunction shaping
    is out of scope, documented."""
    terms: tuple[str, ...] = ()
    max_gaps: int = 0
    ordered: bool = False


@dataclass(frozen=True)
class IntervalSlotsNode(FieldedNode):
    """Interval/proximity query whose SLOTS each admit a set of
    alternative terms — the SpanNearQuery-with-SpanOr-clauses shape the
    surround parser produces (queryparser/surround/query/DistanceQuery.java
    → SpanNearQuery; truncated operands become SpanOr over dictionary
    expansions, SrndTruncQuery.java). Before plan-time expansion each
    slot is a fielded leaf (TermNode / PrefixNode / RegexpNode /
    FuzzyNode / TermInSetNode); IndexSearcher._expand resolves multi-term
    slots against the dictionary into TermInSetNode. Matching: one
    position from ONE alternative per slot, gaps ≤ max_gaps (ordered /
    unordered exactly as IntervalNode — merging each slot's position
    lists is match-equivalent to the SpanOr cross product). Match-only:
    constant score = boost (like IntervalNode).

    min_start/max_end bound the matched span's POSITION RANGE — the
    SpanFirstQuery / SpanPositionRangeQuery role (search/spans/
    SpanFirstQuery.java, SpanPositionRangeQuery.java): a match must use
    only positions p with min_start ≤ p < max_end. This is exact for
    both ordered and unordered spans (a span's start is its min
    position and its end-1 its max, so clamping every slot's position
    list to the window is equivalent). SpanFirst(q, end) = max_end=end.
    With bounds set, a single slot is allowed (SpanFirst over one
    SpanTerm)."""
    slots: tuple[Node, ...] = ()
    max_gaps: int = 0
    ordered: bool = False
    min_start: int = 0
    max_end: int | None = None


@dataclass(frozen=True)
class SpanNotNode(Node):
    """Span difference — search/spans/SpanNotQuery.java: matches where
    the INCLUDE span query has a span that does not overlap (within
    `pre` tokens before / `post` tokens after, SpanNotQuery.java:64-66)
    any span of the EXCLUDE query. Both children are IntervalSlotsNode
    (term leaves are wrapped as single-slot intervals). Documented
    deviation: our span streams are the MINIMAL match intervals, which
    is sound and complete for the exists-a-non-overlapping-span
    question (shrinking a span never adds overlap); Lucene's lazy
    enumeration can emit non-minimal spans but decides the same set of
    docs for pre/post ≥ 0. Match-only: constant score = boost."""
    include: Node | None = None
    exclude: Node | None = None
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class PayloadScoreNode(FieldedNode):
    """PayloadScoreQuery over a single term span —
    queries/payloads/PayloadScoreQuery.java with includeSpanScore=false:
    score = boost · PayloadFunction.docScore over the payloads at the
    term's matching positions. func ∈ {'min','max','sum','avg'}
    ({Min,Max,Sum,Average}PayloadFunction.java — a doc whose positions
    carry NO payloads scores docScore = 1, per those classes' ternary).
    Requires a field indexed with a payload_delimiter analyzer
    (DelimitedPayloadTokenFilter chain)."""
    term: str = ""
    func: str = "max"


@dataclass(frozen=True)
class SpanPayloadCheckNode(FieldedNode):
    """SpanPayloadCheckQuery — queries/payloads/SpanPayloadCheckQuery.java:
    44-191: wrap a span (here the dominant usages — a single SpanTerm or
    an exact-adjacent ordered SpanNear) and keep only the occurrences
    whose position-ordered payload sequence EQUALS `payloads`
    (PayloadChecker.collectLeaf: one expected payload per span position,
    compared in order; a None entry matches a position that carries no
    payload, and the count must come out exact —
    `matches && upto == payloadToMatch.size()`). A doc matches when ≥1
    occurrence survives the check; scored like the underlying span — the
    phrase pseudo-term blended weight over freq = surviving-occurrence
    count (SpanWeight sloppyFreq with slop 0 is 1 per occurrence).
    Payloads are float32 (FloatEncoder channel); requires an index built
    with a payload_delimiter analyzer."""
    terms: tuple[str, ...] = ()
    payloads: tuple[float | None, ...] = ()


@dataclass(frozen=True)
class IntervalFilterNode(Node):
    """Interval containment/overlap algebra — queries/intervals/
    Intervals.java:300-404 (ContainingIntervalsSource,
    NotContainingIntervalsSource, ContainedByIntervalsSource,
    NotContainedByIntervalsSource, OverlappingIntervalsSource,
    NonOverlappingIntervalsSource): filter the SOURCE side's
    minimal-interval stream by the REFERENCE side's. Ops:
      'containing'       — source intervals containing ≥1 reference span
      'not_containing'   — source intervals containing none
      'contained_by'     — source intervals inside some reference span
      'not_contained_by' — source intervals inside none
      'overlapping'      — source intervals overlapping ≥1 reference span
      'non_overlapping'  — source intervals overlapping none
    ref_extend widens every reference span by N positions both sides
    (ExtendedIntervalIterator: [max(0, s−N), e+N]) so that
      within(src, N, ref)    = contained_by + ref_extend=N
      not_within(src, N, ref)= non_overlapping + ref_extend=N
    exactly as Intervals.within/notWithin compose (Intervals.java:333-357).
    Both children are IntervalSlotsNode after planning (term leaves are
    wrapped as single-slot intervals). A doc matches when the filtered
    source stream is non-empty. Filtering one minimal-span list by
    another is exact here: both streams are fully enumerated per doc
    (interval_spans), so no lazy-minimization subtlety applies.
    Match-only: constant score = boost."""
    source: Node | None = None
    reference: Node | None = None
    op: str = "containing"
    ref_extend: int = 0


@dataclass(frozen=True)
class IntervalOrNode(Node):
    """Disjunction interval source — queries/intervals/
    DisjunctionIntervalsSource.java (Intervals.or, Intervals.java:104-131):
    the union of the sub-sources' interval streams, reduced to its
    containment antichain (interval iterators only surface minimal
    intervals; the disjunction's priority-queue merge never emits an
    interval containing another candidate). Sources are any interval
    nodes; term leaves are wrapped as single-slot intervals by the
    planner. Match-only: constant score = boost."""
    sources: tuple[Node, ...] = ()


@dataclass(frozen=True)
class IntervalExtendNode(Node):
    """ExtendedIntervalsSource — Intervals.extend (Intervals.java:254-257;
    ExtendedIntervalIterator.java:53-80): every child interval widened to
    [max(0, start − before), end + after]. Deliberately NOT re-minimized:
    Lucene's extended iterator reports the widened bounds as-is, and the
    clamp at 0 can create nested intervals that containedBy-style
    consumers must see (Intervals.within builds on exactly this); only
    exact duplicates collapse."""
    source: Node | None = None
    before: int = 0
    after: int = 0


@dataclass(frozen=True)
class IntervalMaxWidthNode(Node):
    """FilteredIntervalsSource.MaxWidth — Intervals.maxwidth
    (Intervals.java:222-225): keep child intervals whose width
    end − start + 1 ≤ width (FilteredIntervalsSource.java:68)."""
    source: Node | None = None
    width: int = 0


@dataclass(frozen=True)
class IntervalSeqNode(Node):
    """Ordered/unordered composition over ARBITRARY interval sub-sources
    — OrderedIntervalsSource.java / UnorderedIntervalsSource.java when a
    child is itself a composed source (the all-term-slots case lowers to
    the IntervalSlotsNode fast path instead). Ordered: each child's span
    starts strictly after the previous child's span END
    (OrderedIntervalsSource.java:152 `start() <= end()` skip loop);
    enumeration anchors on child 0's spans and greedily chains the
    earliest admissible span per child (antichain starts and ends are
    co-sorted, so earliest start = earliest end = Lucene's minimizing
    loop). Unordered: minimal windows covering one span from every child
    (the m=n case of the atLeast sweep). gaps = window width − Σ child
    widths (OrderedIntervalsSource.java:160-162; same formula in
    Unordered) — for unordered windows containing several spans of one
    child, the widest contained span is charged (minimal-gaps reading;
    documented deviation, exact for the dominant term-leaf case)."""
    sources: tuple[Node, ...] = ()
    ordered: bool = True
    max_gaps: int = 2 ** 31 - 1


@dataclass(frozen=True)
class IntervalAtLeastNode(Node):
    """MinimumShouldMatchIntervalsSource — Intervals.atLeast
    (Intervals.java:406-419): minimal intervals spanning one interval
    from each of ≥ min_match DISTINCT sub-sources. Enumerated per doc by
    an end-ordered sweep: at each candidate right edge (a sub-interval's
    end), the tightest left edge is the min_match-th largest of the
    per-source best (max) starts among sub-intervals already ended —
    emitting that window per edge and reducing to the containment
    antichain yields exactly the minimal covering set. The planner drops
    sub-sources that expanded to nothing (they can never contribute) and
    rewrites to MatchNone when fewer than min_match remain."""
    sources: tuple[Node, ...] = ()
    min_match: int = 1


@dataclass(frozen=True)
class DocValuesRangeNode(Node):
    """Numeric range over a doc-values/stored column — the
    PointRangeQuery role (document/IntPoint.java newRangeQuery,
    search/PointRangeQuery.java) and the doc-values-verify side of
    IndexOrDocValuesQuery. Evaluated by the SEARCHER, not the kernel:
    the range is lowered to a JVM predicate on the docstats sidecar
    (parquet min/max row-group pruning plays the BKD-tree cell-skip
    role) and applied as a semi-join filter on the text-match result.
    Supported as a top-level FILTER clause or alone (constant score);
    any other position raises at plan time. None bounds are open."""
    column: str = ""
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class DocValuesTermsNode(Node):
    """Set membership over a doc-values/stored column — the
    DocValuesTermsQuery / DocValuesNumbersQuery role
    (sandbox/search/DocValuesTermsQuery.java:63-75,
    sandbox/search/DocValuesNumbersQuery.java:44-55): constant-score
    verification against doc values, the slow-but-selective side of
    IndexOrDocValuesQuery. Same searcher-side lowering as
    DocValuesRangeNode: FILTER-only (never scored), applied as a
    semi-join with an isin predicate the parquet scan can push down."""
    column: str = ""
    values: tuple = ()


@dataclass(frozen=True)
class DocValuesMultiRangeNode(Node):
    """Union of numeric ranges over ONE column — the MultiRangeQuery role
    (sandbox/search/MultiRangeQuery.java:47-75: a disjunction of ranges
    on the same dimension evaluated in one pass). Matches docs whose
    value falls in ANY range; ranges are (lower, upper) CLOSED bounds
    with None = open end (the reference merges overlapping ranges as an
    optimization — semantics are the plain union either way). FILTER-only
    constant score, lowered like the single-range node so the OR-of-
    between predicate pushes into the docstats scan."""
    column: str = ""
    ranges: tuple = ()   # ((lower | None, upper | None), ...)


@dataclass(frozen=True)
class IndriAndNode(FieldedNode):
    """search/IndriAndQuery.java + IndriAndScorer.java:35-61 — the Indri
    log-space AND: iterates the DISJUNCTION of its terms, and scores
    every candidate as Σ boost_t · s_t / Σ boost_t where s_t is the
    IndriDirichlet log-probability of term t in the doc — the term's
    real score when present, its freq-0 smoothing score otherwise
    (TermScorer.smoothingScore:79-81). Terms absent from the whole
    index contribute neither score nor boost (IndriAndWeight builds
    scorers only for terms with postings, IndriAndWeight.java:47-57).
    `boosts` parallels `terms` (all-1 when empty); mu is the Dirichlet
    parameter of IndriDirichletSimilarity (default 2000). Scores are
    negative log-probabilities — top-k still orders correctly (closer
    to 0 = better)."""
    terms: tuple[str, ...] = ()
    boosts: tuple[float, ...] = ()
    mu: float = 2000.0


@dataclass(frozen=True)
class FieldExistsNode(FieldedNode):
    """DocValuesFieldExistsQuery / NormsFieldExistsQuery
    (search/DocValuesFieldExistsQuery.java:35, NormsFieldExistsQuery.java:33):
    matches every doc that has a value for the field. FILTER-only
    constant score, lowered like the other doc-values nodes. For an
    INDEXED text field this is the norms side (the doc's field length
    > 0 — a doc whose field produced zero tokens has no norm); for
    anything else it is a non-null check over the doc-values sidecar,
    honoring committed numeric DV updates (a doc gains existence when
    an update first gives it a value — Lucene's dv-update iterators
    behave the same way)."""


@dataclass(frozen=True)
class MatchAllNode(Node):
    pass


@dataclass(frozen=True)
class MatchNoneNode(Node):
    pass


@dataclass(frozen=True)
class KnnVectorNode(Node):
    """Top-k vector query over an indexed vector field — the
    KnnVectorQuery role (document/VectorField.java + the HNSW searcher;
    search/knnfield.py executes it: per-partition NSW beam + global
    merge). `ef=None` saturates the beam → exact over each shard (the
    oracle-checkable degenerate mode)."""
    field: str = ""
    vector: tuple[float, ...] = ()
    k: int = 10
    ef: int | None = None


@dataclass(frozen=True)
class ConstantScoreNode(Node):
    """search/ConstantScoreQuery.java — wrap, fixed score = boost."""
    child: Node | None = None


@dataclass(frozen=True)
class Clause:
    occur: Occur
    node: Node


@dataclass(frozen=True)
class BooleanNode(Node):
    clauses: tuple[Clause, ...] = ()
    minimum_should_match: int = 0


@dataclass(frozen=True)
class DisjunctionMaxNode(Node):
    """search/DisjunctionMaxQuery.java — max over clauses + tie·Σ(others)."""
    children: tuple[Node, ...] = ()
    tie_breaker: float = 0.0


MAX_CLAUSE_COUNT = 1024  # IndexSearcher.java:83 maxClauseCount guard


def apply_field(node: Node, fld: str, only_default: bool = False) -> Node:
    """Set the target field on every fielded leaf of a subtree — the
    classic parser's `field:(a AND b)` group override and the searcher's
    default-field resolution (only_default=True rewrites only leaves whose
    field is still '' — an explicit inner `other:term` override wins,
    matching QueryParserBase field scoping)."""
    if isinstance(node, IntervalSlotsNode):
        if only_default and node.field:
            return node
        return replace(node, field=fld, slots=tuple(
            apply_field(s, fld, only_default) for s in node.slots))
    if isinstance(node, SpanNotNode):
        return replace(
            node,
            include=apply_field(node.include, fld, only_default),
            exclude=apply_field(node.exclude, fld, only_default))
    if isinstance(node, IntervalFilterNode):
        return replace(
            node,
            source=apply_field(node.source, fld, only_default),
            reference=apply_field(node.reference, fld, only_default))
    if isinstance(node, (IntervalOrNode, IntervalAtLeastNode, IntervalSeqNode)):
        return replace(node, sources=tuple(
            apply_field(s, fld, only_default) for s in node.sources))
    if isinstance(node, (IntervalExtendNode, IntervalMaxWidthNode)):
        return replace(node, source=apply_field(node.source, fld, only_default))
    if isinstance(node, FieldedNode):
        if only_default and node.field:
            return node
        return replace(node, field=fld)
    if isinstance(node, BooleanNode):
        return replace(node, clauses=tuple(
            Clause(c.occur, apply_field(c.node, fld, only_default))
            for c in node.clauses))
    if isinstance(node, DisjunctionMaxNode):
        return replace(node, children=tuple(
            apply_field(c, fld, only_default) for c in node.children))
    if isinstance(node, ConstantScoreNode) and node.child is not None:
        return replace(node, child=apply_field(node.child, fld, only_default))
    return node


def AND(*nodes: Node) -> BooleanNode:
    return BooleanNode(clauses=tuple(Clause(Occur.MUST, n) for n in nodes))


def OR(*nodes: Node) -> BooleanNode:
    return BooleanNode(clauses=tuple(Clause(Occur.SHOULD, n) for n in nodes))


def rewrite(node: Node) -> Node:
    """BooleanQuery.rewrite-style simplification to fixpoint."""
    prev = None
    cur = node
    while cur != prev:
        prev = cur
        cur = _rewrite_once(cur)
    return cur


def _rewrite_once(node: Node) -> Node:
    if isinstance(node, NGramPhraseNode):
        # NGramPhraseQuery.rewrite:46-75 — reader-free, pure plan rewrite
        if node.slop == 0 and node.n >= 2 and len(node.terms) >= 3:
            keep = [i for i in range(len(node.terms))
                    if i % node.n == 0 or i == len(node.terms) - 1]
            return PhraseNode(
                terms=tuple(node.terms[i] for i in keep),
                positions=tuple(keep), field=node.field, boost=node.boost)
        return PhraseNode(terms=node.terms, slop=node.slop,
                          field=node.field, boost=node.boost)
    if isinstance(node, ConstantScoreNode) and node.child is not None:
        child = _rewrite_once(node.child)
        if isinstance(child, MatchNoneNode):
            return MatchNoneNode(boost=node.boost)
        return replace(node, child=child)
    if not isinstance(node, BooleanNode):
        return node
    clauses = [Clause(c.occur, _rewrite_once(c.node)) for c in node.clauses]

    # flatten nested pure-SHOULD disjunctions / pure-MUST conjunctions.
    # SHOULD flattening is only sound when the OUTER msm <= 1: with
    # msm=2, (SHOULD(OR(a,b)), SHOULD(c), msm=2) counts the inner
    # disjunction ONCE, but flattened (a,b,c,msm=2) would count a and b
    # separately (BooleanQuery.rewrite has the same minShouldMatch guard)
    flat: list[Clause] = []
    for c in clauses:
        if isinstance(c.node, BooleanNode) and c.node.boost == 1.0 and c.node.minimum_should_match == 0:
            inner = c.node.clauses
            if (c.occur is Occur.SHOULD
                    and node.minimum_should_match <= 1
                    and all(i.occur is Occur.SHOULD for i in inner)):
                flat.extend(inner)
                continue
            if c.occur is Occur.MUST and all(i.occur is Occur.MUST for i in inner):
                flat.extend(inner)
                continue
        flat.append(c)
    clauses = flat

    # dedup FILTER / MUST_NOT duplicates (BooleanQuery.rewrite dedup)
    seen: set[tuple[Occur, Node]] = set()
    dedup: list[Clause] = []
    for c in clauses:
        key = (c.occur, c.node)
        if c.occur in (Occur.FILTER, Occur.MUST_NOT) and key in seen:
            continue
        seen.add(key)
        dedup.append(c)
    clauses = dedup

    # MatchAll MUST/FILTER clauses are redundant once another positive
    # clause anchors the result set (FILTER: exact; MUST: shifts every
    # hit's score by the constant matchall boost — rank-preserving,
    # documented deviation); keeping them would force the kernel to
    # materialize the whole doc universe
    def _is_ma(c: Clause) -> bool:
        return isinstance(c.node, MatchAllNode) and c.occur in (
            Occur.MUST, Occur.FILTER)
    if any(_is_ma(c) for c in clauses) and any(
            c.occur in (Occur.MUST, Occur.SHOULD, Occur.FILTER)
            and not isinstance(c.node, MatchAllNode) for c in clauses):
        clauses = [c for c in clauses if not _is_ma(c)]

    # MUST x ∧ MUST_NOT x → MatchNone
    must_set = {c.node for c in clauses if c.occur in (Occur.MUST, Occur.FILTER)}
    if any(c.node in must_set for c in clauses if c.occur is Occur.MUST_NOT):
        return MatchNoneNode()

    # drop MatchNone SHOULDs; MatchNone MUST → MatchNone
    kept: list[Clause] = []
    for c in clauses:
        if isinstance(c.node, MatchNoneNode):
            if c.occur in (Occur.MUST, Occur.FILTER):
                return MatchNoneNode()
            continue  # SHOULD/MUST_NOT MatchNone is a no-op
        kept.append(c)
    clauses = kept

    if not clauses:
        return MatchNoneNode()
    # an msm larger than the surviving optional-clause count is
    # unsatisfiable (Lucene rewrites to MatchNoDocs) — checked HERE
    # because MatchNone SHOULD clauses were just dropped and the
    # single-clause unwraps below would otherwise erase the constraint
    n_should = sum(1 for c in clauses if c.occur is Occur.SHOULD)
    if node.minimum_should_match > n_should:
        return MatchNoneNode()
    # single positive clause unwrap (keeps semantics when no minimum_should_match)
    if (
        len(clauses) == 1
        and node.minimum_should_match <= 1
        and clauses[0].occur in (Occur.MUST, Occur.SHOULD)
        and node.boost == 1.0
    ):
        return clauses[0].node
    if len(clauses) == 1 and clauses[0].occur in (Occur.FILTER,) and node.boost == 1.0:
        return ConstantScoreNode(child=clauses[0].node, boost=0.0)
    # pure-negative query matches nothing (Lucene requires a positive clause)
    if all(c.occur is Occur.MUST_NOT for c in clauses):
        return MatchNoneNode()
    return replace(node, clauses=tuple(clauses))
