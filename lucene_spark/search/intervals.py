"""Public constructors for the minimal-interval algebra — the
Intervals.java factory surface (lucene/queries/src/java/org/apache/
lucene/queries/intervals/Intervals.java). Sources (term / ordered /
unordered + maxgaps) build plan.IntervalSlotsNode; the filter
combinators (containing / notContaining / containedBy / notContainedBy
/ overlapping / nonOverlapping / within / notWithin,
Intervals.java:300-404) build plan.IntervalFilterNode. Every node runs
through IndexSearcher.search()/matches() like any other query plan.

Term arguments may be plain strings (wrapped as single-slot sources) or
already-built sources; multi-term slot alternatives (the or() role over
term leaves) can be passed as tuples of strings.
"""

from __future__ import annotations

from lucene_spark.search import plan as P

__all__ = [
    "term", "ordered", "unordered", "phrase", "or_", "prefix", "wildcard",
    "maxwidth", "extend", "at_least", "before", "after",
    "containing", "not_containing",
    "contained_by", "not_contained_by", "overlapping", "non_overlapping",
    "within", "not_within",
]


def _slot(x) -> P.Node:
    if isinstance(x, str):
        return P.TermNode(term=x)
    if isinstance(x, tuple):
        return P.TermInSetNode(terms=tuple(x))
    if isinstance(x, P.Node):
        return x
    raise TypeError(f"interval slot must be str/tuple/Node, got {x!r}")


def term(t: str, field: str = "") -> P.IntervalSlotsNode:
    """Intervals.term — a single-term interval source."""
    return P.IntervalSlotsNode(slots=(P.TermNode(term=t),), field=field)


def _slotlike(x) -> bool:
    """Arguments lowerable to the single-postings-scan slot fast path —
    term-set leaves; composed sources take the IntervalSeqNode span path."""
    return isinstance(x, (str, tuple, P.TermNode, P.TermInSetNode,
                          P.PrefixNode, P.RegexpNode, P.FuzzyNode))


def _seq_sources(slots, field: str) -> tuple[P.Node, ...]:
    """Wrap sequence children; an explicit field= override reaches every
    leaf, matching the slots fast path (whose eval reads the NODE's
    field for all slots — Intervals.fixField role)."""
    srcs = tuple(_src(s) for s in slots)
    if field:
        srcs = tuple(P.apply_field(s, field) for s in srcs)
    return srcs


def ordered(*slots, max_gaps: int = 2 ** 31 - 1, field: str = "") -> P.Node:
    """Intervals.ordered (+ maxgaps filter when bounded) — sub-sources in
    strictly increasing position order (each starting after the previous
    ends, OrderedIntervalsSource.java:152). Lucene's bare ordered() has
    no width bound, hence the unbounded default. Term-set arguments take
    the slot fast path; composed sources (or/phrase/extend/...) build
    the general sequence node."""
    if all(_slotlike(s) for s in slots):
        return P.IntervalSlotsNode(slots=tuple(_slot(s) for s in slots),
                                   max_gaps=max_gaps, ordered=True, field=field)
    return P.IntervalSeqNode(sources=_seq_sources(slots, field),
                             ordered=True, max_gaps=max_gaps)


def unordered(*slots, max_gaps: int = 2 ** 31 - 1, field: str = "") -> P.Node:
    """Intervals.unordered (+ maxgaps) — any arrangement, overlaps
    allowed; same fast-path/sequence dispatch as ordered()."""
    if all(_slotlike(s) for s in slots):
        return P.IntervalSlotsNode(slots=tuple(_slot(s) for s in slots),
                                   max_gaps=max_gaps, ordered=False, field=field)
    return P.IntervalSeqNode(sources=_seq_sources(slots, field),
                             ordered=False, max_gaps=max_gaps)


def _src(x) -> P.Node:
    if isinstance(x, str):
        return term(x)
    if isinstance(x, tuple):
        return P.IntervalSlotsNode(slots=(P.TermInSetNode(terms=tuple(x)),))
    return x


def phrase(*slots, field: str = "") -> P.Node:
    """Intervals.phrase (Intervals.java:78-101) — a block interval: the
    slots at strictly consecutive positions (ordered with zero total
    gaps; BlockIntervalsSource role)."""
    return ordered(*slots, max_gaps=0, field=field)


def or_(*sources) -> P.IntervalOrNode:
    """Intervals.or (Intervals.java:104-131) — the disjunction of the
    sub-sources' interval streams (DisjunctionIntervalsSource)."""
    return P.IntervalOrNode(sources=tuple(_src(s) for s in sources))


def prefix(pfx: str, field: str = "") -> P.IntervalSlotsNode:
    """Intervals.prefix (Intervals.java:140-163) — intervals over every
    dictionary term starting with `pfx` (expanded at plan time, like
    the query surface's PrefixNode)."""
    return P.IntervalSlotsNode(slots=(P.PrefixNode(prefix=pfx, field=field),),
                               field=field)


def wildcard(pattern: str, field: str = "") -> P.IntervalSlotsNode:
    """Intervals.wildcard (Intervals.java:166-193) — intervals over the
    dictionary terms matching a `*`/`?` wildcard (anchored-regex
    expansion, WildcardQuery.java translation)."""
    return P.IntervalSlotsNode(
        slots=(P.RegexpNode(pattern=P.wildcard_regexp(pattern), field=field),),
        field=field)


def maxwidth(width: int, source) -> P.IntervalMaxWidthNode:
    """Intervals.maxwidth (Intervals.java:222-225) — keep source
    intervals with end − start + 1 ≤ width."""
    return P.IntervalMaxWidthNode(source=_src(source), width=int(width))


def extend(source, before_: int, after_: int) -> P.IntervalExtendNode:
    """Intervals.extend (Intervals.java:254-257) — widen every source
    interval to [max(0, start − before_), end + after_]; useful for
    defined gaps in a block: phrase(a, extend(b, 0, 2), c)."""
    return P.IntervalExtendNode(source=_src(source), before=int(before_),
                                after=int(after_))


def at_least(min_match: int, *sources) -> P.Node:
    """Intervals.atLeast (Intervals.java:406-419) — minimal intervals
    spanning combinations of intervals from ≥ min_match of the sources
    (MinimumShouldMatchIntervalsSource; > len(sources) is the
    NoMatchIntervalsSource arm)."""
    if min_match < 1:
        raise ValueError(f"minShouldMatch must be ≥1, got {min_match}")
    if min_match > len(sources):
        return P.MatchNoneNode()
    return P.IntervalAtLeastNode(sources=tuple(_src(s) for s in sources),
                                 min_match=int(min_match))


def before(source, reference) -> P.IntervalFilterNode:
    """Intervals.before (Intervals.java:421-424) — source intervals that
    appear before some reference interval (end ≤ max(0, ref.start − 1),
    the clamped OffsetIntervalsSource window)."""
    return P.IntervalFilterNode(source=_src(source), reference=_src(reference),
                                op="before")


def after(source, reference) -> P.IntervalFilterNode:
    """Intervals.after (Intervals.java:427-430) — source intervals that
    appear after some reference interval (start ≥ ref.end + 1)."""
    return P.IntervalFilterNode(source=_src(source), reference=_src(reference),
                                op="after")


def containing(big, small) -> P.IntervalFilterNode:
    """Intervals.containing — big's spans that contain ≥1 small span."""
    return P.IntervalFilterNode(source=_src(big), reference=_src(small),
                                op="containing")


def not_containing(minuend, subtrahend) -> P.IntervalFilterNode:
    """Intervals.notContaining — minuend spans containing no subtrahend span."""
    return P.IntervalFilterNode(source=_src(minuend), reference=_src(subtrahend),
                                op="not_containing")


def contained_by(small, big) -> P.IntervalFilterNode:
    """Intervals.containedBy — small's spans inside some big span."""
    return P.IntervalFilterNode(source=_src(small), reference=_src(big),
                                op="contained_by")


def not_contained_by(small, big) -> P.IntervalFilterNode:
    """Intervals.notContainedBy — small's spans inside no big span."""
    return P.IntervalFilterNode(source=_src(small), reference=_src(big),
                                op="not_contained_by")


def overlapping(source, reference) -> P.IntervalFilterNode:
    """Intervals.overlapping — source spans overlapping ≥1 reference span."""
    return P.IntervalFilterNode(source=_src(source), reference=_src(reference),
                                op="overlapping")


def non_overlapping(minuend, subtrahend) -> P.IntervalFilterNode:
    """Intervals.nonOverlapping — minuend spans overlapping none."""
    return P.IntervalFilterNode(source=_src(minuend), reference=_src(subtrahend),
                                op="non_overlapping")


def within(source, positions: int, reference) -> P.IntervalFilterNode:
    """Intervals.within = containedBy(source, extend(reference, N, N))
    (Intervals.java:348-351)."""
    return P.IntervalFilterNode(source=_src(source), reference=_src(reference),
                                op="contained_by", ref_extend=int(positions))


def not_within(minuend, positions: int, subtrahend) -> P.IntervalFilterNode:
    """Intervals.notWithin = nonOverlapping(minuend, extend(subtrahend, N, N))
    (Intervals.java:333-342)."""
    return P.IntervalFilterNode(source=_src(minuend), reference=_src(subtrahend),
                                op="non_overlapping", ref_extend=int(positions))
