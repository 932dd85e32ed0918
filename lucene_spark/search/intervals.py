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
    "term", "ordered", "unordered", "containing", "not_containing",
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


def ordered(*slots, max_gaps: int = 2 ** 31 - 1,
            field: str = "") -> P.IntervalSlotsNode:
    """Intervals.ordered (+ maxgaps filter when bounded) — slots in
    strictly increasing position order. Lucene's bare ordered() has no
    width bound, hence the unbounded default."""
    return P.IntervalSlotsNode(slots=tuple(_slot(s) for s in slots),
                               max_gaps=max_gaps, ordered=True, field=field)


def unordered(*slots, max_gaps: int = 2 ** 31 - 1,
              field: str = "") -> P.IntervalSlotsNode:
    """Intervals.unordered (+ maxgaps) — any arrangement, overlaps allowed."""
    return P.IntervalSlotsNode(slots=tuple(_slot(s) for s in slots),
                               max_gaps=max_gaps, ordered=False, field=field)


def _src(x) -> P.Node:
    return term(x) if isinstance(x, str) else x


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
