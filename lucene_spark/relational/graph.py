"""Graph traversal streams — Solr streaming-expression graph surface.

Role analogue (solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/):
- ``gatherNodes`` / ``nodes`` (GatherNodesStream.java): breadth-first
  node gathering along from-field -> to-field edges, one hop per call,
  chainable; per-node edge metrics (count(*), sum/avg/min/max over edge
  tuple fields), ancestor tracking (trackTraversal), BRANCHES/LEAVES
  scatter (Traversal.java Scatter enum, TraversalIterator.java).
- ``scoreNodes`` (ScoreNodesStream.java:225-245): tf-idf significance
  scoring of gathered nodes against the collection's term statistics.
- ``shortestPath`` (ShortestPathStream.java:293-414): iterative BFS with
  per-level parent sets, cycle pruning against every earlier level
  (ShortestPathStream.cycle), stop at the first depth that reaches the
  target, then walk the parent maps backwards to enumerate ALL distinct
  shortest paths.

Spark shape: each hop is ONE distributed join edges ⋈ frontier (the
reference issues the same join as batched Solr /export queries —
JoinRunner), a distinct, and an anti-join against the visited set.  The
driver only orchestrates the loop and checks frontier emptiness; node
sets, parent maps and metric contributions stay DataFrames end to end,
so the traversal scales with the cluster, not the driver.  Frontiers are
persisted per level to stop lineage growth across hops (an O(depth)
chain of joins otherwise re-plans the whole history every iteration).

Visited semantics are the reference's: node identity is one GLOBAL id
space across hops (Traversal.visited checks every level by bare node
id, Traversal.java:49-58) — callers walking heterogeneous collections
should prefix ids ("c:123", "o:456") exactly as multi-collection Solr
expressions do with distinct key fields.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


class Traversal:
    """Chained gatherNodes traversal (GatherNodesStream + Traversal roles).

    ``roots`` seed level 0.  Each :meth:`gather` call adds one level:
    nodes reached by edges whose ``from_col`` is in the previous level
    and that were never seen at ANY earlier level (Traversal.visited).
    Edge tuples that reach an already-visited node still accrue to that
    node's ancestors/metrics at its first-seen level — the reference
    updates the existing Node object in place (Node.add via
    Traversal.visited) — so emission aggregates every contribution
    regardless of the hop it arrived in.
    """

    def __init__(self, roots: DataFrame, node_col: str = "node",
                 track_traversal: bool = False) -> None:
        self.track = track_traversal
        r = roots.select(F.col(node_col).cast("string").alias("node")).distinct()
        r = r.persist(StorageLevel.MEMORY_AND_DISK)
        self._levels: list[DataFrame] = [r]
        self._visited: DataFrame = r
        # (node, ancestor, metric value columns...) — one row per gathered
        # edge tuple, tagged with the hop that produced it.
        self._contribs: list[DataFrame] = []
        self._metric_cols: list[str] = []

    # -- gather ----------------------------------------------------------
    def gather(self, edges: DataFrame, from_col: str, to_col: str,
               metrics: Sequence[tuple[str, str]] = ()) -> "Traversal":
        """One gatherNodes hop.  ``metrics`` are (agg, column) pairs with
        agg in {sum, avg, min, max}; count(*) is always computed (the
        reference's CountMetric over gathered edge tuples)."""
        frontier = self._levels[-1]
        cols = [F.col(to_col).cast("string").alias("node"),
                F.col(from_col).cast("string").alias("ancestor")]
        for agg, c in metrics:
            name = f"{agg}_{c}"
            if name not in self._metric_cols:
                self._metric_cols.append(name)
            cols.append(F.col(c).cast("double").alias(name))
        hit = (edges.join(frontier.withColumnRenamed("node", "__from"),
                          F.col(from_col).cast("string") == F.col("__from"))
               .select(*cols))
        self._contribs.append(hit)
        new_nodes = (hit.select("node").distinct()
                     .join(self._visited, "node", "left_anti")
                     .persist(StorageLevel.MEMORY_AND_DISK))
        self._levels.append(new_nodes)
        self._visited = self._visited.unionByName(new_nodes)
        return self

    @property
    def depth(self) -> int:
        return len(self._levels) - 1

    # -- emit -------------------------------------------------------------
    def nodes(self, scatter: Sequence[str] = ("leaves",)) -> DataFrame:
        """Emit tuples per Node.toTuple: node, level, count(*) metric,
        optional field metrics, and (trackTraversal) ancestors as a
        sorted list plus num_ancestors.  scatter ⊆ {branches, leaves}:
        LEAVES = the final level (the default), BRANCHES = every earlier
        level including the roots (TraversalIterator.java)."""
        want: list[int] = []
        s = {x.lower() for x in scatter}
        if "branches" in s:
            want.extend(range(0, self.depth))
        if "leaves" in s:
            want.append(self.depth)
        lvl_map = None
        for i, lv in enumerate(self._levels):
            tagged = lv.withColumn("level", F.lit(i))
            lvl_map = tagged if lvl_map is None else lvl_map.unionByName(tagged)
        contribs = None
        for c in self._contribs:
            for m in self._metric_cols:  # align hop schemas
                if m not in c.columns:
                    c = c.withColumn(m, F.lit(None).cast("double"))
            c = c.select("node", "ancestor", *self._metric_cols)
            contribs = c if contribs is None else contribs.unionByName(c)
        aggs = [F.count("*").alias("count")]
        for m in self._metric_cols:
            agg = m.split("_", 1)[0]
            aggs.append(getattr(F, agg)(m).alias(m))
        if self.track:
            aggs.append(F.array_sort(F.collect_set("ancestor")).alias("ancestors"))
        if contribs is not None:
            per_node = contribs.groupBy("node").agg(*aggs)
            out = lvl_map.join(per_node, "node", "left")
        else:
            out = lvl_map.withColumn("count", F.lit(0).cast("long"))
            if self.track:
                out = out.withColumn(
                    "ancestors", F.array().cast("array<string>"))
        out = out.filter(F.col("level").isin(want) if want else F.lit(False))
        # roots gathered by no edge: count 0, empty ancestors
        out = out.withColumn("count", F.coalesce("count", F.lit(0)))
        if self.track:
            out = out.withColumn(
                "ancestors",
                F.coalesce("ancestors", F.array().cast("array<string>")))
            out = out.withColumn("num_ancestors", F.size("ancestors"))
        return out

    def close(self) -> None:
        """Release every cached level — call once the emitted DataFrames
        are consumed (or use :func:`gather_nodes`, which materializes and
        closes for you); a long-lived session otherwise accumulates dead
        cached frontiers."""
        for lv in self._levels:
            lv.unpersist()


def gather_nodes(roots: DataFrame, edges: DataFrame, from_col: str,
                 to_col: str, metrics: Sequence[tuple[str, str]] = (),
                 track_traversal: bool = False,
                 node_col: str = "node") -> DataFrame:
    """Single-hop gatherNodes convenience (scatter=LEAVES default).
    Materializes the result (localCheckpoint) and releases the
    traversal's cached levels before returning."""
    t = Traversal(roots, node_col=node_col, track_traversal=track_traversal)
    out = (t.gather(edges, from_col, to_col, metrics).nodes()
           .localCheckpoint(eager=True))
    t.close()
    return out


def score_nodes(nodes: DataFrame, collection: DataFrame, field: str,
                term_freq_col: str = "count") -> DataFrame:
    """scoreNodes streaming expression (solrj/io/stream/
    ScoreNodesStream.java:225-245): tf-idf significance of gathered
    nodes.  docFreq = how many ``collection`` rows carry the node id in
    ``field`` (the reference asks the /terms handler), numDocs = the
    collection size, termFreq = the gather metric (count(*) by default),
    and per line 242::

        nodeScore = float32(ln(termFreq) + 1) * float32(ln((numDocs + 1)
                    / (docFreq + 1)) + 1)

    Nodes gathered from the collection's own edges always have a terms
    entry, so the docFreq join is inner (the reference throws when a
    term is missing from the response).
    """
    num_docs = collection.count()
    dfreq = (collection
             .groupBy(F.col(field).cast("string").alias("node"))
             .agg(F.count(F.lit(1)).alias("docFreq")))
    tf = F.col(term_freq_col).cast("double")
    idf = (F.log((F.lit(float(num_docs)) + 1.0)
                 / (F.col("docFreq").cast("double") + 1.0)) + 1.0)
    score = ((F.log(tf) + 1.0).cast("float") * idf.cast("float")).cast("float")
    return (nodes.join(dfreq, "node")
            .withColumn("numDocs", F.lit(num_docs))
            .withColumn("nodeScore", score))


def shortest_path(edges: DataFrame, from_node, to_node, from_col: str = "src",
                  to_col: str = "dst", max_depth: int = 6) -> DataFrame:
    """All shortest paths from ``from_node`` to ``to_node`` —
    ShortestPathStream.java:293-414 semantics: BFS expands the whole
    frontier one depth per iteration; an edge into a node already seen
    at ANY earlier depth is pruned (cycle), an edge into the target is
    always recorded; the loop stops at the first depth with a hit (or at
    max_depth edges), then every distinct path is reconstructed by
    walking the per-level parent sets backwards.

    Returns DataFrame(path array<string>, path_str, length) — one row
    per distinct shortest path, empty if unreachable within max_depth.
    """
    spark = edges.sparkSession
    src = F.col(from_col).cast("string").alias("parent")
    dst = F.col(to_col).cast("string").alias("node")
    e = edges.select(src, dst)
    start = str(from_node)
    target = str(to_node)
    frontier = spark.createDataFrame([(start,)], "node string")
    visited = frontier
    levels: list[DataFrame] = []   # (node, parent) pairs per depth 1..d
    cached: list[DataFrame] = []   # everything persisted, released at end
    found = False
    try:
        for _ in range(max_depth):
            cand = (e.join(frontier.withColumnRenamed("node", "parent"),
                           "parent")
                    .select("node", "parent").distinct())
            nxt = (cand.filter(F.col("node") != target)
                   .join(visited, "node", "left_anti")
                   .unionByName(cand.filter(F.col("node") == target))
                   .persist(StorageLevel.MEMORY_AND_DISK))
            levels.append(nxt)
            cached.append(nxt)
            found = bool(nxt.filter(F.col("node") == target).limit(1).count())
            frontier = nxt.select("node").distinct()
            visited = visited.unionByName(frontier).distinct() \
                             .persist(StorageLevel.MEMORY_AND_DISK)
            cached.append(visited)
            if found or not frontier.limit(1).count():
                break
        if not found:
            return spark.createDataFrame(
                [], "path array<string>, path_str string, length int")
        # backward reconstruction over exact-depth parent maps: the head of
        # a partial path at step i is a node at depth d-i, found only in
        # that level's pairs (the reference walks allVisited newest-first
        # and a level without the head leaves the path unchanged).
        paths = (levels[-1].filter(F.col("node") == target)
                 .select(F.col("parent").alias("__head"),
                         F.array(F.lit(target)).alias("path")))
        for lv in reversed(levels[:-1]):
            paths = (paths.join(lv, paths["__head"] == lv["node"])
                     .select(F.col("parent").alias("__head"),
                             F.concat(F.array(F.col("node")), F.col("path"))
                             .alias("path")))
        out = (paths.select(
            F.concat(F.array(F.lit(start)), F.col("path")).alias("path"))
            .distinct()
            .withColumn("path_str", F.concat_ws("->", "path"))
            .withColumn("length", (F.size("path") - 1).cast("int")))
        # materialize (shortest-path sets are small by construction) so the
        # caches can be dropped without the caller re-running the BFS
        return out.localCheckpoint(eager=True)
    finally:
        for df in cached:
            df.unpersist()
