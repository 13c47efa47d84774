"""Canonicalization: connected components over the alias/duplicate graph.

North-rule stage "connected-components canonicalization via iterative
hash-join label propagation". Catalyst has no iteration, so the driver runs
a loop of DataFrame self-joins (SURVEY.md §4 item 2):

- min-label propagation: every node's label becomes the min label in its
  closed neighborhood; converges in O(graph diameter) rounds. Alias graphs
  are star-shaped (duplicates point at canonicals), so diameter is small;
  for adversarial long-chain graphs switch to large/small-star (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14) — same loop
  skeleton, different expansion.
- each round is a shuffle on node id; ``localCheckpoint`` every
  ``checkpoint_every`` rounds truncates the lineage so plans don't grow
  exponentially at 10^12-edge scale.
- convergence = zero changed labels, computed with a join + count (an
  aggregate, not a collect of the data itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 3,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(src, dst) undirected edges → (id, canon_id) with canon_id = min
    member id of each component.

    Hybrid execution: if the (deduplicated) edge list fits comfortably on
    the driver (≤ ``driver_threshold`` edges — the alias/duplicate graphs of
    a KG run are orders of magnitude smaller than the mention table), run
    union-find locally and broadcast the result: identical output, zero
    iterative Spark jobs. Larger graphs take the distributed label-
    propagation loop. Set ``driver_threshold=0`` to force the distributed
    path (the tests exercise both).
    """
    if driver_threshold > 0:
        # single job: fetch up to threshold+1 rows; fall through if more
        sample = (
            edges.select(src, dst).where(F.col(src) != F.col(dst)).take(driver_threshold + 1)
        )
        if len(sample) <= driver_threshold:
            comp = _union_find_min_label([(r[0], r[1]) for r in sample])
            if not comp:
                return edges.sparkSession.createDataFrame(
                    [], f"id {dict(edges.dtypes)[src]}, canon_id {dict(edges.dtypes)[dst]}"
                )
            return edges.sparkSession.createDataFrame(
                list(comp.items()), ["id", "canon_id"]
            )
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for i in range(max_iter):
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .select(F.col("a").alias("id"), "label")
        )
        new_labels = (
            labels.select("id", "label")
            .union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("canon_id"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14): converges
    in O(log n) rounds even on adversarial long-chain graphs, where plain
    min-label propagation needs O(diameter) rounds. Each round is two
    groupBy-min joins — pure DataFrame ops, checkpointed to truncate lineage.

    Returns (id, canon_id) for every node that appears in a (non-self) edge,
    canon_id = min member id — identical output to ``connected_components``
    (equivalence is a test).
    """

    def large_star(e: DataFrame) -> DataFrame:
        # symmetric neighborhoods; for each center a: m = min(N(a) ∪ {a});
        # re-link strictly-larger neighbors to m
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        return (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient high→low; for each center a: m = min(N(a) ∪ {a});
        # link every lower neighbor AND the center itself to m
        oriented = e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).where(F.col("a") != F.col("b"))
        mins = oriented.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        relinked = oriented.join(mins, "a").select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        centers = mins.select(F.col("a"), F.col("m").alias("b"))
        return (
            relinked.union(centers)
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for i in range(max_iter):
        new_e = small_star(large_star(e))
        new_e = new_e.localCheckpoint()  # truncate lineage every round
        # converged when the star edge set is stable: equal cardinality and
        # no edge in new∖old (two cheap distributed checks, no data collect)
        changed = (
            new_e.count() != e.count() or new_e.exceptAll(e).limit(1).count() > 0
        )
        e = new_e
        if not changed:
            break
    # final star: every node points at its component min; the roots
    # themselves map to their own id
    members = e.select(F.col("a").alias("id"), F.col("b").alias("canon_id"))
    roots = e.select(F.col("b").alias("id")).distinct().withColumn("canon_id", F.col("id"))
    return members.union(roots).distinct()


def _union_find_min_label(pairs: list[tuple]) -> dict:
    """Union-find with min-label roots; same result as converged min-label
    propagation. Nodes appearing only in self-loops are excluded upstream."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def canonicalize_entities(
    linked: DataFrame,
    canon_edges: DataFrame,
) -> DataFrame:
    """linked mentions (entity_id) + duplicate edges → + canon_id column.

    Entities not in any duplicate component are their own canonicals. The
    component map is tiny relative to mentions → broadcast join.
    """
    components = connected_components(canon_edges)
    return (
        linked.join(
            F.broadcast(components.withColumnRenamed("id", "entity_id")),
            "entity_id",
            "left",
        )
        .withColumn("canon_id", F.coalesce(F.col("canon_id"), F.col("entity_id")))
    )
