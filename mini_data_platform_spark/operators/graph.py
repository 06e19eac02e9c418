"""Connected components over a near-duplicate pair graph — the dedup
ENDGAME: pairwise similarity (dedup_fuzzy) says "these two match";
components turn matches into duplicate CLUSTERS so exactly one canonical
document survives per cluster (transitively: A~B and B~C dedup together
even when A~C was never scored).

Algorithm: iterative min-label propagation — every vertex starts labeled
with its own id; each round every vertex takes the min of its label and
its neighbors' labels; fixpoint = component minimum everywhere. This is
the standard large-graph formulation (alternating small-star/large-star
is the same idea with better constants): each round is ONE join + ONE
min-aggregate, both shuffling on vertex id — no adjacency matrices, no
driver-side graph. Rounds needed = graph diameter; near-dup graphs are
piles of small cliques (diameter ~2-3), so the loop converges in a
handful of rounds. Convergence is detected with a 1-row aggregate per
round (bounded driver traffic), and ``max_iter`` caps pathological
chains.

The result is engine-independent (THE components, however computed),
which is what makes an SQL oracle possible: DuckDB reproduces the
labeling with a recursive reachability CTE + MIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``pairs``, where
    component = the minimum vertex id reachable through the undirected
    pair graph. Deterministic and engine-independent."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # PERSIST the symmetrized edge list: it is consumed once per
    # propagation round, and its lineage is whatever produced ``pairs`` —
    # for near-dup graphs that is the whole MinHash→LSH→Jaccard pipeline,
    # which would otherwise be recomputed EVERY round (measured 10×
    # slowdown at sf0.1). The edge frame itself is tiny relative to the
    # corpus (one row per duplicate pair), so caching it is the 100 TB
    # design too.
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .persist()
    )
    # labels only ever DECREASE, so the global sum is strictly monotone
    # until fixpoint: one 1-row aggregate per round detects convergence
    cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label in the race
        msgs = sym.join(labels, sym["src"] == labels["v"]).select(
            F.col("dst").alias("v"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        new_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == cur_sum:
            break
        cur_sum = new_sum
    # the final labels are materialized in cache (the convergence agg ran
    # on them), so the edge cache is no longer needed by consumers
    sym.unpersist()
    return labels.select(F.col("v"), F.col("comp"))


def sql_connected_components(pairs_cte: str) -> str:
    """DuckDB twin: recursive reachability closure + MIN per vertex.
    ``pairs_cte`` must select columns (id_a, id_b). UNION (not ALL)
    dedupes the frontier, so the recursion terminates on cyclic graphs."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_cte}),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(v, c) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.c FROM reach r JOIN edges e ON e.src = r.v
        )
        SELECT v, MIN(c) AS comp FROM reach GROUP BY v
    """
