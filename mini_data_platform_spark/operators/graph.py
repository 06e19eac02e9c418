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

import warnings

from pyspark.sql import DataFrame, functions as F

from mini_data_platform_spark.operators.resources import release_plan


def _release_checkpoint(df: DataFrame) -> None:
    """Best-effort release of a ``localCheckpoint``'ed frame's blocks.

    A localCheckpoint materializes the frame as persisted RDD blocks whose
    logical plan is a ``LogicalRDD``; ``DataFrame.unpersist`` does NOT free
    those (it only touches the SQL cache manager), so superseded per-round
    label frames would otherwise sit in executor storage until driver GC +
    ContextCleaner got around to them — up to ``max_iter`` copies. Reach
    the underlying RDD via py4j and unpersist it directly; swallow every
    failure (a missed release degrades to the old GC behavior, never
    correctness)."""
    try:
        spark = df.sparkSession
        # unpersisting a localCheckpoint'ed RDD logs a WARN per block
        # ("lineage has been truncated...") — expected here by design (the
        # released frame is dead). Mute that logger ONLY around the
        # unpersist call and restore its previous effective level after:
        # nearly every Spark RDD is a MapPartitionsRDD, so a session-wide
        # mute would also silence genuine warnings (block loss/recompute)
        # from unrelated code for the rest of the session.
        jvm = spark._jvm
        logger_name = "org.apache.spark.rdd.MapPartitionsRDD"
        prev_level = None
        try:
            prev_level = jvm.org.apache.logging.log4j.LogManager.getLogger(
                logger_name
            ).getLevel()
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                logger_name, jvm.org.apache.logging.log4j.Level.ERROR
            )
        except Exception:  # noqa: BLE001 — logging cosmetics, never fatal
            prev_level = None
        try:
            # the checkpointed RDD lives on a LogicalRDD LEAF; the frame
            # handed in may wrap it in projections (connected_components
            # returns labels.select(...)), so walk every leaf rather than
            # assuming the root is the LogicalRDD itself
            leaves = df._jdf.queryExecution().logical().collectLeaves().iterator()
            while leaves.hasNext():
                leaf = leaves.next()
                try:
                    leaf.rdd().unpersist(False)
                except Exception:  # noqa: BLE001 — non-RDD leaf (scan etc.)
                    pass
        finally:
            if prev_level is not None:
                try:
                    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                        logger_name, prev_level
                    )
                except Exception:  # noqa: BLE001
                    pass
    except Exception:  # noqa: BLE001 — cleanup is advisory
        pass


#: edge-count ceiling for the single-task union-find path: 2M edges ≈
#: 32 MB of (long, long) pairs in one task — far under executor memory,
#: far over any dedup graph the fixtures produce.
LOCAL_CC_MAX_EDGES = 2_000_000


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "auto",
    local_edges_max: int = LOCAL_CC_MAX_EDGES,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``pairs``, where
    component = the minimum vertex id reachable through the undirected
    pair graph. Deterministic and engine-independent.

    ``algorithm``:
    - ``"auto"`` (default): count the (checkpointed) edge list — a
      near-dup graph's edges are orders of magnitude smaller than the
      corpus — and run ``"local"`` when it fits one task
      (``local_edges_max``), else ``"label"``. Round-9 change: the
      emb_dup_clusters creep (r8 verdict item 4) profiled to the LOOP,
      not the pairs — the sf0.1 cosine graph has ~16-hop chains, so
      label propagation paid 16 × ~0.45 s of per-round job overhead on
      a 920-edge graph. Distributed iteration is the wrong physical
      plan for an edge list this small, at any corpus scale.
    - ``"local"``: single-task union-find (min-id roots, path
      compression) via one mapInPandas over the coalesced edge list —
      ONE job, zero iterative shuffles. Exactly the sketch-sized-state
      doctrine, executor-side instead of driver-side.
    - ``"label"``: min-label propagation — one join + one
      min-aggregate per round, rounds = graph diameter. The right
      distributed choice for piles of small cliques (diameter ~2-3).
    - ``"star"``: alternating large-star/small-star contraction (Kiveris
      et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
      rounds = O(log² n) INDEPENDENT of diameter, at ~2 aggregates + 2
      joins per round. The distributed scale path when components can be
      long chains beyond the local ceiling.
    All variants produce THE components (min reachable id), so they
    share the SQL oracle."""
    if algorithm == "star":
        return _connected_components_star(pairs, id_a, id_b, max_iter)
    if algorithm not in ("label", "auto", "local"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    # CHECKPOINT (not merely persist) the edge list: each propagation
    # round builds a NEW plan on top of the previous round's labels, so
    # without lineage truncation the plan tree doubles every round —
    # whatever produced ``pairs`` (for near-dup graphs the whole
    # MinHash→LSH→Jaccard pipeline) gets re-executed exponentially many
    # times, and deep chains overflow the JVM stack just RENDERING the
    # plan. ``localCheckpoint`` materializes to executor-local blocks and
    # cuts the lineage, so every round's plan is one join + one aggregate
    # over flat scans — the same reason GraphX/GraphFrames checkpoint
    # every N Pregel rounds. The edge frame is tiny relative to the
    # corpus (one row per duplicate pair), so this is the 100 TB design
    # too (on a real cluster with lost-executor risk, swap for
    # ``checkpoint()`` against a reliable store).
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint()
    # the input plan has now EXECUTED (localCheckpoint is eager): frames
    # persisted on its behalf (near_dup_pairs' shingle/candidate caches —
    # operators/resources.py) are dead weight from here on. Releasing is
    # correctness-neutral; a caller reusing ``pairs`` afterwards merely
    # recomputes without the cache.
    release_plan(pairs)
    if algorithm == "local":
        return _connected_components_local(edges)
    if algorithm == "auto":
        # counting the checkpointed blocks is one cheap scan-only job
        n_edges = edges.count()
        if n_edges <= local_edges_max:
            out = _connected_components_local(edges)
            # thread the known edge count to the caller (the
            # ``_mdp_row_bound`` doctrine): a graph small enough for
            # single-task union-find has ≤ 2·n_edges vertices, so
            # consumers can safely broadcast-hint frames derived from
            # the labels (e.g. the dedup anti-join's dupes side)
            # without an extra count job. Absent on the distributed
            # paths, where no such bound is known.
            out._mdp_edge_count = n_edges
            return out
    # union of two scans over the checkpointed blocks — shallow lineage,
    # cheap to re-read each round, no extra storage needed
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # initialize at the ROUND-1 state directly: v's label = min(v, its
    # neighbors) needs no join from identity labels — one aggregation
    # over the edge list replaces the first propagation round (one fewer
    # join+checkpoint+collect cycle; matters when every near-dup query
    # pays the loop's fixed cost)
    labels = (
        sym.select(F.col("src").alias("v"), F.col("dst").alias("comp"))
        .unionByName(sym.select(F.col("src").alias("v"), F.col("src").alias("comp")))
        .groupBy("v")
        .agg(F.min("comp").alias("comp"))
        .localCheckpoint(eager=False)
    )
    # labels only ever DECREASE, so the global sum is strictly monotone
    # until fixpoint: one 1-row aggregate per round detects convergence
    # (bounded driver traffic). The agg doubles as the action that
    # materializes each round's lazy checkpoint. Sum over decimal(38,0):
    # a long sum of vertex ids can overflow (ArithmeticException under
    # Spark 4's ANSI default) on large graphs with large ids.
    _sum_expr = F.sum(F.col("comp").cast("decimal(38,0)"))
    cur_sum = labels.agg(_sum_expr).collect()[0][0]
    converged = False
    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label in the race
        msgs = sym.join(labels, sym["src"] == labels["v"]).select(
            F.col("dst").alias("v"), F.col("comp")
        )
        prev = labels
        labels = (
            labels.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(_sum_expr).collect()[0][0]
        # the agg above materialized this round's checkpoint, so the
        # previous round's blocks are now dead — release them instead of
        # letting up to max_iter label copies pile up in executor storage
        _release_checkpoint(prev)
        if new_sum == cur_sum:
            converged = True
            break
        cur_sum = new_sum
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            "rounds; labels may span partially-merged components. Raise "
            "max_iter (rounds needed ~ graph diameter).",
            RuntimeWarning,
            stacklevel=2,
        )
    # every round's agg materialized its checkpoint, so the edge blocks are
    # no longer reachable from the final (checkpointed) labels frame
    _release_checkpoint(edges)
    return labels.select(F.col("v"), F.col("comp"))


def _connected_components_local(edges: DataFrame) -> DataFrame:
    """Single-task union-find over a (src, dst) edge list that fits one
    executor core: coalesce to one partition, fold every Arrow batch
    into a parent map with min-id roots + path compression, emit
    (v, comp) once at the end. ONE Spark job, no iterative shuffles, no
    driver data traffic — the edge list never leaves the executor.
    Output is identical to the distributed variants: every vertex
    appearing in any pair, labeled with its component's minimum id."""
    import pandas as pd
    from pyspark.sql import types as T

    vtype = edges.schema["src"].dataType
    schema = T.StructType(
        [
            T.StructField("v", vtype, False),
            T.StructField("comp", vtype, False),
        ]
    )

    def uf(batches):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # min-id root keeps the canonical-survivor contract
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        if parent:
            vs = list(parent)
            yield pd.DataFrame({"v": vs, "comp": [find(v) for v in vs]})

    return edges.coalesce(1).mapInPandas(uf, schema)


def _connected_components_star(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int,
) -> DataFrame:
    """Alternating large-star/small-star contraction.

    One round:
    - LARGE-STAR: per vertex u, every strictly-larger neighbor re-attaches
      to m = min(neighborhood(u) ∪ {u}) — long chains fold toward their
      minimum from every vertex at once, which is where the
      diameter-independence comes from.
    - SMALL-STAR: per vertex u, its smaller neighbors (and u itself)
      re-attach to m = min of the smaller neighborhood — flattens partial
      stars so large-star has fresh shortcuts next round.
    Each phase is one groupBy-min plus one equi-join on the vertex id;
    edges only ever move toward component minima, and at fixpoint the
    graph IS a forest of stars centered at each component's minimum.
    Convergence check: (edge count, xxhash64 checksum) 1-row aggregate —
    bounded driver traffic, same doctrine as the label-prop variant.
    Per-round ``localCheckpoint`` truncates lineage exactly as in
    ``connected_components`` (the plan would otherwise double per round).
    """
    raw = pairs.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint()
    release_plan(pairs)
    # vertex universe up front: the contraction drops self-loops (and with
    # them any vertex whose only pair was a self-pair), but the contract —
    # "every vertex appearing in pairs" — must match the label variant
    # eager checkpoint: round 1's block release walks the then-current
    # edge frame's leaves and frees ``raw`` — vertices must already be
    # materialized blocks of its own by then, not a lazy plan over raw
    vertices = (
        raw.select(F.col("a").alias("v"))
        .unionByName(raw.select(F.col("b").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    edges = raw.where(F.col("a") != F.col("b"))
    _sig = [
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64(F.col("a"), F.col("b")).cast("decimal(38,0)")
        ).alias("s"),
    ]

    def _signature(df: DataFrame):
        row = df.agg(*_sig).collect()[0]
        return (row["n"], row["s"])

    cur = _signature(edges)
    converged = False
    for _ in range(max_iter):
        # ---- large-star: symmetric view, min over Γ(u) ∪ {u}
        sym = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.min(F.least("a", "b")).alias("m")
        )
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star: orient (max, min); m = min of smaller nbrs
        oriented = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(
                smins.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        new = _signature(small)  # materializes the lazy checkpoint
        _release_checkpoint(edges)
        edges = small
        if new == cur:
            converged = True
            break
        cur = new
    if not converged:
        warnings.warn(
            f"connected_components(star): no fixpoint after max_iter="
            f"{max_iter} rounds; labels may span partially-merged "
            "components. Rounds needed ~ O(log^2 n).",
            RuntimeWarning,
            stacklevel=3,
        )
    # fixpoint edges form stars (leaf, center): leaves label with their
    # center, centers label with themselves; vertices outside any star
    # (self-pair-only or isolated after contraction) label themselves
    star_labels = (
        edges.select(F.col("a").alias("v"), F.col("b").alias("comp"))
        .unionByName(
            edges.select(F.col("b").alias("v"), F.col("b").alias("comp"))
        )
        .groupBy("v")
        .agg(F.min("comp").alias("comp"))
    )
    return vertices.join(star_labels, "v", "left").select(
        F.col("v"), F.coalesce("comp", "v").alias("comp")
    )


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
