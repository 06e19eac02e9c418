"""The reference's declared KPI query surface (SURVEY.md §2.6, Q1-Q6),
re-expressed as first-class Spark DataFrame plans over the star-schema
fixtures (orders/lineitem play `sales`; events plays the audit trend).

Reference citations: /root/reference/README.md:132-146 (Metabase KPIs).

Each query has a matched DuckDB oracle (ORACLE dict) with identical output
column names; float aggregates use the decimal-sum parity recipe
(plans/_parity.py) so values hash-match bit-for-bit.

Scale notes are per-query in docstrings — these plans are written for the
100 TB case: aggregations are partial-agg friendly (groupBy on bounded-
cardinality keys), top-k compiles to TakeOrderedAndProject (no global
sort materialization), the one dimension join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mini_data_platform_spark.catalog import load_table
from mini_data_platform_spark.plans._parity import dsum, sql_dsum


def revenue_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q1 — total sales amount by day (README.md:142).

    Scale: group keys are days (bounded ~1e4 cardinality even at 100 TB), so
    partial aggregation collapses each input partition to a few thousand rows
    before the shuffle — the shuffle is negligible regardless of input size.
    Only (o_orderdate, o_totalprice) are read from the scan (column pruning).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(dsum(F.col("o_totalprice")).alias("revenue"), F.count("*").alias("n_orders"))
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q2 — top 10 customers by revenue (README.md:143).

    Scale: aggregate orders by custkey FIRST (shuffle on custkey with
    map-side combine), then join the much smaller per-customer aggregate to
    the customer dim. The final top-k compiles to TakeOrderedAndProject —
    each partition keeps its local top 10, the driver merges 10×P rows; no
    global sort. Tie-break on custkey makes the result set deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(dsum(F.col("o_totalprice")).alias("revenue"))
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"), "revenue")
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(10)
    )


def product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q3 — product performance: revenue / quantity / order count by
    product (README.md:144), joined onto the part dimension for names.

    Scale: lineitem aggregates by partkey before joining part — the join
    input shrinks from |lineitem| to |part|. At sf where part fits the
    broadcast threshold Catalyst/AQE broadcasts it; otherwise both sides are
    already partitioned by the join key from the aggregation shuffle.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = lineitem.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        dsum(F.col("l_quantity")).alias("total_qty"),
        F.count("*").alias("n_lines"),
    )
    return per_part.join(part, per_part.l_partkey == part.p_partkey).select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        "revenue",
        "total_qty",
        "n_lines",
    )


def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q4 — rolling 7-day revenue (README.md:145), gap-correct: the
    frame is a RANGE over days (missing days shrink the window), not a
    ROWS frame over whatever days happen to exist.

    Scale: the daily aggregate (bounded cardinality) happens first, so the
    window operates on thousands of rows no matter the input size. The
    single-partition window is fine BECAUSE of that bound; the rolling mean
    is derived from exact decimal rolling sum / rolling count for
    cross-engine determinism.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("_rev_dec")
    )
    w = Window.orderBy(F.unix_date(F.col("day"))).rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.col("_rev_dec").cast("double").alias("revenue"),
        F.sum("_rev_dec").over(w).cast("double").alias("rolling_7d_revenue"),
        (F.sum("_rev_dec").over(w).cast("double") / F.count("*").over(w)).alias("rolling_7d_avg"),
    )


def failed_events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q5 — failure trend by day (README.md:146). The reference counts
    `%failed%` rows in file_ingestion_log; the fixture equivalent is the
    events table's `error` event_type.

    Scale: filter pushes into the parquet scan (PushedFilters on
    event_type), then a bounded-key aggregate.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "error")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n_failed"))
    )


def revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q6 — revenue by customer (README.md:134). Plain hash aggregate;
    partial agg bounds the shuffle at |customers|."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


def revenue_by_day_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q1 maintained INCREMENTALLY (operators/ivm.py): the orders
    facts arrive as three deterministic batches (o_orderkey % 3); each
    increment folds only its delta's partial aggregate into the
    persisted view (O(delta), zero view reads in delta mode), and the
    serve read merges the segment log. The oracle is the plain full
    GROUP BY — decimal sum states make the maintained totals
    bit-identical to the recompute no matter how the facts were
    batched, which is the IVM correctness contract.

    The scratch view lives at ONE per-process path (rebuilt wholesale
    each invocation, removed at exit) — repeated bench/driver runs must
    not accumulate orphan view dirs in the temp root."""
    import atexit
    import os
    import shutil
    import tempfile

    from mini_data_platform_spark.operators.ivm import (
        view_build,
        view_fold_many,
        view_read,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        "o_orderkey",
        "o_totalprice",
    )
    view_dir = os.path.join(
        tempfile.gettempdir(), f"mdp_ivmview_{os.getpid()}"
    )
    shutil.rmtree(view_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, view_dir, ignore_errors=True)
    measures = {
        "revenue": ("sum", "o_totalprice"),
        "n_orders": ("count", "*"),
        "max_price": ("max", "o_totalprice"),
    }
    view_build(
        orders.filter(F.col("o_orderkey") % 3 == 0),
        view_dir, ["day"], measures,
    )
    # the two increments are one single-writer bulk fold (segments
    # write concurrently, tickets commit in order — state-identical to
    # sequential view_increment calls; ivm.view_fold_many)
    view_fold_many(view_dir, deltas=[
        orders.filter(F.col("o_orderkey") % 3 == 1),
        orders.filter(F.col("o_orderkey") % 3 == 2),
    ])
    return view_read(spark, view_dir)


def _scratch_view_dir(tag: str) -> str:
    """One per-process scratch path per view family (rebuilt wholesale
    each invocation, removed at exit) — repeated bench/driver runs must
    not accumulate orphan view dirs in the temp root."""
    import atexit
    import os
    import shutil
    import tempfile

    view_dir = os.path.join(
        tempfile.gettempdir(), f"mdp_{tag}_{os.getpid()}"
    )
    shutil.rmtree(view_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, view_dir, ignore_errors=True)
    return view_dir


def price_quantiles_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained approximate quantiles (operators/ivm.py histogram
    views): p50/p95 order value per priority class, with the orders
    facts arriving as three deterministic batches — each increment is an
    O(delta) bin-count partial aggregate, state is one row per
    non-empty (priority, price bin), and the serve read interpolates
    within the bin holding rank q·N. The oracle recomputes the SAME
    histogram + interpolation from scratch in SQL — bin assignment and
    the serve expression are libm-free fixed arithmetic, so the
    estimates hash-match bit-exactly however the facts were batched
    (approximate vs the true quantile, deterministic vs the histogram —
    the declared accuracy trade is the 10k bin width)."""
    from mini_data_platform_spark.operators.ivm import (
        histogram_view_build,
        histogram_view_fold_many,
        quantile_view_read,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        "o_totalprice",
    )
    view_dir = _scratch_view_dir("histview")
    k = F.col("o_orderkey")
    histogram_view_build(
        orders.filter(k % 3 == 0).drop("o_orderkey"),
        view_dir, ["priority"], "o_totalprice", width=10000.0,
    )
    # bulk fold: both increments' bin-count segments write concurrently
    histogram_view_fold_many(view_dir, deltas=[
        orders.filter(k % 3 == 1).drop("o_orderkey"),
        orders.filter(k % 3 == 2).drop("o_orderkey"),
    ])
    return quantile_view_read(
        spark, view_dir, {"p50": 0.5, "p95": 0.95}
    )


def top_customers_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPI Q2 as a MAINTAINED dashboard: per-customer revenue kept
    current by O(delta) increments (three deterministic batches), top-10
    served straight from the view state with a view-sized
    TakeOrderedAndProject — the recurring "top customers" refresh never
    rescans facts. Ties break on custkey (``view_topk``), matching the
    oracle's ORDER BY."""
    from mini_data_platform_spark.operators.ivm import (
        view_build,
        view_fold_many,
        view_topk,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    view_dir = _scratch_view_dir("topkview")
    k = F.col("o_orderkey")
    measures = {
        "revenue": ("sum", "o_totalprice"),
        "n_orders": ("count", "*"),
    }
    view_build(orders.filter(k % 3 == 0), view_dir, ["custkey"], measures)
    # bulk fold: both increments' segments write concurrently
    view_fold_many(view_dir, deltas=[
        orders.filter(k % 3 == 1),
        orders.filter(k % 3 == 2),
    ])
    return view_topk(spark, view_dir, "revenue", 10)


def distinct_customers_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact "distinct customers per day" MAINTAINED through deletes
    (operators/ivm.py distinct support views): the facts arrive as
    three deterministic batches, then a CDC wave RETRACTS every
    ``o_orderkey % 5 == 0`` row (-1 per original row — the shape a
    keyed delete emits). HLL approx_distinct cannot retract (registers
    only grow); the support view can, exactly: the state is the live
    (day, custkey) multiset, a customer's count drops only when their
    LAST order of that day retracts. The oracle is the from-scratch
    COUNT(DISTINCT) over the surviving facts — the view must equal it
    whatever the batching, the IVM contract.

    Scale: each increment/retraction is one O(delta) partial aggregate;
    the serve is view-sized (one row per live (day, custkey)). The
    state-vs-exactness trade against the HLL measure is the point."""
    from mini_data_platform_spark.operators.ivm import (
        distinct_view_build,
        distinct_view_read,
        view_fold_many,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"),
        "o_orderkey",
        "o_custkey",
    )
    view_dir = _scratch_view_dir("distview")
    k = F.col("o_orderkey")
    distinct_view_build(
        orders.filter(k % 3 == 0).drop("o_orderkey"),
        view_dir, ["day"], "o_custkey",
    )
    # bulk fold: both increments AND the retraction wave write their
    # segments concurrently; tickets (and the change batch's op-guard)
    # commit strictly in order — state-identical to the sequential calls
    view_fold_many(
        view_dir,
        deltas=[
            orders.filter(k % 3 == 1).drop("o_orderkey"),
            orders.filter(k % 3 == 2).drop("o_orderkey"),
        ],
        changes=[
            orders.filter(k % 5 == 0)
            .drop("o_orderkey")
            .withColumn("_op", F.lit(-1)),
        ],
    )
    return distinct_view_read(spark, view_dir)


def _orders_wave_frames(spark, sf_dir: str) -> list[DataFrame]:
    """The ONE copy of the five-wave orders change history every
    merge-table/join-view query replays (build %3==0, upserts %3==1,
    updates %6==0, deletes %9==0, late upserts %3==2) — their oracles
    restate the same final state, so a drift between two copies would
    silently break one query's hash contract. Returned as frames so
    ``orders_join_view`` can interleave view refreshes between waves."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    return [
        orders.filter(k % 3 == 0),
        orders.filter(k % 3 == 1),
        orders.filter(k % 6 == 0).withColumns(
            {
                "o_totalprice": F.col("o_totalprice") * 2,
                "o_orderstatus": F.lit("U"),
            }
        ),
        orders.filter(k % 9 == 0)
        .select("o_orderkey")
        .withColumn("_op", F.lit("d")),
        orders.filter(k % 3 == 2),
    ]


def _build_orders_merge_table(spark, sf_dir: str, table_dir: str) -> None:
    from mini_data_platform_spark.operators.mergetable import (
        table_apply_many,
        table_build,
    )

    waves = _orders_wave_frames(spark, sf_dir)
    table_build(waves[0], table_dir, ["o_orderkey"])
    # single-writer bulk load: the four wave segments write
    # concurrently (each _seq is known up front), tickets commit in
    # order — identical table state to sequential applies (guide §2.6)
    table_apply_many(waves[1:], table_dir)


def orders_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyed MERGE table (operators/mergetable.py) end-to-end: the
    orders facts arrive as five deterministic change batches against a
    table keyed by o_orderkey — build (keys %3==0), a plain upsert wave
    (%3==1), an UPDATE wave (%6==0: price doubled, status 'U'), a
    keys-only DELETE wave (%9==0), and a late upsert wave (%3==2) — and
    the serve read resolves latest-wins per key at read time (one
    max_by aggregate over the segment log, no window, no table rewrites
    anywhere on the write path). The oracle is the declarative
    restatement: every order except the deleted keys, with the update
    wave's CASE applied — batch-unique keys + the _seq total order make
    the resolved state engine-independent, so it hash-matches.

    Scale: each apply is O(batch) (one segment write, zero table
    reads); the read shuffles live log rows once with map-side combine.
    The scratch table lives at ONE per-process temp path, rebuilt
    wholesale per invocation and removed at exit."""
    import atexit
    import os
    import shutil
    import tempfile

    from mini_data_platform_spark.operators.mergetable import table_read

    table_dir = os.path.join(
        tempfile.gettempdir(), f"mdp_mergetable_{os.getpid()}"
    )
    shutil.rmtree(table_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, table_dir, ignore_errors=True)
    _build_orders_merge_table(spark, sf_dir, table_dir)
    return table_read(spark, table_dir)


def _build_merge_view_artifacts(spark, sf_dir: str, root: str) -> None:
    """Offline build shared by the merge-view PROOF (per-invocation
    scratch root) and its SERVE twin (cached root): the keyed table
    receives the five change waves, and the two maintained views (plain
    aggregate + retractable-min/max support) are seeded from epoch 1
    and caught up PURELY from the table's Z-set change feed. Writes an
    explicit ``_COMPLETE`` marker last (multi-store artifact — no
    single meta.json can prove completeness)."""
    import os

    from mini_data_platform_spark.operators.mergetable import (
        table_changes_zset,
        table_read,
    )
    from mini_data_platform_spark.operators.ivm import (
        minmax_view_build,
        view_apply_changes,
        view_build,
    )
    from mini_data_platform_spark.operators.resources import release_plan

    from mini_data_platform_spark.operators.resources import (
        run_concurrently,
    )

    tdir = os.path.join(root, "table")
    vdir = os.path.join(root, "view")
    mdir = os.path.join(root, "minmax")
    _build_orders_merge_table(spark, sf_dir, tdir)
    seed = table_read(spark, tdir, as_of=1)
    # the two maintained views are independent stores fed by the same
    # seed/changes — build and refresh them from two driver threads
    # (guide §2.6); per batch the shared zset is persisted, so whichever
    # apply materializes it first caches it for the other
    run_concurrently(
        lambda: view_build(
            seed,
            vdir,
            ["o_orderstatus"],
            {"revenue": ("sum", "o_totalprice"), "n_orders": ("count", "*")},
        ),
        lambda: minmax_view_build(seed, mdir, ["o_orderstatus"], "o_totalprice"),
    )
    # the table is FULLY built before this loop, so the four change
    # windows' zsets are mutually independent reads of committed
    # segments: persist all four and materialize them concurrently up
    # front (one noop action each, guide §2.6) — the per-window resolve
    # shuffles overlap each other instead of serializing through the
    # apply chain, and each apply then consumes cached zset blocks.
    # Apply ORDER per view stays strictly sequential (seq contract).
    zsets = [
        table_changes_zset(spark, tdir, since=b, as_of=b + 1).persist()
        for b in range(1, 5)
    ]
    run_concurrently(*[
        (lambda z=z: z.write.format("noop").mode("overwrite").save())
        for z in zsets
    ])
    for zset in zsets:
        # each apply's validation metric rides its write
        # (ivm.view_apply_changes), and the zset feeds BOTH views
        run_concurrently(
            lambda: view_apply_changes(zset, vdir),
            lambda: view_apply_changes(zset, mdir),
        )
        zset.unpersist(False)
        release_plan(zset)
    with open(os.path.join(root, "_COMPLETE"), "w") as fh:
        fh.write("ok")


def _read_merge_view_artifacts(spark, root: str) -> DataFrame:
    import os

    from mini_data_platform_spark.operators.ivm import (
        minmax_view_read,
        view_read,
    )

    mm = minmax_view_read(spark, os.path.join(root, "minmax")).select(
        "o_orderstatus",
        F.col("min_o_totalprice").alias("min_price"),
        F.col("max_o_totalprice").alias("max_price"),
    )
    return view_read(spark, os.path.join(root, "view")).join(
        F.broadcast(mm), "o_orderstatus"
    )


def orders_merge_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full lakehouse CDC chain as ONE query — the equivalence
    PROOF: the keyed merge table receives the same five change batches
    as ``orders_merge_table``, and TWO maintained views are kept
    current PURELY from the table's Z-set change feed
    (``table_changes_zset`` — displaced pre-images as -1, post-images
    as +1), never from the table state: a plain aggregate view
    (revenue + order count by status) and a retractable-min/max
    SUPPORT view (``ivm.minmax_view_build`` — the multiplicity-per-
    value state that lets deletes move the extremum, which plain
    min/max measures must refuse). Updates and deletes thus retract
    exactly, and the served join hash-matches a plain GROUP BY (sum,
    count, MIN, MAX) over the table's FINAL state — the end-to-end
    correctness contract of the table→view pipeline. Construction is
    paid IN-QUERY by design; ``orders_merge_view_serve`` measures the
    read-only serving shape.

    Scale: each view refresh costs O(changed keys' log rows) for the
    pre/post-image resolve plus an O(delta) segment append — no fact
    rescan, no view rewrite; the table and view stay independently
    compactable."""
    import atexit
    import os
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(), f"mdp_mergeview_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    _build_merge_view_artifacts(spark, sf_dir, root)
    return _read_merge_view_artifacts(spark, root)


def orders_merge_view_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING shape of the maintained merge-table views (the
    round-7 item-4 doctrine applied to the round-8 view chain):
    ``orders_merge_view`` is the equivalence proof and pays table+view
    construction in-query; this query reads a PREBUILT artifact —
    ``view_read``'s merge-on-read resolve over the view segment log
    plus the minmax support serve — which is what a dashboard actually
    hits. Built once per fixture via plans/_serving.py (race-safe
    atomic publish), same oracle as the proof."""
    from mini_data_platform_spark.plans._serving import cached_artifact

    root = cached_artifact(
        sf_dir,
        "mergeview",
        lambda d: _build_merge_view_artifacts(spark, sf_dir, d),
        fixture="orders.parquet",
        marker="_COMPLETE",
    )
    return _read_merge_view_artifacts(spark, root)


def _build_join_view_artifacts(spark, sf_dir: str, root: str) -> None:
    """Offline build shared by the join-view PROOF and its SERVE twin:
    two keyed merge tables (orders: the shared five-wave history;
    customers: evens, odds, then the %5==0 'PROMOTED' update) with the
    maintained join view caught up by four refreshes at different
    points of the interleaved history — never by a join recompute."""
    import os

    from mini_data_platform_spark.operators.joinview import (
        join_view_build,
        join_view_refresh,
    )
    from mini_data_platform_spark.operators.mergetable import (
        table_apply,
        table_apply_many,
        table_build,
    )

    odir = os.path.join(root, "orders")
    cdir = os.path.join(root, "customer")
    vdir = os.path.join(root, "view")
    waves = _orders_wave_frames(spark, sf_dir)
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    ck = F.col("o_custkey")
    from mini_data_platform_spark.operators.resources import (
        run_concurrently,
    )

    # epoch 1 on both sides, then the view bootstraps through the same
    # delta path every later refresh takes. The two tables' builds (and
    # each window's two applies below) are independent chains — run them
    # from two driver threads so one chain's tail back-fills the other's
    # cores and their planning gaps overlap (guide §2.6); refreshes stay
    # barriers, and applies to the SAME table keep their order.
    run_concurrently(
        lambda: table_build(waves[0], odir, ["o_orderkey"]),
        lambda: table_build(customer.filter(ck % 2 == 0), cdir, ["o_custkey"]),
    )
    join_view_build(
        spark, odir, cdir, ["o_custkey"], vdir, ["c_mktsegment"],
        {"revenue": ("sum", "o_totalprice"), "n_orders": ("count", "*")},
    )
    join_view_refresh(spark, vdir)  # (0,0) -> (1,1)
    # both sides advance: the odd customers' arrival must pull in the
    # epoch-1 orders that found no join partner at the first refresh
    run_concurrently(
        lambda: table_apply(waves[1], odir),
        lambda: table_apply(customer.filter(ck % 2 == 1), cdir),
    )
    join_view_refresh(spark, vdir)  # (1,1) -> (2,2)

    # update + delete on orders, segment promotion on customers — the
    # retraction-heavy window (price doubling, row deletes, and revenue
    # moving between segments, all in one delta). The two orders waves
    # stay ordered (same table); the customer wave rides alongside.
    run_concurrently(
        # the two orders waves are one single-writer bulk load (segments
        # write concurrently, tickets commit in order — state-identical
        # to sequential applies); the customer wave rides alongside
        lambda: table_apply_many([waves[2], waves[3]], odir),
        lambda: table_apply(
            customer.filter(ck % 5 == 0)
            .withColumn("c_mktsegment", F.lit("PROMOTED")),
            cdir,
        ),
    )
    join_view_refresh(spark, vdir)  # (2,2) -> (4,3)
    table_apply(waves[4], odir)
    join_view_refresh(spark, vdir)  # (4,3) -> (5,3): one-sided
    with open(os.path.join(root, "_COMPLETE"), "w") as fh:
        fh.write("ok")


def orders_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained JOIN view (operators/joinview.py) — the equivalence
    PROOF: revenue by market segment over ``orders ⋈ customer``, where
    BOTH sides are keyed merge tables receiving interleaved change
    waves and the view is caught up by four refreshes at different
    points of the history — never by a join recompute. The oracle is a
    plain GROUP BY over both tables' FINAL states: the view must equal
    it whatever the refresh cadence — the join-IVM contract.
    Construction is paid IN-QUERY by design; ``orders_join_view_serve``
    measures the read-only serving shape.

    Scale: each refresh computes ``dA ⋈ B₀ ∪ A₁ ⋈ dB`` with the
    snapshot sides candidate-bounded to the delta's join-key values
    (customer side via table_lookup's IN-literal pushdown; orders side
    via a guarded-broadcast semi-join) — O(delta + candidate log rows)
    per refresh, never a base-table rescan."""
    import atexit
    import os
    import shutil
    import tempfile

    from mini_data_platform_spark.operators.ivm import view_read

    root = os.path.join(
        tempfile.gettempdir(), f"mdp_joinview_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    _build_join_view_artifacts(spark, sf_dir, root)
    return view_read(spark, os.path.join(root, "view"))


def orders_join_view_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING shape of the maintained join view: a read-only
    ``view_read`` (merge-on-read resolve over the view's segment log)
    against a PREBUILT two-table + view artifact — the dashboard hit,
    with construction amortized offline (plans/_serving.py, race-safe
    atomic publish). Same oracle as the proof."""
    import os

    from mini_data_platform_spark.operators.ivm import view_read
    from mini_data_platform_spark.plans._serving import cached_artifact

    root = cached_artifact(
        sf_dir,
        "joinview",
        lambda d: _build_join_view_artifacts(spark, sf_dir, d),
        # the artifact embeds BOTH sides' change waves — key on both
        fixture=["orders.parquet", "customer.parquet"],
        marker="_COMPLETE",
    )
    return view_read(spark, os.path.join(root, "view"))


def orders_scd2_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time enrichment (operators/scd.py): revenue by the
    market segment each customer HAD AT THE ORDER'S EPOCH — the
    event-time-correct dimension join (no time-travel leakage), derived
    from a customer merge table receiving four change waves: build
    (even custkeys), the odds, a promotion UPDATE (%5==0 →
    'PROMOTED'), and a DELETE wave (%7==0). Each order carries a
    deterministic epoch ``o_orderkey % 5 + 1`` (epoch 5 reads past the
    last batch — the open-interval path): orders placed before their
    customer existed, or after deletion, drop; orders before a
    promotion keep the OLD segment — exactly what a latest-wins join
    gets wrong. The oracle restates validity declaratively from the
    wave arithmetic.

    Scale: the history is ONE window pass over the dim log; the enrich
    is the as-of union-window machinery — one shuffle over
    facts + versions, never an interval-explosion join."""
    import atexit
    import os
    import shutil
    import tempfile

    from mini_data_platform_spark.operators.mergetable import (
        table_apply,
        table_build,
    )
    from mini_data_platform_spark.operators.scd import (
        scd2_enrich,
        scd2_history,
    )

    dim_dir = os.path.join(
        tempfile.gettempdir(), f"mdp_scd2_{os.getpid()}"
    )
    shutil.rmtree(dim_dir, ignore_errors=True)
    atexit.register(shutil.rmtree, dim_dir, ignore_errors=True)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ck = F.col("c_custkey")
    table_build(customer.filter(ck % 2 == 0), dim_dir, ["c_custkey"])
    table_apply(customer.filter(ck % 2 == 1), dim_dir)
    table_apply(
        customer.filter(ck % 5 == 0)
        .withColumn("c_mktsegment", F.lit("PROMOTED")),
        dim_dir,
    )
    table_apply(
        customer.filter(ck % 7 == 0)
        .select("c_custkey")
        .withColumn("_op", F.lit("d")),
        dim_dir,
    )
    facts = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
        (F.col("o_orderkey") % 5 + 1).alias("at_e"),
    )
    enriched = scd2_enrich(
        facts, scd2_history(spark, dim_dir), ["c_custkey"], "at_e",
        how="inner",
    )
    return enriched.groupBy("c_mktsegment").agg(
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


QUERIES = {
    "kpi_revenue_by_day": revenue_by_day,
    "kpi_top_customers": top_customers,
    "kpi_product_performance": product_performance,
    "kpi_rolling_7d_revenue": rolling_7d_revenue,
    "kpi_failed_events_trend": failed_events_trend,
    "kpi_revenue_by_customer": revenue_by_customer,
    "kpi_revenue_by_day_ivm": revenue_by_day_ivm,
    "kpi_price_quantiles_ivm": price_quantiles_ivm,
    "kpi_top_customers_ivm": top_customers_ivm,
    "kpi_distinct_customers_ivm": distinct_customers_ivm,
    "orders_merge_table": orders_merge_table,
    "orders_merge_view": orders_merge_view,
    "orders_merge_view_serve": orders_merge_view_serve,
    "orders_join_view": orders_join_view,
    "orders_join_view_serve": orders_join_view_serve,
    "orders_scd2_revenue": orders_scd2_revenue,
}

_REV = sql_dsum("o_totalprice")


def _sql_hist_quantiles(qs: dict[str, float], width: float) -> str:
    """The DuckDB twin of ivm.quantile_view_read over an orders
    histogram keyed by priority: same floor(v/width) bins, same
    cumulative window, same in-bin interpolation expression tree —
    every float op mirrors the Spark side exactly (no libm, no
    reassociable constants), so the estimates hash-match."""
    w = repr(float(width))
    cols = []
    for name, q in qs.items():
        t = f"CAST({q!r} AS DOUBLE) * CAST(tot AS DOUBLE)"
        cb = "CAST(cum - n AS DOUBLE)"
        cols.append(
            f"MAX(CASE WHEN CAST(cum AS DOUBLE) >= {t} AND {cb} < {t} "
            f"THEN CAST(bucket AS DOUBLE) * {w} "
            f"+ {w} * (({t} - {cb}) / CAST(n AS DOUBLE)) END) AS {name}"
        )
    return f"""
        WITH b AS (
            SELECT o_orderpriority AS priority,
                   CAST(floor(CAST(o_totalprice AS DOUBLE) / {w}) AS BIGINT)
                       AS bucket,
                   COUNT(*) AS n
            FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
        ),
        c AS (
            SELECT priority, bucket, n,
                   SUM(n) OVER (
                       PARTITION BY priority ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(n) OVER (PARTITION BY priority) AS tot
            FROM b
        )
        SELECT priority, {', '.join(cols)} FROM c GROUP BY priority
    """


ORACLE = {
    "kpi_revenue_by_day": f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               {_REV} AS revenue,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "kpi_top_customers": f"""
        WITH per_cust AS (
            SELECT o_custkey, {_REV} AS revenue FROM orders GROUP BY 1
        )
        SELECT c_custkey AS custkey, c_name AS name, revenue
        FROM per_cust JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, custkey ASC LIMIT 10
    """,
    "kpi_product_performance": f"""
        WITH per_part AS (
            SELECT l_partkey,
                   {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
                   {sql_dsum('l_quantity')} AS total_qty,
                   COUNT(*) AS n_lines
            FROM lineitem GROUP BY 1
        )
        SELECT p_partkey AS partkey, p_name AS part_name, p_brand AS brand,
               revenue, total_qty, n_lines
        FROM per_part JOIN part ON l_partkey = p_partkey
    """,
    # DuckDB's windowed SUM(DECIMAL) accumulates inexactly (unlike its group
    # aggregate), so the oracle expresses the rolling frame as a range
    # self-join + exact group SUM instead of a window function.
    "kpi_rolling_7d_revenue": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_dec
            FROM orders GROUP BY 1
        ),
        roll AS (
            SELECT d1.day, SUM(d2.rev_dec) AS roll_dec, COUNT(*) AS cnt
            FROM daily d1 JOIN daily d2
              ON d2.day BETWEEN d1.day - 6 AND d1.day
            GROUP BY d1.day
        )
        SELECT d.day,
               CAST(d.rev_dec AS DOUBLE) AS revenue,
               CAST(r.roll_dec AS DOUBLE) AS rolling_7d_revenue,
               CAST(r.roll_dec AS DOUBLE) / r.cnt AS rolling_7d_avg
        FROM daily d JOIN roll r ON d.day = r.day
    """,
    "kpi_failed_events_trend": """
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_failed
        FROM events WHERE event_type = 'error' GROUP BY 1
    """,
    "kpi_revenue_by_customer": f"""
        SELECT o_custkey AS custkey, {_REV} AS revenue, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    # the maintained view must equal the from-scratch GROUP BY exactly,
    # however the facts were batched — the IVM correctness contract
    "kpi_revenue_by_day_ivm": f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               {_REV} AS revenue,
               COUNT(*) AS n_orders,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY 1
    """,
    # the maintained histogram's estimates must equal the SAME
    # histogram + in-bin interpolation recomputed from scratch — bin
    # assignment (floor(v/width)) and the serve expression are fixed
    # libm-free arithmetic, identical tree shape on both engines
    "kpi_price_quantiles_ivm": _sql_hist_quantiles(
        {"p50": 0.5, "p95": 0.95}, 10000.0
    ),
    # the maintained top-k must equal the from-scratch ranking; ties
    # break on custkey in both engines
    "kpi_top_customers_ivm": f"""
        WITH per_cust AS (
            SELECT o_custkey AS custkey, {_REV} AS revenue,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT custkey, revenue, n_orders FROM per_cust
        ORDER BY revenue DESC, custkey ASC LIMIT 10
    """,
    # the maintained distinct count must equal the from-scratch
    # COUNT(DISTINCT) over the facts surviving the retraction wave —
    # every %5==0 row was inserted by exactly one of the three build
    # batches (%3 covers all keys), so the -1 wave removes precisely
    # those rows from the support multiset
    "kpi_distinct_customers_ivm": """
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(DISTINCT o_custkey) AS n_distinct_o_custkey
        FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY 1
    """,
    # latest-wins over the five change batches, restated declaratively:
    # delete wave %9==0 wins last over its keys (nothing later re-adds
    # them: %9==0 ∩ %3==2 = ∅); update wave %6==0 supersedes the build
    # rows; everything else serves its original row. price*2 is exact
    # in binary FP, so DOUBLE values hash-match across engines.
    "orders_merge_table": """
        SELECT o_orderkey,
               o_custkey,
               CASE WHEN o_orderkey % 6 = 0 THEN 'U'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderkey % 9 <> 0
    """,
    # the maintained view must equal a plain GROUP BY over the table's
    # final state (the orders_merge_table oracle), however the changes
    # were batched and retracted — the table→view chain contract
    "orders_merge_view": f"""
        WITH final AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 6 = 0 THEN 'U'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderkey % 9 <> 0
        )
        SELECT o_orderstatus,
               {sql_dsum('o_totalprice')} AS revenue,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM final GROUP BY 1
    """,
    "orders_merge_view_serve": f"""
        WITH final AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 6 = 0 THEN 'U'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderkey % 9 <> 0
        )
        SELECT o_orderstatus,
               {sql_dsum('o_totalprice')} AS revenue,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM final GROUP BY 1
    """,
    # the maintained JOIN view must equal a plain GROUP BY over the
    # join of both tables' FINAL states, whatever the refresh cadence —
    # the join-IVM contract. Orders' final state is the shared
    # five-wave restatement; customers' is the promotion CASE.
    "orders_join_view": f"""
        WITH final_orders AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderkey % 9 <> 0
        ),
        final_cust AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0 THEN 'PROMOTED'
                        ELSE c_mktsegment END AS c_mktsegment
            FROM customer
        )
        SELECT c_mktsegment,
               {sql_dsum('o_totalprice')} AS revenue,
               COUNT(*) AS n_orders
        FROM final_orders JOIN final_cust ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "orders_join_view_serve": f"""
        WITH final_orders AS (
            SELECT o_orderkey, o_custkey,
                   CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderkey % 9 <> 0
        ),
        final_cust AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0 THEN 'PROMOTED'
                        ELSE c_mktsegment END AS c_mktsegment
            FROM customer
        )
        SELECT c_mktsegment,
               {sql_dsum('o_totalprice')} AS revenue,
               COUNT(*) AS n_orders
        FROM final_orders JOIN final_cust ON o_custkey = c_custkey
        GROUP BY 1
    """,
    # validity restated from the wave arithmetic: evens exist from
    # epoch 1, odds from 2 (at_e >= 1 always holds), %5==0 customers
    # read 'PROMOTED' from epoch 3, %7==0 are deleted from epoch 4
    "orders_scd2_revenue": f"""
        WITH fact AS (
            SELECT o_custkey, o_totalprice,
                   o_orderkey % 5 + 1 AS at_e
            FROM orders
        )
        SELECT CASE WHEN c_custkey % 5 = 0 AND at_e >= 3
                    THEN 'PROMOTED' ELSE c_mktsegment
               END AS c_mktsegment,
               {sql_dsum('o_totalprice')} AS revenue,
               COUNT(*) AS n_orders
        FROM fact JOIN customer ON o_custkey = c_custkey
        WHERE (c_custkey % 2 = 0 OR at_e >= 2)
          AND NOT (c_custkey % 7 = 0 AND at_e >= 4)
        GROUP BY 1
    """,
}
