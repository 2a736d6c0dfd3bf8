"""Relational surface — SURVEY.md §2.7's "Spark plan" column, made real.

The reference has no joins/aggs/windows/sorts/set-ops (verified absent,
SURVEY.md §2.7); its users do that work inside an opaque JS callback. Here
each category is a first-class declarative query so Catalyst gets pushdown,
pruning, join planning and whole-stage codegen. Every query is paired with a
DuckDB oracle.

Scale notes (the part that matters at 100 TB):
* dimension joins broadcast explicitly (``F.broadcast``) — no shuffle of the
  fact table for region/nation/customer-sized sides;
* aggregations are expressed as plain groupBy → partial (map-side) combine
  comes free; no driver-side loops anywhere;
* floats that cross the engine boundary are rounded on BOTH sides — Spark
  and DuckDB may sum doubles in different orders, and round() keeps the
  comparison honest without hiding real errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from node_mongo2influx_spark.functions.jsonpath import (
    INT_SHAPE_RE,
    SAFE_KEY_RE,
)
from node_mongo2influx_spark.plans import query
from node_mongo2influx_spark.plans.tables import (
    load,
    load_events_measured,
    load_events_timed,
    stable_round,
)


# ---------------------------------------------------------------------------
# Aggregation: hash agg with partial/final, the TPC-H Q1 pattern
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                   AS sum_qty,
               round(sum(l_extendedprice), 2)                              AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0            AS avg_qty,
               floor(avg(l_extendedprice) * 10000.0 + 0.5) / 10000.0       AS avg_price,
               floor(avg(l_discount) * 10000.0 + 0.5) / 10000.0            AS avg_disc,
               count(*)                                                    AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="Hash aggregation with map-side partial combine (TPC-H Q1 shape).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    description="Scalar aggregate over a multi-predicate scan (TPC-H Q6 "
    "shape): every predicate pushes to the parquet scan — at 100 TB this "
    "query is I/O-bound on row-group pruning, zero shuffle.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Joins: broadcast dim → fact, multi-way star join, top-k
# ---------------------------------------------------------------------------
@query(
    "q3_top_unshipped_revenue",
    oracle="""
        SELECT l.l_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    description="Star join + agg + global top-k (TPC-H Q3 shape). No table "
    "is broadcast-HINTED: customer grows ~150k rows/sf (a hint overrides "
    "Spark's size check and would force-broadcast a multi-TB table at "
    "100 TB), so AQE decides at runtime — it broadcasts the filtered "
    "customer while genuinely small and falls back to shuffle-hash at "
    "scale. Hints are reserved for fixed-size dims (region/nation). "
    "TakeOrderedAndProject avoids a full sort.",
)
def q3_top_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    # MERGE hint on the fact side (r11 optimization round): the filtered
    # lineitem's size ESTIMATE dips under autoBroadcastJoinThreshold at
    # bench scale, and the planner then broadcast the FACT (single-threaded
    # 300k-row hashed-relation build) and streamed the small orders⋈customer
    # side — inverted. Forcing sort-merge keeps the fact⋈fact join a
    # parallel shuffle on orderkey at every scale (SMJ spills gracefully;
    # same plan the size check yields at 100 TB). Measured 0.63 s vs 0.76 s
    # min (8-rep interleaved A/B at sf0.1).
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff).hint("merge")
    return (
        l.join(o.join(c, o.o_custkey == c.c_custkey),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    oracle="""
        SELECT n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        GROUP BY n.n_name
    """,
    description="Five-way star join (TPC-H Q5 shape): fixed-size dims "
    "(region/nation) carry explicit broadcast hints; customer/supplier "
    "scale linearly with sf (150k·sf / 10k·sf rows) so they are left "
    "unhinted — AQE broadcasts them while small and shuffle-hashes at "
    "scale, where a hint would force-broadcast a multi-TB table and OOM. "
    "lineitem⋈orders is the one fact⋈fact join and shuffles on orderkey.",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    # MERGE hint on the fact side (r11 optimization round): lineitem's
    # 4-column projection estimate dips under autoBroadcastJoinThreshold
    # at bench scale and the planner broadcast the FACT (single-threaded
    # 600k-row hashed-relation build, orders streamed against it).
    # Forcing sort-merge keeps lineitem⋈orders the documented parallel
    # shuffle on orderkey at every scale. Measured 1.10 s vs 1.28 s min
    # (8-rep interleaved A/B at sf0.1); dim joins still broadcast.
    l = load(spark, sf_dir, "lineitem").hint("merge")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    o_enriched = o.join(dims, o.o_custkey == F.col("c_custkey"))
    return (
        l.join(o_enriched, l.l_orderkey == F.col("o_orderkey"))
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q7_nation_trade_flow",
    oracle="""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT))
                   / 10000.0 AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
        JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
        JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
        WHERE cn.n_name <> sn.n_name
          AND l.l_shipdate >= DATE '1995-01-01'
        GROUP BY cn.n_name, sn.n_name
    """,
    description="Cross-border trade flows (TPC-H Q7 shape): revenue between "
    "every (customer nation, supplier nation) pair after a pushed-down date "
    "filter. The chain is fact⋈fact (lineitem⋈orders, shuffle on orderkey) "
    "then dim joins: nation (fixed 25 rows) is broadcast-hinted twice under "
    "different aliases — the self-alias case the planner must keep distinct "
    "— while customer/supplier are unhinted (they scale with sf; AQE "
    "broadcasts them only while actually small).",
)
def q7_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= "1995-01-01")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            # Exact-integer revenue: price and discount are 2-decimal, so
            # cents × discount-centipoints is an integer — integers sum
            # exactly in ANY order, unlike the double product, whose sums
            # here land exactly on .xx65 round boundaries where even
            # stable_round is engine-dependent. Summed as decimal so the
            # exactness survives 100 TB row counts (a long sum would hit
            # ANSI overflow ~9e18; DuckDB's BIGINT sum widens to HUGEINT).
            # One division at the end maps back to currency, same double
            # in both engines.
            (
                F.sum(
                    (
                        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                        * F.floor((1 - F.col("l_discount")) * 100 + F.lit(0.5))
                    ).cast("decimal(24,0)")
                )
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q16_supplier_variety",
    oracle="""
        SELECT p.p_brand, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_partkey NOT IN (
            SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
        )
        GROUP BY p.p_brand, p.p_size
    """,
    description="Supplier variety per (brand, size) for parts never ordered "
    "in near-max quantity (TPC-H Q16 shape): a distinct aggregate (two-"
    "phase expand + partial agg) on top of a LEFT ANTI join. The exclusion "
    "list is UNHINTED: distinct high-quantity partkeys scale with the part "
    "table, so a broadcast hint would force an unbounded broadcast at "
    "100 TB — AQE broadcasts while it measures small and falls back to a "
    "shuffled anti join at scale (plan-gated).",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    excluded = l.where(F.col("l_quantity") >= 49).select(
        F.col("l_partkey").alias("x_partkey")
    ).distinct()
    kept = p.join(
        excluded, p.p_partkey == F.col("x_partkey"), "left_anti"
    )
    return (
        l.join(kept, l.l_partkey == kept.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   floor(sum(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
                       / 100.0 AS total_rev
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM supplier s
        JOIN rev r ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    description="Top revenue supplier (TPC-H Q15 shape): a per-supplier "
    "revenue aggregate compared against its own scalar max — the 1-row max "
    "cross-joins back (broadcast nested loop over one row), so the CTE "
    "evaluates as one lazy plan with no driver round-trip. Revenue rounded "
    "on both sides before the equality.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= "1996-01-01")
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        # stable_round, not round: total_rev feeds an equality against its
        # own max, so a .xx5 boundary divergence would change the winner
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__max_rev"))
    # The max-filtered rev is ~1 row — broadcast IT into supplier, never
    # the other way round (supplier scales 10k·sf; a hint there would
    # force-broadcast a huge table at the 100 TB target).
    top = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("__max_rev"))
        .select("l_suppkey", "total_rev")
    )
    return s.join(
        F.broadcast(top), F.col("l_suppkey") == s.s_suppkey
    ).select("s_suppkey", "s_name", "total_rev")


@query(
    "semi_anti_join",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
    """,
    description="Anti join: customers with no large orders (LEFT ANTI — the "
    "probe side's payload never materializes).",
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where("o_totalprice > 300000")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "asof_join_last_order",
    oracle="""
        SELECT event_id, user_id, time, o_orderkey, order_time
        FROM (
            SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS time,
                   o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS order_time,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) t
        WHERE rn = 1
    """,
    description="As-of join (backward): each event matched to the user's most "
    "recent prior order. Spark lacks a native as-of; implemented as the "
    "union-sort merge-asof: tag both sides, one shuffle+sort on (key, time), "
    "running last-order via an ignorenulls window. Strictly linear in "
    "|events|+|orders| — the naive equi-join+range+top-1 formulation "
    "materializes |events_per_key|×|orders_per_key| rows per key and dies "
    "on skewed keys (measured 100M intermediate rows on this fixture).",
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumnRenamed("ts", "time")
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_orderdate", "order_time")
    # tag 0 = order, 1 = event; at equal timestamps the order sorts first so
    # an order at exactly the event time qualifies (order_time <= time).
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("order_time").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
    )
    ev = e.select(
        F.col("user_id").alias("k"),
        F.col("time").alias("t"),
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    # Ascending (t, tag, o_orderkey): among equal-time orders the LAST seen
    # (highest orderkey) wins — same tie-break as the oracle's
    # ORDER BY order_time DESC, o_orderkey DESC LIMIT 1.
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = od.unionByName(ev).select(
        "k",
        "t",
        "tag",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last(F.when(F.col("tag") == 0, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("order_time"),
    )
    return (
        merged.where((F.col("tag") == 1) & F.col("o_orderkey").isNotNull())
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("time"),
            "o_orderkey",
            "order_time",
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------
@query(
    "full_outer_reconcile",
    oracle="""
        SELECT coalesce(c.c_custkey, e.user_id) AS entity_id,
               CASE WHEN c.c_custkey IS NULL THEN 'events_only'
                    WHEN e.user_id IS NULL THEN 'customer_only'
                    ELSE 'both' END AS presence,
               coalesce(e.n_events, 0) AS n_events,
               c.c_mktsegment
        FROM (SELECT c_custkey, c_mktsegment FROM customer) c
        FULL OUTER JOIN (
            SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
        ) e ON e.user_id = c.c_custkey
    """,
    description="FULL OUTER reconciliation of two entity sets with presence "
    "classification — the id-coverage audit pattern.",
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    e = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = c.join(e, c.c_custkey == e.user_id, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "user_id").alias("entity_id"),
        F.when(F.col("c_custkey").isNull(), "events_only")
        .when(F.col("user_id").isNull(), "customer_only")
        .otherwise("both")
        .alias("presence"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "c_mktsegment",
    )


@query(
    "semi_join_active_customers",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM events e
            WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase'
        )
    """,
    description="LEFT SEMI join (EXISTS): probe-side payload never "
    "materializes, build side deduplicates — cheapest existence check.",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    e = load(spark, sf_dir, "events").where("event_type = 'purchase'")
    return c.join(e, c.c_custkey == e.user_id, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "window_topn_per_user",
    oracle="""
        SELECT user_id, event_id, value, rn
        FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id
                   ) AS rn
            FROM events
        ) t
        WHERE rn <= 3
    """,
    description="Partitioned top-N: row_number window with deterministic "
    "tie-break, filtered to N (the scalable per-group top-k).",
)
def window_topn_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


@query(
    "window_running_total",
    oracle="""
        SELECT event_id, user_id,
               round(sum(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 4) AS running_value,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
        WHERE ts IS NOT NULL
    """,
    description="Running aggregate + lag over an ordered per-user frame "
    "(sessionization building blocks).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events_timed(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(frame), 4).alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@query(
    "window_range_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               floor(avg(value) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP)) * 1000000)
                            AS BIGINT)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) * 10000.0 + 0.5) / 10000.0 AS avg_1h
        FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events
    """,
    description="RANGE-frame window: trailing 1-hour moving average keyed on "
    "event time (microsecond range frame) — value-based frames, not row "
    "counts, so sparse and dense series behave identically.",
)
def window_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events_measured(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        stable_round(F.avg("value").over(w), 4).alias("avg_1h"),
    )


@query(
    "unpivot_part_attrs",
    oracle="""
        SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val
        FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val
        FROM part
    """,
    description="UNPIVOT/melt: wide attribute columns to long (attr, val) "
    "rows — a narrow transformation, no shuffle.",
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "attr", "val")


#: Shared oracle for the two props-explode faces (map explode + UDTF) —
#: the functions/jsonpath.py contract: every key occurrence is a row;
#: a path-unsafe key (SAFE_KEY_RE, the union of both engines' path-
#: parser hazards — evaluated under CASE so DuckDB never runs a path it
#: would RAISE on, e.g. an empty key) or a non-integer-shaped value
#: (INT_SHAPE_RE — bare TRY_CAST would ROUND '3.7' to 4 where Spark's
#: is NULL) yields val NULL. Extraction is first-wins on duplicates,
#: quoted so dotted/spaced keys reach their member (ADVICE r8: the old
#: '$.' || key form silently NULLed any dotted key).
_PROPS_KV_ORACLE = f"""
        WITH kv AS (
            SELECT event_id, k.key,
                   CASE WHEN regexp_matches(k.key, '{SAFE_KEY_RE}')
                        THEN json_extract_string(
                                 props, '$."' || k.key || '"')
                   END AS raw
            FROM events,
                 unnest(CASE WHEN json_valid(props)
                             THEN json_keys(props) END) AS k(key)
            WHERE props IS NOT NULL
        )
        SELECT event_id, key,
               TRY_CAST(CASE WHEN regexp_matches(raw, '{INT_SHAPE_RE}')
                             THEN raw END AS INT) AS val
        FROM kv
    """


@query(
    "json_props_map",
    oracle=_PROPS_KV_ORACLE,
    description="Dynamic JSON document → map explode (the Mongo schemaless-"
    "document pattern): one row per TOP-LEVEL KEY OCCURRENCE of a valid "
    "object root, value = int of that key's FIRST value under the "
    "functions/jsonpath.py contract — quoted-path extraction (dotted/"
    "spaced keys work; keys in the union of both engines' path-parser "
    "hazard sets are enumerable but yield NULL), integer-shaped values "
    "only (DuckDB's bare TRY_CAST rounds '3.7' to 4 where Spark's is "
    "NULL — ADVICE r8). Key enumeration (json_object_keys / json_keys, "
    "both of which keep duplicate keys and return nothing for non-"
    "object or malformed roots) + path extraction (first-wins on "
    "duplicates in both engines) replaces the old strict from_json "
    "map<string,int> — whose all-or-nothing document semantics matches "
    "no DuckDB spelling on adversarial documents (json sweep, r8/r9).",
)
def json_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("props").isNotNull())
    keyed = e.select(
        "event_id",
        "props",
        F.explode(F.expr("json_object_keys(props)")).alias("key"),
    )
    # raw in its OWN projection: it feeds two output expressions (shape
    # guard + cast) and get_json_object re-parses the document — without
    # the alias CollapseProject would inline the parse per reference.
    raw = keyed.select(
        "event_id",
        "key",
        F.when(
            F.col("key").rlike(SAFE_KEY_RE),
            # bracket path $['k'] — the Spark spelling that reaches
            # dotted/spaced members; char(39) is the quote, so no
            # SQL-literal backslash games.
            F.expr(
                "get_json_object(props, "
                "concat('$[', char(39), key, char(39), ']'))"
            ),
        ).alias("raw"),
    )
    return raw.select(
        "event_id",
        "key",
        F.when(F.col("raw").rlike(INT_SHAPE_RE), F.col("raw"))
        .try_cast("int")
        .alias("val"),
    )


@query(
    "window_rank_family",
    oracle="""
        SELECT event_id, user_id,
               ntile(4)      OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist()    OVER w, 6) AS cume,
               dense_rank()  OVER w AS drank,
               first_value(event_id) OVER w AS first_ev,
               last_value(event_id) OVER (
                   PARTITION BY user_id
                   ORDER BY value NULLS LAST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_ev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value NULLS LAST, event_id)
    """,
    description="The full ranking-window family (ntile / percent_rank / "
    "cume_dist / dense_rank / first_value / last_value with an explicit "
    "whole-partition frame) — one shuffle+sort serves all six. NULL "
    "ordering is EXPLICIT on both sides: Spark defaults ASC to NULLS "
    "FIRST, DuckDB to NULLS LAST, so any nullable ORDER BY column "
    "silently shifts every rank in partitions containing NULLs "
    "(caught by tools/nullify_fixtures.py).",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
        F.first("event_id").over(w).alias("first_ev"),
        F.last("event_id").over(whole).alias("last_ev"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------
@query(
    "sort_topk_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    description="Global top-k: orderBy+limit compiles to TakeOrderedAndProject "
    "(per-partition heap + driver merge), never a full global sort.",
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@query(
    "set_ops_customers",
    oracle="""
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
            WHERE o_orderstatus = 'F' AND o_totalprice > 400000
    """,
    description="UNION (distinct) + EXCEPT chain — set semantics over key sets.",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    building = c.where("c_mktsegment = 'BUILDING'").select("c_custkey")
    rich = c.where("c_acctbal > 9000").select("c_custkey")
    big_f = (
        o.where("o_orderstatus = 'F' AND o_totalprice > 400000")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.union(rich).distinct().exceptAll(big_f.distinct())


@query(
    "intersect_active_buyers",
    oracle="""
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    """,
    description="INTERSECT of two filtered key sets.",
)
def intersect_active_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.where("event_type = 'purchase'").select("user_id")
        .intersect(e.where("event_type = 'click'").select("user_id"))
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / distinct aggregates
# ---------------------------------------------------------------------------
@query(
    "rollup_events_daily",
    oracle="""
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events
        GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
    description="ROLLUP hierarchy (type → day → grand total) in one shuffle.",
)
def rollup_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return e.rollup("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )


@query(
    "cube_type_by_weekday",
    oracle="""
        SELECT event_type, CAST(isodow(ts) AS INT) AS weekday,
               count(*) AS n,
               floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
        FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events
        GROUP BY CUBE (event_type, CAST(isodow(ts) AS INT))
    """,
    description="CUBE over two dimensions (all 4 grouping sets).",
)
def cube_type_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ISO weekday (Mon=1..Sun=7) matches DuckDB's isodow.
    e = load_events_measured(spark, sf_dir).withColumn(
        "weekday", F.dayofweek(F.expr("ts - INTERVAL 1 DAY")).cast("int")
    )
    return e.cube("event_type", "weekday").agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "distinct_users_per_type",
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    description="Exact distinct aggregate (expand+two-phase under the hood); "
    "see approx_distinct_users for the sketch path.",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions: string/date/math/json
# ---------------------------------------------------------------------------
@query(
    "scalar_string_math",
    oracle=r"""
        SELECT p_partkey,
               upper(p_brand)                                   AS brand_upper,
               substr(p_name, 1, 8)                             AS name_prefix,
               length(p_name)                                   AS name_len,
               replace(p_type, ' ', '_')                        AS type_slug,
               regexp_extract(p_type, '(\w+)$', 1)              AS type_last,
               concat(p_brand, '#', CAST(p_size AS VARCHAR))    AS brand_size,
               round(sqrt(p_retailprice), 6)                    AS price_sqrt,
               round(ln(p_retailprice + 1), 6)                  AS price_ln,
               CAST(ceil(p_retailprice) AS BIGINT)              AS price_ceil,
               abs(p_size - 25)                                 AS size_dev,
               p_partkey % 7                                    AS bucket
        FROM part
    """,
    description="String/math scalar functions — all JVM-side Column exprs.",
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.regexp_extract("p_type", r"(\w+)$", 1).alias("type_last"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log1p("p_retailprice"), 6).alias("price_ln"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("bucket"),
    )


@query(
    "scalar_date_json",
    oracle="""
        SELECT event_id,
               CAST(year(ts) AS INT)                            AS y,
               CAST(month(ts) AS INT)                           AS m,
               CAST(day(ts) AS INT)                             AS d,
               CAST(hour(ts) AS INT)                            AS h,
               CAST(date_trunc('day', ts) AS TIMESTAMP)         AS day_start,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS unix_sec,
               TRY_CAST(CASE WHEN json_valid(props)
                             THEN (CASE WHEN regexp_matches(
                                       json_extract_string(props, '$.k'),
                                       '{INT_SHAPE}')
                                   THEN json_extract_string(props, '$.k')
                                   END) END
                        AS INT) AS prop_k
        FROM events
    """.replace("{INT_SHAPE}", INT_SHAPE_RE),
    description="Date-part extraction + epoch + JSON field extraction "
    "(events.props is a JSON string — the Mongo dynamic-document "
    "analogue). Extraction is TOLERANT on both sides: a malformed "
    "document, non-numeric value, or int32 overflow is NULL, never an "
    "error (json sweep, round 8); integer-SHAPED values only (the "
    "functions/jsonpath.py contract — DuckDB's bare TRY_CAST rounds "
    "'3.7' to 4 where Spark's ANSI try_cast is NULL; ADVICE r8).",
)
def scalar_date_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        # FLOOR seconds, not truncation: unix_timestamp() drops the
        # fractional second toward ZERO, so a PRE-EPOCH reading like
        # 1905-...T07:00:00.5 lands one second late vs DuckDB's
        # floor(epoch()) (extreme-ts sweep, round 8). pmod makes the
        # floor exact in integer micros — no double in sight.
        F.expr(
            "(unix_micros(ts) - pmod(unix_micros(ts), 1000000)) "
            "div 1000000"
        ).alias("unix_sec"),
        F.expr(
            "try_cast(CASE WHEN get_json_object(props, '$.k') "
            f"RLIKE '{INT_SHAPE_RE}' "
            "THEN get_json_object(props, '$.k') END AS INT)"
        ).alias("prop_k"),
    )


@query(
    "pivot_event_matrix",
    oracle="""
        SELECT user_id,
               count(CASE WHEN event_type = 'click' THEN 1 END)    AS click,
               count(CASE WHEN event_type = 'view' THEN 1 END)     AS view,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END)   AS signup,
               count(CASE WHEN event_type = 'error' THEN 1 END)    AS error
        FROM events
        GROUP BY user_id
    """,
    description="Pivot (explicit value list → one shuffle; an unpivoted "
    "value list would need a discovery pass first).",
)
def pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0, subset=["click", "view", "purchase", "signup", "error"])
    )


@query(
    "unpivot_event_matrix",
    oracle="""
        WITH m AS (
            SELECT user_id,
                   count(CASE WHEN event_type = 'click' THEN 1 END)    AS click,
                   count(CASE WHEN event_type = 'view' THEN 1 END)     AS view,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                   count(CASE WHEN event_type = 'signup' THEN 1 END)   AS signup,
                   count(CASE WHEN event_type = 'error' THEN 1 END)    AS error
            FROM events
            GROUP BY user_id
        )
        SELECT user_id, event_type, CAST(n AS BIGINT) AS n
        FROM m UNPIVOT (n FOR event_type IN (click, view, purchase, signup, error))
    """,
    description="UNPIVOT (melt): the wide per-user event matrix back to "
    "long (user, type, count) rows — the round trip of "
    "pivot_event_matrix. Spark's unpivot is a zero-shuffle Expand over "
    "the wide rows; output width is rows × value-columns, so at scale "
    "unpivot the columns you need, not the whole matrix. Absent "
    "(user, type) combos are 0 on BOTH engines: DuckDB's count(CASE) is "
    "0 (never NULL) so its UNPIVOT keeps every cell, and the Spark side "
    "na.fill(0)s its pivot NULLs to match — all users × 5 types.",
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0, subset=["click", "view", "purchase", "signup", "error"])
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["click", "view", "purchase", "signup", "error"],
        variableColumnName="event_type",
        valueColumnName="n",
    )


@query(
    "grouping_sets_explicit",
    oracle="""
        SELECT c_mktsegment, c_nationkey,
               count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    description="Explicit GROUPING SETS (segment-only, nation-only, grand "
    "total) — finer control than rollup/cube, still one expand+shuffle.",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "percentiles_by_type",
    oracle="""
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events
        GROUP BY event_type
    """,
    description="Exact interpolated percentiles per group. At 100 TB swap "
    "for approx_percentile (t-digest sketch, mergeable map-side) — see "
    "approx_distinct_users for the sketch pattern.",
)
def percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events_measured(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "histogram_quantile_sketch",
    oracle="""
        WITH rows_ AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
            FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events WHERE value IS NOT NULL
        ),
        hist AS (
            SELECT event_type, least(cents // 800, 63) AS bin,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM rows_ GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, bin, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)
                        AS BIGINT) AS cum
            FROM hist
        ),
        tot AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   quantile_cont(cents, 2.5e-1) AS x25,
                   quantile_cont(cents, 5e-1)   AS x50,
                   quantile_cont(cents, 7.5e-1) AS x75
            FROM rows_ GROUP BY 1
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_rows,
               floor(min(CASE WHEN cum >= CAST(ceil(2.5e-1 * n) AS BIGINT)
                               AND cum - cnt < CAST(ceil(2.5e-1 * n) AS BIGINT)
                              THEN (bin * 800 + 8e2 * (CAST(ceil(2.5e-1 * n) AS BIGINT)
                                    - (cum - cnt)) / cnt) / 1e2 END)
                     * 1e4 + 5e-1) / 1e4 AS est_p25,
               floor(min(CASE WHEN cum >= CAST(ceil(5e-1 * n) AS BIGINT)
                               AND cum - cnt < CAST(ceil(5e-1 * n) AS BIGINT)
                              THEN (bin * 800 + 8e2 * (CAST(ceil(5e-1 * n) AS BIGINT)
                                    - (cum - cnt)) / cnt) / 1e2 END)
                     * 1e4 + 5e-1) / 1e4 AS est_p50,
               floor(min(CASE WHEN cum >= CAST(ceil(7.5e-1 * n) AS BIGINT)
                               AND cum - cnt < CAST(ceil(7.5e-1 * n) AS BIGINT)
                              THEN (bin * 800 + 8e2 * (CAST(ceil(7.5e-1 * n) AS BIGINT)
                                    - (cum - cnt)) / cnt) / 1e2 END)
                     * 1e4 + 5e-1) / 1e4 AS est_p75,
               floor(max(x25) / 1e2 * 1e4 + 5e-1) / 1e4 AS exact_p25,
               floor(max(x50) / 1e2 * 1e4 + 5e-1) / 1e4 AS exact_p50,
               floor(max(x75) / 1e2 * 1e4 + 5e-1) / 1e4 AS exact_p75
        FROM cum JOIN tot USING (event_type)
        GROUP BY event_type
    """,
    description="The ORACLE-CHECKABLE quantile-sketch tier (sibling of the "
    "portable HLL): per-type quantiles estimated from a FIXED-BOUNDARY "
    "64-bin integer-cents histogram — bin counts are exact mergeable "
    "integers (map-side combine; per-batch partials SUM, the property "
    "approx_percentile's t-digest has but can't oracle-check), the "
    "estimate interpolates inside the hit bin with deterministic double "
    "arithmetic, and exact percentiles (integer cents at binary-fraction "
    "quantiles — bit-identical across engines, CLAUDE.md r5) ride along "
    "as the in-row accuracy witness. Fixed boundaries are the "
    "known-value-range production pattern; t-digest covers the unknown "
    "range case (approx_percentiles_by_type, accuracy-gated in pytest).",
)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    rows = (
        load_events_measured(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    hist = rows.groupBy(
        "event_type", F.least(F.expr("cents div 800"), F.lit(63)).alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = hist.select(
        "event_type", "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    tot = rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(cents, 0.25D)").alias("x25"),
        F.expr("percentile(cents, 0.5D)").alias("x50"),
        F.expr("percentile(cents, 0.75D)").alias("x75"),
    )

    def est(q: float):
        target = F.ceil(F.lit(q) * F.col("n"))
        before = F.col("cum") - F.col("cnt")
        hit = (F.col("cum") >= target) & (before < target)
        e_cents = (
            F.col("bin") * 800 + F.lit(8e2) * (target - before) / F.col("cnt")
        )
        return F.min(F.when(hit, e_cents / F.lit(1e2)))

    def r4(c):
        return F.floor(c * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)

    return (
        cum.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_rows"),
            r4(est(0.25)).alias("est_p25"),
            r4(est(0.5)).alias("est_p50"),
            r4(est(0.75)).alias("est_p75"),
            r4(F.max("x25") / F.lit(1e2)).alias("exact_p25"),
            r4(F.max("x50") / F.lit(1e2)).alias("exact_p50"),
            r4(F.max("x75") / F.lit(1e2)).alias("exact_p75"),
        )
    )


@query(
    "winsorize_by_type",
    oracle="""
        WITH cuts AS (
            SELECT event_type,
                   floor(quantile_cont(value, 0.05) * 1e4 + 0.5) / 1e4 AS lo,
                   floor(quantile_cont(value, 0.95) * 1e4 + 0.5) / 1e4 AS hi
            FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               floor(least(greatest(value, lo), hi) * 1e4 + 0.5) / 1e4
                   AS clipped,
               (value < lo OR value > hi) AS was_clipped
        FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) e JOIN cuts USING (event_type)
    """,
    description="Per-group winsorization: clip each value into its "
    "group's [p05, p95] band — the outlier-taming step a training "
    "pipeline applies to lengths/scores before normalization. Exact "
    "interpolated percentiles reduce each group to a 2-number cut "
    "record; the join-back is an aggregate-over-the-same-table joined "
    "without a hint (AQE broadcasts the cuts while small). Cuts are "
    "half-up rounded to 1e-4 BEFORE comparison on BOTH engines so an "
    "ulp of interpolation drift can't flip a boundary row's clip flag.",
)
def winsorize_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events_measured(spark, sf_dir)
    r4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    cuts = e.groupBy("event_type").agg(
        r4(F.expr("percentile(value, 0.05)")).alias("lo"),
        r4(F.expr("percentile(value, 0.95)")).alias("hi"),
    )
    return e.join(cuts, "event_type").select(
        "event_id",
        "event_type",
        r4(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))).alias(
            "clipped"
        ),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "was_clipped"
        ),
    )


@query(
    "correlated_max_order",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey AS top_orderkey,
               o.o_totalprice AS top_price
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice = (
            SELECT max(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = c.c_custkey
        )
        AND o.o_orderkey = (
            SELECT min(o3.o_orderkey) FROM orders o3
            WHERE o3.o_custkey = c.c_custkey
              AND o3.o_totalprice = o.o_totalprice
        )
    """,
    description="Correlated scalar subquery (each customer's max-price "
    "order, deterministic tie-break) — decorrelates to an aggregate+join; "
    "expressed directly as max_by with a join-free single shuffle.",
)
def correlated_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    top = o.groupBy("o_custkey").agg(
        F.max_by(
            F.struct("o_totalprice", "o_orderkey"),
            # max_by on (price, -orderkey): highest price, lowest key on ties
            F.struct(F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg")),
        ).alias("top")
    )
    return (
        c.join(top, c.c_custkey == top.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("top.o_orderkey").alias("top_orderkey"),
            F.col("top.o_totalprice").alias("top_price"),
        )
    )


@query(
    "udaf_geomean_value",
    oracle="""
        SELECT event_type,
               round(exp(avg(ln(value))), 4) AS geo_mean
        FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events
        WHERE value > 0
        GROUP BY event_type
    """,
    description="Custom aggregate via pandas GROUPED_AGG UDAF (geometric "
    "mean; Arrow ships each group's values once, numpy reduces). The oracle "
    "is its algebraic identity exp(avg(ln x)) — the gate checks the UDAF "
    "mechanism end to end.",
)
def udaf_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from node_mongo2influx_spark.functions.udxf import geomean

    e = load_events_measured(spark, sf_dir).where("value > 0")
    return e.groupBy("event_type").agg(
        F.round(geomean("value"), 4).alias("geo_mean")
    )


@query(
    "udtf_explode_props",
    oracle=_PROPS_KV_ORACLE,
    description="Python UDTF (Spark 3.5+ table function): one row per JSON "
    "property, lateral-joined to the source — the UDTF surface, oracle-"
    "checked against the native json path. Same key-occurrence/"
    "first-wins/path-safe/integer-shape semantics as json_props_map "
    "(the functions/jsonpath.py contract; the UDTF parses with "
    "object_pairs_hook so duplicate keys survive where a plain dict "
    "would silently last-wins them, and NULLs the value of path-unsafe "
    "keys it could technically read — ADVICE r8: it must not be MORE "
    "capable than the engine paths it is oracle-checked against).",
)
def udtf_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from node_mongo2influx_spark.functions.udxf import ExplodeProps

    spark.udtf.register("explode_props", ExplodeProps)
    load(spark, sf_dir, "events").createOrReplaceTempView("events_udtf")
    return spark.sql(
        """
        SELECT e.event_id, t.key, t.val
        FROM events_udtf e, LATERAL explode_props(e.props) t
        WHERE e.props IS NOT NULL
        """
    )


@query(
    "approx_percentiles_by_type",
    # Bounded-witness FULL oracle (round 7, VERDICT r6 #3): the sketch
    # value itself is engine-specific, but its GUARANTEE is not — the
    # Greenwald-Khanna contract says the returned element's rank
    # interval [count(<p)+1, count(<=p)] overlaps q·n ± n/accuracy.
    # Spark outputs per-group exact counts plus ok_* booleans checking
    # that contract IN-ROW; DuckDB replays the exacts and literal TRUE.
    oracle="""
        SELECT event_type, CAST(count(value) AS BIGINT) AS n,
               TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
        FROM events GROUP BY event_type
    """,
    description="approx_percentile (Greenwald-Khanna, accuracy 10000): "
    "the mergeable-sketch percentile path for 100 TB — map-side partial "
    "sketches, constant memory per group. Converted from rows-only to a "
    "bounded-witness FULL oracle: each group carries its exact non-null "
    "count n and one boolean per quantile asserting the GK rank "
    "guarantee (the returned value's rank interval overlaps q*n +- "
    "n/accuracy, +-1 slack for interpolation) — the sketch value stays "
    "Spark-native, the GUARANTEE is what both engines agree on. The "
    "rank check joins the 3 per-group sketch outputs back to the rows "
    "(a broadcast of the bounded per-type aggregate) and counts "
    "value < p / value <= p per group.",
)
def approx_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "value")
    ap = e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("p90"),
        F.expr("approx_percentile(value, 0.99, 10000)").alias("p99"),
        F.count("value").alias("n"),
    )
    # eqNullSafe: a NULL event_type group must survive the rank-check
    # join (plain equi-join keys never match NULL, which would drop the
    # NULL group entirely while the oracle's GROUP BY emits it).
    ap_r = ap.withColumnRenamed("event_type", "__ap_type")
    j = e.join(
        F.broadcast(ap_r), F.col("event_type").eqNullSafe(F.col("__ap_type"))
    ).drop("__ap_type")
    eps = 1.0 / 10000

    def lo(p):  # min possible rank of the returned element
        return F.sum(F.when(F.col("value") < F.col(p), 1).otherwise(0)) + 1

    def hi(p):  # max possible rank of the returned element
        return F.sum(F.when(F.col("value") <= F.col(p), 1).otherwise(0))

    ranks = j.groupBy("event_type").agg(
        F.first("n").alias("n"),
        *[x for p in ("p50", "p90", "p99") for x in (
            lo(p).alias(f"lo_{p}"), hi(p).alias(f"hi_{p}"))],
    )

    def ok(p, q):
        n = F.col("n").cast("double")
        slack = F.lit(eps) * n + F.lit(1.0)
        cond = (F.col(f"hi_{p}") >= q * n - slack) & (
            F.col(f"lo_{p}") <= q * n + slack
        )
        # all-NULL group: the sketch returns NULL, counts are 0 — the
        # contract is vacuous, matching the oracle's unconditional TRUE
        return F.when(F.col("n") == 0, F.lit(True)).otherwise(cond).alias(
            f"ok_{p}"
        )

    return ranks.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        ok("p50", F.lit(0.5)),
        ok("p90", F.lit(0.9)),
        ok("p99", F.lit(0.99)),
    )


@query(
    "grouped_zscore",
    oracle="""
        SELECT event_id, user_id,
               round((value - avg(value) OVER w)
                     / nullif(stddev_samp(value) OVER w, 0), 4) AS zscore
        FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events
        WINDOW w AS (PARTITION BY user_id)
    """,
    description="Per-group normalization via applyInPandas (grouped-map "
    "UDF: each user's rows arrive as one pandas frame, numpy standardizes). "
    "Oracle is the equivalent window SQL — the gate checks the grouped-map "
    "mechanism itself. Native windows are preferred when expressible; this "
    "exists for transforms that genuinely need whole-group pandas access.",
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events_measured(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )

    def standardize(pdf):
        import numpy as np
        import pandas as pd

        # numpy directly, not pandas Series ops: with many small groups
        # the per-group pandas dispatch dominated (measured r11: 0.76x
        # from this body alone, values bit-identical — both spellings
        # are the same two-pass pairwise-summed moments; this repo has
        # no bottleneck install to divert pandas onto another kernel).
        v = pdf["value"].to_numpy(dtype="float64", na_value=np.nan)
        n_ok = int(np.count_nonzero(~np.isnan(v)))
        std = float(np.nanstd(v, ddof=1)) if n_ok >= 2 else float("nan")
        # SQL NULL semantics: stddev_samp is NULL for a 1-row group (numpy:
        # NaN) and the oracle NULLIFs a zero stddev — the raw kernel would
        # emit NaN and ±inf respectively, which the comparator treats as
        # values.
        if not np.isfinite(std) or std == 0.0:
            out = pd.DataFrame(
                {"event_id": pdf["event_id"], "user_id": pdf["user_id"]}
            )
            out["zscore"] = None
            return out
        mean = float(np.nanmean(v))
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": np.round((v - mean) / std, 4),
            }
        )

    return e.groupBy("user_id").applyInPandas(
        standardize, schema="event_id long, user_id long, zscore double"
    )


@query(
    "approx_distinct_users",
    # Bounded-witness FULL oracle (round 7, VERDICT r6 #3): the HLL++
    # estimate is engine-specific; its rsd-derived error bound is not.
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_bound
        FROM events GROUP BY event_type
    """,
    description="approx_count_distinct (HyperLogLog++, rsd=0.01): the "
    "mergeable-sketch path for distinct counts at 100 TB — map-side "
    "partial sketches, no exact-distinct expand. Converted from "
    "rows-only to a bounded-witness FULL oracle: each group outputs its "
    "exact distinct count (computed via a pre-aggregated distinct-pair "
    "count — never in the same groupBy as the sketch, which would plan "
    "an Expand) and within_bound = |approx - exact| <= max(5*rsd*exact, "
    "2) — five standard deviations plus absolute slack for tiny groups; "
    "HLL++ at rsd=0.01 holds a sparse exact representation well past "
    "these cardinalities, so the bound is comfortably loose. DuckDB "
    "replays the exact count and literal TRUE.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )
    exact = (
        e.where(F.col("user_id").isNotNull())
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    # left join from approx: a group whose users are all NULL has an
    # approx row (estimate 0) but no exact row — coalesce to 0 like
    # count(DISTINCT) would give. eqNullSafe so a NULL event_type group
    # still matches its exact row (plain keys never join NULL=NULL,
    # which would force exact_users=0 while the oracle counts it).
    exact_r = exact.withColumnRenamed("event_type", "__ex_type")
    out = approx.join(
        exact_r,
        F.col("event_type").eqNullSafe(F.col("__ex_type")),
        "left",
    ).select(
        "event_type",
        F.coalesce("exact_users", F.lit(0)).cast("long").alias("exact_users"),
        "approx_users",
    )
    bound = F.greatest(
        F.ceil(F.lit(0.05) * F.col("exact_users")).cast("long"), F.lit(2)
    )
    return out.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users")) <= bound
        ).alias("within_bound"),
    )


def _hll_portable_oracle() -> str:
    from node_mongo2influx_spark.functions.hll import hll_oracle_sql

    hll = hll_oracle_sql(
        "SELECT event_type, CAST(user_id AS VARCHAR) AS __v "
        "FROM events WHERE user_id IS NOT NULL",
        "event_type",
    )
    return f"""
        WITH hll AS ({hll}),
        ex AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM events GROUP BY 1
        )
        SELECT hll.event_type, ex.exact_users, hll.hll_estimate,
               hll.used_buckets, hll.zero_buckets, hll.sum_inv_scaled
        FROM hll JOIN ex USING (event_type)
    """


@query(
    "hll_portable_distinct",
    oracle=_hll_portable_oracle(),
    description="The ORACLE-CHECKABLE sketch tier of approx_distinct_users: "
    "a from-scratch HyperLogLog over the portable FNV-1a hash "
    "(functions/hll.py) — registers are max-merged integer partials, the "
    "harmonic core stays an EXACT INTEGER (sum_inv_scaled), and the "
    "estimate (with the standard linear-counting small-range branch) is "
    "bit-identical across engines. Exact distinct joined alongside, so the "
    "row itself witnesses sketch accuracy. Spark's native HLL++ remains "
    "the production path; this proves the mergeable-sketch algebra the "
    "100 TB distinct-count posture rests on (O(m) state, partials "
    "storable and mergeable across days/partitions).",
)
def hll_portable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from node_mongo2influx_spark.functions.hll import hll_count_distinct

    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    hll = hll_count_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return hll.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        "hll_estimate",
        "used_buckets",
        "zero_buckets",
        "sum_inv_scaled",
    )


@query(
    "array_functions",
    oracle="""
        WITH raw AS (
            SELECT vec_id,
                   len(embedding) AS dim,
                   CAST(embedding[1] AS DOUBLE) AS first_raw,
                   CAST(embedding[64] AS DOUBLE) AS last_raw,
                   -- LEFT FOLD (list_reduce), not list_sum: list_sum's
                   -- accumulation order differs from Spark's aggregate()
                   -- fold — 2 ulps apart on 1e78 sums (embed sweep r10,
                   -- huge class). NULLs made explicit: Spark's fold
                   -- propagates a NULL element (and a NULL vector) to a
                   -- NULL sum, and the guard also keeps list_prepend off
                   -- NULL lists (it mints [0.0], r8)
                   CASE WHEN embedding IS NULL THEN NULL
                        WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
                        THEN NULL
                        ELSE list_reduce(list_prepend(
                             CAST(0.0 AS DOUBLE),
                             list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)
                                       * CAST(x AS DOUBLE))),
                             (a, b) -> a + b) END AS sq_raw,
                   CAST(list_max(embedding) AS DOUBLE) AS max_raw
            FROM embeddings
        )
        -- magnitude-gated round: DuckDB's round(x, 6) goes through
        -- x * 1e6, which is ulp-lossy past 2^53 (measured 2 ulps at
        -- 1e78) where Spark's BigDecimal round is exact — above 1e9
        -- the fraction is beyond double resolution anyway, so both
        -- sides pass the raw value through. "+ 0.0" normalizes IEEE
        -- signed zero (DuckDB round of a tiny negative yields -0.0,
        -- Spark +0.0; embed sweep r10, denormal class)
        SELECT vec_id, dim,
               CASE WHEN abs(first_raw) < 1e9 THEN round(first_raw, 6)
                    ELSE first_raw END + 0.0 AS first_val,
               CASE WHEN abs(last_raw) < 1e9 THEN round(last_raw, 6)
                    ELSE last_raw END + 0.0 AS last_val,
               CASE WHEN abs(sq_raw) < 1e9 THEN round(sq_raw, 6)
                    ELSE sq_raw END + 0.0 AS sq_norm,
               CASE WHEN abs(max_raw) < 1e9 THEN round(max_raw, 6)
                    ELSE max_raw END + 0.0 AS max_val
        FROM raw
    """,
    description="Array column functions over embeddings (size, element_at, "
    "higher-order aggregate for the squared norm) — vector math without UDFs.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_norm = F.aggregate(
        dbl, F.lit(0.0), lambda acc, x: acc + x * x
    )
    def r6(col):
        # magnitude-gated round + IEEE -0.0 normalization (oracle comment)
        return F.when(F.abs(col) < 1e9, F.round(col, 6)).otherwise(col) + F.lit(
            0.0
        )

    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        r6(F.element_at(dbl, 1)).alias("first_val"),
        r6(F.element_at(dbl, 64)).alias("last_val"),
        r6(sq_norm).alias("sq_norm"),
        r6(F.array_max(F.col("embedding")).cast("double")).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# Round 3: additional TPC-H-shaped join/agg patterns (Q10/Q12/Q14/Q18) and
# the lead/lag window family.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_revenue",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1995-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    description="Returned-item revenue by customer, top 20 (TPC-H Q10 "
    "shape): a HIGH-CARDINALITY aggregation — the group key is the customer "
    "key itself, ~150k·sf groups, so the partial/final agg pair carries real "
    "weight (unlike the 6-group q1). Joins: lineitem⋈orders shuffles on "
    "orderkey; customer is unhinted (AQE broadcasts while small, "
    "shuffle-hash at scale); nation (25 rows) is broadcast-hinted. "
    "TakeOrderedAndProject caps the result without a global sort.",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "1995-01-01")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= DATE '1995-06-01'
        GROUP BY l.l_returnflag
    """,
    description="Conditional aggregation (TPC-H Q12 shape): per return flag, "
    "line counts split by order priority via sum(CASE WHEN) — both counts in "
    "ONE pass over the join, no second scan or self-join. The CASE stays a "
    "Column expression inside whole-stage codegen; the fact⋈fact join "
    "shuffles on orderkey with the date filter pushed to the lineitem scan.",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") >= "1995-06-01")
    o = load(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_pct",
    oracle="""
        SELECT round(
                 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4
               ) AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= DATE '1995-09-01'
          AND l.l_shipdate <  DATE '1995-10-01'
    """,
    description="Promotion revenue share (TPC-H Q14 shape): a scalar ratio "
    "of two conditional sums computed in one aggregation over "
    "lineitem⋈part. Part is unhinted (scales 200k·sf — AQE broadcasts while "
    "small); the one-month shipdate range is pushed to the lineitem scan, "
    "so the join input is ~1/84 of the fact table.",
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
        WITH big AS (
            SELECT l_orderkey
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 150
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM orders o
        JOIN big b      ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    description="Large-volume orders (TPC-H Q18 shape): a HAVING-filtered "
    "aggregate over the biggest fact table becomes the join key set — the "
    "aggregate-then-semi-join-back pattern. The groupBy(l_orderkey) agg is "
    "map-side-combined on the join key, so the subsequent join with orders "
    "reuses the same hash partitioning (no extra exchange under AQE); the "
    "HAVING filter cuts the key set to a sliver before anything joins.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == F.col("l_orderkey"))
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@query(
    "window_lead_lag_delta",
    oracle="""
        SELECT event_id, user_id,
               round(value - lag(value)  OVER w, 4) AS delta_prev,
               round(lead(value) OVER w - value, 4) AS delta_next,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT)
                   AS micros_since_prev
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="lead/lag window family: per-user value deltas against the "
    "previous and next event plus the inter-event gap in microseconds — one "
    "shuffle+sort on user_id serves all three offset functions (completes "
    "the window coverage: ranking, running, RANGE frame, offsets).",
)
def window_lead_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_events_timed(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                   * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)
                   - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                   * CAST(floor(l.l_quantity + 0.5) AS BIGINT) * 60)
                   / 10000.0 AS profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
    description="Profit by supplier nation and order year (TPC-H Q9 shape, "
    "supply cost synthesized as 60% of retail — the fixture has no "
    "partsupp): lineitem joins TWO fact-sized tables (orders on orderkey, "
    "part on partkey — different keys, so two shuffles is the honest "
    "minimum) plus unhinted supplier and broadcast nation; grouping is on a "
    "DERIVED date part. The p_name LIKE filter stays on the part scan. "
    "Currency handled as exact integer 1e-4 dollars summed in decimal "
    "(same discipline as q7 — floats would land on .xx5 round boundaries).",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    rev = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)) * F.floor(
        (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    )
    cost = (
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        * F.floor(F.col("l_quantity") + F.lit(0.5))
        * 60
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (F.sum((rev - cost).cast("decimal(24,0)")) / 10000.0).alias(
                "profit"
            )
        )
    )


@query(
    "skew_salted_rollup",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total
        FROM events
        GROUP BY event_type
    """,
    description="Hot-key-safe aggregation via explicit two-phase salting "
    "(functions/skew.py): rows spread over (key, salt) for the partial "
    "count+sum, then a tiny |keys|×buckets final pass — the tool for the "
    "one case AQE cannot fix (a hash-aggregate group that IS one key, e.g. "
    "a single event_type at 30% of a 100 TB table). The oracle is the "
    "plain GROUP BY, proving the salted plan computes the identical "
    "answer; equality is also property-tested in tests/test_property.py.",
)
def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from node_mongo2influx_spark.functions.skew import salted_stats

    e = load(spark, sf_dir, "events")
    out = salted_stats(e, keys=["event_type"], value_col="value", buckets=32)
    return out.select(
        "event_type", "n", F.round("total", 2).alias("total")
    )


@query(
    "q4_order_priority_check",
    oracle="""
        SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate <  DATE '1995-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
    """,
    description="Order-priority check (TPC-H Q4 shape): EXISTS against "
    "lineitem with a CORRELATED inequality (shipdate > that order's date) "
    "— a left-semi join whose condition mixes the equi key with a "
    "non-equi residual. The quarter filter is pushed to the orders scan; "
    "the semi join keeps at most one match per order so no post-join "
    "dedup is needed.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-04-01")
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q13_customer_order_histogram",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey,
                   count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON o.o_custkey = c.c_custkey
             AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust
        GROUP BY c_count
    """,
    description="Customer order-count distribution (TPC-H Q13 shape): LEFT "
    "outer join so zero-order customers keep a row (count(o_orderkey) "
    "counts non-null matches only — the left-join-count idiom), then a "
    "second aggregation histograms the counts. First agg keys on custkey "
    "(high cardinality, partial/final), second on the tiny count domain.",
)
def q13_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity >= 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size <= 20 AND l.l_quantity >= 30)
           OR (p.p_brand = 'Brand#3' AND p.p_size <= 30 AND l.l_quantity >= 40)
    """,
    description="Disjunctive predicate revenue (TPC-H Q19 shape): an "
    "OR-of-ANDs mixing columns from both join sides. Catalyst splits it: "
    "the part-only disjunction (brand/size) and the lineitem-only one "
    "(quantity >= 20, the common lower bound) push below the join as "
    "derived filters; the mixed residual evaluates post-join. The plan "
    "gate asserts the scans are filtered, not bare.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size") <= 10)
            & (F.col("l_quantity") >= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size") <= 20)
            & (F.col("l_quantity") >= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size") <= 30)
            & (F.col("l_quantity") >= 40)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q22_dormant_high_balance",
    oracle="""
        WITH avg_bal AS (
            SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_mktsegment,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c.c_acctbal), 2) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.a
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000
          )
        GROUP BY c.c_mktsegment
    """,
    description="High-balance customers with no large orders (TPC-H Q22 "
    "shape): a scalar subquery (average positive balance) feeds an "
    "inequality filter — the 1-row aggregate cross-joins back as a "
    "broadcast, keeping one lazy plan — and NOT EXISTS against filtered "
    "orders is a left-anti join on the customer key. Segment rollup on "
    "the survivors.",
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            o.where(F.col("o_totalprice") > 400000),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
        WITH part_avg AS (
            SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p    ON p.p_partkey = l.l_partkey
        JOIN part_avg a ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < a.qty_cut
    """,
    description="Small-quantity order revenue (TPC-H Q17 shape): each "
    "lineitem compares against 0.2× the AVERAGE quantity OF ITS OWN PART — "
    "the correlated-aggregate-join-back pattern. The per-part average "
    "aggregates on the same key the join uses (partkey), so agg output and "
    "join probe share hash partitioning; the brand filter prunes the part "
    "side early. No correlated subquery re-execution — one aggregate, one "
    "join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    part_avg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q8_market_share",
    oracle="""
        WITH flows AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   sn.n_name AS supp_nation,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        )
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                              ELSE 0.0 END) / sum(volume), 6) AS mkt_share
        FROM flows
        GROUP BY o_year
    """,
    description="National market share by year (TPC-H Q8 shape): one "
    "nation's fraction of total supply volume — a conditional-sum ratio "
    "per group, computed in a single aggregation over the join (no "
    "second pass for the denominator). Supplier is unhinted; nation (25 "
    "rows) broadcast-hinted; the derived-year group key keeps the output "
    "tiny.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_7", volume).otherwise(0.0)
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q21_waiting_supplier",
    oracle="""
        WITH lo AS (
            SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        cand AS (
            SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
            FROM lo l1
            WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
              AND EXISTS (
                  SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                  SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY
              )
        )
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM cand
        JOIN supplier s ON s.s_suppkey = cand.l_suppkey
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    description="Suppliers who alone held up multi-supplier orders (TPC-H "
    "Q21 shape, lateness = shipped >60 days after order date). The naive "
    "form is a QUADRUPLE-correlated EXISTS/NOT-EXISTS self-join (the "
    "oracle keeps it, as the equivalence proof); the Spark plan "
    "DECORRELATES it into one per-order aggregate — distinct suppliers, "
    "distinct LATE suppliers, and the sole late supplier via min — "
    "filtered to (n_supp >= 2, n_late = 1). One shuffle on orderkey "
    "replaces three correlated probes of the biggest fact table.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    # Pre-aggregate to one row per (order, supplier) FIRST — then the
    # per-order pass needs only plain count/sum/min, no distinct
    # aggregates. Two count_distincts in one groupBy would plan an Expand
    # (3x the join output through the shuffle — the biggest intermediate
    # in the query); this shape keeps every row single-width.
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late"),
        F.min(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    blamed = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    ).select("late_supp")
    return (
        blamed.join(s, F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "null_semantics_probe",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT)     AS n_rows,
               CAST(count(props) AS BIGINT) AS n_props,
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)              AS n_null_props,
               CAST(count(DISTINCT props IS NULL) AS BIGINT) AS null_states,
               round(avg(CASE WHEN props IS NULL THEN NULL ELSE value END), 4)
                   AS avg_value_with_props
        FROM events
        GROUP BY event_type
    """,
    description="NULL-semantics parity probe: count(*) vs count(col) "
    "(null-excluding), explicit null counting, a boolean-distinct over "
    "IS NULL, and an aggregate whose input is nulled conditionally "
    "(avg ignores NULLs identically in both engines). Pins the exact "
    "NULL discipline every other aggregate in the registry relies on.",
)
def null_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("props").alias("n_props"),
        F.sum(
            F.when(F.col("props").isNull(), 1).otherwise(0)
        ).alias("n_null_props"),
        F.count_distinct(F.col("props").isNull()).alias("null_states"),
        F.round(
            F.avg(
                F.when(F.col("props").isNull(), F.lit(None)).otherwise(
                    F.col("value")
                )
            ),
            4,
        ).alias("avg_value_with_props"),
    )


# ---------------------------------------------------------------------------
# Round 4: the remaining TPC-H shapes (no partsupp table in the fixtures —
# the supply relation is derived from lineitem, which preserves each
# query's operator shape: correlated min join-back (q2), share-of-total
# HAVING (q11), nested semi-join chain over aggregates (q20))
# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS cost
            FROM lineitem GROUP BY 1, 2
        )
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
               round(ps.cost, 4) AS cost
        FROM supply ps
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        JOIN part p     ON p.p_partkey = ps.l_partkey
        WHERE r.r_name = 'EUROPE' AND p.p_size = 10 AND p.p_type = 'STANDARD'
          AND ps.cost = (
              SELECT min(ps2.cost) FROM supply ps2
              JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
              JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
              JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
              WHERE r2.r_name = 'EUROPE' AND ps2.l_partkey = ps.l_partkey
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """,
    description="Minimum-cost supplier (TPC-H Q2 shape; the supply "
    "relation is min unit price per (part, supplier) derived from "
    "lineitem). The correlated min DECORRELATES into one per-part "
    "aggregate joined back — one extra shuffle keyed on partkey instead "
    "of a per-row subquery. region/nation broadcast; supplier/part joins "
    "unhinted (AQE); min() is order-independent so the double equality "
    "is engine-safe (no summation involved). Top-100 via "
    "TakeOrderedAndProject.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part")
    supply = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    # euro_supply feeds BOTH the per-part min aggregate and the join-back
    # (the correlated-min shape) — without a checkpoint the lineitem-wide
    # supply aggregate + three joins run once per branch (no
    # ReusedExchange in the plan; CLAUDE.md consumed-≥2× rule). The
    # materialized table is (part, supplier)-level — bounded far below
    # lineitem.
    euro_supply = (
        supply.join(s, supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
        .localCheckpoint(eager=False)
    )
    min_cost = euro_supply.groupBy("l_partkey").agg(
        F.min("cost").alias("min_cost")
    )
    return (
        euro_supply.join(min_cost, "l_partkey")
        .where(F.col("cost") == F.col("min_cost"))
        .join(
            p.where((F.col("p_size") == 10) & (F.col("p_type") == "STANDARD")),
            F.col("l_partkey") == p.p_partkey,
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("cost", 4).alias("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle="""
        WITH v AS (
            SELECT l.l_partkey AS p_partkey,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                       AS value_cents
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_3'
            GROUP BY 1
        )
        SELECT p_partkey,
               CAST(value_cents AS DOUBLE) / 100.0 AS stock_value
        FROM v
        WHERE value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT)
                                    FROM v)
    """,
    description="Important stock (TPC-H Q11 shape): per-part supplied "
    "value from one nation's suppliers, kept when above 0.1% of the "
    "nation's total — a grouped aggregate HAVING against a scalar "
    "subquery over itself. The threshold compares EXACT integer cents "
    "(value_cents*1000 > total_cents): a double sum would order-depend "
    "at the boundary across engines. The scalar total joins back as a "
    "1-row broadcast; nation broadcast, supplier join unhinted.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    v = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.where(F.col("n_name") == "NATION_3")),
            s.s_nationkey == n.n_nationkey,
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = v.agg(F.sum("value_cents").alias("total_cents"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            "p_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("stock_value"),
        )
    )


@query(
    "q20_promo_part_suppliers",
    oracle="""
        WITH q AS (
            SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS qty
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              AND l.l_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
              )
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT l_partkey, sum(qty) AS total_qty FROM q GROUP BY 1
        )
        SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
        FROM q
        JOIN tot ON q.l_partkey = tot.l_partkey
        JOIN supplier s ON q.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE q.qty * 10 > tot.total_qty * 3
    """,
    description="Dominant promo-part suppliers (TPC-H Q20 shape): "
    "suppliers holding >30% of a 'small%' part's 1997 volume — a "
    "name-filtered semi-join into a per-(part,supplier) aggregate, "
    "compared against the per-part total (aggregate-of-aggregate joined "
    "back on partkey, same partitioning reused), then DISTINCT supplier "
    "identity. Quantities are integer-valued doubles, so their sums are "
    "exact and the share comparison is engine-safe without rounding. "
    "The part-name filter pushes into the lineitem semi-join probe.",
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    promo = p.where(F.col("p_name").like("small%")).select("p_partkey")
    q = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(promo, l.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = q.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    return (
        q.join(tot, "l_partkey")
        .where(F.col("qty") * 10 > F.col("total_qty") * 3)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@query(
    "window_cume_ntile",
    oracle="""
        SELECT event_id, event_type,
               round(cume_dist() OVER w, 6)    AS cume,
               ntile(10) OVER w                AS decile,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY value NULLS LAST, event_id)
    """,
    description="Distribution window functions (cume_dist / ntile / "
    "percent_rank) in one window pass. The ORDER BY is a total order "
    "(value, event_id) so ntile bucket boundaries are deterministic "
    "across engines, with NULLS LAST explicit on both sides (the "
    "engines' ASC defaults differ). One shuffle on event_type; the "
    "three functions share a single Window node.",
)
def window_cume_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "events_user_funnel",
    oracle="""
        WITH stages AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CASE
                 WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click THEN 'purchased'
                 WHEN t_view IS NOT NULL AND t_click > t_view THEN 'clicked'
                 WHEN t_view IS NOT NULL THEN 'viewed'
                 ELSE 'none'
               END AS stage,
               CAST(count(*) AS BIGINT) AS n_users
        FROM stages GROUP BY 1
    """,
    description="Ordered funnel (view -> click -> purchase): one grouped "
    "pass builds per-user first-touch timestamps as conditional mins (no "
    "self-joins, no window — the n-stage funnel is n conditional "
    "aggregates in ONE shuffle on user_id), then stage classification is "
    "a CASE over timestamp ordering. NULL comparisons fall through the "
    "CASE identically in both engines. At 100 TB this is the canonical "
    "funnel plan: no per-stage scan, no event-to-event join.",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stages = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_purchase") > F.col("t_click")),
            "purchased",
        )
        .when(
            F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")),
            "clicked",
        )
        .when(F.col("t_view").isNotNull(), "viewed")
        .otherwise("none")
    )
    return stages.select(stage.alias("stage")).groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "orders_fill_rate_asof",
    oracle="""
        WITH per_order AS (
            SELECT o.o_orderkey, o.o_orderpriority,
                   date_diff('day', o.o_orderdate, min(l.l_shipdate))
                       AS days_to_first,
                   sum(CASE WHEN l.l_shipdate <= o.o_orderdate
                                 + INTERVAL 30 DAY THEN 1 ELSE 0 END)
                       AS filled30,
                   count(*) AS n_lines
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, o.o_orderdate
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(avg(days_to_first), 4) AS avg_days_to_first_ship,
               round(CAST(sum(filled30) AS DOUBLE)
                     / CAST(sum(n_lines) AS DOUBLE), 6) AS fill_rate_30d
        FROM per_order GROUP BY 1
    """,
    description="Order fill analysis: per order, the as-of gap to its "
    "FIRST shipment (min l_shipdate vs o_orderdate) and the fraction of "
    "lines shipped within 30 days, rolled up per priority. The fill rate "
    "is a ratio of exact integer sums (sum(filled)/sum(lines)), not an "
    "avg of per-order doubles — avg-of-ratios is order-dependent across "
    "engines AND statistically wrong (it over-weights small orders). "
    "One fact-fact shuffle on orderkey, then a tiny rollup.",
)
def orders_fill_rate_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    per_order = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            F.min("l_shipdate").alias("first_ship"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("filled30"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumn(
            "days_to_first", F.datediff("first_ship", "o_orderdate")
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        stable_round(F.avg("days_to_first"), 4).alias("avg_days_to_first_ship"),
        F.round(
            F.sum("filled30").cast("double") / F.sum("n_lines").cast("double"),
            6,
        ).alias("fill_rate_30d"),
    )


@query(
    "lateral_top_orders",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
    """,
    description="Correlated LATERAL subquery (per-customer top-2 orders "
    "by price) — the SQL-standard spelling of grouped top-k. Spark "
    "DECORRELATES the lateral-with-LIMIT into a window rank over one "
    "join (no per-row re-execution of the subquery — the naive "
    "nested-loop interpretation would re-scan orders per customer); the "
    "IDENTICAL SQL text runs on DuckDB as the oracle. Complements "
    "window_topn_per_user, which states the same computation directly "
    "in the DataFrame API.",
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("__lat_cust")
    load(spark, sf_dir, "orders").createOrReplaceTempView("__lat_ord")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM __lat_cust c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM __lat_ord o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
    """)


@query(
    "variant_json_typed",
    oracle="""
        WITH src AS (
            SELECT event_id,
                   CASE WHEN json_valid(props)
                         AND len(json_keys(props))
                             = len(list_distinct(json_keys(props)))
                        THEN props END AS p
            FROM events
        ),
        ext AS (
            SELECT event_id,
                   -- Spark's variant double->bigint cast TRUNCATES
                   -- toward zero (3.7 -> 3, -3.7 -> -3, measured)
                   -- while DuckDB's JSON->BIGINT cast ROUNDS (3.7 ->
                   -- 4), so the DOUBLE json_type is trunc'd explicitly
                   -- before the cast; every other type (int, bool,
                   -- quoted numeric string) casts identically.
                   CASE WHEN json_type(p, '$.k') = 'DOUBLE'
                        THEN TRY_CAST(trunc(TRY_CAST(
                                 json_extract(p, '$.k') AS DOUBLE))
                             AS BIGINT)
                        ELSE TRY_CAST(json_extract(p, '$.k') AS BIGINT)
                   END AS k,
                   json_extract_string(p, '$.missing') AS missing_path
            FROM src
        )
        SELECT event_id, k, missing_path,
               ((k % 10) + 10) % 10 AS k_mod
        FROM ext
    """,
    description="Semi-structured access through Spark 4's VARIANT type: "
    "try_parse_json once, typed try_variant_get extraction (a missing "
    "path, malformed document, or overflow is NULL, not an error), "
    "arithmetic on the extracted value. VARIANT stores shredded binary "
    "JSON — repeated path access skips re-parsing the string, the "
    "columnar-JSON answer to the reference's schemaless Mongo documents "
    "(SURVEY §1.3). Oracle: DuckDB's JSON extraction with TRY_CAST and a "
    "validity guard computes the same values from the raw string; a "
    "document with DUPLICATE keys is invalid per the VARIANT spec "
    "(try_parse_json -> NULL), mirrored by the distinct-keys guard "
    "(top-level — the depth the adversarial fixture exercises; Spark "
    "rejects duplicates at any depth); a non-integral double truncates "
    "toward zero like Spark's variant cast (the oracle trunc-guards "
    "DuckDB's rounding cast), and k_mod is spelled as the portable "
    "((k % 10) + 10) % 10 so negative k agrees with Spark's pmod.",
)
def variant_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.expr("try_parse_json(props)")
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_path"),
        F.pmod(k, F.lit(10)).cast("bigint").alias("k_mod"),
    )


@query(
    "retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   min(date_trunc('month', o_orderdate)) AS cohort
            FROM orders GROUP BY o_custkey
        ),
        activity AS (
            SELECT DISTINCT o.o_custkey, f.cohort,
                   (year(date_trunc('month', o.o_orderdate)) - year(f.cohort)) * 12
                   + (month(date_trunc('month', o.o_orderdate)) - month(f.cohort))
                       AS month_offset
            FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        )
        SELECT CAST(cohort AS DATE) AS cohort_month,
               CAST(month_offset AS BIGINT) AS month_offset,
               count(*) AS n_customers
        FROM activity
        GROUP BY cohort, month_offset
        HAVING count(*) >= 5
    """,
    description="Retention cohort matrix: customers grouped by first-"
    "order month, counted per month-offset of later activity — the "
    "classic cohort-retention triangle. Month offsets via integer "
    "year/month arithmetic (portable across engines, unlike fractional "
    "months_between). Distinct (customer, cohort, offset) FIRST, then "
    "the count — never count(DISTINCT) mixed into the rollup (Expand "
    "trap). Two shuffles on o_custkey, one on the small cohort key.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    # cohort as a per-customer window min, NOT aggregate + join-back:
    # the join formulation shuffled orders on o_custkey twice more (build
    # + probe). The window's custkey partitioning also satisfies the
    # distinct (equal rows share a custkey, hence a partition), so the
    # whole query runs in 2 exchanges — window + final rollup — down
    # from 8 (measured on the executed plan).
    cohort = F.min(month).over(Window.partitionBy("o_custkey"))
    activity = (
        o.select(
            "o_custkey",
            cohort.alias("cohort"),
            (
                (F.year(month) - F.year(cohort)) * 12
                + (F.month(month) - F.month(cohort))
            ).alias("month_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.col("cohort").cast("date").alias("cohort_month"),
            F.col("month_offset").cast("bigint").alias("month_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .where(F.col("n_customers") >= 5)
    )


@query(
    "rfm_segmentation",
    oracle="""
        WITH rfm AS (
            SELECT o_custkey,
                   epoch(max(o_orderdate)) AS recency_s,
                   count(*) AS frequency,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY o_custkey
        ),
        cuts AS (
            SELECT quantile_cont(CAST(recency_s AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS rc,
                   quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS fc,
                   quantile_cont(CAST(monetary_cents AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS mc
            FROM rfm
        ),
        scored AS (
            SELECT o_custkey,
                   1 + CASE WHEN recency_s > rc[1] THEN 1 ELSE 0 END
                     + CASE WHEN recency_s > rc[2] THEN 1 ELSE 0 END
                     + CASE WHEN recency_s > rc[3] THEN 1 ELSE 0 END
                     + CASE WHEN recency_s > rc[4] THEN 1 ELSE 0 END AS r,
                   1 + CASE WHEN frequency > fc[1] THEN 1 ELSE 0 END
                     + CASE WHEN frequency > fc[2] THEN 1 ELSE 0 END
                     + CASE WHEN frequency > fc[3] THEN 1 ELSE 0 END
                     + CASE WHEN frequency > fc[4] THEN 1 ELSE 0 END AS f,
                   1 + CASE WHEN monetary_cents > mc[1] THEN 1 ELSE 0 END
                     + CASE WHEN monetary_cents > mc[2] THEN 1 ELSE 0 END
                     + CASE WHEN monetary_cents > mc[3] THEN 1 ELSE 0 END
                     + CASE WHEN monetary_cents > mc[4] THEN 1 ELSE 0 END AS m
            FROM rfm, cuts
        )
        SELECT CAST(r AS INT) AS r_score, CAST(f AS INT) AS f_score,
               CAST(m AS INT) AS m_score,
               count(*) AS n_customers,
               min(o_custkey) AS sample_custkey
        FROM scored
        GROUP BY r, f, m
        HAVING count(*) >= 3
    """,
    description="RFM customer segmentation by QUANTILE-THRESHOLD binning, "
    "not ntile: a global ntile is a single-partition window (the exact "
    "anti-pattern training_order_shuffle exists to avoid), and it splits "
    "ties arbitrarily. Instead one aggregate computes the 20/40/60/80 "
    "cutoffs per metric (exact interpolated percentiles — a 1-row table "
    "broadcast back) and customers score by comparison: fully parallel, "
    "ties land in one bucket (semantically right for RFM), monetary in "
    "exact integer cents so cutoffs are engine-identical. The per-"
    "customer aggregate is the only data-sized shuffle.",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.unix_timestamp(F.max("o_orderdate")).alias("recency_s"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("monetary_cents"),
    )
    cuts = rfm.agg(
        F.expr(
            "percentile(CAST(recency_s AS DOUBLE), array(0.2, 0.4, 0.6, 0.8))"
        ).alias("rc"),
        F.expr(
            "percentile(CAST(frequency AS DOUBLE), array(0.2, 0.4, 0.6, 0.8))"
        ).alias("fc"),
        F.expr(
            "percentile(CAST(monetary_cents AS DOUBLE), array(0.2, 0.4, 0.6, 0.8))"
        ).alias("mc"),
    )

    def score(v: str, c: str):
        out = F.lit(1)
        for i in range(1, 5):
            out = out + F.when(
                F.col(v) > F.element_at(F.col(c), i), 1
            ).otherwise(0)
        return out

    scored = rfm.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        score("recency_s", "rc").cast("int").alias("r_score"),
        score("frequency", "fc").cast("int").alias("f_score"),
        score("monetary_cents", "mc").cast("int").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("o_custkey").alias("sample_custkey"),
        )
        .where(F.col("n_customers") >= 3)
    )


@query(
    "table_diff_checksum",
    oracle="""
        WITH base AS (
            SELECT event_id, event_type, user_id, value
            FROM (SELECT * REPLACE (CASE WHEN isfinite(value) THEN value END
              AS value) FROM events) events
        ),
        altered AS (
            SELECT event_id, event_type, user_id,
                   CASE WHEN event_id % 1000 = 7 THEN value + 1.0
                        ELSE value END AS value
            FROM base
        ),
        ba AS (
            SELECT event_id % 64 AS bucket,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       + event_id * 31 + user_id * 7) AS chk,
                   count(*) AS n
            FROM base GROUP BY bucket
        ),
        aa AS (
            SELECT event_id % 64 AS bucket,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       + event_id * 31 + user_id * 7) AS chk,
                   count(*) AS n
            FROM altered GROUP BY bucket
        )
        SELECT CAST(ba.bucket AS BIGINT) AS bucket,
               CAST(ba.n AS BIGINT) AS n_rows,
               (CAST(ba.chk AS BIGINT) <> CAST(aa.chk AS BIGINT)) AS differs
        FROM ba JOIN aa USING (bucket)
    """,
    description="Merkle-style table diff: both replicas reduce to 64 "
    "bucket checksums (order-independent integer sums over basis-point "
    "values + key mixing) and ONLY differing buckets need row-level "
    "repair — the anti-entropy primitive that compares 100 TB replicas "
    "by exchanging 64 numbers, not rows. The probe alters one row per "
    "1000 deterministically; exactly those buckets flag. Checksums are "
    "commutative integer sums: aggregation-order-proof on BOTH engines.",
)
def table_diff_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events_measured(spark, sf_dir).select(
        "event_id", "event_type", "user_id", "value"
    )
    altered = e.withColumn(
        "value",
        F.when(F.col("event_id") % 1000 == 7, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )

    def bucket_sums(df: DataFrame) -> DataFrame:
        chk = (
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            + F.col("event_id") * 31
            + F.col("user_id") * 7
        )
        return (
            df.groupBy((F.col("event_id") % 64).alias("bucket"))
            .agg(F.sum(chk).alias("chk"), F.count(F.lit(1)).alias("n"))
        )

    ba = bucket_sums(e)
    aa = bucket_sums(altered).select(
        F.col("bucket"), F.col("chk").alias("chk2")
    )
    return ba.join(aa, "bucket").select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n").alias("n_rows"),
        (F.col("chk") != F.col("chk2")).alias("differs"),
    )


@query(
    "dq_expectations",
    oracle="""
        SELECT 'lineitem_rowcount' AS checkname,
               CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS observed,
               (SELECT count(*) FROM lineitem) > 0 AS passes
        UNION ALL
        SELECT 'orders_pk_unique',
               CAST((SELECT count(*) - count(DISTINCT o_orderkey)
                     FROM orders) AS BIGINT),
               (SELECT count(*) = count(DISTINCT o_orderkey) FROM orders)
        UNION ALL
        SELECT 'lineitem_orphans',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               (SELECT count(*) = 0 FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'lineitem_qty_range',
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_quantity < 0 OR l_quantity > 100) AS BIGINT),
               (SELECT count(*) = 0 FROM lineitem
                WHERE l_quantity < 0 OR l_quantity > 100)
        UNION ALL
        SELECT 'orders_date_nonnull',
               CAST((SELECT count(*) FROM orders
                     WHERE o_orderdate IS NULL) AS BIGINT),
               (SELECT count(*) = 0 FROM orders WHERE o_orderdate IS NULL)
        UNION ALL
        SELECT 'events_value_nonnull',
               CAST((SELECT count(*) FROM events
                     WHERE value IS NULL) AS BIGINT),
               (SELECT count(*) = 0 FROM events WHERE value IS NULL)
    """,
    description="Data-quality expectation suite (dbt-test/Great-"
    "Expectations shape): row count, primary-key uniqueness, referential "
    "orphans (anti-join), accepted ranges, null rates — each check ONE "
    "aggregate row, the whole suite a union of map-side-combined scans. "
    "The orphan check is a broadcast-able anti-join at the scan; nothing "
    "collects row-level data. The output schema (checkname, observed, "
    "passes) is the contract a scheduler alerts on.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")

    def check(name: str, observed, passes) -> DataFrame:
        return observed.select(
            F.lit(name).alias("checkname"),
            F.col("obs").cast("bigint").alias("observed"),
            passes(F.col("obs")).alias("passes"),
        )

    rowcount = li.agg(F.count(F.lit(1)).alias("obs"))
    pk = o.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("obs")
    )
    orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    qty = li.where(
        (F.col("l_quantity") < 0) | (F.col("l_quantity") > 100)
    ).agg(F.count(F.lit(1)).alias("obs"))
    dates = o.where(F.col("o_orderdate").isNull()).agg(
        F.count(F.lit(1)).alias("obs")
    )
    vals = e.where(F.col("value").isNull()).agg(F.count(F.lit(1)).alias("obs"))
    return (
        check("lineitem_rowcount", rowcount, lambda c: c > 0)
        .unionAll(check("orders_pk_unique", pk, lambda c: c == 0))
        .unionAll(check("lineitem_orphans", orphans, lambda c: c == 0))
        .unionAll(check("lineitem_qty_range", qty, lambda c: c == 0))
        .unionAll(check("orders_date_nonnull", dates, lambda c: c == 0))
        .unionAll(check("events_value_nonnull", vals, lambda c: c == 0))
    )


@query(
    "null_safe_join_probe",
    oracle="""
        WITH tagged AS (
            SELECT event_id,
                   CASE WHEN user_id % 7 = 0 THEN NULL
                        ELSE user_id % 5 END AS grp,
                   value
            FROM events
        ),
        agg AS (
            SELECT grp, count(*) AS n,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM tagged GROUP BY grp
        )
        SELECT t.event_id, a.grp, a.n AS grp_n
        FROM tagged t JOIN agg a ON t.grp IS NOT DISTINCT FROM a.grp
        WHERE t.event_id < 500
    """,
    description="Null-safe equality join (<=> / IS NOT DISTINCT FROM): "
    "NULL group keys MATCH each other instead of silently dropping — "
    "the semantics plain equi-joins get wrong on nullable keys (a "
    "NULL = NULL predicate is NULL, so every null-keyed row vanishes). "
    "Spark plans <=> as a regular hash join (null-safe keys hash like "
    "values); one aggregate + one join, both shuffles on the group key.",
)
def null_safe_join_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    tagged = e.select(
        "event_id",
        F.when(F.col("user_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("user_id") % 5)
        .alias("grp"),
        "value",
    )
    agg = tagged.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("cents"),
    ).select(F.col("grp").alias("agrp"), "n")
    return (
        tagged.join(agg, F.col("grp").eqNullSafe(F.col("agrp")))
        .where(F.col("event_id") < 500)
        .select("event_id", F.col("agrp").alias("grp"), F.col("n").alias("grp_n"))
    )


# ---------------------------------------------------------------------------
# Entity resolution & privacy audits
# ---------------------------------------------------------------------------
@query(
    "entity_resolution_pairs",
    oracle="""
        WITH blocked AS (
            SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk
            FROM customer
        )
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               a.c_name AS name_a, b.c_name AS name_b,
               CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
        FROM blocked a JOIN blocked b
             ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    description="Entity resolution candidate pairs: block on a name "
    "prefix, score within-block pairs by Levenshtein edit distance, keep "
    "dist <= 1 — the record-linkage shape (Fellegi-Sunter blocking + "
    "string similarity) whose candidates are a bucket equi-join, never "
    "all-pairs. Same scale posture as the LSH dedup tiers: the block key "
    "bounds the comparison set; feed the surviving pairs to "
    "components_from_pairs for entity groups.",
)
def entity_resolution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    )
    # Distribute the STREAMED side by block key: the per-pair Levenshtein
    # scoring parallelizes over streamed-side partitions, and a
    # single-split input file would otherwise put every within-block
    # comparison on one core (n-row shuffle vs blocks x pairs work —
    # the same lesson as the exact cosine tier's BNLJ repartition).
    a = c.select(
        F.col("c_custkey").alias("cust_a"), F.col("c_name").alias("name_a"), "blk"
    ).repartition("blk")
    b = c.select(
        F.col("c_custkey").alias("cust_b"), F.col("c_name").alias("name_b"), "blk"
    )
    # Levenshtein on the SUFFIXES past the block prefix: the join key is
    # substring(name, 1, 16) equality, so every joined pair agrees on its
    # first 16 chars, and edit distance is invariant under stripping a
    # common prefix — ld(p||s, p||t) == ld(s, t) (the textbook trim
    # optimization every edit-distance library applies). The DP shrinks
    # from |name|² to |suffix|² cells per pair — the dominant cost of
    # the query (measured r11: the full-name spelling spent 2.45 s of a
    # 2.93 s execution inside levenshtein; suffix equality asserted
    # against the full-name spelling in tests/test_relational_extra.py).
    # The oracle keeps the full-name spelling as the equivalence proof.
    return (
        a.join(b, "blk")
        .where(F.col("cust_a") < F.col("cust_b"))
        .withColumn(
            "edit_dist",
            F.levenshtein(
                F.expr("substring(name_a, 17)"), F.expr("substring(name_b, 17)")
            ),
        )
        .where(F.col("edit_dist") <= 1)
        .select("cust_a", "cust_b", "name_a", "name_b", "edit_dist")
    )


@query(
    "k_anonymity_audit",
    oracle="""
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS group_size,
               count(*) < 5 AS below_k
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
    description="k-anonymity audit over the quasi-identifier combination "
    "(nation, market segment): group sizes below k=5 single out "
    "individuals under linkage attacks and must be generalized or "
    "suppressed before release. One two-phase aggregate over the "
    "quasi-identifier key — the privacy-screening pass a training-data "
    "release pipeline runs next to the PII redaction stats.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") < 5).alias("below_k"),
        )
    )


def _pagerank_oracle(n_iters: int = 3) -> str:
    """Unrolled integer-PageRank CTE chain: standard SQL forbids
    aggregates in a recursive CTE's recursive term, so each fixed
    iteration is its own CTE — same integer math as the Spark loop."""
    body = """
        WITH edges0 AS (
            SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT cust AS src, supp + 1000000 AS dst FROM edges0
            UNION ALL
            SELECT supp + 1000000 AS src, cust AS dst FROM edges0
        ),
        deg AS (
            SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM edges GROUP BY src
        ),
        r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM deg)
    """
    prev = "r0"
    for i in range(1, n_iters + 1):
        body += f""",
        r{i} AS (
            SELECT deg.node,
                   150000000 + CAST(floor(coalesce(s.inc, 0) * 85 / 100.0)
                                    AS BIGINT) AS r
            FROM deg
            LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(CAST(floor(CAST(p.r AS DOUBLE) / deg.d)
                                     AS BIGINT)) AS BIGINT) AS inc
                FROM edges e
                JOIN {prev} p ON p.node = e.src
                JOIN deg ON deg.node = e.src
                GROUP BY e.dst
            ) s ON s.node = deg.node
        )"""
        prev = f"r{i}"
    body += f"""
        SELECT node, r AS rank_nano FROM {prev}
    """
    return body


@query(
    "pagerank_cust_supp",
    oracle=_pagerank_oracle(),
    description="Graph centrality: integer-deterministic PageRank over "
    "the undirected customer-supplier order graph (suppliers offset by "
    "1e6), 3 fixed iterations, damping 0.85. Ranks live on EXACT "
    "integers (nano-rank 1e9; per-edge contribution floor(r/deg), "
    "damped sum floor(s*85/100)) so the distributed aggregation "
    "hash-matches the sequential oracle under any reassociation — the "
    "same exact-integer discipline as cusum_drift_chunked. Each "
    "iteration is one join + two-phase aggregate; the oracle unrolls "
    "the iterations as CTEs (standard SQL forbids aggregates in a "
    "recursive term).",
)
def pagerank_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + 1000000).alias("supp"),
        )
        .distinct()
    )
    # Iterative plans MUST truncate lineage: ranks is referenced twice per
    # iteration (contribution join + damping fallback) and edges/deg in
    # every iteration, so without checkpoints the un-materialized branches
    # recompute ~2^k-fold — measured at sf0.1 as 22.5 MB shuffled and
    # 10.5 MB spilled for 3 iterations, vs ~1 MB checkpointed.
    edges = (
        e0.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
        .unionAll(e0.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    ranks = deg.select("node", F.lit(1000000000).cast("long").alias("r"))
    for _ in range(3):
        contrib = (
            edges.join(deg, edges.src == deg.node)
            .join(
                ranks.select(F.col("node").alias("rnode"), "r"),
                F.col("src") == F.col("rnode"),
            )
            .select(
                "dst",
                F.floor(F.col("r").cast("double") / F.col("d"))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            deg.join(contrib, deg.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(150000000)
                    + F.floor(
                        F.coalesce(F.col("inc"), F.lit(0)) * 85 / 100.0
                    ).cast("long")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_nano"))


_FUZZY_QUERY = "Custoer#000000422"  # typo'd Customer#000000422


@query(
    "fuzzy_name_lookup",
    oracle=f"""
        WITH names AS (SELECT c_custkey, c_name FROM customer),
        grams AS (
            SELECT c_custkey, unnest(list_distinct(
                list_transform(generate_series(1, length(c_name)-2),
                    i -> substr(c_name, i, 3)))) AS g
            FROM names
        ),
        df AS (SELECT g, CAST(count(*) AS BIGINT) AS d FROM grams GROUP BY g),
        qgrams AS (
            SELECT unnest(list_distinct(
                list_transform(generate_series(1, length('{_FUZZY_QUERY}')-2),
                    i -> substr('{_FUZZY_QUERY}', i, 3)))) AS g
        ),
        rare AS (SELECT qgrams.g FROM qgrams JOIN df USING (g) WHERE d <= 50),
        cand AS (SELECT DISTINCT grams.c_custkey FROM grams JOIN rare USING (g))
        SELECT n.c_custkey, n.c_name,
               CAST(levenshtein(n.c_name, '{_FUZZY_QUERY}') AS INTEGER)
                   AS edit_dist
        FROM cand JOIN names n USING (c_custkey)
        ORDER BY edit_dist, n.c_custkey LIMIT 10
    """,
    description="Fuzzy lookup of one (typo'd) name against the customer "
    "table: the query's trigrams are filtered to RARE ones (df <= 50 — "
    "common trigrams like 'Cus' select the whole table and carry no "
    "signal), candidates come from the rare-trigram posting join, and "
    "only candidates pay the Levenshtein rerank + top-k. The selective-"
    "posting shape a name-resolution service runs at 100 TB: candidate "
    "cost tracks the RAREST gram's document frequency, not the corpus.",
)
def fuzzy_name_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _FUZZY_QUERY
    names = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    grams = names.select(
        "c_custkey",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(c_name) - 2), "
                    "i -> substring(c_name, i, 3))"
                )
            )
        ).alias("g"),
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("d"))
    qgrams = spark.createDataFrame(
        [(g,) for g in sorted({q[i : i + 3] for i in range(len(q) - 2)})],
        "g string",
    )
    rare = qgrams.join(dfreq, "g").where(F.col("d") <= 50).select("g")
    cand = grams.join(F.broadcast(rare), "g").select("c_custkey").distinct()
    return (
        cand.join(names, "c_custkey")
        .select(
            "c_custkey",
            "c_name",
            F.levenshtein(F.col("c_name"), F.lit(q)).alias("edit_dist"),
        )
        .orderBy("edit_dist", "c_custkey")
        .limit(10)
    )


@query(
    "join_key_skew_report",
    oracle="""
        WITH freq AS (
            SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_orderkey
        ),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(max(n) AS BIGINT) AS max_n,
                   floor(avg(n) * 1e4 + 0.5) / 1e4 AS avg_n
            FROM freq
        ),
        top AS (
            SELECT CAST(sum(n) AS BIGINT) AS top_rows FROM (
                SELECT n FROM freq ORDER BY n DESC, k LIMIT 10
            )
        )
        SELECT n_keys, n_rows, max_n, avg_n,
               floor(CAST(max_n AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys)
                     * 1e4 + 0.5) / 1e4 AS skew_factor,
               floor(CAST(top_rows AS DOUBLE) / n_rows * 1e6 + 0.5) / 1e6
                   AS top10_share
        FROM stats, top
    """,
    description="Join-key skew diagnosis for lineitem.l_orderkey: key "
    "count, max/avg rows per key, the max/avg skew factor, and the share "
    "of rows owned by the 10 hottest keys — the numbers that decide "
    "between plain shuffle, AQE skew-join, and salting "
    "(functions/skew.py) BEFORE a 100 TB join melts an executor. One "
    "two-phase aggregate + a 1-row top-k; nothing data-sized leaves the "
    "executors.",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    freq = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = freq.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        (F.floor(F.avg("n") * 1e4 + F.lit(0.5)) / 1e4).alias("avg_n"),
    )
    top = (
        freq.orderBy(F.col("n").desc(), "k")
        .limit(10)
        .agg(F.sum("n").alias("top_rows"))
    )
    r4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return stats.crossJoin(top).select(
        "n_keys",
        "n_rows",
        "max_n",
        "avg_n",
        r4(
            F.col("max_n").cast("double")
            / (F.col("n_rows").cast("double") / F.col("n_keys"))
        ).alias("skew_factor"),
        r6(F.col("top_rows").cast("double") / F.col("n_rows")).alias(
            "top10_share"
        ),
    )
