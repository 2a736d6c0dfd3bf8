"""Extra relational operator tests not covered by the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_mongo2influx_spark.plans import load_registry
from node_mongo2influx_spark.plans.tables import load


def test_approx_distinct_close_to_exact(spark, sf_dir):
    # independent accuracy gate: run the SKETCH directly (the query now
    # outputs bounded-witness booleans, r7) and compare to exact counts
    approx = {
        r["event_type"]: r["a"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)
    # and the registry query's in-row witnesses agree
    reg = load_registry()
    rows = reg["approx_distinct_users"].fn(spark, sf_dir).collect()
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    assert all(r["within_bound"] for r in rows)


def test_approx_percentiles_rank_accurate(spark, sf_dir):
    # approx_percentile returns an actual sample (no interpolation), so in
    # a sparse tail its VALUE can differ a lot from the interpolated exact
    # percentile while still being rank-correct. Assert rank: the fraction
    # of values <= approx_pq must be within ~1.5% of q. (Independent of
    # the registry query, which now outputs this check as in-row
    # bounded-witness booleans — asserted at the end.)
    e = load(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, 0.5, 10000)").alias("p50"),
            F.expr("approx_percentile(value, 0.9, 10000)").alias("p90"),
            F.expr("approx_percentile(value, 0.99, 10000)").alias("p99"),
        )
        .collect()
    }
    for k, row in approx.items():
        vals = [
            r["value"] for r in e.where(F.col("event_type") == k).select("value").collect()
        ]
        n = len(vals)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            frac = sum(1 for v in vals if v <= row[name]) / n
            assert q - 0.015 <= frac <= min(1.0, q + 0.015 + 1.0 / n), (
                k, name, row[name], frac,
            )
    reg = load_registry()
    wit = reg["approx_percentiles_by_type"].fn(spark, sf_dir).collect()
    assert wit and all(
        r["ok_p50"] and r["ok_p90"] and r["ok_p99"] for r in wit
    )
    assert {r["event_type"]: r["n"] for r in wit} == {
        k: len(
            [x for x in e.where(F.col("event_type") == k).select("value").collect()
             if x["value"] is not None]
        )
        for k in approx
    }


def test_components_deep_chain_converges(spark):
    # a 40-node chain has diameter 39: neighbor-min alone would need 39
    # iterations; pointer jumping must close it within the default 20.
    from node_mongo2influx_spark.operators.dedup import components_from_pairs

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in components_from_pairs(pairs).collect()
    }
    assert set(got.values()) == {1} and len(got) == 40


def test_components_match_ground_truth_on_adversarial_graphs(spark):
    # The contraction algorithm (per-partition union-find + closure +
    # relabel rounds) must agree with a sequential union-find on graph
    # shapes that stress each piece: random sparse, long chains that
    # straddle every partition, stars, dense cliques, and disconnected
    # pair soup. Labels must be the exact global component minimum.
    import random

    from node_mongo2influx_spark.operators.dedup import components_from_pairs

    def truth(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    rng = random.Random(42)
    shapes = {
        "random": [
            tuple(sorted((rng.randrange(500), rng.randrange(500))))
            for _ in range(300)
        ],
        "chains": [(i, i + 1) for i in range(1, 60)]
        + [(i, i + 1) for i in range(100, 145)],
        "star": [(1, i) for i in range(2, 80)],
        "clique": [(i, j) for i in range(200, 215) for j in range(i + 1, 215)],
        "pairs": [(i, i + 1000) for i in range(300, 340)],
    }
    for name, edges in shapes.items():
        edges = [e for e in set(edges) if e[0] != e[1]]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["component_id"]
            for r in components_from_pairs(pairs).collect()
        }
        assert got == truth(edges), name


def test_components_from_pairs_basic(spark):
    from node_mongo2influx_spark.operators.dedup import components_from_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in components_from_pairs(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_sessionize_invariants(spark, sf_dir):
    reg = load_registry()
    rows = reg["sessionize_events"].fn(spark, sf_dir).collect()
    total_events = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total_events
    assert all(1 <= r["n_sessions"] <= r["n_events"] for r in rows)


def test_gapfill_grid_is_dense(spark, sf_dir):
    reg = load_registry()
    rows = reg["gapfill_minutely"].fn(spark, sf_dir).collect()
    times = sorted(r["bucket"] for r in rows)
    diffs = {
        (b - a).total_seconds() for a, b in zip(times, times[1:])
    }
    assert diffs == {3600.0}  # dense hourly grid, no holes
    assert any(r["n"] == 0 for r in rows) or len(rows) > 0


def test_entity_resolution_pairs_compose_into_entity_groups(spark, sf_dir):
    # The record-linkage composition: blocked edit-distance pairs ->
    # components -> entity groups. Every pair's two members must land in
    # the same component, and components must be closed under the pair
    # relation (the whole point of the candidate tier).
    from node_mongo2influx_spark.operators.dedup import components_from_pairs
    from node_mongo2influx_spark.plans import load_registry

    reg = load_registry()
    pairs = (
        reg["entity_resolution_pairs"].fn(spark, sf_dir)
        .select("cust_a", "cust_b")
        .persist()
    )
    comp = {
        r["doc_id"]: r["component_id"]
        for r in components_from_pairs(
            pairs, a_col="cust_a", b_col="cust_b"
        ).collect()
    }
    for r in pairs.collect():
        assert comp[r["cust_a"]] == comp[r["cust_b"]]
    pairs.unpersist()
    assert comp, "blocking should produce at least one candidate pair"


def test_entity_resolution_suffix_levenshtein_is_exact(spark, sf_dir):
    # The r11 optimization computes edit_dist on the suffixes past the
    # 16-char block prefix (ld(p||s, p||t) == ld(s, t) — edit distance
    # is invariant under stripping a common prefix, and the join key
    # guarantees the shared prefix). Assert the identity on hostile
    # pairs sharing a 16-char prefix (short/empty suffixes, multibyte,
    # length-mismatched suffixes) AND row-for-row on the fixtures
    # against the full-name spelling.
    p = "0123456789abcdef"  # the 16-char "block prefix"
    hostile = [
        (p, p),  # both names exactly the prefix -> empty suffixes
        (p + "x", p),  # one empty suffix
        (p + "x", p + "y"),
        (p + "xy", p + "y"),
        (p + "éß", p + "éz"),  # multibyte suffixes
        (p + "abc", p + "zzzz"),  # length-mismatched suffixes
    ]
    df = spark.createDataFrame(hostile, "name_a string, name_b string")
    rows = df.select(
        F.levenshtein("name_a", "name_b").alias("full"),
        F.levenshtein(
            F.expr("substring(name_a, 17)"), F.expr("substring(name_b, 17)")
        ).alias("suffix"),
    ).collect()
    for r in rows:
        assert r["full"] == r["suffix"], (r["full"], r["suffix"])

    reg = load_registry()
    got = {
        (r["cust_a"], r["cust_b"]): (r["edit_dist"], r["name_a"], r["name_b"])
        for r in reg["entity_resolution_pairs"].fn(spark, sf_dir).collect()
    }
    # reference spelling: full-name levenshtein over the same block join
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    )
    a = c.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_name").alias("name_a"),
        "blk",
    )
    b = c.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_name").alias("name_b"),
        "blk",
    )
    want = {
        (r["cust_a"], r["cust_b"]): (r["edit_dist"], r["name_a"], r["name_b"])
        for r in a.join(b, "blk")
        .where(F.col("cust_a") < F.col("cust_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("edit_dist") <= 1)
        .collect()
    }
    assert got == want


def test_pagerank_mass_and_ordering(spark, sf_dir):
    # Integer PageRank sanity: every rank >= the damping floor, total
    # mass stays below the theoretical cap N*1e9 (floor() only loses
    # mass), and the mean rank of the top-degree decile exceeds the
    # bottom decile's (centrality must follow connectivity).
    from node_mongo2influx_spark.plans import load_registry

    reg = load_registry()
    ranks = {
        r["node"]: r["rank_nano"]
        for r in reg["pagerank_cust_supp"].fn(spark, sf_dir).collect()
    }
    assert all(v >= 150000000 for v in ranks.values())
    assert sum(ranks.values()) <= len(ranks) * 1_000_000_000
    from node_mongo2influx_spark.plans.tables import load
    from pyspark.sql import functions as F

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    deg = {
        r["o_custkey"]: r["d"]
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    by_deg = sorted(deg, key=deg.get)
    k = max(1, len(by_deg) // 10)
    low = sum(ranks[c] for c in by_deg[:k]) / k
    high = sum(ranks[c] for c in by_deg[-k:]) / k
    assert high > low


def test_jsonpath_contract_pins(spark):  # udxf import needs a session
    # The UDTF keeps SELF-CONTAINED copies of the jsonpath patterns (a
    # module-global reference would make cloudpickle import this package
    # on executors — the r8 worker-import trap). Pin them equal so the
    # contract cannot silently fork.
    from node_mongo2influx_spark.functions import jsonpath
    from node_mongo2influx_spark.functions.udxf import ExplodeProps

    assert ExplodeProps.func._SAFE_KEY_RE == jsonpath.SAFE_KEY_RE
    assert ExplodeProps.func._INT_SHAPE_RE == jsonpath.INT_SHAPE_RE


def test_jsonpath_safe_key_classes():
    import re

    from node_mongo2influx_spark.functions import jsonpath

    safe = ["k", "a.b", "a b", "ké", "日本", "a[0]", "$w", "0", "a?b",
            "(a)", "a{b}", "a..b", "a-b"]
    # union of both engines' path-parser hazards, measured live (r9):
    # Spark brackets fail on leading/trailing space, single quote, empty;
    # DuckDB quoted paths wildcard on * and raise on empty / embedded "
    unsafe = ["", " k", "k ", "k'q", 'e"f', "a\\b", "*", "a\tb", " "]
    for k in safe:
        assert re.fullmatch(jsonpath.SAFE_KEY_RE, k), k
    for k in unsafe:
        assert not re.fullmatch(jsonpath.SAFE_KEY_RE, k), k


def test_jsonpath_tolerant_int_shape(spark):  # udxf import needs a session
    # The INT_SHAPE contract across the Python runtime (engines are
    # covered by the json sweep): ints in int32 pass; every float is
    # NULL (engines see '3.0'/'300.0' strings that fail the shape);
    # strings must be pure optional-sign digits.
    from node_mongo2influx_spark.functions.udxf import ExplodeProps

    t = ExplodeProps.func()._tolerant_int
    assert t(5) == 5 and t(-5) == -5 and t("12") == 12 and t("+5") == 5
    assert t("007") == 7 and t("-0") == 0
    for v in (3.0, 3.7, -3.7, 1e2, True, False, None, {}, [],
              "2.5", "3.0", " 12 ", "3e2", "", "x", "++1",
              2**31, -(2**31) - 1, str(10**20)):
        assert t(v) is None, v
    assert t(2**31 - 1) == 2**31 - 1 and t(-(2**31)) == -(2**31)
