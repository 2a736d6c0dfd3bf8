"""Physical-plan quality gates — the 100 TB requirements as assertions.

These tests read `explain()` output, not results: a query can be correct and
still carry a plan that dies at 1000× the data (full scans where pushdown
was available, sort-merge joins of broadcastable dims, global sorts for
top-k). Each assertion pins the plan shape we designed for.
"""

from __future__ import annotations

import pytest

from node_mongo2influx_spark.plans import load_registry


@pytest.fixture(scope="module")
def reg():
    return load_registry()


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir, reg):
    # q1's shipdate filter must reach the scan as a pushed filter, and the
    # scan must prune to only the referenced columns.
    plan = _plan(reg["q1_pricing_summary"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan, plan
    # column pruning: o_orderkey et al not read
    assert "l_comment" not in plan
    scan_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_schema and "l_partkey" not in scan_schema[0]


def test_star_join_broadcasts_dims_no_smj(spark, sf_dir, reg):
    plan = _plan(reg["q5_revenue_by_nation"].fn(spark, sf_dir))
    # At test scale every dimension join broadcasts (size-based planning /
    # AQE); the single allowed shuffle join is fact x fact
    # (lineitem x orders), which the r11 MERGE hint pins to sort-merge at
    # every scale (the planner used to broadcast the FACT whenever its
    # projected estimate dipped under the threshold). Formatted explain
    # lists each operator twice (tree + details), so one SMJ node counts 2.
    assert plan.count("BroadcastHashJoin") >= 8, plan
    assert plan.count("SortMergeJoin") <= 2, (
        "more than the one fact-fact SMJ:\n" + plan
    )
    # and that one SMJ must be the orderkey join, not a dim fallback
    import re

    m = re.search(r"\(\d+\) SortMergeJoin\s*\nLeft keys \[1\]: \[l_orderkey", plan)
    assert m, "the SMJ is not the lineitem-orders orderkey join:\n" + plan


#: Column markers identifying relations whose size scales with sf. An
#: explicit broadcast HINT on one of these overrides Spark's size check and
#: force-broadcasts a multi-TB table at the 100 TB target. (region/nation
#: are fixed-size and may be hinted.)
_SCALING_MARKERS = (
    "c_custkey#", "s_suppkey#", "o_orderkey#", "l_orderkey#",
    "p_partkey#", "event_id#", "doc_id#",
)


def _hint_subtrees(analyzed: str) -> list[str]:
    """Each ResolvedHint node's subtree from an analyzed-plan tree string."""
    lines = analyzed.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln:
            continue
        if "strategy=broadcast" not in ln:
            # Only broadcast hints can force-OOM a scaling table; a
            # merge/shuffle_hash hint forces a SHUFFLE — the safe
            # direction (r11: q3/q5 pin their fact-fact join to SMJ so
            # the planner can't broadcast the fact at bench scale).
            continue
        depth = ln.index("ResolvedHint")
        sub = []
        for nxt in lines[i + 1:]:
            body = nxt.replace(":", " ").replace("+-", "  ")
            indent = len(body) - len(body.lstrip())
            if indent <= depth and nxt.strip():
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


@pytest.mark.parametrize(
    "qname",
    [
        "q3_top_unshipped_revenue", "q5_revenue_by_nation",
        "q7_nation_trade_flow", "q15_top_supplier", "q16_supplier_variety",
        "semi_anti_join", "semi_join_active_customers",
        "full_outer_reconcile", "asof_join_last_order",
        "q10_returned_revenue", "q12_priority_by_returnflag",
        "q14_promo_revenue_pct", "q18_large_volume_customers",
        "q9_profit_by_nation_year", "q4_order_priority_check",
        "q13_customer_order_histogram", "q19_disjunctive_revenue",
        "q22_dormant_high_balance", "q17_small_quantity_revenue",
        "q8_market_share", "q21_waiting_supplier",
        "tfidf_top_terms", "label_centroid_cosine",
        "doc_perplexity_bigram",
        "q2_min_cost_supplier", "q11_important_stock",
        "q20_promo_part_suppliers", "orders_fill_rate_asof",
        "events_user_funnel", "ohlc_vwap_hourly",
        "bm25_multi_query_topk", "dedup_modality_agreement",
        "fuzzy_name_lookup",
    ],
)
def test_no_broadcast_hint_on_scaling_tables(spark, sf_dir, reg, qname):
    # The 100x rule: a broadcast hint is legitimate only on a fixed-size dim
    # (region/nation) or on a subtree whose output is provably bounded. A
    # hint over a bare scan of a table that grows with sf (customer,
    # supplier, orders, lineitem, part, events, documents) is a
    # force-broadcast OOM at 100 TB — AQE decides those joins instead.
    #
    # An AGGREGATE over a scaling table is NOT automatically bounded: its
    # output scales with the grouping-key cardinality (a vocabulary
    # aggregate over documents is billions of rows at 100 TB). A hinted
    # aggregate subtree is accepted only when its top aggregate is GLOBAL
    # (no grouping keys -> exactly one row) or the query is allowlisted
    # below with a written boundedness argument.
    df = reg[qname].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    for sub in _hint_subtrees(analyzed):
        if _subtree_output_bounded(qname, sub):
            continue
        for marker in _SCALING_MARKERS:
            assert marker not in sub, (
                f"{qname}: broadcast hint over a scaling (sub)tree:\n{sub}"
            )


#: Hinted grouped-aggregate subtrees whose output is bounded for a reason
#: the plan string can't show. Every entry needs the argument written here.
_BOUNDED_HINTED_AGG_ALLOW = {
    # q15: per-supplier revenue FILTERED to == the global max revenue —
    # output is ~1 row at any sf (ties only), regardless of supplier count.
    "q15_top_supplier",
    # bm25_multi: the hinted per-term df aggregate is computed over
    # postings already FILTERED to the literal query vocabulary (isin on
    # a fixed term set), so its output is ≤ |query terms| rows at any sf
    # — bounded by the query batch, not the corpus.
    "bm25_multi_query_topk",
    # fuzzy lookup: the hinted rare-gram table is the literal query's
    # trigram list inner-joined to the df cut — ≤ len(query)-2 rows at
    # any sf, bounded by the query string, not the corpus.
    "fuzzy_name_lookup",
}

_GROUPED_AGG_RE = None


def _subtree_output_bounded(qname: str, sub: str) -> bool:
    """True if a hinted subtree's row count is bounded independent of sf."""
    import re

    agg_lines = [ln for ln in sub.splitlines() if "Aggregate [" in ln]
    if not agg_lines:
        return False  # bare scan/join of whatever is underneath
    # Analyzed-plan syntax: global agg = `Aggregate [exprs]` (one list),
    # grouped agg = `Aggregate [keys], [exprs]` (two lists). The TOP
    # aggregate determines the subtree's output cardinality.
    top = agg_lines[0]
    grouped = re.search(r"Aggregate \[[^\[\]]*\], \[", top) is not None
    if not grouped:
        return True  # global aggregate -> exactly one row
    return qname in _BOUNDED_HINTED_AGG_ALLOW


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir, reg):
    plan = _plan(reg["sort_topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_anti_join_is_broadcast(spark, sf_dir, reg):
    plan = _plan(reg["semi_anti_join"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_agg_has_partial_phase(spark, sf_dir, reg):
    # Two HashAggregates (partial + final) around the exchange = map-side
    # combine; a single post-shuffle agg would move every row.
    plan = _plan(reg["q1_pricing_summary"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_pipeline_parity_whole_stage_codegen(spark, sf_dir, reg):
    # The migrate hot path (scan -> transform -> filter) must stay inside
    # whole-stage codegen ('*'-starred nodes in formatted mode): no Python
    # evaluation nodes.
    plan = _plan(reg["migrate_events"].fn(spark, sf_dir))
    assert "* Project" in plan or "* Filter" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, f"python in the hot path:\n{plan}"


def test_events_time_filter_pushed(spark, sf_dir, reg):
    # With accounting off, isnotnull(time) propagates through the
    # null-intolerant micros conversion down to the ts scan filter.
    plan = _plan(reg["migrate_events"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(ts)]" in plan, plan


def test_observe_pins_filter_above_scan(spark, sf_dir):
    # With accounting ON the filter must NOT push below CollectMetrics —
    # pushed-down rows would never be counted as skipped.
    from node_mongo2influx_spark.operators.transform import TransformSpec
    from node_mongo2influx_spark.plans.tables import load

    out, _ = TransformSpec(rename={"ts": "time"}).apply(load(spark, sf_dir, "events"))
    plan = _plan(out)
    assert "CollectMetrics" in plan
    assert "PushedFilters: [IsNotNull(ts)]" not in plan


def test_q7_broadcasts_dims_single_fact_shuffle(spark, sf_dir, reg):
    # Four broadcast dim joins at test scale (customer, supplier, nation
    # twice under different aliases — only the nations are HINTED; customer
    # and supplier broadcast by size); the only shuffle join is
    # lineitem x orders.
    plan = _plan(reg["q7_nation_trade_flow"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_q16_anti_join_broadcasts_exclusion_list(spark, sf_dir, reg):
    # The exclusion subquery is an aggregate (small): the anti join must be
    # a broadcast probe, never a shuffle of the part table.
    plan = _plan(reg["q16_supplier_variety"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q15_scalar_max_stays_lazy(spark, sf_dir, reg):
    # The scalar max joins back as a 1-row broadcast (nested-loop over one
    # row) — the whole query is one plan, no driver round-trip mid-build.
    plan = _plan(reg["q15_top_supplier"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_lsh_bucket_join_carries_ids_only(spark, sf_dir, reg):
    # The LSH candidate join must move (id, t, bucket) rows only; the
    # embedding vectors rejoin the candidate set afterwards. An exchange
    # that hashes on bucket but carries a vector column replicates every
    # embedding n_tables× (the round-1 scale defect) — pin it out.
    for qname in ("embedding_neardup_lsh", "knn_cosine_lsh"):
        plan = _plan(reg[qname].fn(spark, sf_dir))
        for blk in plan.split("\n\n"):
            if "Exchange" not in blk and "BroadcastExchange" not in blk:
                continue
            if "bucket#" not in blk:
                continue
            for payload in ("vec#", "cvec#", "qvec#", " va#", " vb#", "vnorm#"):
                assert payload not in blk, (
                    f"{qname}: vector payload in bucket exchange:\n{blk}"
                )


def test_q10_high_cardinality_topk(spark, sf_dir, reg):
    # ~150k·sf group keys: the agg must keep its partial/final pair and the
    # top-20 must be TakeOrderedAndProject, never a global sort.
    plan = _plan(reg["q10_returned_revenue"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_returnflag)" in plan or "EqualTo(l_returnflag,R)" in plan, plan


def test_label_centroid_corpus_not_exploded(spark, sf_dir, reg):
    # Only the centroid computation may explode (one Generate); the corpus
    # side computes its cosine with array exprs — a second Generate would
    # mean the 64x row expansion leaked into the data path.
    plan = _plan(reg["label_centroid_cosine"].fn(spark, sf_dir))
    # formatted mode prints each operator twice (tree line "Generate (7)" +
    # detail header "(7) Generate") — count tree lines only
    assert plan.count("Generate (") == 1, plan


def test_q19_disjunction_splits_to_both_scans(spark, sf_dir, reg):
    # Catalyst must derive per-side filters from the OR-of-ANDs: the
    # quantity disjunction reaches the lineitem scan and the brand/size
    # disjunction reaches the part scan — neither scan is bare.
    plan = _plan(reg["q19_disjunctive_revenue"].fn(spark, sf_dir))
    assert "GreaterThanOrEqual(l_quantity,20.0)" in plan, plan
    assert "EqualTo(p_brand,Brand#1)" in plan, plan


def test_doc_repetition_is_zero_shuffle(spark, sf_dir, reg):
    # The repetition signal is a per-row fold over the sorted word array —
    # a narrow map with NO exchange (the word-count formulation would
    # shuffle every word in the corpus).
    plan = _plan(reg["doc_repetition_ratio"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode either


def test_range_join_is_bucketed_equi_join(spark, sf_dir, reg):
    # The ±1h interval join must run as a hash equi-join on
    # (user, hour-bucket) with the interval as residual — a naive interval
    # condition would plan BroadcastNestedLoopJoin (quadratic per user).
    plan = _plan(reg["range_join_clicks_near_purchase"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_join_no_cartesian(spark, sf_dir, reg):
    # The as-of is an equi-join on the key with a range residual — never a
    # cartesian/broadcast-nested-loop over the fact tables.
    plan = _plan(reg["asof_join_last_order"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_is_zero_shuffle(spark, sf_dir, reg):
    # Chunking is per-row work: split/sequence/slice + one Generate for
    # the explode — any Exchange would mean it can't run at scan speed.
    plan = _plan(reg["doc_chunk_overlap"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_char_entropy_is_zero_shuffle_no_explode(spark, sf_dir, reg):
    # The entropy fold is the histogram-free formulation: no Generate and
    # no KEYED shuffle (the oracle's explode+groupBy shape would shuffle
    # every character in the corpus). A single round-robin ROW spread is
    # allowed (r11): it moves each document once so the fold inherits the
    # cluster's parallelism instead of the scan's split count — cost
    # O(rows), unlike the O(chars) hash exchange this test exists to ban.
    plan = _plan(reg["doc_char_entropy"].fn(spark, sf_dir))
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Generate" not in plan, plan


def test_shuffle_order_no_global_sort(spark, sf_dir, reg):
    # The global-permutation op must not sort the corpus into one
    # partition: the data-sized window partitions by bucket (hash
    # exchange), and the only SinglePartition exchange feeds the
    # 64-row bucket-offset table.
    plan = _plan(reg["training_order_shuffle"].fn(spark, sf_dir))
    assert "rangepartitioning" not in plan.lower(), plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "hashpartitioning(bucket" in plan, plan


#: Queries whose fn() runs Spark jobs during composition (iterative
#: components / eager model training) — linting them re-trains models for
#: no plan information; their plan discipline has dedicated tests above.
_LINT_SKIP = {
    "dedup_clusters", "dedup_clusters_lsh", "dedup_filtered_corpus",
    "leakage_safe_split",  # components (iterative, eager) at compose
    "bpe_tokenize_corpus",  # BPE training (eager aggregate) at compose
    "knn_cosine_ivf", "knn_cosine_pq", "knn_cosine_ivfpq",
    "knn_cosine_ivfpq_batch",  # kmeans + codebook training at compose
    "embedding_neardup_ivf", "semantic_dedup_ivf",
    "embedding_pca_project",  # eager Gram collect (model-sized) at compose
}

#: Queries where a BroadcastNestedLoopJoin is the INTENDED plan, each with
#: the boundedness/intent argument. Two classes: (a) a 1-row global
#: aggregate or model-sized table cross-joined back (the loop side is O(1)
#: rows); (b) the documented EXACT all-pairs oracle tiers, whose quadratic
#: cost is the point (their scale twins are the LSH/IVF/PQ queries).
_SCALAR_CROSSJOIN_OK = {
    "tfidf_top_terms",        # n_docs scalar
    "doc_perplexity_bigram",  # vocabulary-size scalar
    "q15_top_supplier",       # global max revenue scalar
    "q22_dormant_high_balance",  # global avg balance scalar
    "q11_important_stock",    # nation-total scalar
    "label_centroid_cosine",  # k-row centroid table
    "ann_recall_probe",       # 16-row fixed centroid table
    "lsh_recall_probe",       # ≤10-row broadcast query side (exact yardstick)
    "pq_recall_probe",        # ≤10-row broadcast query side (exact yardstick)
    "q14_promo_revenue_pct",  # scalar ratio
    "q8_market_share",        # scalar shares
    "knn_cosine_bruteforce",  # exact tier: broadcast query side (≤5 rows)
    "embedding_neardup_pairs",  # exact all-pairs oracle tier (documented)
    "locf_forward_fill",      # 1-row bounds aggregate × distinct types
    "domain_mixture_weights",  # 1-row alpha-sum scalar × n_domains rows
    "length_bucket_padding_stats",  # 1-row global-max × n_buckets rows
    "word_subsample_weights",  # 1-row corpus-total × vocab rows
    "bm25_keyword_topk",      # 1-row (N, avgdl, per-term df) stats record
    "cooccurrence_pmi",       # two 1-row totals (pair count, word count)
    "rfm_segmentation",       # 1-row quantile-cutoff record × customers
    "hybrid_retrieval_rrf",   # bm25 1-row stats + knn broadcast (≤1-row query side)
    "bm25_multi_query_topk",  # 1-row (N, avgdl) stats record
    "dedup_modality_agreement",  # embeds the exact all-pairs cosine tier
    "dedup_modality_agreement_sampled",  # same tiers over the rate^2 hash sample
    "dup_transitivity_audit",  # three 1-row aggregates (edges, wedges, triangles)
    "join_key_skew_report",   # two 1-row aggregates (key stats × top-10 sum)
    "curriculum_training_order",  # 1-row quantile-cutoff record × docs
    "embedding_neardup_sampled",  # exact tier over the rate^2 hash sample
    "approx_top_words",       # 1-row err/c20 scalars × ≤20-row sketch items (r7 witness)
}

#: Queries whose Python-eval node is the deliverable itself.
_PYTHON_EVAL_OK = {
    "udtf_explode_props",  # the UDTF surface demo — UDTFs ARE Python
}


def test_registry_wide_plan_lint(spark, sf_dir, reg):
    # Every registered query's physical plan, linted for the anti-patterns
    # that kill 100 TB runs regardless of which operator they hide in:
    # cartesian products, row-at-a-time Python eval, and unexplained
    # nested-loop joins. New queries get linted automatically on
    # registration — no need to remember to add a per-query gate.
    bad = {}
    for name, qd in reg.items():
        if name in _LINT_SKIP:
            continue
        df = qd.fn(spark, sf_dir)
        plan = _plan(df)
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BatchEvalPython" in plan and name not in _PYTHON_EVAL_OK:
            problems.append("row-at-a-time Python UDF")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in _SCALAR_CROSSJOIN_OK
        ):
            problems.append("unexplained BroadcastNestedLoopJoin")
        if qd.oracle is not None:
            # Oracle queries are hash-compared by the driver through
            # pandas sort_values, which cannot factorize bytes/list/dict
            # cells — non-scalar output columns crashed the comparator in
            # r3 (binary) AND r4 (array). Ban them at the query edge:
            # posexplode to rows or concat_ws/hex to a string.
            nonscalar = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if any(
                    f.dataType.simpleString().startswith(p)
                    for p in ("array", "map", "struct", "binary")
                )
            ]
            if nonscalar:
                problems.append(
                    f"non-scalar output columns {nonscalar} crash the "
                    "driver comparator"
                )
        if problems:
            bad[name] = problems
    assert not bad, f"plan lint failures: {bad}"


def test_lateral_decorrelates_to_window(spark, sf_dir, reg):
    # The correlated LATERAL-with-LIMIT must plan as ONE join feeding a
    # window rank — not a nested-loop that re-executes the subquery per
    # outer row (and not a cartesian). Catalyst's decorrelation is what
    # makes the SQL-standard spelling usable at 100 TB.
    plan = _plan(reg["lateral_top_orders"].fn(spark, sf_dir))
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan
    import re

    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 2, plan  # customer once, orders once
