"""Property-based checks (SURVEY.md §5.2 item 4): random transform specs
over random sub-schemas preserve the reference's own invariants."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from node_mongo2influx_spark import TransformSpec

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


@st.composite
def specs(draw):
    drop = draw(st.lists(st.sampled_from(["user_id", "value", "event_type"]),
                         unique=True, max_size=2))
    rename_time = draw(st.booleans())
    where = draw(st.sampled_from([None, "event_id % 2 = 0", "value > 50"]))
    return TransformSpec(
        rename={"ts": "time"} if rename_time else {},
        drop=drop,
        where=where,
        time_column="time" if rename_time else "ts",
        count_skipped=True,
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=specs())
def test_rows_in_equals_out_plus_skipped(spark, sf_dir, spec):
    from node_mongo2influx_spark.plans.tables import load

    df = load(spark, sf_dir, "events")
    out, obs = spec.apply(df)
    n_out = out.count()
    stats = obs.get
    # the reference's own invariant (index.js:271):
    assert stats["rows_in"] == n_out + stats["rows_skipped"]
    # schema algebra: input minus dropped, with renames applied
    expected = [
        ("time" if (c == "ts" and spec.rename) else c)
        for c in [*COLS, "props"]
        if c not in spec.drop
    ]
    assert out.columns == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    buckets=st.integers(min_value=1, max_value=64),
)
def test_salted_aggregation_matches_plain(spark, sf_dir, buckets):
    from pyspark.sql import functions as F

    from node_mongo2influx_spark.functions.skew import salted_count, salted_sum
    from node_mongo2influx_spark.plans.tables import load

    e = load(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (r["n"], round(r["s"], 4))
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    ns = {
        r["event_type"]: r["n"]
        for r in salted_count(e, ["event_type"], buckets).collect()
    }
    ss = {
        r["event_type"]: round(r["total"], 4)
        for r in salted_sum(e, ["event_type"], "value", buckets).collect()
    }
    assert ns == {k: v[0] for k, v in plain.items()}
    assert ss == {k: v[1] for k, v in plain.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff"]),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_repetition_fold_matches_counter(spark, docs):
    # the longest-equal-run-over-sorted-words fold must equal the max
    # word frequency for ANY word multiset, not just fixture text
    from collections import Counter

    from node_mongo2influx_spark.plans.llm_ops import doc_repetition_ratio

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import node_mongo2influx_spark.plans.tables as tables

    # route the query's load() to our synthetic frame
    orig = tables.load
    import node_mongo2influx_spark.plans.llm_ops as llm_ops

    llm_ops.load = lambda s, d, n: df
    try:
        got = {
            r["doc_id"]: (r["top_word_count"], r["n_words"])
            for r in doc_repetition_ratio(spark, "unused").collect()
        }
    finally:
        llm_ops.load = orig
    for i, words in enumerate(docs):
        c = Counter(words)
        assert got[i] == (max(c.values()), len(words)), (i, words)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff"]),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=10,
    ),
    ctx=st.integers(min_value=2, max_value=12),
)
def test_chunk_windows_covers_every_word(spark, docs, ctx):
    # invariants for ANY document set and any (ctx, stride=ctx//2+1):
    # chunk count = ceil(n / stride); sizes = ctx except a short tail;
    # reconstructing from stride-prefixes of each chunk yields the doc.
    import math

    from node_mongo2influx_spark.operators import sampling

    stride = ctx // 2 + 1
    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.chunk_windows(df, ctx=ctx, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, words in enumerate(docs):
        n = len(words)
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_no"])
        assert len(chunks) == math.ceil(n / stride)
        for j, c in enumerate(chunks):
            start = j * stride
            assert c["n_words"] == min(ctx, n - start)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
)
def test_shuffle_order_is_always_a_permutation(spark, ids):
    from node_mongo2influx_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = sampling.shuffle_order(df, n_buckets=8).collect()
    positions = sorted(r["pos"] for r in out)
    assert positions == list(range(len(ids)))


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=200, deadline=None)
def test_cdc_chunks_reassemble_and_are_edit_local(text):
    # Pure-python model of operators/dedup.cdc_chunks (the Spark/DuckDB
    # equivalence is pinned by tests/test_dedup.py on the fixtures; this
    # checks the ALGORITHM's invariants on arbitrary printable strings).
    from tests.test_dedup import _cdc_python

    chunks = _cdc_python(text)
    # lossless: chunks partition the document exactly, in order
    assert "".join(c[3] for c in chunks) == text
    assert [c[0] for c in chunks] == list(range(1, len(chunks) + 1))
    assert all(c[2] == len(c[3]) >= 1 for c in chunks)
    # edit locality: prepending text preserves all chunks after the
    # first boundary of the original
    edited = _cdc_python("XX " + text)
    if len(chunks) > 1:
        surviving = {c[3] for c in chunks[1:]}
        got = {c[3] for c in edited}
        assert surviving <= got


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_components_match_pure_python_union_find(spark, edges):
    # Model-based check of the contraction components operator against a
    # 20-line sequential union-find: same partition into components, and
    # component_id is the smallest member id — for ANY random graph,
    # including self-loops, duplicate and reversed edges.
    from node_mongo2influx_spark.operators import dedup

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component_id"]
        for r in dedup.components_from_pairs(pairs).collect()
    }
    assert got == expect
