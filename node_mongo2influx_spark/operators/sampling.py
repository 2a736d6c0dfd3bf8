"""Deterministic sampling & dataset splitting (training-data pipeline ops).

Random sampling (``df.sample``) is useless for dataset curation at scale:
it isn't reproducible across runs/engines, can't be joined against later
("which split did doc X land in?"), and resamples everything when the
corpus grows. These operators derive membership from a *hash of the row's
id + a salt*, which makes splits

* **stable** — a document keeps its split for life; appending new data
  never reshuffles old assignments (the property that keeps eval sets
  uncontaminated across corpus versions);
* **reproducible** — any engine that can hash can recompute the split
  (the DuckDB oracles replay the exact arithmetic via functions/phash);
* **tunable per stratum** — per-source rates for mixture weighting.

All membership tests are integer comparisons of a 32-bit hash against a
precomputed cutoff — no float division, no cross-engine representation
questions. Everything is Column expressions (whole-stage codegen); the
only shuffle in the counting queries is the final small aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from node_mongo2influx_spark.functions.phash import (
    HASH_SPACE,
    cutoff32,
    fnv1a32_spark_sql,
)

#: Default split spec: name -> fraction (must sum to <= 1; remainder falls
#: in the last split via the open-ended ELSE).
DEFAULT_SPLITS = (("train", 0.90), ("val", 0.05), ("test", 0.05))


def split_hash(id_col: str, salt: str) -> Column:
    """32-bit portable hash of ``cast(id as string) || ':' || salt``.

    The salt namespaces independent decisions: a split assignment and a
    sampling pass over the same ids must not reuse one hash, or sampling
    would systematically favor one split (hash < cutoff twice).
    """
    if "'" in salt:
        raise ValueError("salt must not contain quotes")
    key = f"concat(cast({id_col} as string), ':{salt}')"
    return F.expr(fnv1a32_spark_sql(key))


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits=DEFAULT_SPLITS,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column: deterministic train/val/test assignment.

    Cumulative integer cutoffs over the 32-bit hash space; the last split
    absorbs the tail so fractions that don't sum to exactly 1 can't drop
    rows.
    """
    names = [n for n, _ in splits]
    cums, acc = [], 0.0
    for _, frac in splits:
        acc += frac
        cums.append(cutoff32(min(acc, 1.0)))
    h = split_hash(id_col, salt)
    expr: Column = F.lit(names[-1])
    # Build the CASE from the right: WHEN h < cut_0 THEN s_0 ... ELSE last.
    for name, cut in reversed(list(zip(names[:-1], cums[:-1]))):
        expr = F.when(h < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    default_fraction: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its hash falls
    under its stratum's cutoff. ``fractions`` maps stratum value -> keep
    rate; strata not listed get ``default_fraction``. The mixture-weighting
    primitive: rates express source proportions for a training blend, and
    the same (id, salt) always yields the same keep decision.
    """
    h = split_hash(id_col, salt)
    cut: Column = F.lit(cutoff32(default_fraction))
    for value, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == F.lit(value), F.lit(cutoff32(frac))).otherwise(cut)
    return df.where(h < cut)


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    ctx_len: int = 2048,
    n_buckets: int = 16,
    size_ordered: bool = False,
) -> DataFrame:
    """Assign documents to fixed-size context windows (training-sequence
    packing), bucketed for scale.

    Greedy-by-order packing: within a bucket, documents are laid out in
    id order and a document joins the bin its start offset falls in
    (``floor(prefix_tokens / ctx_len)``) — the streaming concatenate-and-
    chop layout most LLM data loaders use. A single global order would
    need a one-partition window; hashing ids into ``n_buckets``
    independent buckets keeps the window shuffle n_buckets-way parallel
    and each bin fully deterministic (grow n_buckets with the corpus;
    packing quality is unaffected since bins never span buckets).

    ``size_ordered=True`` lays each bucket out longest-document-first
    (first-fit-decreasing flavour): big docs pack early while bins are
    empty and the fragmentation tail is made of small docs that still fit
    — measurably fewer cross-bin splits / less padding waste than id
    order, at identical cost (the window just sorts by (tokens DESC, id)
    instead of id). Deterministic either way.

    Returns one row per document: (id, bucket, bin, tokens, prefix before
    the doc) — downstream writers group by (bucket, bin).
    """
    from pyspark.sql import Window

    bucket = F.pmod(F.col(id_col), F.lit(n_buckets)).alias("bucket")
    order = (
        [F.col("toks").desc(), F.col(id_col)]
        if size_ordered
        else [F.col(id_col)]
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(F.col(id_col), bucket, F.col(tokens_col).alias("toks"))
    out = out.withColumn("cum", F.sum("toks").over(w))
    return out.select(
        id_col,
        "bucket",
        F.floor((F.col("cum") - F.col("toks")) / ctx_len).alias("bin"),
        F.col("toks").alias("n_tokens"),
        (F.col("cum") - F.col("toks")).alias("start_offset"),
    )


def split_oracle_case_duckdb(
    id_col: str, splits=DEFAULT_SPLITS, salt: str = "split-v1"
) -> str:
    """DuckDB CASE expression replaying :func:`assign_split` exactly."""
    from node_mongo2influx_spark.functions.phash import fnv1a32_duckdb_sql

    key = f"concat(CAST({id_col} AS VARCHAR), ':{salt}')"
    h = fnv1a32_duckdb_sql(key)
    names = [n for n, _ in splits]
    whens, acc = [], 0.0
    for name, frac in zip(names[:-1], [f for _, f in splits][:-1]):
        acc += frac
        whens.append(f"WHEN {h} < {cutoff32(min(acc, 1.0))} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into fixed-size context windows with overlap.

    The training-data chunking op: a document becomes ``ceil(n/stride)``
    chunks of up to ``ctx`` words, each chunk starting ``stride`` words
    after the previous (``ctx - stride`` words of overlap carry context
    across chunk boundaries — the standard sliding-window layout for
    models with a bounded context length). The reference's per-row
    transform surface (index.js:234) has no analogue; this is pure
    §2.12 extension.

    Everything is per-row Column work — split, sequence of starts,
    slice per start — so the operator runs inside whole-stage codegen
    with ZERO shuffles and scales embarrassingly: 100 TB of documents
    chunk at scan speed. The chunk text itself is emitted as an md5
    fingerprint (chunk_md5) so the output stays narrow; swap the md5
    for array_join(...) when the downstream wants the words.
    """
    if not 1 <= stride <= ctx:
        raise ValueError(f"need 1 <= stride <= ctx, got stride={stride} ctx={ctx}")
    # The split is materialized in its OWN projection so the lambdas
    # below reference an attribute, not the expression tree: an inlined
    # split(text) re-evaluates O(len) per chunk START (the round-5
    # CollapseProject lesson in higher-order-function form), which is
    # O(chunks · len) — a 10 MB document never finishes (longdoc sweep,
    # round 9). Through the attribute, the array is built once per row
    # and each slice is O(ctx).
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__ws")
    )
    ws = F.col("__ws")
    starts = F.sequence(F.lit(1), F.size(ws), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_no"),
            F.slice(ws, s, ctx).alias("chunk_words"),
        ),
    )
    ex = staged.select(F.col(id_col), F.explode(chunks).alias("c"))
    return ex.select(
        id_col,
        F.col("c.chunk_no").cast("int").alias("chunk_no"),
        F.size("c.chunk_words").alias("n_words"),
        F.md5(F.array_join("c.chunk_words", " ")).alias("chunk_md5"),
    )


def shuffle_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training-order permutation — WITHOUT a global
    sort.

    Training wants examples in a reproducible pseudo-random order. The
    naive ``orderBy(hash)`` plans a range-partitioned global sort; fine,
    but the position assignment (row_number over the whole corpus) would
    need a single-partition window — the classic driver-shaped bottleneck.
    Instead:

    1. key  = portable 32-bit hash of (id, salt)  — the shuffle order;
    2. bucket = key div (2^32 / n_buckets)  — a RANGE prefix of the key,
       so (bucket, key, id) ordering == (key, id) ordering;
    3. local rank per bucket (n_buckets-way parallel window);
    4. bucket offsets = running sum over the n_buckets-row count table
       (tiny — broadcast back);
    5. pos = offset + local_rank - 1.

    Every shuffle is n_buckets-way parallel; nothing single-partition
    touches data-sized input. n_buckets must be a power of two (exact
    integer bucket width). Grow it with the corpus; the permutation is
    unchanged (bucket is derived from the key, not from n_buckets-
    dependent arithmetic ... the WIDTH depends on n_buckets, but order
    is by (key, id) regardless, so pos is n_buckets-invariant).
    """
    from pyspark.sql import Window

    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    width = HASH_SPACE // n_buckets
    out = df.select(F.col(id_col), split_hash(id_col, salt).alias("h"))
    out = out.withColumn("bucket", F.expr(f"h div {width}"))
    local = F.row_number().over(
        Window.partitionBy("bucket").orderBy("h", id_col)
    )
    counts = out.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    offs = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "off")
    return (
        out.withColumn("local", local)
        .join(offs, "bucket")
        .select(
            id_col, (F.col("off") + F.col("local") - 1).alias("pos")
        )
    )


def domain_mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_chars",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled sampling weights per domain (training mixtures).

    A raw-proportional blend lets the biggest crawl swamp every small
    high-quality domain; the standard fix is to sample domain i with
    probability c_i^alpha / sum_j c_j^alpha for alpha < 1, which flattens
    the distribution (alpha=1 is natural, alpha=0 uniform). Returns per
    domain: its natural share, its alpha-scaled mixture share, and the
    resulting boost factor (mixture/natural — how many effective epochs
    of that domain one pass of the blend consumes).

    Two shuffles total, both tiny: the per-domain aggregate (map-side
    partial over the corpus — the only data-sized input) and a 1-row
    global reduce of the n_domains-row table, joined back via broadcast.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight_col).alias("w_total"),
    # per feeds the 1-row reduce AND the output spine; persisting the
    # n_domains-row aggregate keeps the corpus scan single-pass (r11).
    ).persist()
    tot = per.agg(
        F.sum(F.pow(F.col("w_total").cast("double"), F.lit(alpha))).alias("wsum"),
        F.sum("w_total").alias("tsum"),
    )
    scaled = F.pow(F.col("w_total").cast("double"), F.lit(alpha))
    natural = F.col("w_total").cast("double") / F.col("tsum")
    mixture = scaled / F.col("wsum")

    def _r6(c: Column) -> Column:
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "w_total",
        _r6(natural).alias("p_natural"),
        _r6(mixture).alias("p_mixture"),
        _r6(mixture / natural).alias("boost"),
    )


def quota_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 15,
    salt: str = "quota-v1",
) -> DataFrame:
    """Per-domain quota sampling: keep at most ``cap`` rows per group,
    chosen by deterministic hash rank (not arrival order, not df.sample).

    The curation op for capping over-represented domains: every engine
    replays the same choice (portable FNV rank), appending new documents
    can displace old ones only by hash order (stable under re-runs of the
    same corpus), and the per-group window is as parallel as the group
    count. One shuffle (the window partition by group).
    """
    from pyspark.sql import Window

    h = split_hash(id_col, salt)
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        df.select(F.col(id_col), F.col(group_col))
        .withColumn("sample_rank", rn)
        .where(F.col("sample_rank") <= cap)
    )


def length_bucket_padding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket: int = 64,
) -> DataFrame:
    """Padding-waste accounting for length-bucketed batching.

    Batching variable-length documents pads every sequence to its batch's
    longest member; bucketing by length bounds that waste. Buckets here
    are multiples of ``bucket`` tokens (a doc of n tokens pads to
    ceil(n/bucket)*bucket). Returns, per bucket: document count, real
    token sum, the padded token sum, the padding fraction — and the
    fraction the same documents would waste if padded to the corpus-wide
    max bucket instead (the single-bucket strawman), which is what
    justifies bucketing in the first place.

    One data-sized aggregate (map-side partial), then a 1-row global max
    broadcast back over the tiny bucket table.
    """
    n_tokens = F.size(F.split(F.col(text_col), " "))
    cap = (F.floor((n_tokens - 1) / bucket) + 1) * bucket
    per = (
        df.where(n_tokens > 0)
        .select(cap.alias("bucket_cap"), n_tokens.alias("toks"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("token_sum"),
        )
    )
    gmax = per.agg(F.max("bucket_cap").alias("max_cap"))

    def _r6(c: Column) -> Column:
        return F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0

    padded = F.col("n_docs") * F.col("bucket_cap")
    padded_g = F.col("n_docs") * F.col("max_cap")
    return per.crossJoin(F.broadcast(gmax)).select(
        "bucket_cap",
        "n_docs",
        "token_sum",
        padded.alias("padded_sum"),
        _r6(F.lit(1.0) - F.col("token_sum") / padded).alias("pad_frac"),
        _r6(F.lit(1.0) - F.col("token_sum") / padded_g).alias("pad_frac_global"),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    splits=DEFAULT_SPLITS,
    salt: str = "split-v1",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: the split hash is taken over each document's near-dup
    CLUSTER canonical id, not its own id, so every member of a duplicate
    cluster lands in the same split. A plain per-doc hash split puts
    ~(1 - Σ fᵢ²) of duplicate pairs in DIFFERENT splits — eval
    contamination by construction at any duplication rate.

    ``pairs`` is any near-dup pair set (MinHash-LSH, embedding cosine,
    CDC — same shape the dedup pipeline produces). Composition:
    connected components over the pairs (contraction operator, O(log d)
    rounds), canonical = component id, singletons keep their own id
    (left join + coalesce — docs with no pair cost nothing extra), then
    the standard salted-hash split over the canonical. Cost beyond plain
    assign_split: the components run over |pairs| edges + one broadcast-
    friendly join of the (duplicates-only) component map.
    """
    from node_mongo2influx_spark.operators import dedup

    comp = dedup.components_from_pairs(pairs, a_col=a_col, b_col=b_col)
    comp = comp.select(
        F.col("doc_id").alias(id_col), F.col("component_id").alias("__canon")
    )
    withc = df.join(comp, id_col, "left").withColumn(
        "__canon", F.coalesce(F.col("__canon"), F.col(id_col))
    )
    return assign_split(
        withc, id_col="__canon", splits=splits, salt=salt
    ).drop("__canon")


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_stages: int = 4,
    salt: str = "curriculum-v1",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic curriculum training order: easy → hard stages, each
    stage internally pseudo-random — without a global sort.

    1. stage = score quantile bucket (one n_stages-quantile aggregate =
       a 1-row cutoff record broadcast back; stage 0 = lowest scores);
    2. within a stage the order is the salted-hash shuffle, using
       shuffle_order's bucketed prefix-sum layout generalized to the
       (stage, bucket) composite — every window is stage×n_buckets-way
       parallel, the offset table is stage×n_buckets rows (tiny);
    3. pos = global training position: stages laid out consecutively.

    Returns (id, stage, pos); rows with a NULL score are omitted (a
    difficulty proxy that is undefined for a document cannot place it in
    the curriculum). pos is a contiguous 0..n-1 permutation;
    equal scores tie-break by the hash (deterministic). Curriculum
    learning's data side reduces to exactly this layout; swap the score
    for any difficulty proxy (perplexity, length, quality).
    """
    from pyspark.sql import Window

    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2, got {n_stages}")
    qs = [i / n_stages for i in range(1, n_stages)]
    # NULL scores are OMITTED (same rule as null text in the kernels): a
    # NULL-score row would get a NULL stage, silently vanish in the
    # offset join AFTER being counted into the offsets — breaking the
    # contiguous 0..n-1 pos contract for every surviving row.
    df = df.where(F.col(score_col).isNotNull())
    cuts = df.agg(
        F.expr(
            f"percentile({score_col}, array({', '.join(str(q) for q in qs)}))"
        ).alias("cuts")
    )
    width = HASH_SPACE // n_buckets
    out = (
        df.select(F.col(id_col), F.col(score_col).alias("__s"))
        .crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            F.aggregate(
                F.col("cuts"),
                F.lit(0),
                lambda acc, c: acc + (F.col("__s") > c).cast("int"),
            ).alias("stage"),
            split_hash(id_col, salt).alias("h"),
        )
        .withColumn("bucket", F.expr(f"h div {width}"))
        # consumed twice (count table + windowed join) downstream of the
        # corpus scan ⊗ percentile aggregate — persist so the expensive
        # subtree runs once per action, not twice (the narrow projection
        # is 3 longs + an int per row).
        .persist()
    )
    local = F.row_number().over(
        Window.partitionBy("stage", "bucket").orderBy("h", id_col)
    )
    counts = out.groupBy("stage", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    offs = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("stage", "bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("stage", "bucket", "off")
    return (
        out.withColumn("local", local)
        .join(offs, ["stage", "bucket"])
        .select(
            id_col,
            "stage",
            (F.col("off") + F.col("local") - 1).alias("pos"),
        )
    )
