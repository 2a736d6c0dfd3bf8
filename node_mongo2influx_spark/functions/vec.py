"""The vector-validity contract — the finite-measure rule extended to
embedding columns (round 10; the r8 rule's vector sibling).

The reference's data model is arbitrary numeric fields on schemaless
documents (index.js:198): nothing guarantees a vector column is
well-behaved, and the adversarial embedding sweep
(tools/embedding_fixtures.py) shows what hostile vectors do to naive
operators — ANSI DIVIDE_BY_ZERO on zero norms, NULL-element folds that
Spark propagates but DuckDB's list_sum skips, float(None) crashes in
Arrow kernels, and int64-saturating floor() on 1e38-component sums.

Two tiers, each ONE predicate spelled identically for Spark Columns,
Spark SQL text, and DuckDB oracle SQL:

**usable** — the input contract of every cosine-family operator
(knn/*, cosine_pairs*, semantic_dedup, centroids, trainers):

* non-NULL vector,
* no NULL and no non-finite (NaN/±Inf) elements — an invalid reading
  is not a valid vector, exactly as an invalid scalar measure is not a
  valid reading (functions/measures),
* at least one non-zero element. A zero vector has NO DIRECTION:
  cosine against it is 0/0 in every engine (raise, NULL, or NaN —
  all divergent). Real vector stores treat it as junk; so do we.
  The element-wise spelling (``exists(x != 0)``) is deliberately NOT
  ``norm > 0``: float32-sourced elements have magnitude ≥ 1.4e-45, so
  any nonzero element keeps the double norm ≥ ~1.4e-45 > 0 — the two
  are equivalent — but the element test cannot underflow.

Unusable vectors are EXCLUDED from vector-operator results, the way a
NULL measure is absent from an aggregate. Oracles carry the same WHERE.

**bounded** (usable AND every |x| <= ``STAT_ABS_MAX``) — the input
domain of the exact-quantization statistics operators (Gram matrix,
PCA milli-unit quantization, JL micro-unit outputs). These operators
freeze values onto integer lattices for reassociation-proof
cross-engine sums; a 3e38 component has no place on a milli-unit int64
lattice (the cast overflows, and Spark's floor() saturates LONG where
DuckDB's floor stays DOUBLE — measured divergence, r10 embed sweep).
Embeddings are unit-ish by construction; STAT_ABS_MAX=100 is ~100×
looser than any real embedding and keeps every quantized product
exactly summable: q <= 1e5 milli-units, q² <= 1e10 per element, safe
past 1e8 rows per BIGINT partial. Out-of-domain vectors are excluded
from the statistic — and REPORTED by ``embedding_norm_qa``'s
``n_outlier`` (a QA query surfaces what operators exclude).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Component-magnitude bound of the exact-quantization statistics domain.
STAT_ABS_MAX = 100.0

_INF = float("inf")


def usable_vector(col: Column) -> Column:
    """Spark Column: the **usable** predicate (see module docstring)."""
    bad = F.exists(
        col, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(_INF))
    )
    return col.isNotNull() & ~bad & F.exists(col, lambda x: x != F.lit(0.0))


def usable_vector_sql(expr: str) -> str:
    """Spark-SQL text twin of :func:`usable_vector`."""
    return (
        f"({expr} IS NOT NULL"
        f" AND NOT exists({expr}, x -> x IS NULL OR isnan(x)"
        f" OR abs(x) = double('Infinity'))"
        f" AND exists({expr}, x -> x != 0.0))"
    )


def usable_vector_duckdb_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`usable_vector`.

    ``list_filter`` drops NULL-predicate elements, so the zero test is
    only reached on vectors already known NULL-free (AND short-circuit
    is not guaranteed in SQL, but both branches are NULL-safe: a NULL
    element makes the first filter non-empty and the second filter's
    NULL predicate rows simply drop)."""
    return (
        f"({expr} IS NOT NULL"
        f" AND len(list_filter({expr},"
        f" x -> x IS NULL OR isnan(x) OR isinf(x))) = 0"
        f" AND len(list_filter({expr}, x -> x != 0)) > 0)"
    )


def bounded_vector(col: Column, bound: float = STAT_ABS_MAX) -> Column:
    """Spark Column: the **bounded** predicate (statistics domain)."""
    return usable_vector(col) & ~F.exists(
        col, lambda x: F.abs(x) > F.lit(bound)
    )


def bounded_vector_sql(expr: str, bound: float = STAT_ABS_MAX) -> str:
    """Spark-SQL text twin of :func:`bounded_vector`."""
    return (
        f"({usable_vector_sql(expr)}"
        f" AND NOT exists({expr}, x -> abs(x) > {bound!r}D))"
    )


def bounded_vector_duckdb_sql(expr: str, bound: float = STAT_ABS_MAX) -> str:
    """DuckDB oracle twin of :func:`bounded_vector`."""
    return (
        f"({usable_vector_duckdb_sql(expr)}"
        f" AND len(list_filter({expr}, x -> abs(x) > {bound!r})) = 0)"
    )


def vector_class(col: Column) -> Column:
    """Spark Column: QA classification of a vector into the contract's
    mutually-exclusive classes — ``missing`` (NULL vector), ``invalid``
    (NULL/NaN/±Inf element), ``zero`` (no direction), ``outlier``
    (usable but outside the statistics domain), ``ok``. The QA face of
    the predicates above: operators EXCLUDE, QA REPORTS."""
    return (
        F.when(col.isNull(), "missing")
        .when(
            F.exists(
                col,
                lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(_INF)),
            ),
            "invalid",
        )
        .when(~F.exists(col, lambda x: x != F.lit(0.0)), "zero")
        .when(
            F.exists(col, lambda x: F.abs(x) > F.lit(STAT_ABS_MAX)), "outlier"
        )
        .otherwise("ok")
    )


def vector_class_duckdb_sql(expr: str) -> str:
    """DuckDB oracle twin of :func:`vector_class`."""
    return (
        f"CASE WHEN {expr} IS NULL THEN 'missing'"
        f" WHEN len(list_filter({expr},"
        f" x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 THEN 'invalid'"
        f" WHEN len(list_filter({expr}, x -> x != 0)) = 0 THEN 'zero'"
        f" WHEN len(list_filter({expr}, x -> abs(x) > {STAT_ABS_MAX!r}))"
        f" > 0 THEN 'outlier'"
        f" ELSE 'ok' END"
    )


def usable_vector_py(v) -> bool:
    """Python/Arrow-kernel twin of :func:`usable_vector` (row values as
    collected: None, or a list of float/None)."""
    import math

    if v is None:
        return False
    any_nonzero = False
    for x in v:
        if x is None or math.isnan(x) or math.isinf(x):
            return False
        if x != 0.0:
            any_nonzero = True
    return any_nonzero
