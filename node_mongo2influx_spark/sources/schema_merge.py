"""Heterogeneous-document schema handling (SURVEY.md §1.3, §7 hard-part 2).

Mongo collections are schemaless: documents in one collection can disagree
on fields and even on a field's type. The reference passes whatever keys
exist straight through (index.js:234). Spark needs a schema, so the policy
is explicit here:

* **union-of-fields** (:func:`union_heterogeneous`): the merged schema is
  the union of all input schemas; absent fields become nulls
  (``unionByName(allowMissingColumns=True)`` chained). Matches how users
  expect Mongo data to land in a table.
* **conflict fallback** (:func:`merge_read_json`): reading JSON with
  ``mergeSchema``-style inference; where two files type a field
  incompatibly, Spark widens (int→long→double) or falls back to string —
  the remaining conflicts surface as a clear AnalysisException rather than
  silent corruption.
* **opaque fallback**: for truly wild documents, keep the raw JSON string
  column and extract typed fields lazily (``json_props_map`` /
  ``from_json`` with a permissive map schema) — nothing is dropped.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def union_heterogeneous(dfs: list[DataFrame]) -> DataFrame:
    """Union frames with differing schemas: union-of-fields, nulls for
    absent columns. Column order follows first appearance."""
    if not dfs:
        raise ValueError("no frames to union")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def merge_read_json(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read JSON-lines files with unified inferred schema across all paths
    (one inference pass over the whole set, so per-file schema drift merges
    instead of failing on the first mismatch)."""
    return spark.read.option("multiLine", "false").json(paths)
