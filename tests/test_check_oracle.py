"""Unit tests for the local oracle gate's output-type hazard check
(tools/check_oracle.py::output_hazards) — the class of bug that burned
rounds 3 AND 4: outputs that hash fine locally but crash the DRIVER's
pandas-based comparator (bytearray in r3, list cells in r4)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import output_hazards  # noqa: E402


def _fields(spark, ddl: str):
    return spark.createDataFrame([], ddl).schema.fields


def test_array_output_is_flagged(spark):
    # The exact pre-fix multimodal_features shape: Spark array<double>,
    # DuckDB DOUBLE[] — r4's driver-red row MUST be caught locally now.
    probs = output_hazards(
        _fields(spark, "doc_id bigint, feature_r array<double>"),
        ["doc_id", "feature_r"],
        ["BIGINT", "DOUBLE[]"],
    )
    assert len(probs) == 1 and "non-scalar" in probs[0]
    assert "feature_r" in probs[0]


def test_map_struct_and_duckdb_list_flagged(spark):
    probs = output_hazards(
        _fields(spark, "m map<string,int>, s struct<a:int>"),
        ["m", "s"],
        ["MAP(VARCHAR, INTEGER)", "STRUCT(a INTEGER)"],
    )
    assert probs and "non-scalar" in probs[0]
    # spark-side AND oracle-side spellings both reported
    assert "spark:m" in probs[0] and "oracle:s" in probs[0]


def test_binary_output_is_flagged(spark):
    # r3's multimodal_frame_sample crash class.
    probs = output_hazards(
        _fields(spark, "frame binary"), ["frame"], ["BLOB"]
    )
    assert len(probs) == 1 and "binary" in probs[0]


def test_hugeint_and_decimal_flagged(spark):
    probs = output_hazards(
        _fields(spark, "n bigint, total double"),
        ["n", "total"],
        ["HUGEINT", "DECIMAL(18,2)"],
    )
    assert len(probs) == 1 and "arrow-hostile" in probs[0]


def test_scalar_outputs_pass(spark):
    probs = output_hazards(
        _fields(
            spark,
            "id bigint, name string, v double, ok boolean, d date, t timestamp",
        ),
        ["id", "name", "v", "ok", "d", "t"],
        ["BIGINT", "VARCHAR", "DOUBLE", "BOOLEAN", "DATE", "TIMESTAMP"],
    )
    assert probs == []
