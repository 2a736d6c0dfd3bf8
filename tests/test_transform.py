"""TransformSpec unit tests (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from node_mongo2influx_spark import TransformSpec


def _events(spark):
    return spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1), "a"),
            (2, None, "b"),
            (3, datetime.datetime(1970, 1, 1), "c"),  # epoch-0: must SURVIVE
        ],
        "id long, date timestamp, payload string",
    )


def test_rename_drop_cast_set(spark):
    spec = TransformSpec(
        rename={"date": "time"},
        drop=["payload"],
        cast={"id": "int"},
        set={"doubled": "id * 2"},
        time_column=None,
    )
    out = spec.compile(_events(spark))
    assert out.columns == ["id", "time", "doubled"]
    assert dict(out.dtypes)["id"] == "int"
    assert out.where("doubled = 6").count() == 1


def test_time_filter_keeps_epoch_zero(spark):
    # Deliberate deviation from JS truthiness (index.js:235): epoch-0 is a
    # valid timestamp here. SURVEY.md §4.3.2.
    spec = TransformSpec(rename={"date": "time"})
    out, obs = spec.apply(_events(spark))
    rows = out.collect()
    assert {r["id"] for r in rows} == {1, 3}
    assert obs.get == {"rows_in": 3, "rows_skipped": 1}


def test_where_predicate(spark):
    spec = TransformSpec(rename={"date": "time"}, where="id < 3")
    out, obs = spec.apply(_events(spark))
    assert [r["id"] for r in out.collect()] == [1]
    # where runs before the time filter, so skip accounting sees 2 rows
    assert obs.get == {"rows_in": 2, "rows_skipped": 1}


def test_batch_fn_escape_hatch(spark):
    # Arrow-batched opaque transform (the pandas analogue of an arbitrary
    # prepareFunction) — mapInPandas, never row-at-a-time.
    def add_len(batches):
        for pdf in batches:
            pdf = pdf.assign(payload_len=pdf["payload"].str.len())
            yield pdf[["id", "date", "payload_len"]]

    spec = TransformSpec(
        batch_fn=add_len,
        batch_schema="id long, date timestamp, payload_len long",
        rename={"date": "time"},
    )
    out, _ = spec.apply(_events(spark))
    got = {r["id"]: r["payload_len"] for r in out.collect()}
    assert got == {1: 1, 3: 1}


def test_stage_order_rename_then_set(spark):
    # set{} sees post-rename names, mirroring in-place row mutation in the
    # reference example.
    spec = TransformSpec(
        rename={"date": "time"},
        set={"year": "year(time)"},
        time_column="time",
    )
    out, _ = spec.apply(_events(spark))
    assert {r["year"] for r in out.collect()} == {2024, 1970}
