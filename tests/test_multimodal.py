"""Multimodal plumbing tests: binary payloads, metadata, stubbed decode."""

from __future__ import annotations

import pytest

from node_mongo2influx_spark.operators import multimodal


@pytest.fixture(scope="module")
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "x" * 10), (2, "y" * 2000), (3, "z" * 5000)],
        "doc_id long, text string",
    )
    return multimodal.as_binary_payload(df, source_col="text")


def test_payload_meta(payloads):
    rows = {r["doc_id"]: r for r in multimodal.payload_meta(payloads).collect()}
    assert rows[1]["n_bytes"] == 10 and rows[1]["size_class"] == "small"
    assert rows[2]["size_class"] == "medium"
    assert rows[3]["size_class"] == "large"
    assert len(rows[1]["content_md5"]) == 32


def test_extract_features_fake_mode(payloads):
    out = multimodal.extract_features(payloads, dim=16).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 3
    assert len(rows[1]["feature"]) == 16
    assert all(0.0 <= v <= 1.0 for v in rows[1]["feature"])
    assert rows[1]["decoder"] == "stub-fake"
    # deterministic across runs
    again = {r["doc_id"]: r for r in multimodal.extract_features(payloads, dim=16).collect()}
    assert again[1]["feature"] == rows[1]["feature"]


def test_extract_features_real_mode_is_stubbed(payloads):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        multimodal.extract_features(payloads, mode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_sample_frames(payloads):
    rows = multimodal.sample_frames(payloads, every_n_bytes=1024, frame_bytes=16).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1  # tiny payload -> one frame
    assert len(by_doc[3]) == 5  # 5000 bytes / 1024 -> offsets 1,1025,...,4097
    assert all(len(bytes(r["frame"])) <= 16 for r in rows)
