"""Text analysis operator tests."""

from __future__ import annotations

import pytest

from node_mongo2influx_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "el perro y la casa de que", "es"),
            (3, "xyzzy qwerty plugh", "xx"),
            (4, "Hello, world! 42 times.", "en"),
        ],
        "doc_id long, text string, lang string",
    )


def test_quality_features(docs):
    rows = {r["doc_id"]: r for r in text.quality(docs).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert r1["n_chars_m"] == 22
    assert r1["stopword_ratio"] == round(2 / 6, 4)  # 'the' twice
    assert rows[4]["non_alpha_ratio"] > 0


def test_token_counts(docs):
    rows = {r["doc_id"]: r for r in text.token_counts(docs).collect()}
    assert rows[1]["ws_tokens"] == 6
    # "Hello, world! 42 times." -> Hello , world ! 42 times . = 7
    assert rows[4]["bpe_ish_tokens"] == 7


def test_lang_id_heuristic(docs):
    rows = {r["doc_id"]: r for r in text.lang_id(docs).collect()}
    assert rows[1]["predicted"] == "en"
    assert rows[2]["predicted"] == "es"
    assert rows[3]["predicted"] == "unknown"
    assert rows[1]["label"] == "en"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "A b C"), (3, "totally different")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert rows[1] == rows[2]  # whitespace + case normalized
    assert rows[1] != rows[3]
    out = text.fingerprint(df).first()
    assert out["shard_bucket"] == out["fingerprint"][:4]
