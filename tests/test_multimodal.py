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


# --- image_dims: real container-format headers, no codec needed ----------

def _png(w: int, h: int) -> bytearray:
    # signature + IHDR chunk (len, type, width, height, bit depth, color
    # type, compression, filter, interlace) — crc omitted; the parser only
    # reads the documented fixed offsets.
    return bytearray(
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 6, 0, 0, 0])
    )


def _jpeg(w: int, h: int, extra_segments: int = 2) -> bytearray:
    # SOI, then APP0 (JFIF), then `extra_segments` dummy COM segments (so
    # the marker walk is actually exercised), then SOF0 with the dims.
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for i in range(extra_segments):
        body = bytes([i]) * 5
        out += b"\xff\xfe" + (2 + len(body)).to_bytes(2, "big") + body
    out += (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    return out


def test_image_dims_parses_png_and_jpeg_headers(spark):
    df = spark.createDataFrame(
        [
            (1, _png(640, 480)),
            (2, _jpeg(1920, 1080)),
            (3, _jpeg(33000, 2, extra_segments=8)),  # width > int16
            (4, bytearray(b"not an image at all")),
            (5, _png(1, 1)),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in multimodal.image_dims(df).collect()}
    assert (rows[1]["fmt"], rows[1]["width"], rows[1]["height"]) == ("png", 640, 480)
    assert (rows[2]["fmt"], rows[2]["width"], rows[2]["height"]) == ("jpeg", 1920, 1080)
    assert (rows[3]["fmt"], rows[3]["width"], rows[3]["height"]) == ("jpeg", 33000, 2)
    assert rows[4]["fmt"] == "unknown"
    assert rows[4]["width"] is None and rows[4]["height"] is None
    assert (rows[5]["width"], rows[5]["height"]) == (1, 1)


def test_image_dims_jpeg_segment_cap_yields_null_not_error(spark):
    deep = _jpeg(10, 10, extra_segments=40)  # beyond max_jpeg_segments
    df = spark.createDataFrame([(1, bytearray(deep))], "doc_id long, payload binary")
    row = multimodal.image_dims(df, max_jpeg_segments=16).collect()[0]
    assert row["fmt"] == "jpeg"
    assert row["width"] is None and row["height"] is None


def test_image_dims_stays_jvm_side(spark):
    df = spark.createDataFrame([(1, _png(2, 2))], "doc_id long, payload binary")
    plan = multimodal.image_dims(df)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_sniff_mime_magic_bytes(spark):
    from node_mongo2influx_spark.operators import multimodal

    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A" + "00" * 8)),  # PNG
        (2, bytes.fromhex("FFD8FFE000104A46")),             # JPEG
        (3, b"GIF89a" + b"\x01\x02"),                        # GIF
        (4, b"RIFF\x10\x00\x00\x00WAVEfmt "),                # RIFF+WAVE
        (5, b"RIFF\x10\x00\x00\x00AVI LIST"),                # RIFF, not WAVE
        (6, b"%PDF-1.7 stuff"),                              # PDF
        (7, b"\xde\xad\xbe\xef garbage"),                    # unknown
        (8, b"\x89P"),                                       # short prefix
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r["sniffed_mime"]
        for r in multimodal.sniff_mime(df).collect()
    }
    assert got == {
        1: "image/png",
        2: "image/jpeg",
        3: "image/gif",
        4: "audio/x-wav",
        5: "application/x-riff",
        6: "application/pdf",
        7: "application/octet-stream",
        8: "application/octet-stream",
    }


def test_resize_images_fake_mode(payloads, spark):
    out = {r["doc_id"]: r for r in multimodal.resize_images(payloads, width=4, height=3).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r["width"], r["height"]) == (4, 3)
        assert len(r["thumb"]) == 12  # fixed output size regardless of input
        assert r["decoder"] == "stub-fake"
    # deterministic: same payload -> same thumbnail bytes across runs
    again = {r["doc_id"]: r for r in multimodal.resize_images(payloads, width=4, height=3).collect()}
    assert all(bytes(out[k]["thumb"]) == bytes(again[k]["thumb"]) for k in out)
    # null payloads pass through as null thumbs, not crashes
    withnull = payloads.unionByName(
        spark.createDataFrame([(9, None, "text/plain")], "doc_id long, payload binary, mime string")
    )
    rows = {r["doc_id"]: r for r in multimodal.resize_images(withnull, width=2, height=2).collect()}
    assert rows[9]["thumb"] is None


def test_resize_images_real_mode_is_stubbed(payloads):
    import pytest as _pytest

    df = multimodal.resize_images(payloads, mode="real")
    with _pytest.raises(Exception, match="NotImplementedError|codecs"):
        df.collect()
    with _pytest.raises(ValueError):
        multimodal.resize_images(payloads, mode="nope")
