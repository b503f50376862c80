"""Multimodal plumbing tests (binary payloads, mapInPandas features,
stubbed codecs)."""

import pytest

from etlalchemy_spark.operators.multimodal import (
    attach_payload,
    byte_features,
    decode_image,
    frame_sample_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 100)], "id long, text string"
    )
    return attach_payload(df, "id", "text")


def test_payload_schema(media):
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<mime:string,n_bytes:bigint")


def test_byte_features(spark, media):
    rows = {r.id: r for r in byte_features(media, "id").collect()}
    assert rows[1].n_bytes == 11 and rows[1].first_byte == ord("h")
    assert rows[1].head_byte_sum == sum(b"hello world")
    assert rows[2].n_bytes == 0 and rows[2].first_byte == -1
    assert rows[3].head_byte_sum == ord("x") * 64  # capped at 64 bytes


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG")


def test_frame_sampling(spark, media):
    frames = frame_sample_stub(media, "id", every_n_bytes=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r.frame_offset)
    assert by_id[1] == [1, 5, 9]  # 11 bytes, stride 4
    assert by_id[2] == [1]  # empty payload still yields one probe


def test_byte_features_string_ids(spark):
    """The mapInPandas schema keeps the caller's id type (a hardcoded
    long broke string-keyed tables, r5 review)."""
    from etlalchemy_spark.operators.multimodal import attach_payload, byte_features

    df = spark.createDataFrame([("doc-a", "hello")], "doc_id string, text string")
    out = byte_features(attach_payload(df, "doc_id", "text"), "doc_id").collect()
    assert out[0]["doc_id"] == "doc-a" and out[0]["n_bytes"] == 5


def test_frame_sample_routes_null_payload(spark):
    from pyspark.sql import functions as F

    from etlalchemy_spark.operators.multimodal import frame_sample_stub

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdefgh")), (2, None)], "doc_id int, payload binary"
    )
    out = frame_sample_stub(df, "doc_id", every_n_bytes=4)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2}  # NULL payload routed, not dropped
    # the NULL-payload doc yields exactly one placeholder row with NULL
    # frame bytes (greatest() skips the NULL length -> offset 1)
    null_rows = out.where(F.col("doc_id") == 2).collect()
    assert len(null_rows) == 1 and null_rows[0]["frame_bytes"] is None
