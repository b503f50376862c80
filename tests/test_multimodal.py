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
