"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mandated extension surface (BASELINE.json): image/audio/video are
``binary`` columns with a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched Pandas functions over
``mapInPandas``. The real media codecs aren't in this container
(SURVEY.md environment), so the decode step is STUBBED — clearly marked
``NotImplementedError`` for real codecs, with a deterministic
byte-level feature extractor proving the Spark-side plumbing (schema,
batch iteration, partition preservation) end-to-end.

Scale shape: mapInPandas streams Arrow batches partition-local — no
shuffle, no driver traffic; exactly how a real decoder would run over
100 TB of media (payload column pruned unless required, metadata-only
queries never touch bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = "payload binary, meta struct<mime:string,n_bytes:bigint,source:string>"


def attach_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "text/plain") -> DataFrame:
    """Wrap a column as the multimodal convention: (id, payload binary,
    meta struct). With real media, payload comes from
    ``spark.read.format('binaryFile')`` and meta from the file catalog."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.lit("fixture").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> None:
    """STUB: real image decode (PIL/opencv are not in this container).
    The mapInPandas plumbing around it is real and tested with
    byte-level features instead."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; swap in PIL.Image.open(io.BytesIO(payload)) on a "
        "real cluster"
    )


def byte_features(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic 'decode': per-payload byte-level features via
    mapInPandas (n_bytes, first_byte, byte_sum over the first 64 bytes)
    — the stand-in for decode→feature-extract with identical batch
    shape, schema handling, and partitioning. The id column keeps the
    CALLER's type (a hardcoded long broke string/int-keyed tables at
    the Arrow conversion)."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, n_bytes long, first_byte int, head_byte_sum long"

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # NULL payloads arrive as None: feature as empty (a real
            # decoder would route these to a dead-letter column, not
            # crash the executor)
            payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "head_byte_sum": payloads.map(
                        lambda b: int(sum(b[:64]))
                    ).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(extract, out_schema)


def frame_sample_stub(df: DataFrame, id_col: str, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' on the byte stream: one row per sampled offset
    (the video-frame-sampling plumbing — explode of sampled positions,
    payload sliced per frame). Deterministic byte slices stand in for
    decoded frames. NULL payloads are ROUTED, not dropped (module
    contract, same as byte_features): greatest() skips the NULL
    length so the id keeps one placeholder row (offset 1, NULL
    bytes), and explode_outer backstops that if the length expression
    ever returns NULL outright — a per-id reconciliation against
    byte_features must agree on row sets."""
    n = F.octet_length("payload")
    offsets = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes))
    return (
        df.select(F.col(id_col), "payload", F.explode_outer(offsets).alias("frame_offset"))
        .select(
            id_col,
            "frame_offset",
            F.substring(F.col("payload"), F.col("frame_offset"), 4).alias("frame_bytes"),
        )
    )


def resize_stub(df: DataFrame, id_col: str, target_bytes: int = 32) -> DataFrame:
    """'Resize' plumbing: normalize every payload to ``target_bytes``
    (crop long, zero-pad short) through the same Arrow-batched
    mapInPandas path a real thumbnailer uses. STUB semantics (byte
    crop/pad is the deterministic stand-in for pixel resampling — swap
    the body for PIL ``Image.resize`` on a real cluster); the schema,
    batch iteration, and updated metadata are the real contract."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, payload binary, n_bytes bigint"

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            fixed = pdf["payload"].map(
                lambda b: bytes((b or b"")[:target_bytes]).ljust(target_bytes, b"\x00")
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": fixed,
                    "n_bytes": fixed.map(len).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(resize, out_schema)
