"""Multimodal-column queries: binary payload + metadata conventions
with Pandas-UDF decode plumbing (stubbed codecs, real dataflow).

The byte-level features are deterministic, so the mapInPandas path
itself is oracle-checked: DuckDB recomputes the same features from the
text with encode()/ascii() arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.operators.multimodal import attach_payload, byte_features, frame_sample_stub
from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t

def _spread_docs(spark, sf_dir):
    """The documents table, round-robin repartitioned to the session's
    full parallelism BEFORE the expensive Arrow/mapInPandas decode
    stages in this module. At gate scale the table is one small parquet
    file -> ONE input partition, which silently serialized every codec
    batch onto a single core (found in r13: mm_decode_jpeg_progressive
    spent its whole wall clock on 1 of 32 cores). The params frames
    built from this are metadata-thin (ids + synth dims; Catalyst
    prunes the projection through the exchange), so the narrow shuffle
    is ~free and the decode fans out to every core — the same move a
    100 TB pipeline makes when an upstream writes few large files.
    r14: footer-guarded via catalog.load_table_spread — the exchange
    exists only when the scan is actually under-split."""
    from etlalchemy_spark.catalog import load_table_spread

    return load_table_spread(spark, sf_dir, "documents")


_META_SQL = """
SELECT doc_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       'fixture' AS source
FROM documents
"""


@register("mm_payload_metadata", oracle=_META_SQL, tags=("multimodal",))
def mm_payload_metadata(spark, sf_dir):
    """The multimodal schema convention: metadata-only projection never
    touches payload bytes (column pruning keeps the scan narrow)."""
    docs = t(spark, sf_dir, "documents")
    wrapped = attach_payload(docs, "doc_id", "text")
    return wrapped.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
    )


_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN LENGTH(text) = 0 THEN -1 ELSE ascii(substr(text, 1, 1)) END AS INT)
         AS first_byte,
       CAST(list_aggregate(
              list_transform(generate_series(1, LEAST(LENGTH(text), 64)),
                             i -> ascii(substr(text, CAST(i AS INT), 1))),
              'sum') AS BIGINT) AS head_byte_sum
FROM documents
"""


@register("mm_decode_byte_features", oracle=_FEATURES_SQL, tags=("multimodal", "udf"))
def mm_decode_byte_features(spark, sf_dir):
    """The decode→feature-extract path through mapInPandas (Arrow
    batches, partition-local). Fixture text is ASCII, so byte features
    equal character features and DuckDB can recompute them."""
    docs = t(spark, sf_dir, "documents")
    wrapped = attach_payload(docs, "doc_id", "text")
    return byte_features(wrapped, "doc_id")


_FRAME_HEX_SQL = """
SELECT doc_id, frame_offset,
       hex(encode(substr(text, frame_offset, 4))) AS frame_hex
FROM (
  SELECT doc_id, text,
         CAST(UNNEST(generate_series(1, GREATEST(octet_length(encode(text)), 1), 64)) AS INT)
           AS frame_offset
  FROM documents WHERE doc_id < 50
)
"""


@register("mm_frame_sample", oracle=_FRAME_HEX_SQL, tags=("multimodal",))
def mm_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing over the byte stream; frames surface as
    hex strings so the oracle value-compares the actual sampled bytes
    (fixture text is ASCII → byte slices == character slices)."""
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    wrapped = attach_payload(docs, "doc_id", "text")
    frames = frame_sample_stub(wrapped, "doc_id", every_n_bytes=64)
    return frames.select(
        "doc_id",
        F.col("frame_offset").cast("int").alias("frame_offset"),
        F.hex("frame_bytes").alias("frame_hex"),
    )


_RESIZE_SQL = """
SELECT doc_id,
       hex(encode(substr(text, 1, 32)))
       || repeat('00', GREATEST(32 - octet_length(encode(text)), 0)) AS payload_hex,
       32 AS n_bytes
FROM documents
"""


@register("mm_resize_stub", oracle=_RESIZE_SQL, tags=("multimodal", "udf"))
def mm_resize_stub(spark, sf_dir):
    """Resize plumbing: every payload normalized to 32 bytes
    (crop/zero-pad — the thumbnailer's batch shape) via mapInPandas;
    result bytes oracle-compared as hex."""
    from etlalchemy_spark.operators.multimodal import resize_stub

    docs = t(spark, sf_dir, "documents")
    wrapped = attach_payload(docs, "doc_id", "text")
    resized = resize_stub(wrapped, "doc_id", target_bytes=32)
    return resized.select(
        "doc_id",
        F.hex("payload").alias("payload_hex"),
        F.col("n_bytes").cast("int").alias("n_bytes"),
    )


_WAV_SQL = """
WITH params AS (
  SELECT doc_id,
         50 + doc_id % 97 AS n_samples,
         CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 11025 ELSE 16000 END AS sample_rate
  FROM documents
),
amps AS (
  SELECT doc_id, n_samples, sample_rate,
         list_transform(generate_series(0, n_samples - 1),
                        i -> abs((doc_id * 31 + i * 17) % 65536 - 32768)) AS a
  FROM params
)
SELECT doc_id,
       CAST(sample_rate AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(n_samples * 1000000 // sample_rate AS BIGINT) AS duration_us,
       CAST(list_aggregate(a, 'sum') AS BIGINT) AS sum_abs_amplitude,
       CAST(list_aggregate(a, 'max') AS BIGINT) AS peak_amplitude
FROM amps
"""


@register("mm_decode_wav_stats", oracle=_WAV_SQL, tags=("multimodal", "udf"))
def mm_decode_wav_stats(spark, sf_dir):
    """REAL audio decode, stdlib-only: every document gets a synthetic
    mono 16-bit PCM WAV payload (samples are a deterministic function
    of doc_id, so DuckDB can recompute the expected stats without
    parsing bytes), encoded and then DECODED back through the Arrow
    mapInPandas path — RIFF chunk walk, fmt parse, int16 LE sample
    extraction (operators/multimodal.py decode_wav). The encode→decode
    round trip is the proof the decoder reads real WAV bytes; only
    compressed codecs remain NotImplementedError. Both stages are
    partition-local (no shuffle): at 100 TB this is scan-speed modulo
    Python CPU, the same shape a real resample/feature job has."""
    from etlalchemy_spark.operators.multimodal import encode_wav_pcm16, wav_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(50) + F.col("doc_id") % 97).cast("int").alias("n_samples"),
        F.when(F.col("doc_id") % 3 == 0, 8000)
        .when(F.col("doc_id") % 3 == 1, 11025)
        .otherwise(16000)
        .alias("sample_rate"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n, rate in zip(pdf["doc_id"], pdf["n_samples"], pdf["sample_rate"]):
                i = np.arange(int(n), dtype=np.int64)
                samples = (int(doc_id) * 31 + i * 17) % 65536 - 32768
                payloads.append(encode_wav_pcm16(samples, int(rate)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    wavs = params.mapInPandas(synth, "doc_id long, payload binary")
    return wav_stats(wavs, "doc_id")


_IMG_SQL = """
WITH params AS (
  SELECT doc_id,
         1 + doc_id % 7 AS width,
         1 + doc_id % 5 AS height,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format
  FROM documents
),
px AS (
  SELECT doc_id, format, width, height,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id + 3 * (i % width) + 5 * (i // width)) % 256) AS r,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id * 2 + (i % width)) % 256) AS g,
         list_transform(generate_series(0, width * height - 1),
                        i -> ((i % width) * (i // width) + doc_id) % 256) AS b
  FROM params
)
SELECT doc_id, format,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(width * height AS BIGINT) AS n_pixels,
       CAST(list_aggregate(r, 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(g, 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(b, 'sum') AS BIGINT) AS sum_b
FROM px
"""


@register("mm_decode_image_stats", oracle=_IMG_SQL, tags=("multimodal", "udf"))
def mm_decode_image_stats(spark, sf_dir):
    """REAL image decode, stdlib-only, mixed formats: even doc_ids
    become 24-bit BMP payloads (bottom-up BGR rows, 4-byte padding),
    odd ones binary PPM (P6) — pixels a deterministic function of
    doc_id so DuckDB recomputes expected sums formula-side. The
    payloads are then DECODED back via the magic-byte router
    (operators/multimodal.py decode_image → decode_bmp/decode_ppm):
    header parse, stride/orientation/channel-order recovery, per-
    channel sums. Compressed codecs (PNG/JPEG) remain the documented
    NotImplementedError boundary."""
    from etlalchemy_spark.operators.multimodal import (
        encode_bmp_24,
        encode_ppm_p6,
        image_stats,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(1) + F.col("doc_id") % 7).cast("int").alias("width"),
        (F.lit(1) + F.col("doc_id") % 5).cast("int").alias("height"),
        F.when(F.col("doc_id") % 2 == 0, "bmp").otherwise("ppm").alias("format"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h, fmt in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["format"]
            ):
                doc_id, w, h = int(doc_id), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = (doc_id + 3 * x + 5 * y) % 256
                g = (doc_id * 2 + x) % 256
                b = (x * y + doc_id) % 256
                px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                payloads.append(encode_bmp_24(px) if fmt == "bmp" else encode_ppm_p6(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_stats(imgs, "doc_id")


_BINFILE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


@register("mm_binary_file_source", oracle=_BINFILE_SQL, tags=("multimodal", "sources"))
def mm_binary_file_source(spark, sf_dir):
    """The real multimodal ingestion path: a directory of opaque blob
    files read with ``spark.read.format("binaryFile")`` (distributed
    binary scan; driver only lists paths) → per-file metadata + content
    hash. Setup materializes one .bin per document once (streamed via
    toLocalIterator, marker-gated); the measured operator is the scan.
    Oracle recomputes the same hashes from the source table — proving
    byte fidelity through the blob round-trip."""
    import os

    from etlalchemy_spark.queries._util import (
        cached_fixture,
        commit_fixture,
        fixture_tag,
    )

    docs = t(spark, sf_dir, "documents")
    # content-tagged (r10): the old bare _done marker survived a
    # testdata regen and would have served stale blobs
    tag = fixture_tag(sf_dir, extra="mm_blob_v1")
    tmp, meta = cached_fixture("mm_blob", sf_dir, tag)
    if meta is None:
        for stale in os.listdir(tmp):  # doc_ids may differ post-regen
            if stale.endswith(".bin"):
                os.unlink(os.path.join(tmp, stale))
        for row in docs.select("doc_id", "text").toLocalIterator():
            with open(os.path.join(tmp, f"doc_{row['doc_id']}.bin"), "wb") as f:
                f.write(row["text"].encode("utf-8"))
        commit_fixture(tmp, tag)
    bf = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(tmp)
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


_ROUTER_SQL = """
WITH blobs AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN unhex('89504E47') || encode(text)
           WHEN 1 THEN unhex('FFD8FFE0') || encode(text)
           WHEN 2 THEN unhex('52494646') || encode(text)
           ELSE encode(text)
         END AS payload
  FROM documents
),
routed AS (
  SELECT doc_id, payload,
         CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'image/png'
              WHEN substring(hex(payload), 1, 6) = 'FFD8FF' THEN 'image/jpeg'
              WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'audio/riff'
              ELSE 'application/octet-stream' END AS modality
  FROM blobs
)
SELECT modality, COUNT(*) AS n_blobs,
       SUM(octet_length(payload)) AS total_bytes,
       MIN(doc_id) AS first_doc
FROM routed GROUP BY modality
"""


@register("mm_magic_byte_router", oracle=_ROUTER_SQL, tags=("multimodal",))
def mm_magic_byte_router(spark, sf_dir):
    """Content-sniffing router for mixed-modality blob columns: the
    first payload bytes are compared against magic numbers (PNG / JPEG
    / RIFF) as BINARY slices — no hex-string detour, no UDF — and each
    blob is routed to its modality partition. This is the dispatch
    stage in front of the per-modality decode UDFs: a pure narrow
    expression, so routing a 100 TB mixed lake is scan-speed and the
    downstream partitionBy(modality) write gives each decoder a clean
    input. Payload magic is synthesized deterministically (doc_id % 4)
    since the fixture has no real media."""
    d = t(spark, sf_dir, "documents")
    body = F.encode(F.col("text"), "UTF-8")
    payload = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.unhex(F.lit("89504E47")), body))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.unhex(F.lit("FFD8FFE0")), body))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.unhex(F.lit("52494646")), body))
        .otherwise(body)
    )
    head = lambda n: F.expr(f"substring(payload, 1, {n})")  # noqa: E731
    modality = (
        F.when(head(4) == F.unhex(F.lit("89504E47")), "image/png")
        .when(head(3) == F.unhex(F.lit("FFD8FF")), "image/jpeg")
        .when(head(4) == F.unhex(F.lit("52494646")), "audio/riff")
        .otherwise("application/octet-stream")
    )
    return (
        d.select("doc_id", payload.alias("payload"))
        .select("doc_id", "payload", modality.alias("modality"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_PNG_SQL = """
WITH params AS (
  SELECT doc_id,
         1 + doc_id % 6 AS width,
         1 + doc_id % 4 AS height,
         CASE doc_id % 3 WHEN 0 THEN 'gray' WHEN 1 THEN 'rgb' ELSE 'rgba' END AS kind
  FROM documents
),
px AS (
  SELECT doc_id, kind, width, height,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id + 3 * (i % width) + 5 * (i // width)) % 256) AS r,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id * 2 + (i % width)) % 256) AS g,
         list_transform(generate_series(0, width * height - 1),
                        i -> ((i % width) * (i // width) + doc_id) % 256) AS b
  FROM params
)
SELECT doc_id, 'png' AS format,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(width * height AS BIGINT) AS n_pixels,
       CAST(list_aggregate(r, 'sum') AS BIGINT) AS sum_r,
       CAST(CASE WHEN kind = 'gray' THEN list_aggregate(r, 'sum')
                 ELSE list_aggregate(g, 'sum') END AS BIGINT) AS sum_g,
       CAST(CASE WHEN kind = 'gray' THEN list_aggregate(r, 'sum')
                 ELSE list_aggregate(b, 'sum') END AS BIGINT) AS sum_b
FROM px
"""


_PNG_MATRIX_SQL = """
WITH params AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INT) AS mode,
         2 + doc_id % 7 AS w,
         2 + doc_id % 5 AS h
  FROM documents
),
px AS (
  SELECT doc_id, mode, w, h,
         list_transform(generate_series(0, w * h - 1),
                        i -> [doc_id + 3 * (i % w) + 5 * (i // w),
                              doc_id * 2 + (i % w),
                              (i % w) * (i // w) + doc_id]) AS base
  FROM params
),
sums AS (
  SELECT doc_id, mode, w, h,
         CASE mode
           WHEN 0 THEN list_aggregate(list_transform(base,
                v -> (31 * (v[1] % 16) + 7 + doc_id) % 256), 'sum')
           WHEN 1 THEN list_aggregate(list_transform(base,
                v -> (doc_id * 97 + v[1] * 13) % 65536), 'sum')
           WHEN 2 THEN list_aggregate(list_transform(base,
                v -> (v[1] * 257) % 65536), 'sum')
           ELSE list_aggregate(list_transform(base, v -> v[1] % 256), 'sum')
         END AS sum_r,
         CASE mode
           WHEN 0 THEN list_aggregate(list_transform(base,
                v -> (63 * (v[1] % 16) + 11 + doc_id) % 256), 'sum')
           WHEN 1 THEN list_aggregate(list_transform(base,
                v -> (doc_id * 97 + v[1] * 13) % 65536), 'sum')
           WHEN 2 THEN list_aggregate(list_transform(base,
                v -> (v[2] * 263) % 65536), 'sum')
           ELSE list_aggregate(list_transform(base, v -> v[2] % 256), 'sum')
         END AS sum_g,
         CASE mode
           WHEN 0 THEN list_aggregate(list_transform(base,
                v -> (17 * (v[1] % 16) + 23 + doc_id) % 256), 'sum')
           WHEN 1 THEN list_aggregate(list_transform(base,
                v -> (doc_id * 97 + v[1] * 13) % 65536), 'sum')
           WHEN 2 THEN list_aggregate(list_transform(base,
                v -> (v[3] * 269) % 65536), 'sum')
           ELSE list_aggregate(list_transform(base, v -> v[3] % 256), 'sum')
         END AS sum_b
  FROM px
)
SELECT doc_id, 'png' AS format,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r,
       CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b
FROM sums
"""


@register("mm_decode_png_matrix", oracle=_PNG_MATRIX_SQL, tags=("multimodal", "udf"))
def mm_decode_png_matrix(spark, sf_dir):
    """The PNG baseline matrix r8's decoder refused (r10): payloads
    cycle indexed-4-bit-with-PLTE / 16-bit grayscale / 16-bit RGB
    (big-endian samples) / Adam7-interlaced RGB by doc_id, every pixel
    a deterministic doc_id formula so DuckDB recomputes the channel
    sums (palette-mapped for indexed, raw 16-bit values for deep
    rasters) formula-side. Exercises sub-byte MSB-first unpacking,
    sample-width filter distances, PLTE mapping, and the seven-pass
    interlace scatter — all through the magic-byte router, same
    partition-local Arrow mapInPandas shape as every decoder here."""
    from etlalchemy_spark.operators.multimodal import encode_png, image_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 4).cast("int").alias("mode"),
        (F.lit(2) + F.col("doc_id") % 7).cast("int").alias("w"),
        (F.lit(2) + F.col("doc_id") % 5).cast("int").alias("h"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc, mode, w, h in zip(pdf["doc_id"], pdf["mode"], pdf["w"], pdf["h"]):
                doc, mode, w, h = int(doc), int(mode), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                base = (doc + 3 * x + 5 * y).reshape(h, w)
                if mode == 0:  # indexed 4-bit + doc-derived palette
                    v = np.arange(16, dtype=np.int64)
                    pal = np.stack(
                        [(31 * v + 7 + doc) % 256, (63 * v + 11 + doc) % 256,
                         (17 * v + 23 + doc) % 256], axis=1,
                    ).astype(np.uint8)
                    payloads.append(
                        encode_png(base % 16, color_type=3, bit_depth=4, palette=pal)
                    )
                elif mode == 1:  # 16-bit grayscale
                    g = (doc * 97 + base * 13) % 65536
                    payloads.append(encode_png(g, color_type=0, bit_depth=16))
                elif mode == 2:  # 16-bit RGB
                    r = (base * 257) % 65536
                    g = (((doc * 2 + x).reshape(h, w)) * 263) % 65536
                    b = (((x * y + doc).reshape(h, w)) * 269) % 65536
                    payloads.append(
                        encode_png(np.stack([r, g, b], axis=2),
                                   color_type=2, bit_depth=16)
                    )
                else:  # Adam7-interlaced 8-bit RGB
                    r = base % 256
                    g = (doc * 2 + x).reshape(h, w) % 256
                    b = (x * y + doc).reshape(h, w) % 256
                    payloads.append(
                        encode_png(np.stack([r, g, b], axis=2).astype(np.uint8),
                                   color_type=2, interlace=True)
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_stats(imgs, "doc_id")


@register("mm_decode_png_stats", oracle=_PNG_SQL, tags=("multimodal", "udf"))
def mm_decode_png_stats(spark, sf_dir):
    """REAL PNG decode, stdlib-only (r8 — PNG left the compressed-codec
    boundary: its compression is plain zlib): payloads cycle grayscale
    / RGB / RGBA by doc_id, pixels a deterministic function of doc_id
    so DuckDB recomputes expected channel sums formula-side, then the
    bytes round-trip through the magic-byte router (decode_image →
    decode_png: chunk walk, zlib inflate, five-filter scanline
    unfiltering). Grayscale reports its sum as r=g=b; RGBA's alpha is
    ignored in sums — both conventions asserted by the oracle. Same
    Arrow mapInPandas shape as the BMP/PPM query: partition-local,
    payload bytes never shuffle."""
    from etlalchemy_spark.operators.multimodal import encode_png, image_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(1) + F.col("doc_id") % 6).cast("int").alias("width"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("height"),
        (F.col("doc_id") % 3).cast("int").alias("kind"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h, kind in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["kind"]
            ):
                doc_id, w, h, kind = int(doc_id), int(w), int(h), int(kind)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = (doc_id + 3 * x + 5 * y) % 256
                g = (doc_id * 2 + x) % 256
                b = (x * y + doc_id) % 256
                a = (x + 2 * y + doc_id) % 256  # alpha: present, ignored in sums
                if kind == 0:
                    px = r.reshape(h, w).astype(np.uint8)
                    payloads.append(encode_png(px, color_type=0))
                elif kind == 1:
                    px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                    payloads.append(encode_png(px, color_type=2))
                else:
                    px = np.stack([r, g, b, a], axis=1).reshape(h, w, 4).astype(np.uint8)
                    payloads.append(encode_png(px, color_type=6))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_stats(imgs, "doc_id")


_JPEG_DRI_SQL = """
WITH params AS (
  SELECT doc_id,
         CAST(doc_id % 2 AS INT) AS mode,          -- 0: 4:2:2, 1: 4:2:0
         16 * (1 + CAST(doc_id % 3 AS INT)) AS w,
         16 AS h
  FROM documents
),
lbx AS (
  SELECT doc_id, mode, w, h, UNNEST(generate_series(0, w // 8 - 1)) AS bx
  FROM params
),
lblk AS (
  SELECT doc_id, mode, w, h, bx, UNNEST(generate_series(0, h // 8 - 1)) AS by
  FROM lbx
),
lvals AS (
  SELECT doc_id, mode, w, h,
         (7 * doc_id + 11 * bx + 13 * by) % 256 AS l,
         (5 * doc_id + 3 * (bx // 2) + 7 * (CASE WHEN mode = 0 THEN by ELSE by // 2 END)) % 256 AS cbv,
         (3 * doc_id + 5 * (bx // 2) + 1 * (CASE WHEN mode = 0 THEN by ELSE by // 2 END)) % 256 AS crv
  FROM lblk
),
rgb AS (
  SELECT doc_id,
         CAST(SUM(l) AS BIGINT) AS suml,
         CAST(SUM(LEAST(GREATEST(FLOOR(l + 1.402 * (crv - 128) + 0.5), 0), 255)) AS BIGINT) AS sumr,
         CAST(SUM(LEAST(GREATEST(FLOOR(l - 0.344136 * (cbv - 128)
                                         - 0.714136 * (crv - 128) + 0.5), 0), 255)) AS BIGINT) AS sumg,
         CAST(SUM(LEAST(GREATEST(FLOOR(l + 1.772 * (cbv - 128) + 0.5), 0), 255)) AS BIGINT) AS sumb
  FROM lvals GROUP BY doc_id
),
cbx AS (
  SELECT doc_id, mode, w, h, UNNEST(generate_series(0, w // 16 - 1)) AS bx
  FROM params
),
cblk AS (
  SELECT doc_id, mode, bx,
         UNNEST(generate_series(0, (CASE WHEN mode = 0 THEN h // 8 ELSE h // 16 END) - 1)) AS by
  FROM cbx
),
csum AS (
  SELECT doc_id,
         CAST(SUM((5 * doc_id + 3 * bx + 7 * by) % 256) AS BIGINT) AS scb,
         CAST(SUM((3 * doc_id + 5 * bx + 1 * by) % 256) AS BIGINT) AS scr
  FROM cblk GROUP BY doc_id
)
SELECT p.doc_id,
       CASE p.mode WHEN 0 THEN '422' ELSE '420' END AS subsampling,
       CAST(1 + p.doc_id % 3 AS INT) AS restart_interval,
       CAST(p.w AS INT) AS width, CAST(p.h AS INT) AS height,
       CAST(p.w * p.h AS BIGINT) AS n_pixels,
       CAST(64 * r.suml AS BIGINT) AS sum_y,
       CAST(64 * c.scb AS BIGINT) AS sum_cb,
       CAST(64 * c.scr AS BIGINT) AS sum_cr,
       CAST(64 * r.sumr AS BIGINT) AS sum_r,
       CAST(64 * r.sumg AS BIGINT) AS sum_g,
       CAST(64 * r.sumb AS BIGINT) AS sum_b
FROM params p
JOIN rgb r USING (doc_id)
JOIN csum c ON p.doc_id = c.doc_id
"""


@register("mm_decode_jpeg_dri", oracle=_JPEG_DRI_SQL, tags=("multimodal", "udf"))
def mm_decode_jpeg_dri(spark, sf_dir):
    """JPEG restart intervals + 4:2:2 (r10, VERDICT r9 #4 — the two
    most common still-refused baseline features; DRI appears in
    virtually every camera JPEG): payloads cycle 4:2:2 / 4:2:0 with a
    doc-derived DRI, so every decode crosses RST0..7 markers
    (byte-align, modulo-sequence check, DC predictor reset) before
    producing plane sums. Block-constant fixtures at quality 100 keep
    the decode DC-exact, so DuckDB recomputes the sums formula-side —
    the restart machinery must be value-invisible, which is exactly
    what the shared oracle asserts. Golden DRI/422 byte round-trips
    live in tests/test_jpeg.py; same partition-local Arrow
    mapInPandas shape as every decoder in this file."""
    from etlalchemy_spark.operators.jpeg import decode_jpeg, encode_jpeg

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 2).cast("int").alias("mode"),
        (F.lit(16) * (1 + F.col("doc_id") % 3)).cast("int").alias("w"),
        F.lit(16).cast("int").alias("h"),
        (F.lit(1) + F.col("doc_id") % 3).cast("int").alias("ri"),
    )

    def synth_and_decode(batches):
        import numpy as np
        import pandas as pd

        ones = np.ones((8, 8), dtype=np.int64)

        def plane(doc, nbx, nby, ka, kb, kc):
            bx = np.arange(nbx, dtype=np.int64)
            by = np.arange(nby, dtype=np.int64)
            blocks = (ka * doc + kb * bx[None, :] + kc * by[:, None]) % 256
            return np.kron(blocks, ones).astype(np.uint8)

        for pdf in batches:
            rows = []
            for doc, mode, w, h, ri in zip(
                pdf["doc_id"], pdf["mode"], pdf["w"], pdf["h"], pdf["ri"]
            ):
                doc, mode, w, h, ri = int(doc), int(mode), int(w), int(h), int(ri)
                y = plane(doc, w // 8, h // 8, 7, 11, 13)
                if mode == 0:  # 4:2:2 — chroma half-width, full height
                    cb = plane(doc, w // 16, h // 8, 5, 3, 7)
                    cr = plane(doc, w // 16, h // 8, 3, 5, 1)
                    sub = "422"
                else:  # 4:2:0
                    cb = plane(doc, w // 16, h // 16, 5, 3, 7)
                    cr = plane(doc, w // 16, h // 16, 3, 5, 1)
                    sub = "420"
                d = decode_jpeg(
                    encode_jpeg(y, cb, cr, quality=100, subsampling=sub,
                                restart_interval=ri)
                )
                rows.append(
                    (
                        doc, d["subsampling"], ri, d["width"], d["height"],
                        d["n_pixels"], d["sum_y"], d["sum_cb"], d["sum_cr"],
                        d["sum_r"], d["sum_g"], d["sum_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "subsampling", "restart_interval", "width", "height",
                    "n_pixels", "sum_y", "sum_cb", "sum_cr", "sum_r", "sum_g",
                    "sum_b",
                ],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, subsampling string, restart_interval int, width int, "
        "height int, n_pixels bigint, sum_y bigint, sum_cb bigint, sum_cr bigint, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )


# IMA ADPCM constant tables as DuckDB list literals (ITU/IMA public
# spec, the same _IMA_STEP_TABLE / _IMA_INDEX_TABLE the operators use)
_IMA_ST_SQL = (
    "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,"
    "41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,"
    "190,209,230,253,279,307,337,371,408,449,494,544,598,658,"
    "724,796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,"
    "2272,2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,"
    "6484,7132,7845,8630,9493,10442,11487,12635,13899,15289,"
    "16818,18500,20350,22385,24623,27086,29794,32767]"
)
_IMA_IDX_SQL = "[-1,-1,-1,-1,2,4,6,8]"

# WITH RECURSIVE twin of encode_wav_ima_adpcm → decode_wav: because the
# encoder's running (predictor, step-index) state IS the decoder's
# reconstruction, one recursive pass over (doc, sample-index) replays
# quantize + _ima_step exactly — block starts (i % 505 = 0, spb=505 at
# block_align=256) reset the predictor to the raw sample and carry the
# index, exactly like the 4-byte block header. numpy-vs-DuckDB sin
# truncation agreement is verified exhaustively over the full (p1, p2,
# i) parameter space in tests/test_multimodal.py.
_ADPCM_SQL = f"""
WITH RECURSIVE
params AS (
  SELECT doc_id,
         CAST(500 + (doc_id % 17) * 100 AS BIGINT) AS n,
         CAST(20 + doc_id % 13 AS DOUBLE) AS p1,
         CAST(5 + doc_id % 7 AS DOUBLE) AS p2
  FROM documents
),
dec AS (
  SELECT doc_id, n, p1, p2, CAST(0 AS BIGINT) AS i,
         CAST(TRUNC(2500*sin(0.0/p1) + 400*sin(0.0/p2)) AS BIGINT) AS pred,
         0 AS idx
  FROM params
  UNION ALL
  SELECT doc_id, n, p1, p2, i,
         CASE WHEN i % 505 = 0 THEN raw
              ELSE GREATEST(-32768, LEAST(32767,
                   pred + CASE WHEN sgn THEN -delta ELSE delta END)) END,
         CASE WHEN i % 505 = 0 THEN idx
              ELSE GREATEST(0, LEAST(88, idx + ({_IMA_IDX_SQL})[1 + b4*4 + b2*2 + b1])) END
  FROM (
    SELECT *,
           (step >> 3) + b4 * step + b2 * (step >> 1) + b1 * (step >> 2) AS delta
    FROM (
      SELECT *,
             CASE WHEN a - b4*step - b2*(step >> 1) >= step >> 2 THEN 1 ELSE 0 END AS b1
      FROM (
        SELECT *, CASE WHEN a - b4*step >= step >> 1 THEN 1 ELSE 0 END AS b2
        FROM (
          SELECT *, CASE WHEN a >= step THEN 1 ELSE 0 END AS b4
          FROM (
            SELECT d.doc_id, d.n, d.p1, d.p2, d.i + 1 AS i, d.pred, d.idx,
                   CAST(TRUNC(2500*sin(CAST(d.i+1 AS DOUBLE)/d.p1)
                            + 400*sin(CAST(d.i+1 AS DOUBLE)/d.p2)) AS BIGINT) AS raw,
                   ({_IMA_ST_SQL})[d.idx + 1] AS step
            FROM dec d
            WHERE d.i + 1 < d.n
          ), LATERAL (SELECT raw - pred < 0 AS sgn, ABS(raw - pred) AS a)
        )
      )
    )
  )
)
SELECT d.doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(MAX(d.n) AS BIGINT) AS n_samples,
       CAST(MAX(d.n) * 125 AS BIGINT) AS duration_us,
       CAST(SUM(ABS(d.pred)) AS BIGINT) AS sum_abs_amplitude,
       CAST(MAX(ABS(d.pred)) AS BIGINT) AS peak_amplitude
FROM dec d
GROUP BY d.doc_id
"""


@register("mm_decode_adpcm_stats", oracle=_ADPCM_SQL, tags=("multimodal", "udf"))
def mm_decode_adpcm_stats(spark, sf_dir):
    """REAL lossy-audio decode: per-doc deterministic int16 waveforms
    are IMA-ADPCM-compressed (WAV format 17 — 4:1 vs PCM-16, pure
    integer table arithmetic, stdlib-only since r8) and decoded back
    through the same wav_stats mapInPandas pipeline as the PCM query.
    Oracle-exact since r10 (VERDICT r9 #3): the encoder's running
    (predictor, index) state is the decoder's output, so a DuckDB
    WITH RECURSIVE over (doc, sample) replays quantize + _ima_step
    bit-for-bit — no sample array is ever materialized Spark-side.
    tests/test_multimodal.py still pins the codec itself (round-trip
    error bound, golden block, refusals)."""
    from etlalchemy_spark.operators.multimodal import encode_wav_ima_adpcm, wav_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(500) + (F.col("doc_id") % 17) * 100).cast("int").alias("n_samples"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n in zip(pdf["doc_id"], pdf["n_samples"]):
                doc_id, n = int(doc_id), int(n)
                i = np.arange(n, dtype=np.float64)
                wave = (
                    2500 * np.sin(i / (20 + doc_id % 13))
                    + 400 * np.sin(i / (5 + doc_id % 7))
                ).astype(np.int16)
                payloads.append(encode_wav_ima_adpcm(wave, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    wavs = params.mapInPandas(synth, "doc_id long, payload binary")
    return wav_stats(wavs, "doc_id")


_GIF_SQL = """
WITH params AS (
  SELECT doc_id,
         2 + doc_id % 9 AS width,
         2 + doc_id % 6 AS height
  FROM documents
),
px AS (
  SELECT doc_id, width, height,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id + 3 * (i % width) + 5 * (i // width)) % 8) AS idx
  FROM params
)
SELECT doc_id, 'gif' AS format,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(width * height AS BIGINT) AS n_pixels,
       CAST(list_aggregate(list_transform(idx, v -> (31 * v + 7) % 256), 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(list_transform(idx, v -> (63 * v + 11) % 256), 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(list_transform(idx, v -> (17 * v + 23) % 256), 'sum') AS BIGINT) AS sum_b
FROM px
"""


@register("mm_decode_gif_stats", oracle=_GIF_SQL, tags=("multimodal", "udf"))
def mm_decode_gif_stats(spark, sf_dir):
    """REAL GIF decode, stdlib-only (r8): per-doc palette-indexed
    frames (8-color palette, indices a deterministic function of
    doc_id) are LZW-compressed by the fixture writer and decoded back
    through the magic-byte router — header, color table, extension
    skipping, full dictionary-growing LZW inflate, palette mapping.
    DuckDB recomputes the expected palette-mapped channel sums
    formula-side, so the whole compress→decompress→map path is
    oracle-exact. Same partition-local Arrow mapInPandas shape as the
    other decoders."""
    from etlalchemy_spark.operators.multimodal import encode_gif, image_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(2) + F.col("doc_id") % 9).cast("int").alias("width"),
        (F.lit(2) + F.col("doc_id") % 6).cast("int").alias("height"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        pal = np.stack(
            [
                (31 * np.arange(8) + 7) % 256,
                (63 * np.arange(8) + 11) % 256,
                (17 * np.arange(8) + 23) % 256,
            ],
            axis=1,
        ).astype(np.uint8)
        for pdf in batches:
            payloads = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                idx = ((doc_id + 3 * (i % w) + 5 * (i // w)) % 8).reshape(h, w)
                # odd docs store INTERLACED (r10): the four-pass row
                # reorder must be value-invisible to the channel sums
                # the shared oracle recomputes — deinterlacing is
                # row-placement-pinned in tests/test_multimodal.py
                payloads.append(
                    encode_gif(idx.astype(np.uint8), pal, interlace=bool(doc_id % 2))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_stats(imgs, "doc_id")


_AVI_SQL = """
WITH params AS (
  SELECT doc_id,
         2 + doc_id % 5 AS width,
         2 + doc_id % 3 AS height,
         1 + doc_id % 4 AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, width, height, UNNEST(generate_series(0, n_frames - 1)) AS f
  FROM params
),
px AS (
  SELECT doc_id, f, width, height,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id + 3 * (i % width) + 5 * (i // width) + 11 * f) % 256) AS r,
         list_transform(generate_series(0, width * height - 1),
                        i -> (doc_id * 2 + (i % width) + 7 * f) % 256) AS g,
         list_transform(generate_series(0, width * height - 1),
                        i -> ((i % width) * (i // width) + doc_id + 13 * f) % 256) AS b
  FROM frames WHERE f % 2 = 0
)
SELECT doc_id,
       CAST(f AS INT) AS frame_index,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(100000 AS BIGINT) AS us_per_frame,
       CAST(list_aggregate(r, 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(g, 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(b, 'sum') AS BIGINT) AS sum_b
FROM px
"""


_AVI_MJPEG_SQL = """
WITH params AS (
  SELECT doc_id,
         16 * (1 + doc_id % 2) AS w,
         16 AS h,
         1 + doc_id % 4 AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, w, h, UNNEST(generate_series(0, n_frames - 1)) AS f
  FROM params
),
blk AS (
  SELECT doc_id, w, h, f,
         SUM((7 * doc_id + 11 * bx + 13 * by + 17 * f) % 256) AS s
  FROM frames,
       UNNEST(generate_series(0, w // 8 - 1)) AS t1(bx),
       UNNEST(generate_series(0, h // 8 - 1)) AS t2(by)
  WHERE f % 2 = 0
  GROUP BY doc_id, w, h, f
)
SELECT doc_id,
       CAST(f AS INT) AS frame_index,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(100000 AS BIGINT) AS us_per_frame,
       CAST(64 * s AS BIGINT) AS sum_r,
       CAST(64 * s AS BIGINT) AS sum_g,
       CAST(64 * s AS BIGINT) AS sum_b
FROM blk
"""


@register("mm_decode_avi_mjpeg", oracle=_AVI_MJPEG_SQL, tags=("multimodal", "udf"))
def mm_decode_avi_mjpeg(spark, sf_dir):
    """MJPEG AVI decode (r10 — compressed video leaves the refusal
    list via the in-house T.81 codec): per-doc AVIs whose '00dc'
    frames are REAL JPEG payloads (strf biCompression 'MJPG', the
    webcam/DVR format), sampled every second frame through the same
    video_frame_stats pipeline as the uncompressed query — each
    sampled frame runs the full Huffman+IDCT decode, skipped frames
    are never entropy-decoded. Block-constant grayscale frames at
    quality 100 keep the decode DC-exact, so DuckDB recomputes the
    per-sampled-frame sums formula-side: container walk + JPEG decode
    + sampling, oracle-exact end to end. Non-MJPG fourccs still
    refuse loudly by name."""
    from etlalchemy_spark.operators.jpeg import encode_jpeg
    from etlalchemy_spark.operators.multimodal import (
        encode_avi_mjpeg,
        video_frame_stats,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(16) * (1 + F.col("doc_id") % 2)).cast("int").alias("w"),
        F.lit(16).cast("int").alias("h"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        ones = np.ones((8, 8), dtype=np.int64)
        for pdf in batches:
            payloads = []
            for doc, w, h, nf in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["n_frames"]
            ):
                doc, w, h, nf = int(doc), int(w), int(h), int(nf)
                bx = np.arange(w // 8, dtype=np.int64)
                by = np.arange(h // 8, dtype=np.int64)
                jpegs = []
                for f in range(nf):
                    blocks = (7 * doc + 11 * bx[None, :] + 13 * by[:, None]
                              + 17 * f) % 256
                    y = np.kron(blocks, ones).astype(np.uint8)
                    jpegs.append(encode_jpeg(y, quality=100))
                payloads.append(encode_avi_mjpeg(jpegs, w, h, fps=10))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    vids = params.mapInPandas(synth, "doc_id long, payload binary")
    return video_frame_stats(vids, "doc_id", every_n=2)


@register("mm_decode_avi_frames", oracle=_AVI_SQL, tags=("multimodal", "udf"))
def mm_decode_avi_frames(spark, sf_dir):
    """REAL video frame sampling, stdlib-only (r8 — the video modality
    leaves stub-land): per-doc multi-frame uncompressed AVIs (RIFF
    container, avih header, bottom-up BGR DIB frames; frame pixels a
    deterministic function of (doc_id, frame)) are decoded back
    through video_frame_stats, sampling EVERY SECOND frame — skipped
    frames are never rasterized, the cost shape real frame extraction
    needs at 100 TB of video. DuckDB recomputes per-sampled-frame
    channel sums formula-side, so container walk + raster decode +
    sampling are all oracle-exact. Compressed streams ('00dc') remain
    the documented codec boundary."""
    from etlalchemy_spark.operators.multimodal import encode_avi_rgb, video_frame_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(2) + F.col("doc_id") % 5).cast("int").alias("width"),
        (F.lit(2) + F.col("doc_id") % 3).cast("int").alias("height"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h, nf in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["n_frames"]
            ):
                doc_id, w, h, nf = int(doc_id), int(w), int(h), int(nf)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                frames = []
                for f in range(nf):
                    r = (doc_id + 3 * x + 5 * y + 11 * f) % 256
                    g = (doc_id * 2 + x + 7 * f) % 256
                    b = (x * y + doc_id + 13 * f) % 256
                    frames.append(
                        np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                    )
                payloads.append(encode_avi_rgb(np.stack(frames), fps=10))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    vids = params.mapInPandas(synth, "doc_id long, payload binary")
    return video_frame_stats(vids, "doc_id", every_n=2)


_RESIZE_NEAREST_SQL = """
WITH params AS (
  SELECT doc_id,
         3 + doc_id % 7 AS w,
         3 + doc_id % 5 AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_transform(generate_series(0, 11),
           i -> (doc_id + 3 * (((i % 4) * w) // 4) + 5 * (((i // 4) * h) // 3)) % 256) AS r,
         list_transform(generate_series(0, 11),
           i -> (doc_id * 2 + (((i % 4) * w) // 4)) % 256) AS g,
         list_transform(generate_series(0, 11),
           i -> ((((i % 4) * w) // 4) * (((i // 4) * h) // 3) + doc_id) % 256) AS b
  FROM params
)
SELECT doc_id, 'bmp' AS format,
       CAST(w AS INT) AS src_width,
       CAST(h AS INT) AS src_height,
       CAST(4 AS INT) AS width,
       CAST(3 AS INT) AS height,
       CAST(list_aggregate(r, 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(g, 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(b, 'sum') AS BIGINT) AS sum_b
FROM px
"""


@register("mm_resize_nearest_stats", oracle=_RESIZE_NEAREST_SQL, tags=("multimodal", "udf"))
def mm_resize_nearest_stats(spark, sf_dir):
    """REAL pixel resampling (r8 — resize leaves stub-land): per-doc
    BMP payloads decode through the shared DIB reader and resample to
    a fixed 4x3 thumbnail with nearest-neighbor INTEGER index
    arithmetic (src_x = (x*w)//tw) — the mapping is engine-exact, so
    DuckDB recomputes the resized channel sums formula-side and the
    whole decode→resize→extract path is oracle-gated. Thumbnail
    normalization is the first step of every image-training pipeline;
    the op emits source dimensions beside the resized sums so audits
    bucket by origin size without a second decode."""
    from etlalchemy_spark.operators.multimodal import encode_bmp_24, image_resize_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(3) + F.col("doc_id") % 7).cast("int").alias("width"),
        (F.lit(3) + F.col("doc_id") % 5).cast("int").alias("height"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = (doc_id + 3 * x + 5 * y) % 256
                g = (doc_id * 2 + x) % 256
                b = (x * y + doc_id) % 256
                px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                payloads.append(encode_bmp_24(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_resize_stats(imgs, "doc_id", target_w=4, target_h=3)


_MOTION_SQL = """
WITH params AS (
  SELECT doc_id,
         2 + doc_id % 5 AS w,
         2 + doc_id % 3 AS h,
         1 + doc_id % 4 AS n_frames
  FROM documents
),
pairs AS (
  SELECT doc_id, w, h, UNNEST(generate_series(0, n_frames - 2)) AS f
  FROM params WHERE n_frames >= 2
),
d AS (
  SELECT doc_id, f, w, h,
         list_transform(generate_series(0, w * h - 1),
           i -> ABS((doc_id + 3 * (i % w) + 5 * (i // w) + 11 * (f + 1)) % 256
                  - (doc_id + 3 * (i % w) + 5 * (i // w) + 11 * f) % 256)) AS dr,
         list_transform(generate_series(0, w * h - 1),
           i -> ABS((doc_id * 2 + (i % w) + 7 * (f + 1)) % 256
                  - (doc_id * 2 + (i % w) + 7 * f) % 256)) AS dg,
         list_transform(generate_series(0, w * h - 1),
           i -> ABS(((i % w) * (i // w) + doc_id + 13 * (f + 1)) % 256
                  - ((i % w) * (i // w) + doc_id + 13 * f) % 256)) AS db
  FROM pairs
)
SELECT doc_id,
       CAST(f AS INT) AS frame_a,
       CAST(f + 1 AS INT) AS frame_b,
       CAST(list_aggregate(dr, 'sum') AS BIGINT) AS abs_diff_r,
       CAST(list_aggregate(dg, 'sum') AS BIGINT) AS abs_diff_g,
       CAST(list_aggregate(db, 'sum') AS BIGINT) AS abs_diff_b
FROM d
"""


@register("mm_video_motion_energy", oracle=_MOTION_SQL, tags=("multimodal", "udf"))
def mm_video_motion_energy(spark, sf_dir):
    """Frame-to-frame motion energy over the same synthetic AVI corpus
    as mm_decode_avi_frames (every frame sampled here): per consecutive
    frame pair, summed absolute per-channel pixel difference — the
    shot-boundary / static-clip signal video curation pipelines cut on.
    Single-frame clips emit no rows. DuckDB recomputes |Δ| sums
    formula-side, so the container walk, raster decode, and differencing
    are all oracle-exact."""
    from etlalchemy_spark.operators.multimodal import encode_avi_rgb, video_motion_energy

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(2) + F.col("doc_id") % 5).cast("int").alias("width"),
        (F.lit(2) + F.col("doc_id") % 3).cast("int").alias("height"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h, nf in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["n_frames"]
            ):
                doc_id, w, h, nf = int(doc_id), int(w), int(h), int(nf)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                frames = []
                for f in range(nf):
                    r = (doc_id + 3 * x + 5 * y + 11 * f) % 256
                    g = (doc_id * 2 + x + 7 * f) % 256
                    b = (x * y + doc_id + 13 * f) % 256
                    frames.append(
                        np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                    )
                payloads.append(encode_avi_rgb(np.stack(frames), fps=10))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    vids = params.mapInPandas(synth, "doc_id long, payload binary")
    return video_motion_energy(vids, "doc_id", every_n=1)


# --- Image perceptual-hash near-dup (banded Hamming LSH join) -------------

_AHASH_SQL = """
WITH params AS (
  SELECT doc_id, doc_id // 2 AS base,
         16 + (doc_id // 2) % 9 AS w,
         12 + (doc_id // 2) % 7 AS h,
         doc_id % 2 AS odd
  FROM documents
),
-- nearest-neighbor sampling commutes with the formula pixels: evaluate
-- the pixel function directly at the 8x8 sample coordinates
cells AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63), j ->
           (299 * (((base*131 + 7) * ((((j % 8) * w) // 8) + 1)
                    + (base*197 + 3) * ((((j // 8) * h) // 8) + 1)
                    + CASE WHEN odd = 1
                           AND ((((j % 8) * w) // 8) + 2 * (((j // 8) * h) // 8) + base) % 11 = 0
                           THEN 40 ELSE 0 END) % 256)
          + 587 * (((base*173 + 11) * ((((j % 8) * w) // 8) + 2)
                    + (base*151 + 5) * ((((j // 8) * h) // 8) + 1)
                    + (((j % 8) * w) // 8) * (((j // 8) * h) // 8)) % 256)
          + 114 * (((base*113 + 13) * ((((j % 8) * w) // 8) * (((j // 8) * h) // 8) + 1)
                    + base) % 256)) // 1000) AS cells
  FROM params
),
hashes AS (
  SELECT doc_id, cells, CAST(list_aggregate(cells, 'sum') AS BIGINT) AS s FROM cells
),
hh AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, 15),  j -> CASE WHEN 64*cells[j+1]  > s THEN (1 << j)        ELSE 0 END)) AS INT) AS b0,
         CAST(list_sum(list_transform(generate_series(16, 31), j -> CASE WHEN 64*cells[j+1]  > s THEN (1 << (j-16))   ELSE 0 END)) AS INT) AS b1,
         CAST(list_sum(list_transform(generate_series(32, 47), j -> CASE WHEN 64*cells[j+1]  > s THEN (1 << (j-32))   ELSE 0 END)) AS INT) AS b2,
         CAST(list_sum(list_transform(generate_series(48, 63), j -> CASE WHEN 64*cells[j+1]  > s THEN (1 << (j-48))   ELSE 0 END)) AS INT) AS b3
  FROM hashes
),
bands AS (
  SELECT doc_id, 0 AS band, b0 AS val FROM hh
  UNION ALL SELECT doc_id, 1, b1 FROM hh
  UNION ALL SELECT doc_id, 2, b2 FROM hh
  UNION ALL SELECT doc_id, 3, b3 FROM hh
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT c.doc_a, c.doc_b,
         CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
            + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) AS INT) AS hamming
  FROM cand c
  JOIN hh ha ON c.doc_a = ha.doc_id
  JOIN hh hb ON c.doc_b = hb.doc_id
)
WHERE hamming <= 6
"""


@register("dedup_image_ahash", oracle=_AHASH_SQL, tags=("dedup", "multimodal", "udf", "bench"))
def dedup_image_ahash(spark, sf_dir):
    """IMAGE near-duplicate detection end-to-end — the visual twin of
    MinHash-LSH text dedup: synthesize real image payloads (even
    doc_ids 24-bit BMP, odd binary PPM, so each near-dup pair crosses
    FORMATS — doc 2k and 2k+1 share a base pattern, the odd one
    carrying a sparse +40 red perturbation on ~9%% of pixels),
    REAL-decode them via the magic-byte raster router, fingerprint
    with the integer aHash (operators/multimodal.image_ahash), then
    find near-dups with a banded Hamming LSH join: 4 bands of 16 bits,
    candidates = pairs agreeing on >=1 band (pigeonhole-guaranteed
    recall for Hamming distance < 4, empirically 247/250 planted
    pairs at distance <= 6), verified with an exact popcount-of-XOR
    distance on candidates ONLY — never all-pairs. At 100 TB the
    fingerprint pass is scan-speed Arrow batches, the band join is an
    equi-join shuffling 4 narrow rows per image, and candidate
    verification touches 4 ints per pair. The DuckDB oracle recomputes
    hash and join formula-side (nearest-neighbor sampling commutes
    with the deterministic pixel function)."""
    from etlalchemy_spark.operators.multimodal import encode_bmp_24, encode_ppm_p6, image_ahash

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        F.expr("doc_id DIV 2").alias("base"),
        (F.lit(16) + F.expr("doc_id DIV 2") % 9).cast("int").alias("w"),
        (F.lit(12) + F.expr("doc_id DIV 2") % 7).cast("int").alias("h"),
        (F.col("doc_id") % 2).cast("int").alias("odd"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, base, w, h, odd in zip(
                pdf["doc_id"], pdf["base"], pdf["w"], pdf["h"], pdf["odd"]
            ):
                doc_id, base, w, h, odd = int(doc_id), int(base), int(w), int(h), int(odd)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = ((base * 131 + 7) * (x + 1) + (base * 197 + 3) * (y + 1)) % 256
                if odd:
                    r = (r + 40 * ((x + 2 * y + base) % 11 == 0)) % 256
                g = ((base * 173 + 11) * (x + 2) + (base * 151 + 5) * (y + 1) + x * y) % 256
                b = ((base * 113 + 13) * (x * y + 1) + base) % 256
                px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                payloads.append(encode_bmp_24(px) if odd == 0 else encode_ppm_p6(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    hh = image_ahash(imgs, "doc_id").select("doc_id", "b0", "b1", "b2", "b3")

    # Carry the full 64-bit hash THROUGH the band join instead of
    # joining it back per side: the previous join-back shape referenced
    # hh three times (band explode + both verification sides), so the
    # Arrow-batched synth+decode+hash Python pipeline re-executed three
    # times (16 EvalPython nodes in the r13 before-plan → 4 after).
    # The hashes are functions of doc_id, so the pair distinct is the
    # same set, the verification popcount needs no join, and the only
    # extra cost is 4 ints riding the (band, val) exchange — the
    # lightweight-proxy rule of guide §8 (decide on hashes, never
    # re-decode payloads), applied without an extra materialization.
    # One explicit (band, val) exchange shared by BOTH self-join sides:
    # without it the planner broadcasts one side (BroadcastExchange has
    # no reusable shuffle), so the Arrow-batched synth+decode+hash
    # Python pipeline executed TWICE (4 MapInPandas nodes, two heavy
    # Python jobs profiled in the r13 optimization round). With both
    # sides hanging off the SAME hash exchange, ReusedExchange runs the
    # Python pass once and the join reads the materialized shuffle
    # twice — 4 narrow rows per image through one exchange (guide §2.4
    # "two operations keyed the same way can share one exchange").
    bands = hh.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "val"),
    ).repartition("band", "val")

    def ham(a, b):
        return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))

    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                ham("a.b0", "b.b0")
                + ham("a.b1", "b.b1")
                + ham("a.b2", "b.b2")
                + ham("a.b3", "b.b3")
            )
            .cast("int")
            .alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= 6)


# --- Audio periodicity: integer autocorrelation pitch ---------------------

_AUTOCORR_SQL = """
WITH params AS (
  SELECT doc_id, 2 + doc_id % 7 AS p, 64 + doc_id % 33 AS n FROM documents
),
s AS (
  SELECT doc_id, n,
         list_transform(generate_series(0, n - 1),
                        i -> ((doc_id*13 + (i % p) * 997) % 4001) - 2000) AS s
  FROM params
),
acs AS (
  SELECT doc_id, L,
         CAST(list_sum(list_transform(generate_series(0, n - 1 - L),
                                      i -> s[i+1] * s[i+L+1])) AS BIGINT) AS ac
  FROM s CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS L) lags
),
m AS (SELECT doc_id, MAX(ac) AS best_ac FROM acs GROUP BY doc_id),
b AS (
  SELECT a.doc_id, CAST(MIN(a.L) AS INT) AS best_lag, m.best_ac
  FROM acs a JOIN m ON a.doc_id = m.doc_id AND a.ac = m.best_ac
  GROUP BY a.doc_id, m.best_ac
),
e AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
         CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT) AS energy,
         CAST(list_sum(list_transform(generate_series(0, n - 2),
                                      i -> CASE WHEN s[i+1] * s[i+2] < 0 THEN 1 ELSE 0 END))
              AS BIGINT) AS zero_crossings
  FROM s
)
SELECT e.doc_id, e.n_samples, e.energy, b.best_lag, b.best_ac, e.zero_crossings
FROM e JOIN b ON e.doc_id = b.doc_id
"""


@register("mm_audio_autocorr_pitch", oracle=_AUTOCORR_SQL, tags=("multimodal", "udf"))
def mm_audio_autocorr_pitch(spark, sf_dir):
    """Audio periodicity features over REAL encode→decode round trips:
    each doc synthesizes a periodic 16-bit PCM waveform (period
    2 + doc_id%7 samples, 64-96 samples long), encodes it into a RIFF
    container, and the operator decodes it back (shared chunk walker)
    and computes the exact integer autocorrelation over lags 1..8,
    reporting the maximizing lag (the detected fundamental period,
    smallest-lag tie-break), total energy, and zero-crossing count —
    the classic voiced/unvoiced + pitch front-end of an audio
    curation pipeline, all-integer so DuckDB recomputes the verdicts
    formula-side. Partition-local; no shuffle; O(max_lag * n) per
    asset."""
    from etlalchemy_spark.operators.multimodal import audio_autocorr, encode_wav_pcm16

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(2) + F.col("doc_id") % 7).cast("int").alias("p"),
        (F.lit(64) + F.col("doc_id") % 33).cast("int").alias("n"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, p, n in zip(pdf["doc_id"], pdf["p"], pdf["n"]):
                doc_id, p, n = int(doc_id), int(p), int(n)
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 13 + (i % p) * 997) % 4001) - 2000
                payloads.append(encode_wav_pcm16(s, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    wavs = params.mapInPandas(synth, "doc_id long, payload binary")
    return audio_autocorr(wavs, "doc_id", max_lag=8)


_VAD_SQL = """
WITH params AS (
  SELECT doc_id,
         50 + doc_id % 97 AS n_samples
  FROM documents
), frames AS (
  SELECT doc_id, f,
         list_aggregate(
           list_transform(generate_series(f * 16, f * 16 + 15),
             i -> CAST(((doc_id * 31 + i * 17) % 65536 - 32768) AS HUGEINT)
                  * ((doc_id * 31 + i * 17) % 65536 - 32768)),
           'sum') AS energy
  FROM params, UNNEST(generate_series(0, n_samples // 16 - 1)) AS t(f)
  WHERE n_samples >= 16
), flagged AS (
  SELECT doc_id, f, (energy > 3200000000) AS active FROM frames
), runs AS (
  SELECT doc_id, active, f - ROW_NUMBER() OVER (PARTITION BY doc_id, active ORDER BY f) AS grp
  FROM flagged
), runlen AS (
  SELECT doc_id, MAX(cnt) AS longest_active_run FROM (
    SELECT doc_id, grp, COUNT(*) AS cnt FROM runs WHERE active GROUP BY doc_id, grp
  ) GROUP BY doc_id
)
SELECT fl.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN fl.active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN fl.active THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS active_ratio,
       CAST(COALESCE(MIN(rl.longest_active_run), 0) AS BIGINT) AS longest_active_run
FROM flagged fl LEFT JOIN runlen rl ON fl.doc_id = rl.doc_id
GROUP BY fl.doc_id
"""


@register("mm_audio_vad_segments", oracle=_VAD_SQL, tags=("multimodal", "udf"))
def mm_audio_vad_segments(spark, sf_dir):
    """Energy-threshold voice-activity detection over REAL decoded
    WAV bytes: the synthetic corpus (same deterministic samples as
    mm_decode_wav_stats, so the oracle recomputes expectations
    formula-side without parsing bytes) is encoded to RIFF/PCM16,
    decoded back through the Arrow mapInPandas path, split into
    16-sample frames, and each frame's energy (sum of squared
    samples, exact int64 in numpy / HUGEINT in the oracle) is
    compared to an exact integer threshold. Per asset: frame count,
    active count/ratio, and the longest active run — the segmentation
    primitive behind silence trimming and speech-span extraction in
    audio dataset prep. Decode+frame+flag are partition-local (one
    Arrow pass, no shuffle, no per-row UDF); only per-asset summary
    rows leave the executor — at 100 TB this is scan-bound exactly
    like the production job."""
    from etlalchemy_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_pcm16,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(50) + F.col("doc_id") % 97).cast("int").alias("n_samples"),
    )

    def synth_decode_vad(batches):
        import numpy as np
        import pandas as pd

        out_ids, out_nf, out_na, out_run = [], [], [], []
        for pdf in batches:
            for doc_id, n in zip(pdf["doc_id"], pdf["n_samples"]):
                i = np.arange(int(n), dtype=np.int64)
                samples = (int(doc_id) * 31 + i * 17) % 65536 - 32768
                payload = encode_wav_pcm16(samples, 8000)
                _, dec = decode_wav_samples(payload)
                nf = len(dec) // 16
                if nf == 0:
                    continue
                frames = dec[: nf * 16].reshape(nf, 16).astype(np.int64)
                energy = (frames * frames).sum(axis=1)
                active = energy > 3_200_000_000
                run = best = 0
                for a in active:
                    run = run + 1 if a else 0
                    best = max(best, run)
                out_ids.append(int(doc_id))
                out_nf.append(nf)
                out_na.append(int(active.sum()))
                out_run.append(best)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "n_frames": pd.Series(out_nf, dtype="int64"),
                "n_active": pd.Series(out_na, dtype="int64"),
                "longest_active_run": pd.Series(out_run, dtype="int64"),
            }
        )

    res = params.mapInPandas(
        synth_decode_vad,
        "doc_id long, n_frames long, n_active long, longest_active_run long",
    )
    return res.select(
        "doc_id",
        "n_frames",
        "n_active",
        (F.col("n_active").cast("double") / F.col("n_frames").cast("double")).alias(
            "active_ratio"
        ),
        "longest_active_run",
    )


_PATCH_SQL = """
WITH params AS (
  SELECT doc_id,
         1 + doc_id % 7 AS w,
         1 + doc_id % 5 AS h
  FROM documents
), px AS (
  SELECT doc_id,
         (((i % w) * 2) // w) AS patch_col,
         (((i // w) * 2) // h) AS patch_row,
         ((doc_id + 3 * (i % w) + 5 * (i // w)) % 256)
           + ((doc_id * 2 + (i % w)) % 256)
           + (((i % w) * (i // w) + doc_id) % 256) AS inten
  FROM params, UNNEST(generate_series(0, w * h - 1)) AS t(i)
)
SELECT doc_id,
       CAST(patch_row AS INT) AS patch_row,
       CAST(patch_col AS INT) AS patch_col,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(inten) AS BIGINT) AS intensity_sum,
       CAST(SUM(inten) AS DOUBLE) / (3.0 * CAST(COUNT(*) AS DOUBLE))
         AS mean_intensity
FROM px
GROUP BY doc_id, patch_row, patch_col
"""


@register("mm_image_patch_grid", oracle=_PATCH_SQL, tags=("multimodal", "udf"))
def mm_image_patch_grid(spark, sf_dir):
    """ViT-style 2x2 patch grid over REAL decoded images: the same
    mixed BMP/PPM corpus as mm_decode_image_stats (pixels a
    deterministic function of doc_id, so the oracle recomputes every
    patch sum formula-side) is encoded, pixel-DECODED back
    (operators/multimodal.decode_image_pixels — BGR reorder, stride
    and orientation recovery included), and each image maps onto a
    2x2 patch grid by pure integer arithmetic ((y*2)//h, (x*2)//w) —
    no resampling, any image size. Per patch: pixel count, EXACT
    integer intensity sum, mean. This is the patch-embedding prep
    shape: decode and tile are partition-local Arrow batches, and
    only grid^2 summary rows per asset ever leave the executor — at
    100 TB the job is scan-bound with a 4-rows-per-image output."""
    from etlalchemy_spark.operators.multimodal import (
        encode_bmp_24,
        encode_ppm_p6,
        image_patch_grid,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(1) + F.col("doc_id") % 7).cast("int").alias("width"),
        (F.lit(1) + F.col("doc_id") % 5).cast("int").alias("height"),
        F.when(F.col("doc_id") % 2 == 0, "bmp").otherwise("ppm").alias("format"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h, fmt in zip(
                pdf["doc_id"], pdf["width"], pdf["height"], pdf["format"]
            ):
                doc_id, w, h = int(doc_id), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = (doc_id + 3 * x + 5 * y) % 256
                g = (doc_id * 2 + x) % 256
                b = (x * y + doc_id) % 256
                px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                payloads.append(encode_bmp_24(px) if fmt == "bmp" else encode_ppm_p6(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    patches = image_patch_grid(imgs, "doc_id", grid=2)
    return patches.select(
        "doc_id",
        "patch_row",
        "patch_col",
        "n_px",
        "intensity_sum",
        (
            F.col("intensity_sum").cast("double")
            / (3.0 * F.col("n_px").cast("double"))
        ).alias("mean_intensity"),
    )


# --- REAL baseline JPEG decode (r9) ----------------------------------------

_JPEG_SQL = """
WITH params AS (
  SELECT doc_id,
         CAST(doc_id % 3 AS INT) AS mode,
         16 * (1 + CAST(doc_id % 2 AS INT)) AS w,
         16 AS h
  FROM documents
),
lbx AS (
  SELECT doc_id, mode, w, h, UNNEST(generate_series(0, w // 8 - 1)) AS bx
  FROM params
),
lblk AS (
  SELECT doc_id, mode, w, h, bx, UNNEST(generate_series(0, h // 8 - 1)) AS by
  FROM lbx
),
lvals AS (
  SELECT doc_id, mode, w, h,
         (7 * doc_id + 11 * bx + 13 * by) % 256 AS l,
         CASE WHEN mode = 1 THEN (5 * doc_id + 3 * bx + 7 * by) % 256
              WHEN mode = 2 THEN (5 * doc_id + 3 * (bx // 2) + 7 * (by // 2)) % 256
         END AS cbv,
         CASE WHEN mode = 1 THEN (3 * doc_id + 5 * bx + 1 * by) % 256
              WHEN mode = 2 THEN (3 * doc_id + 5 * (bx // 2) + 1 * (by // 2)) % 256
         END AS crv
  FROM lblk
),
rgb AS (
  SELECT doc_id,
         CAST(SUM(l) AS BIGINT) AS suml,
         CAST(SUM(CASE WHEN mode = 0 THEN l
                       ELSE LEAST(GREATEST(FLOOR(l + 1.402 * (crv - 128) + 0.5), 0), 255)
                  END) AS BIGINT) AS sumr,
         CAST(SUM(CASE WHEN mode = 0 THEN l
                       ELSE LEAST(GREATEST(FLOOR(l - 0.344136 * (cbv - 128)
                                                   - 0.714136 * (crv - 128) + 0.5),
                                           0), 255)
                  END) AS BIGINT) AS sumg,
         CAST(SUM(CASE WHEN mode = 0 THEN l
                       ELSE LEAST(GREATEST(FLOOR(l + 1.772 * (cbv - 128) + 0.5), 0), 255)
                  END) AS BIGINT) AS sumb
  FROM lvals GROUP BY doc_id
),
cbx AS (
  SELECT doc_id, mode, w, h,
         UNNEST(generate_series(0, (CASE WHEN mode = 1 THEN w // 8 ELSE w // 16 END) - 1)) AS bx
  FROM params WHERE mode > 0
),
cblk AS (
  SELECT doc_id, mode, bx,
         UNNEST(generate_series(0, (CASE WHEN mode = 1 THEN h // 8 ELSE h // 16 END) - 1)) AS by
  FROM cbx
),
csum AS (
  SELECT doc_id,
         CAST(SUM((5 * doc_id + 3 * bx + 7 * by) % 256) AS BIGINT) AS scb,
         CAST(SUM((3 * doc_id + 5 * bx + 1 * by) % 256) AS BIGINT) AS scr
  FROM cblk GROUP BY doc_id
)
SELECT p.doc_id,
       CASE p.mode WHEN 0 THEN 'gray' WHEN 1 THEN '444' ELSE '420' END AS subsampling,
       CAST(p.w AS INT) AS width, CAST(p.h AS INT) AS height,
       CAST(p.w * p.h AS BIGINT) AS n_pixels,
       CAST(64 * r.suml AS BIGINT) AS sum_y,
       CAST(64 * COALESCE(c.scb, 0) AS BIGINT) AS sum_cb,
       CAST(64 * COALESCE(c.scr, 0) AS BIGINT) AS sum_cr,
       CAST(64 * r.sumr AS BIGINT) AS sum_r,
       CAST(64 * r.sumg AS BIGINT) AS sum_g,
       CAST(64 * r.sumb AS BIGINT) AS sum_b
FROM params p
JOIN rgb r USING (doc_id)
LEFT JOIN csum c ON p.doc_id = c.doc_id
"""


@register("mm_decode_jpeg_progressive", oracle=_JPEG_SQL, tags=("multimodal", "udf", "bench"))
def mm_decode_jpeg_progressive(spark, sf_dir):
    """PROGRESSIVE JPEG decode (SOF2 — r10, the web's default encode
    mode leaves the refusal list): the SAME block-constant fixtures as
    mm_decode_jpeg_stats, but encoded with a libjpeg-style progressive
    scan script — DC first at Al=1, banded AC first passes, DC
    refinement, chained AC refinements to Al=0 — so every decode walks
    spectral selection, successive approximation, EOB runs, and
    correction bits before producing its sums. The oracle is SHARED
    VERBATIM with the sequential query: progressive encoding of the
    same coefficients must be value-invisible, and the gate hashes
    that claim. Lossy-quality bit-exact equivalence to the baseline
    path is pinned in tests/test_jpeg.py."""
    from etlalchemy_spark.operators.jpeg import decode_jpeg, encode_jpeg_progressive

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 3).cast("int").alias("mode"),
        (F.lit(16) * (1 + F.col("doc_id") % 2)).cast("int").alias("w"),
        F.lit(16).cast("int").alias("h"),
    )

    def synth_and_decode(batches):
        import numpy as np
        import pandas as pd

        ones = np.ones((8, 8), dtype=np.int64)

        def plane(doc, nbx, nby, ka, kb, kc):
            bx = np.arange(nbx, dtype=np.int64)
            by = np.arange(nby, dtype=np.int64)
            blocks = (ka * doc + kb * bx[None, :] + kc * by[:, None]) % 256
            return np.kron(blocks, ones).astype(np.uint8)

        for pdf in batches:
            rows = []
            for doc, mode, w, h in zip(pdf["doc_id"], pdf["mode"], pdf["w"], pdf["h"]):
                doc, mode, w, h = int(doc), int(mode), int(w), int(h)
                y = plane(doc, w // 8, h // 8, 7, 11, 13)
                if mode == 0:
                    payload = encode_jpeg_progressive(y, quality=100)
                elif mode == 1:
                    cb = plane(doc, w // 8, h // 8, 5, 3, 7)
                    cr = plane(doc, w // 8, h // 8, 3, 5, 1)
                    payload = encode_jpeg_progressive(
                        y, cb, cr, quality=100, subsampling="444"
                    )
                else:
                    cb = plane(doc, w // 16, h // 16, 5, 3, 7)
                    cr = plane(doc, w // 16, h // 16, 3, 5, 1)
                    payload = encode_jpeg_progressive(
                        y, cb, cr, quality=100, subsampling="420"
                    )
                d = decode_jpeg(payload)
                rows.append(
                    (
                        doc, d["subsampling"], d["width"], d["height"],
                        d["n_pixels"], d["sum_y"], d["sum_cb"], d["sum_cr"],
                        d["sum_r"], d["sum_g"], d["sum_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "subsampling", "width", "height", "n_pixels",
                    "sum_y", "sum_cb", "sum_cr", "sum_r", "sum_g", "sum_b",
                ],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, subsampling string, width int, height int, n_pixels bigint, "
        "sum_y bigint, sum_cb bigint, sum_cr bigint, sum_r bigint, sum_g bigint, "
        "sum_b bigint",
    )


@register("mm_decode_jpeg_stats", oracle=_JPEG_SQL, tags=("multimodal", "udf", "bench"))
def mm_decode_jpeg_stats(spark, sf_dir):
    """REAL baseline-sequential JPEG decode, stdlib+numpy (r9 — the
    dominant real-world image format leaves the refusal list;
    operators/jpeg.py implements ITU T.81 markers, DHT-from-file
    Huffman decode with byte unstuffing, DC prediction, ZRL/EOB runs,
    dequant + float64 IDCT, 4:2:0 upsample, YCbCr→RGB). Payloads cycle
    grayscale / 4:4:4 / 4:2:0 by doc_id. What makes a LOSSY codec
    oracle-checkable: the fixture is BLOCK-CONSTANT (each 8x8 block one
    value), and at quality 100 the Annex-K scaling yields all-ones
    quant tables, so every block is DC-only and the decode is EXACT —
    DuckDB recomputes plane sums AND the post-conversion RGB sums
    formula-side (identical floor(x+0.5) rounding chain). General
    -image loss is bounded and golden-pinned in tests/test_jpeg.py.
    Same Arrow mapInPandas shape as the PNG query: partition-local,
    payload bytes never shuffle; at 100 TB decode cost is linear in
    bytes and embarrassingly parallel."""
    from etlalchemy_spark.operators.jpeg import decode_jpeg, encode_jpeg

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.col("doc_id") % 3).cast("int").alias("mode"),
        (F.lit(16) * (1 + F.col("doc_id") % 2)).cast("int").alias("w"),
        F.lit(16).cast("int").alias("h"),
    )

    def synth_and_decode(batches):
        import numpy as np
        import pandas as pd

        ones = np.ones((8, 8), dtype=np.int64)

        def plane(doc, nbx, nby, ka, kb, kc):
            bx = np.arange(nbx, dtype=np.int64)
            by = np.arange(nby, dtype=np.int64)
            blocks = (ka * doc + kb * bx[None, :] + kc * by[:, None]) % 256
            return np.kron(blocks, ones).astype(np.uint8)

        for pdf in batches:
            rows = []
            for doc, mode, w, h in zip(pdf["doc_id"], pdf["mode"], pdf["w"], pdf["h"]):
                doc, mode, w, h = int(doc), int(mode), int(w), int(h)
                y = plane(doc, w // 8, h // 8, 7, 11, 13)
                if mode == 0:
                    payload = encode_jpeg(y, quality=100)
                elif mode == 1:
                    cb = plane(doc, w // 8, h // 8, 5, 3, 7)
                    cr = plane(doc, w // 8, h // 8, 3, 5, 1)
                    payload = encode_jpeg(y, cb, cr, quality=100, subsampling="444")
                else:
                    cb = plane(doc, w // 16, h // 16, 5, 3, 7)
                    cr = plane(doc, w // 16, h // 16, 3, 5, 1)
                    payload = encode_jpeg(y, cb, cr, quality=100, subsampling="420")
                d = decode_jpeg(payload)
                rows.append(
                    (
                        doc, d["subsampling"], d["width"], d["height"],
                        d["n_pixels"], d["sum_y"], d["sum_cb"], d["sum_cr"],
                        d["sum_r"], d["sum_g"], d["sum_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "subsampling", "width", "height", "n_pixels",
                    "sum_y", "sum_cb", "sum_cr", "sum_r", "sum_g", "sum_b",
                ],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, subsampling string, width int, height int, n_pixels bigint, "
        "sum_y bigint, sum_cb bigint, sum_cr bigint, sum_r bigint, sum_g bigint, "
        "sum_b bigint",
    )


# --- G.711 mu-law + stereo ADPCM (r9) ---------------------------------------

_MULAW_SQL = """
WITH params AS (
  SELECT doc_id,
         64 + CAST(doc_id % 64 AS INT) AS nbytes,
         1 + CAST(doc_id % 2 AS INT) AS ch
  FROM documents
),
bytes AS (
  SELECT doc_id, nbytes, ch, UNNEST(generate_series(0, nbytes - 1)) AS i
  FROM params
),
dec AS (
  SELECT doc_id, nbytes, ch,
         (((255 - (13 * doc_id + 7 * i) % 256) % 16) * 8 + 132)
           * (1 << CAST(((255 - (13 * doc_id + 7 * i) % 256) // 16) % 8 AS INT))
           - 132 AS mag
  FROM bytes
)
SELECT doc_id,
       8000 AS sample_rate,
       CAST(MIN(ch) AS INT) AS n_channels,
       CAST(MIN(nbytes) // MIN(ch) AS BIGINT) AS n_samples,
       CAST((MIN(nbytes) // MIN(ch)) * 1000000 // 8000 AS BIGINT) AS duration_us,
       CAST(SUM(mag) AS BIGINT) AS sum_abs_amplitude,
       CAST(MAX(mag) AS BIGINT) AS peak_amplitude
FROM dec GROUP BY doc_id
"""


@register("mm_decode_mulaw_stats", oracle=_MULAW_SQL, tags=("multimodal", "udf"))
def mm_decode_mulaw_stats(spark, sf_dir):
    """REAL G.711 mu-law decode (WAV format tag 7, mono and stereo —
    r9): this 'codec' was never a codec, just an 8-bit companding
    table, so it leaves the refusal list as pure integer arithmetic.
    The fixture synthesizes the ENCODED byte stream directly from a
    doc_id formula (every byte is valid mu-law), wraps it in a RIFF
    container, and decodes through the same wav_stats mapInPandas
    pipeline as PCM/ADPCM; DuckDB replicates the exact expansion
    formula — complement, exponent shift around the 0x84 bias — per
    byte, so sums and peaks are oracle-exact (the sign never matters:
    |sample| = magnitude). Partition-local, linear in bytes."""
    import struct as _struct

    from etlalchemy_spark.operators.multimodal import wav_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(64) + F.col("doc_id") % 64).cast("int").alias("nbytes"),
        (F.lit(1) + F.col("doc_id") % 2).cast("int").alias("ch"),
    )

    def synth(batches):
        import pandas as pd

        def wav(doc: int, nbytes: int, ch: int) -> bytes:
            data = bytes((13 * doc + 7 * i) % 256 for i in range(nbytes))
            fmt = b"fmt " + _struct.pack(
                "<IHHIIHHH", 18, 7, ch, 8000, 8000 * ch, ch, 8, 0
            )
            hdr = (
                b"RIFF"
                + _struct.pack("<I", 4 + len(fmt) + 8 + len(data))
                + b"WAVE"
            )
            return hdr + fmt + b"data" + _struct.pack("<I", len(data)) + data

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        wav(int(d), int(n), int(c))
                        for d, n, c in zip(pdf["doc_id"], pdf["nbytes"], pdf["ch"])
                    ],
                }
            )

    wavs = params.mapInPandas(synth, "doc_id long, payload binary")
    return wav_stats(wavs, "doc_id")


# Stereo twin: n ≤ 256 < spb=257 at block_align=264, so every doc is
# ONE block and each channel is an independent mono recursion (pure
# integer waveforms — no sin); one recursion carries both channels'
# (pred, index) states side by side.
_ADPCM_STEREO_SQL = f"""
WITH RECURSIVE
params AS (
  SELECT doc_id, CAST(200 + doc_id % 57 AS BIGINT) AS n FROM documents
),
dec AS (
  SELECT doc_id, n, CAST(0 AS BIGINT) AS i,
         CAST((doc_id * 31) % 8000 - 4000 AS BIGINT) AS lpred, 0 AS lidx,
         CAST((doc_id * 17) % 6000 - 3000 AS BIGINT) AS rpred, 0 AS ridx
  FROM params
  UNION ALL
  SELECT doc_id, n, i,
         GREATEST(-32768, LEAST(32767, lpred + CASE WHEN lsgn THEN -ldelta ELSE ldelta END)),
         GREATEST(0, LEAST(88, lidx + ({_IMA_IDX_SQL})[1 + lb4*4 + lb2*2 + lb1])),
         GREATEST(-32768, LEAST(32767, rpred + CASE WHEN rsgn THEN -rdelta ELSE rdelta END)),
         GREATEST(0, LEAST(88, ridx + ({_IMA_IDX_SQL})[1 + rb4*4 + rb2*2 + rb1]))
  FROM (
    SELECT *,
           (lstep >> 3) + lb4*lstep + lb2*(lstep >> 1) + lb1*(lstep >> 2) AS ldelta,
           (rstep >> 3) + rb4*rstep + rb2*(rstep >> 1) + rb1*(rstep >> 2) AS rdelta
    FROM (
      SELECT *,
             CASE WHEN la - lb4*lstep - lb2*(lstep >> 1) >= lstep >> 2 THEN 1 ELSE 0 END AS lb1,
             CASE WHEN ra - rb4*rstep - rb2*(rstep >> 1) >= rstep >> 2 THEN 1 ELSE 0 END AS rb1
      FROM (
        SELECT *,
               CASE WHEN la - lb4*lstep >= lstep >> 1 THEN 1 ELSE 0 END AS lb2,
               CASE WHEN ra - rb4*rstep >= rstep >> 1 THEN 1 ELSE 0 END AS rb2
        FROM (
          SELECT *,
                 CASE WHEN la >= lstep THEN 1 ELSE 0 END AS lb4,
                 CASE WHEN ra >= rstep THEN 1 ELSE 0 END AS rb4
          FROM (
            SELECT d.doc_id, d.n, d.i + 1 AS i, d.lpred, d.lidx, d.rpred, d.ridx,
                   CAST((d.doc_id * 31 + (d.i+1) * (d.i+1) * 3) % 8000 - 4000 AS BIGINT) AS lraw,
                   CAST((d.doc_id * 17 + (d.i+1) * 5) % 6000 - 3000 AS BIGINT) AS rraw,
                   ({_IMA_ST_SQL})[d.lidx + 1] AS lstep,
                   ({_IMA_ST_SQL})[d.ridx + 1] AS rstep
            FROM dec d
            WHERE d.i + 1 < d.n
          ), LATERAL (SELECT lraw - lpred < 0 AS lsgn, ABS(lraw - lpred) AS la,
                             rraw - rpred < 0 AS rsgn, ABS(rraw - rpred) AS ra)
        )
      )
    )
  )
)
SELECT d.doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(2 AS INT) AS n_channels,
       CAST(MAX(d.n) AS BIGINT) AS n_samples,
       CAST(MAX(d.n) * 125 AS BIGINT) AS duration_us,
       CAST(SUM(ABS(d.lpred)) + SUM(ABS(d.rpred)) AS BIGINT) AS sum_abs_amplitude,
       CAST(GREATEST(MAX(ABS(d.lpred)), MAX(ABS(d.rpred))) AS BIGINT) AS peak_amplitude
FROM dec d
GROUP BY d.doc_id
"""


@register("mm_decode_adpcm_stereo", oracle=_ADPCM_STEREO_SQL, tags=("multimodal", "udf"))
def mm_decode_adpcm_stereo(spark, sf_dir):
    """REAL STEREO IMA ADPCM decode (format 17, 2 channels — r9,
    closing the last named audio boundary): per-doc deterministic
    integer waveforms per channel are compressed with the stereo
    encoder (two per-channel predictor/step states, nibble data
    interleaved in 4-byte groups) and decoded back through wav_stats.
    Oracle-exact since r10 (VERDICT r9 #3): every doc fits one block
    (n ≤ 256 < spb=257), so each channel is an independent recursion
    and one DuckDB WITH RECURSIVE carries both channel states —
    encoder/decoder closeness and the mono-equivalence property stay
    pinned in tests/test_multimodal.py."""
    from etlalchemy_spark.operators.multimodal import (
        encode_wav_ima_adpcm_stereo,
        wav_stats,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id", (F.lit(200) + F.col("doc_id") % 57).cast("int").alias("n")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc, n in zip(pdf["doc_id"], pdf["n"]):
                doc, n = int(doc), int(n)
                i = np.arange(n, dtype=np.int64)
                left = ((doc * 31 + i * i * 3) % 8000 - 4000).astype(np.int16)
                right = ((doc * 17 + i * 5) % 6000 - 3000).astype(np.int16)
                payloads.append(encode_wav_ima_adpcm_stereo(left, right, 8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    wavs = params.mapInPandas(synth, "doc_id long, payload binary")
    return wav_stats(wavs, "doc_id")


# --- Sobel edge energy (r9) ----------------------------------------------------


def _sobel_luma(dx: int, dy: int) -> str:
    x = f"((i % (w-2)) + 1 + {dx})"
    y = f"((i // (w-2)) + 1 + {dy})"
    return (
        f"(299*((doc_id + 3*{x} + 5*{y}) % 256)"
        f" + 587*((doc_id*2 + {x}) % 256)"
        f" + 114*(({x}*{y} + doc_id) % 256))"
    )


_SOBEL_GX = (
    f"(({_sobel_luma(1, -1)} + 2*{_sobel_luma(1, 0)} + {_sobel_luma(1, 1)})"
    f" - ({_sobel_luma(-1, -1)} + 2*{_sobel_luma(-1, 0)} + {_sobel_luma(-1, 1)}))"
)
_SOBEL_GY = (
    f"(({_sobel_luma(-1, 1)} + 2*{_sobel_luma(0, 1)} + {_sobel_luma(1, 1)})"
    f" - ({_sobel_luma(-1, -1)} + 2*{_sobel_luma(0, -1)} + {_sobel_luma(1, -1)}))"
)

_SOBEL_SQL = f"""
WITH params AS (
  SELECT doc_id, 3 + doc_id % 7 AS w, 3 + doc_id % 5 AS h FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST((w-2)*(h-2) AS BIGINT) AS interior_pixels,
       CAST(list_aggregate(list_transform(generate_series(0, (w-2)*(h-2) - 1),
              i -> ABS({_SOBEL_GX}) + ABS({_SOBEL_GY})), 'sum') AS BIGINT)
         AS edge_energy
FROM params
"""


@register("mm_image_sobel_energy", oracle=_SOBEL_SQL, tags=("multimodal", "udf", "bench"))
def mm_image_sobel_energy(spark, sf_dir):
    """REAL edge detection over the same synthesized BMP corpus as
    mm_resize_nearest_stats: decode → integer luma (299R+587G+114B,
    ×1000-scaled, never divided) → both 3×3 Sobel kernels over the
    interior → Σ(|gx|+|gy|) per image. The sharpness/blur score image
    curation pipelines threshold on (near-constant or blurred frames
    score ~0, text/structure scores high). Every tap is integer
    arithmetic, so DuckDB recomputes the full convolution from the
    pixel formulas and the decode→convolve→reduce path is oracle-exact
    end to end. Scale shape: decode + convolution are partition-local
    Arrow batches; only (id, dims, energy) rows ever leave the
    executors."""
    from etlalchemy_spark.operators.multimodal import encode_bmp_24, image_sobel_energy

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(3) + F.col("doc_id") % 7).cast("int").alias("width"),
        (F.lit(3) + F.col("doc_id") % 5).cast("int").alias("height"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = (doc_id + 3 * x + 5 * y) % 256
                g = (doc_id * 2 + x) % 256
                b = (x * y + doc_id) % 256
                px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                payloads.append(encode_bmp_24(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_sobel_energy(imgs, "doc_id")


# --- RMS loudness-normalization audit (r9) ---------------------------------------

_RMS_TARGET = 8000.0

_RMS_SQL = f"""
WITH params AS (
  SELECT doc_id, 50 + doc_id % 97 AS n_samples FROM documents
),
s AS (
  SELECT doc_id, n_samples,
         list_transform(generate_series(0, n_samples - 1),
                        i -> (doc_id * 31 + i * 17) % 65536 - 32768) AS sig
  FROM params
),
m AS (
  SELECT doc_id,
         CAST(n_samples AS BIGINT) AS n_samples,
         CAST(list_aggregate(list_transform(sig, x -> x * x), 'sum') AS BIGINT) AS sum_sq,
         CAST(list_aggregate(list_transform(sig, x -> abs(x)), 'max') AS BIGINT) AS peak
  FROM s
)
SELECT doc_id, n_samples, sum_sq, peak,
       SQRT(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms,
       {_RMS_TARGET!r} / SQRT(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS target_gain,
       32767.0 / CAST(peak AS DOUBLE) AS clip_safe_gain,
       LEAST({_RMS_TARGET!r} / SQRT(CAST(sum_sq AS DOUBLE) / CAST(n_samples AS DOUBLE)),
             32767.0 / CAST(peak AS DOUBLE)) AS applied_gain
FROM m
"""


@register("mm_audio_rms_gain", oracle=_RMS_SQL, tags=("multimodal", "udf"))
def mm_audio_rms_gain(spark, sf_dir):
    """Loudness normalization over the SAME synthetic PCM corpus as
    mm_decode_wav_stats (real encode → real decode per clip): per-clip
    RMS from the exact integer energy sum, the linear gain to a fixed
    target RMS, the clip-safe ceiling 32767/peak, and the applied gain
    = min of the two — the pass speech pipelines run before feature
    extraction so quiet and loud sources train at one level. The chain
    is libm-free (integer sums → sqrt + divisions, both IEEE-exact),
    so every double hash-matches the formula-side recompute."""
    from etlalchemy_spark.operators.multimodal import (
        audio_rms_gain,
        encode_wav_pcm16,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id", (50 + F.col("doc_id") % 97).cast("int").alias("n_samples")
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n in zip(pdf["doc_id"], pdf["n_samples"]):
                doc_id, n = int(doc_id), int(n)
                i = np.arange(n, dtype=np.int64)
                s = (doc_id * 31 + i * 17) % 65536 - 32768
                payloads.append(encode_wav_pcm16([int(x) for x in s], 16000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    clips = params.mapInPandas(synth, "doc_id long, payload binary")
    return audio_rms_gain(clips, "doc_id", _RMS_TARGET)


# --- Color histogram (r9) ----------------------------------------------------------

_CHIST_SQL = """
WITH params AS (
  SELECT doc_id, 3 + doc_id % 7 AS w, 3 + doc_id % 5 AS h FROM documents
),
px AS (
  SELECT doc_id,
         UNNEST(generate_series(0, w * h - 1)) AS i, w, h
  FROM params
),
vals AS (
  SELECT doc_id, 'r' AS channel,
         ((doc_id + 3 * (i % w) + 5 * (i // w)) % 256) * 8 // 256 AS bucket
  FROM px
  UNION ALL
  SELECT doc_id, 'g', ((doc_id * 2 + (i % w)) % 256) * 8 // 256 FROM px
  UNION ALL
  SELECT doc_id, 'b', (((i % w) * (i // w) + doc_id) % 256) * 8 // 256 FROM px
),
grid AS (
  SELECT p.doc_id, c.channel, b.bucket
  FROM params p,
       (SELECT UNNEST(['r','g','b']) AS channel) c,
       (SELECT UNNEST(generate_series(0, 7)) AS bucket) b
)
SELECT g.doc_id, g.channel, CAST(g.bucket AS INT) AS bucket,
       CAST(COALESCE(v.n, 0) AS BIGINT) AS n_pixels
FROM grid g
LEFT JOIN (
  SELECT doc_id, channel, bucket, COUNT(*) AS n FROM vals GROUP BY 1, 2, 3
) v ON v.doc_id = g.doc_id AND v.channel = g.channel AND v.bucket = g.bucket
"""


@register("mm_image_color_histogram", oracle=_CHIST_SQL, tags=("multimodal", "udf"))
def mm_image_color_histogram(spark, sf_dir):
    """Per-channel 8-bucket color histograms over the same synthesized
    BMP corpus as the resize/Sobel rows — the color-distribution
    feature curation uses for near-monochrome filtering and cheap
    pre-dedup blocking: bucket = value·8 DIV 256 (pure integer), output
    long-form so shard histograms merge by SUM (the sketch-family
    register discipline). Empty buckets emit explicitly (the grid is
    part of the contract — a missing-zero bug upstream would silently
    shift every downstream distance metric). DuckDB recomputes the
    buckets from the pixel formulas including the zero grid."""
    from etlalchemy_spark.operators.multimodal import (
        encode_bmp_24,
        image_color_histogram,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(3) + F.col("doc_id") % 7).cast("int").alias("width"),
        (F.lit(3) + F.col("doc_id") % 5).cast("int").alias("height"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["width"], pdf["height"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                i = np.arange(w * h, dtype=np.int64)
                x, y = i % w, i // w
                r = (doc_id + 3 * x + 5 * y) % 256
                g = (doc_id * 2 + x) % 256
                b = (x * y + doc_id) % 256
                px = np.stack([r, g, b], axis=1).reshape(h, w, 3).astype(np.uint8)
                payloads.append(encode_bmp_24(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    imgs = params.mapInPandas(synth, "doc_id long, payload binary")
    return image_color_histogram(imgs, "doc_id", bins=8)


# --- Walsh-Hadamard sequency-band audio energy (r10) --------------------------------

from etlalchemy_spark.operators.multimodal import wht_band_table  # noqa: E402

_WHT_N = 64
_WHT_BANDS = 4
_WHT_BAND_LIST = ", ".join(str(b) for b in wht_band_table(_WHT_N, _WHT_BANDS))

_WHT_SQL = f"""
WITH ks AS (SELECT UNNEST(generate_series(0, {_WHT_N - 1})) AS k),
coeffs AS (
  SELECT d.doc_id, ks.k,
         list_aggregate(list_transform(generate_series(0, {_WHT_N - 1}),
           i -> ((d.doc_id * 31 + i * 17) % 65536 - 32768)
                * (1 - 2 * (bit_count(CAST(i AS BIGINT) & ks.k) % 2))), 'sum') AS c
  FROM documents d, ks
),
bands AS (
  SELECT doc_id, ([{_WHT_BAND_LIST}])[k + 1] AS band, c FROM coeffs
)
SELECT doc_id, CAST(band AS INT) AS band,
       CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS energy
FROM bands GROUP BY doc_id, band
"""


@register("mm_audio_wht_bands", oracle=_WHT_SQL, tags=("multimodal", "udf", "bench"))
def mm_audio_wht_bands(spark, sf_dir):
    """Spectral band energy over REAL audio decode with ZERO float
    risk (r10): the Walsh-Hadamard transform is the +/-1-basis
    sibling of the FFT (same butterfly; real systems use it for
    spectral hashing and as the LSH/PQ rotation preconditioner), and
    over int16 PCM it is EXACT integer arithmetic — so unlike an FFT
    spectrogram, the 4 sequency-band energies oracle-verify
    bit-for-bit. Pipeline: synthesize deterministic 16-bit PCM WAVs,
    ENCODE to real RIFF bytes, DECODE back through the shared chunk
    walker, integer butterfly, fold into sequency bands (sign-change
    order = the WHT's low->high frequency axis; the natural->sequency
    map is one shared literal table). The DuckDB oracle recomputes
    every coefficient from the closed-form sample function — it never
    parses bytes, so agreement proves the decode+transform chain.
    Partition-local Arrow batches; only (id, band, energy) rows
    leave."""
    from etlalchemy_spark.operators.multimodal import (
        encode_wav_pcm16,
        wht_sequency_bands,
    )

    params = _spread_docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                i = np.arange(_WHT_N, dtype=np.int64)
                samples = (int(doc_id) * 31 + i * 17) % 65536 - 32768
                payloads.append(encode_wav_pcm16(samples, 16000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    wavs = params.mapInPandas(synth, "doc_id long, payload binary")
    return wht_sequency_bands(wavs, "doc_id", n=_WHT_N, n_bands=_WHT_BANDS)


# --- TIFF decode (r10) ---------------------------------------------------------------

_TIFF_SQL = """
WITH params AS (
  SELECT doc_id,
         4 + doc_id % 9 AS w,
         3 + doc_id % 6 AS h,
         CASE WHEN doc_id % 5 = 0 THEN 'MM' ELSE 'II' END AS byte_order
  FROM documents
),
px AS (
  SELECT doc_id, byte_order, w, h,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 7 + i * 13) % 256) AS p
  FROM params
)
SELECT doc_id, byte_order,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(list_aggregate(p, 'sum') AS BIGINT) AS sum_pixels,
       CAST(list_aggregate(p, 'max') AS INT) AS max_pixel
FROM px
"""


@register("mm_decode_tiff_stats", oracle=_TIFF_SQL, tags=("multimodal", "udf"))
def mm_decode_tiff_stats(spark, sf_dir):
    """REAL TIFF 6.0 decode, stdlib-only (r10) — the scanner/GIS/
    medical interchange container, BOTH byte orders (every fifth doc
    encodes big-endian 'MM', the Mac-heritage order real archives
    mix): header magic, IFD walk with SHORT/LONG value-vs-pointer
    slots, strip reassembly, 8-bit grayscale stats. Compressed
    variants are exercised by `mm_decode_tiff_lzw`; JPEG-in-TIFF,
    deeper samples, and tiled layout refuse LOUDLY by field name
    (operators/multimodal.py decode_tiff). The
    encode->decode round trip against a closed-form pixel oracle
    proves the parser reads real TIFF bytes; partition-local Arrow
    batches, stats rows only leave the executors."""
    from etlalchemy_spark.operators.multimodal import encode_tiff_gray8, tiff_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(4) + F.col("doc_id") % 9).cast("int").alias("w"),
        (F.lit(3) + F.col("doc_id") % 6).cast("int").alias("h"),
        (F.col("doc_id") % 5 == 0).alias("big_endian"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h, be in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["big_endian"]
            ):
                px = [
                    [(int(doc_id) * 7 + (r * int(w) + c) * 13) % 256 for c in range(int(w))]
                    for r in range(int(h))
                ]
                payloads.append(encode_tiff_gray8(px, big_endian=bool(be)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    tiffs = params.mapInPandas(synth, "doc_id long, payload binary")
    return tiff_stats(tiffs, "doc_id")


# --- WEBP lossless decode (r10) -------------------------------------------------------

_WEBP_SQL = """
WITH params AS (
  SELECT doc_id, 2 + doc_id % 6 AS w, 2 + doc_id % 5 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 3 + i) % 256) AS r,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 5 + 2 * i) % 256) AS g,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 7 + 3 * i) % 256) AS b
  FROM params
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(list_aggregate(r, 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(g, 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(b, 'sum') AS BIGINT) AS sum_b,
       (doc_id % 3 = 1) AS subtract_green
FROM px
"""


@register("mm_decode_webp_stats", oracle=_WEBP_SQL, tags=("multimodal", "udf"))
def mm_decode_webp_stats(spark, sf_dir):
    """REAL WEBP-lossless (VP8L) decode, pure Python from the public
    bitstream spec (r10) — the web-scrape image format that headed the
    refusal list since r6 comes off it: RIFF walk, LSB-first bit
    reader, canonical Huffman in BOTH spec forms (simple 1-2-symbol
    and full code-length-coded with the 16/17/18 repeat machinery +
    max_symbol shortcut), LZ77 backward references with prefix-coded
    lengths/distances, SUBTRACT_GREEN transform — and, since late
    r10, all four transforms (PREDICTOR/CROSS_COLOR/COLOR_INDEXING
    incl. sub-byte bundling), color cache and meta-Huffman splits
    (this query's fixtures exercise predictor, cross-color,
    meta-split and — since r11 — 2D-neighbor distance-map paths by
    doc_id class). The one remaining loud refusal is lossy VP8.
    Each doc synthesizes deterministic RGBA pixels, ENCODES them
    to a real VP8L stream (in-house spec-correct encoder,
    operators/webp.py; golden header bits + roundtrip properties in
    tests/test_webp.py), and DECODES back through the full Huffman+
    LZ77 path; the oracle recomputes channel sums from the closed
    form without parsing bytes. Partition-local Arrow batches."""
    from etlalchemy_spark.operators.webp import encode_webp_lossless, webp_stats

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(2) + F.col("doc_id") % 6).cast("int").alias("w"),
        (F.lit(2) + F.col("doc_id") % 5).cast("int").alias("h"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                px = [
                    [
                        (
                            (doc_id * 3 + (y * w + x)) % 256,
                            (doc_id * 5 + 2 * (y * w + x)) % 256,
                            (doc_id * 7 + 3 * (y * w + x)) % 256,
                            255,
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                if doc_id % 3 == 0:
                    # thirds of the corpus per transform: PREDICTOR
                    # (mode cycles over all 14), CROSS_COLOR
                    # (multipliers derived from the doc id), and the
                    # SUBTRACT_GREEN default
                    payloads.append(
                        encode_webp_lossless(px, predictor_mode=doc_id % 14)
                    )
                elif doc_id % 3 == 2:
                    ct = (doc_id * 37 % 256, doc_id * 59 % 256, doc_id * 83 % 256)
                    payloads.append(
                        encode_webp_lossless(px, color_transform=ct)
                    )
                else:
                    # odd ids: meta-Huffman split; even ids: mapped
                    # 2D-neighbor distance codes (plane codes 1..120)
                    payloads.append(
                        encode_webp_lossless(
                            px,
                            meta_split=(doc_id % 2 == 1),
                            plane_codes=(doc_id % 2 == 0),
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    webps = params.mapInPandas(synth, "doc_id long, payload binary")
    return webp_stats(webps, "doc_id")


# --- EXIF metadata extraction (r10) ----------------------------------------------------

_EXIF_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 'MM' ELSE 'II' END AS byte_order,
       'CAM-' || CAST(doc_id % 7 AS STRING) AS make,
       CAST(1 + doc_id % 8 AS INT) AS orientation,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 300 ELSE 72 END AS BIGINT) AS xres_num,
       CAST(1 AS BIGINT) AS xres_den,
       '2024:01:' || lpad(CAST(1 + doc_id % 28 AS STRING), 2, '0')
         || ' ' || lpad(CAST(doc_id % 24 AS STRING), 2, '0') || ':30:00'
         AS exif_datetime
FROM documents
"""


@register("mm_exif_metadata", oracle=_EXIF_SQL, tags=("multimodal", "udf"))
def mm_exif_metadata(spark, sf_dir):
    """EXIF metadata extraction (r10) — the image-curation filter
    every multimodal pipeline runs before pixels ('drop screenshots,
    keep camera=X, fix orientation'): walk the JPEG marker stream to
    APP1, parse the embedded TIFF IFD (EXIF IS a TIFF — same
    byte-order marks, same 12-byte entries, both orders mixed in the
    fixture), and extract Make (ASCII, pointer-stored), Orientation
    (SHORT, inline), XResolution (RATIONAL — the num/den pair behind
    a pointer) and DateTime. Encode->decode against a closed-form
    oracle proves the parser reads real EXIF layout, not a lookup
    table (operators/multimodal.py encode_exif_jpeg/decode_exif).
    Partition-local Arrow batches; only metadata rows leave — at
    100 TB this is THE cheap pre-decode pruning pass."""
    from etlalchemy_spark.operators.multimodal import encode_exif_jpeg, exif_metadata

    params = _spread_docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                payloads.append(
                    encode_exif_jpeg(
                        f"CAM-{doc_id % 7}",
                        1 + doc_id % 8,
                        f"2024:01:{1 + doc_id % 28:02d} {doc_id % 24:02d}:30:00",
                        (300 if doc_id % 2 == 0 else 72, 1),
                        big_endian=(doc_id % 4 == 0),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    jpegs = params.mapInPandas(synth, "doc_id long, payload binary")
    return exif_metadata(jpegs, "doc_id")


# --- Per-image histogram entropy over real TIFF decode (r10) ---------------------------

from etlalchemy_spark.queries._util import ln_int_sql  # noqa: E402

_IMG_ENTROPY_LN_C = ln_int_sql("c")
_IMG_ENTROPY_LN_N = ln_int_sql("n")

_IMG_ENTROPY_SQL = f"""
WITH params AS (
  SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 6 AS h FROM documents
),
px AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(0, w * h - 1),
                i -> (doc_id * 7 + i * 13) % 256)) AS val
  FROM params
),
hist AS (SELECT doc_id, val, COUNT(*) AS c FROM px GROUP BY doc_id, val),
nn AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_levels FROM hist GROUP BY doc_id),
terms AS (
  SELECT h.doc_id,
         CAST(CAST(h.c AS DOUBLE) * ({_IMG_ENTROPY_LN_C}) AS DECIMAL(28,10)) AS t
  FROM hist h JOIN nn ON h.doc_id = nn.doc_id
),
s AS (SELECT doc_id, SUM(t) AS ts FROM terms GROUP BY doc_id)
SELECT nn.doc_id,
       CAST(nn.n AS BIGINT) AS n_pixels,
       CAST(nn.n_levels AS BIGINT) AS n_levels,
       CAST(({_IMG_ENTROPY_LN_N})
            - CAST(CAST(s.ts AS VARCHAR) AS DOUBLE) / CAST(nn.n AS DOUBLE)
            AS DOUBLE) AS entropy_nats
FROM nn JOIN s ON nn.doc_id = s.doc_id
"""


@register("mm_image_entropy", oracle=_IMG_ENTROPY_SQL, tags=("multimodal", "stats", "udf"))
def mm_image_entropy(spark, sf_dir):
    """Per-image histogram entropy over REAL TIFF decode (r10) — the
    blank/flat-image curation signal (entropy near 0 = solid color /
    scanner misfire; near ln 256 = noise), computed EXACTLY: the
    decode stage emits integer (doc, gray-level, count) HISTOGRAM
    rows from real TIFF bytes (never float entropies from Python —
    those wouldn't cross engines), and Shannon entropy assembles
    engine-side as H = ln n - (1/n) * sum c*ln c with every ln an
    integer ln (ln_int) and per-level terms decimal-summed
    order-free. The oracle recomputes the histogram from the
    closed-form pixel function, so agreement proves decode +
    histogram + entropy end to end. Decode partition-local in Arrow
    batches; only (doc, level, count) rows shuffle — bounded by 256
    levels per image."""
    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(4) + F.col("doc_id") % 9).cast("int").alias("w"),
        (F.lit(3) + F.col("doc_id") % 6).cast("int").alias("h"),
    )

    def synth_and_hist(batches):
        import collections

        import pandas as pd

        for pdf in batches:
            ids, vals, counts = [], [], []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                px = [
                    [(doc_id * 7 + (r * w + c) * 13) % 256 for c in range(w)]
                    for r in range(h)
                ]
                blob = encode_tiff_gray8(px)
                d = decode_tiff(blob)
                assert d["n_pixels"] == w * h
                # histogram from the DECODED strip bytes, not the
                # input list — entropy genuinely covers the decode
                hist = collections.Counter(d["strip"])
                for val, c in hist.items():
                    ids.append(doc_id)
                    vals.append(val)
                    counts.append(c)
            yield pd.DataFrame({"doc_id": ids, "val": vals, "c": counts})

    hist = params.mapInPandas(synth_and_hist, "doc_id long, val int, c long")
    nn = hist.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_levels")
    )
    terms = hist.join(nn, "doc_id").select(
        "doc_id",
        F.expr(
            f"CAST(CAST(c AS DOUBLE) * ({_IMG_ENTROPY_LN_C}) AS DECIMAL(28,10))"
        ).alias("t"),
    )
    s = terms.groupBy("doc_id").agg(F.sum("t").alias("ts"))
    return nn.join(s, "doc_id").select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_pixels"),
        F.col("n_levels").cast("bigint").alias("n_levels"),
        F.expr(
            f"CAST(({_IMG_ENTROPY_LN_N})"
            f" - CAST(ts AS DOUBLE) / CAST(n AS DOUBLE) AS DOUBLE)"
        ).alias("entropy_nats"),
    )


# --- TIFF LZW + PackBits + predictor decode (r11) ------------------------------------

_TIFF_LZW_SQL = """
WITH params AS (
  SELECT doc_id,
         5 + doc_id % 8 AS w,
         4 + doc_id % 5 AS h,
         CASE doc_id % 3 WHEN 0 THEN 5 WHEN 1 THEN 32773 ELSE 5 END AS compression,
         CASE doc_id % 3 WHEN 0 THEN 2 ELSE 1 END AS predictor
  FROM documents
),
px AS (
  SELECT doc_id, compression, predictor, w, h,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 5 + (i // w) * 9 + ((i % w) // 4)) % 256) AS p
  FROM params
)
SELECT doc_id,
       CAST(compression AS INT) AS compression,
       CAST(predictor AS INT) AS predictor,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(list_aggregate(p, 'sum') AS BIGINT) AS sum_pixels,
       CAST(list_aggregate(p, 'max') AS INT) AS max_pixel
FROM px
"""


@register("mm_decode_tiff_lzw", oracle=_TIFF_LZW_SQL, tags=("multimodal", "udf"))
def mm_decode_tiff_lzw(spark, sf_dir):
    """REAL compressed-TIFF decode (r11) — the codec tail that real
    scanner corpora are mostly made of comes off the refusal list:
    Compression 5 (LZW: MSB-first bitstream, Clear/EOI, dictionary to
    12-bit codes with the spec's EarlyChange width rule — the GIF
    decoder's mirror-image flavor) and 32773 (PackBits RLE), plus
    Predictor 2 horizontal differencing (the LZW-corpus norm), all in
    operators/multimodal.py with encoder mirrors so round trips
    exercise the real dictionary-growth path. Docs rotate through
    LZW+predictor / PackBits / plain LZW by doc_id class; every third
    doc is also multi-strip (each strip an INDEPENDENT LZW stream —
    the splittability property that matters at scale), every fifth
    big-endian, and every seventh TILED (r11: 16x16 tiles, so these
    small fixtures exercise the edge-padding crop and per-tile-row
    predictor paths). Stats come from the DECODED strip bytes; the oracle
    recomputes from the closed-form pixel function, so agreement
    proves inflate+unpredict content end to end. Partition-local
    Arrow batches; only stat rows leave the executors."""
    from etlalchemy_spark.operators.multimodal import decode_tiff, encode_tiff_gray8

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(5) + F.col("doc_id") % 8).cast("int").alias("w"),
        (F.lit(4) + F.col("doc_id") % 5).cast("int").alias("h"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "compression", "predictor", "n_pixels",
                    "sum_pixels", "max_pixel")}
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                comp = 32773 if doc_id % 3 == 1 else 5
                pred = 2 if doc_id % 3 == 0 else 1
                px = [
                    [(doc_id * 5 + r * 9 + c // 4) % 256 for c in range(w)]
                    for r in range(h)
                ]
                tiled = doc_id % 7 == 0
                blob = encode_tiff_gray8(
                    px,
                    big_endian=(doc_id % 5 == 0),
                    compression=comp,
                    predictor=pred,
                    rows_per_strip=2 if (doc_id % 3 == 2 and not tiled) else None,
                    tile_size=(16, 16) if tiled else None,
                )
                d = decode_tiff(blob)
                assert d["strip"] == bytes(v for row in px for v in row)
                out["doc_id"].append(doc_id)
                out["compression"].append(d["compression"])
                out["predictor"].append(d["predictor"])
                out["n_pixels"].append(d["n_pixels"])
                out["sum_pixels"].append(sum(d["strip"]))
                out["max_pixel"].append(max(d["strip"]))
            yield pd.DataFrame(out)

    return params.mapInPandas(
        synth,
        "doc_id long, compression int, predictor int, n_pixels bigint, "
        "sum_pixels bigint, max_pixel int",
    )


# --- BMP RLE8 decode (r11) -----------------------------------------------------------

_BMP_RLE_SQL = """
WITH params AS (
  SELECT doc_id, 4 + doc_id % 7 AS w, 3 + doc_id % 5 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id + (i // w) * 2 + (i % w) // 3) % 16) AS idx
  FROM params
)
SELECT doc_id,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(list_aggregate(list_transform(idx,
            v -> (doc_id * 3 + v * 17) % 256), 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(list_transform(idx,
            v -> (doc_id * 5 + v * 29) % 256), 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(list_transform(idx,
            v -> (doc_id * 7 + v * 41) % 256), 'sum') AS BIGINT) AS sum_b
FROM px
"""


@register("mm_decode_bmp_rle", oracle=_BMP_RLE_SQL, tags=("multimodal", "udf"))
def mm_decode_bmp_rle(spark, sf_dir):
    """REAL BI_RLE8 BMP decode (r11) — the compressed-BMP norm comes
    off the refusal list: 8-bit palettized pixels, encoded runs,
    absolute-mode literal stretches with word alignment, end-of-line
    / end-of-bitmap escapes, bottom-up row order, BGRA palette walk
    (operators/multimodal.py: _bmp_rle8_decode + encoder mirror so
    round trips exercise BOTH modes — the index pattern runs in
    3-pixel stretches precisely so runs AND literals appear). Channel
    sums come from palette-mapped DECODED indices; the oracle
    recomputes them from the closed-form index/palette functions, so
    agreement proves RLE inflate + palette mapping end to end.
    Partition-local Arrow batches; stats rows only leave."""
    from etlalchemy_spark.operators.multimodal import decode_bmp, encode_bmp_rle8

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(4) + F.col("doc_id") % 7).cast("int").alias("w"),
        (F.lit(3) + F.col("doc_id") % 5).cast("int").alias("h"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_pixels", "sum_r", "sum_g", "sum_b")}
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                pal = [
                    ((doc_id * 3 + i * 17) % 256,
                     (doc_id * 5 + i * 29) % 256,
                     (doc_id * 7 + i * 41) % 256)
                    for i in range(16)
                ]
                rows = [
                    [(doc_id + r * 2 + c // 3) % 16 for c in range(w)]
                    for r in range(h)
                ]
                d = decode_bmp(encode_bmp_rle8(rows, pal))
                assert d["n_pixels"] == w * h
                out["doc_id"].append(doc_id)
                out["n_pixels"].append(d["n_pixels"])
                out["sum_r"].append(d["sum_r"])
                out["sum_g"].append(d["sum_g"])
                out["sum_b"].append(d["sum_b"])
            yield pd.DataFrame(out)

    return params.mapInPandas(
        synth,
        "doc_id long, n_pixels bigint, sum_r bigint, sum_g bigint, sum_b bigint",
    )


# --- lossless JPEG (SOF3) decode (r11) --------------------------------------------------

_JPEG_LL_SQL = """
WITH params AS (
  SELECT doc_id,
         4 + CAST(doc_id % 5 AS INT) AS w,
         4 + CAST(doc_id % 3 AS INT) AS h,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 12
              ELSE 16 END AS prec,
         1 + CAST(doc_id % 7 AS INT) AS pred,
         CAST(doc_id % 2 AS INT) AS gray
  FROM documents
),
xs AS (SELECT *, UNNEST(generate_series(0, w - 1)) AS x FROM params),
px AS (SELECT *, UNNEST(generate_series(0, h - 1)) AS y FROM xs),
agg AS (
  SELECT doc_id, w AS width, h AS height, w * h AS n_pixels,
         prec, pred, gray,
         CAST(SUM((doc_id * 31 + x * 17 + y * 29)
              % (CAST(1 AS BIGINT) << prec)) AS BIGINT) AS s0,
         CAST(SUM((doc_id * 32 + x * 18 + y * 30)
              % (CAST(1 AS BIGINT) << prec)) AS BIGINT) AS s1,
         CAST(SUM((doc_id * 33 + x * 19 + y * 31)
              % (CAST(1 AS BIGINT) << prec)) AS BIGINT) AS s2
  FROM px GROUP BY doc_id, w, h, prec, pred, gray
)
SELECT doc_id,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(n_pixels AS BIGINT) AS n_pixels,
       CAST(prec AS INT) AS precision,
       CAST(pred AS INT) AS predictor,
       s0 AS sum_y,
       s0 AS sum_r,
       CASE WHEN gray = 1 THEN s0 ELSE s1 END AS sum_g,
       CASE WHEN gray = 1 THEN s0 ELSE s2 END AS sum_b
FROM agg
ORDER BY doc_id
"""


@register("mm_decode_jpeg_lossless", oracle=_JPEG_LL_SQL, tags=("multimodal", "udf"))
def mm_decode_jpeg_lossless(spark, sf_dir):
    """REAL lossless JPEG (SOF3, T.81 Annex H) decode — the medical/
    scanner/DNG-lineage profile where samples are Huffman-coded
    prediction DIFFERENCES with no DCT, so decode is bit-exact at any
    precision: payloads cycle all 7 spec predictors (doc_id % 7),
    8/12/16-bit precision (doc_id % 3) and grayscale vs 3-component
    (doc_id % 2; lossless defines no color transform, components pass
    through raw). Because reconstruction is exact, the oracle needs no
    block-constant trick — DuckDB recomputes the per-pixel synthetic
    formula sums directly. Encoder twin encode_jpeg_lossless
    (operators/jpeg.py) round-trips every payload in
    tests/test_jpeg.py. Arrow mapInPandas, partition-local; at 100 TB
    decode cost is linear in sample count and embarrassingly
    parallel."""
    from etlalchemy_spark.operators.jpeg import decode_jpeg, encode_jpeg_lossless

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(4) + F.col("doc_id") % 5).cast("int").alias("w"),
        (F.lit(4) + F.col("doc_id") % 3).cast("int").alias("h"),
        F.when(F.col("doc_id") % 3 == 0, 8)
        .when(F.col("doc_id") % 3 == 1, 12)
        .otherwise(16).cast("int").alias("prec"),
        (F.lit(1) + F.col("doc_id") % 7).cast("int").alias("pred"),
        (F.col("doc_id") % 2).cast("int").alias("gray"),
    )

    def synth_and_decode(batches):
        import numpy as np
        import pandas as pd

        def plane(doc, w, h, prec, ka, kb, kc):
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            return (doc * ka + x * kb + y * kc) % (1 << prec)

        for pdf in batches:
            rows = []
            for doc, w, h, prec, pred, gray in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["prec"], pdf["pred"], pdf["gray"]
            ):
                doc, w, h = int(doc), int(w), int(h)
                prec, pred, gray = int(prec), int(pred), int(gray)
                if gray:
                    planes = plane(doc, w, h, prec, 31, 17, 29)
                else:
                    planes = [
                        plane(doc, w, h, prec, 31 + k, 17 + k, 29 + k)
                        for k in range(3)
                    ]
                payload = encode_jpeg_lossless(
                    planes, predictor=pred, precision=prec
                )
                d = decode_jpeg(payload)
                rows.append(
                    (
                        doc, d["width"], d["height"], d["n_pixels"],
                        d["precision"], d["predictor"],
                        d["sum_y"], d["sum_r"], d["sum_g"], d["sum_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels", "precision",
                    "predictor", "sum_y", "sum_r", "sum_g", "sum_b",
                ],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, width int, height int, n_pixels long, precision int, "
        "predictor int, sum_y long, sum_r long, sum_g long, sum_b long",
    ).orderBy("doc_id")


# --- AIFF decode (r11) -------------------------------------------------------------------------

_AIFF_SQL = """
WITH params AS (
  SELECT doc_id,
         40 + doc_id % 83 AS n_samples,
         CASE doc_id % 3 WHEN 0 THEN 22050 WHEN 1 THEN 44100 ELSE 48000 END AS sample_rate
  FROM documents
),
amps AS (
  SELECT doc_id, n_samples, sample_rate,
         list_transform(generate_series(0, n_samples - 1),
                        i -> abs((doc_id * 29 + i * 13) % 65536 - 32768)) AS a
  FROM params
)
SELECT doc_id,
       CAST(sample_rate AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(n_samples * 1000000 // sample_rate AS BIGINT) AS duration_us,
       CAST(list_aggregate(a, 'sum') AS BIGINT) AS sum_abs_amplitude,
       CAST(list_aggregate(a, 'max') AS BIGINT) AS peak_amplitude
FROM amps
"""


@register("mm_decode_aiff_stats", oracle=_AIFF_SQL, tags=("multimodal", "udf"))
def mm_decode_aiff_stats(spark, sf_dir):
    """REAL AIFF decode (r11) — the big-endian FORM/COMM/SSND sibling
    of `mm_decode_wav_stats` (Mac-lineage audio interchange; the COMM
    chunk's sample rate is an 80-bit IEEE EXTENDED float, parsed
    exactly for integer rates — the field that trips ad-hoc parsers):
    deterministic mono 16-bit samples per doc encode through
    encode_aiff_pcm16 and decode back through the full chunk walk,
    offset/blockSize handling and odd-size padding; stats match the
    closed form DuckDB recomputes. AIFC and non-16-bit refuse by
    name. Partition-local Arrow batches, same scale shape as WAV."""
    from etlalchemy_spark.operators.multimodal import decode_aiff, encode_aiff_pcm16

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(40) + F.col("doc_id") % 83).cast("int").alias("n_samples"),
        F.when(F.col("doc_id") % 3 == 0, 22050)
        .when(F.col("doc_id") % 3 == 1, 44100)
        .otherwise(48000)
        .alias("sample_rate"),
    )

    def synth_and_decode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, n, rate in zip(
                pdf["doc_id"], pdf["n_samples"], pdf["sample_rate"]
            ):
                i = np.arange(int(n), dtype=np.int64)
                samples = (int(doc_id) * 29 + i * 13) % 65536 - 32768
                d = decode_aiff(encode_aiff_pcm16(samples, int(rate)))
                rows.append(
                    (
                        int(doc_id), d["sample_rate"], d["n_channels"],
                        d["n_samples"], d["duration_us"],
                        d["sum_abs_amplitude"], d["peak_amplitude"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "duration_us", "sum_abs_amplitude", "peak_amplitude",
                ],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, sample_rate int, n_channels int, n_samples bigint, "
        "duration_us bigint, sum_abs_amplitude bigint, peak_amplitude bigint",
    )


# --- TGA decode (r11) --------------------------------------------------------------------------

_TGA_SQL = """
WITH params AS (
  SELECT doc_id, 3 + doc_id % 9 AS w, 2 + doc_id % 6 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 7 + (i % w) * 3 + (i // w) * 11) % 256) AS r,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 5 + (i % w) // 2) % 256) AS g,
         list_transform(generate_series(0, w * h - 1),
                        i -> (doc_id * 3 + (i // w)) % 256) AS b
  FROM params
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(list_aggregate(r, 'sum') AS BIGINT) AS sum_r,
       CAST(list_aggregate(g, 'sum') AS BIGINT) AS sum_g,
       CAST(list_aggregate(b, 'sum') AS BIGINT) AS sum_b
FROM px
"""


@register("mm_decode_tga_stats", oracle=_TGA_SQL, tags=("multimodal", "udf"))
def mm_decode_tga_stats(spark, sf_dir):
    """REAL TGA (Truevision TARGA) decode (r11) — the game-texture /
    scanline-tool format whose RLE packets are ROW-CLAMPED by spec
    (the corruption ad-hoc readers miss): per doc the deterministic
    RGB raster encodes through encode_tga cycling raw (type 2) vs
    RLE (type 10) by doc parity and top-down vs bottom-up origin by
    doc_id % 5, then decodes back through the packet walk with the
    row-boundary guard; channel sums match DuckDB's closed form.
    The g-channel's (i % w) // 2 plateaus guarantee real multi-pixel
    runs so the RLE path is exercised, not just declared.
    Color-mapped/16/32-bit refuse by name. Arrow partition-local."""
    from etlalchemy_spark.operators.multimodal import decode_tga, encode_tga

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(3) + F.col("doc_id") % 9).cast("int").alias("w"),
        (F.lit(2) + F.col("doc_id") % 6).cast("int").alias("h"),
    )

    def synth_and_decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                doc_id, w, h = int(doc_id), int(w), int(h)
                px = [
                    [
                        (
                            (doc_id * 7 + x * 3 + y * 11) % 256,
                            (doc_id * 5 + x // 2) % 256,
                            (doc_id * 3 + y) % 256,
                        )
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                blob = encode_tga(
                    px, rle=(doc_id % 2 == 0), top_down=(doc_id % 5 != 0)
                )
                d = decode_tga(blob)
                rows.append(
                    (
                        doc_id, d["width"], d["height"], d["n_pixels"],
                        d["sum_r"], d["sum_g"], d["sum_b"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, width int, height int, n_pixels long, "
        "sum_r long, sum_g long, sum_b long",
    )


# --- netpbm P4/P5 decode (r12) -------------------------------------------------------

_PNM_SQL = """
WITH params AS (
  SELECT doc_id, 3 + doc_id % 11 AS w, 2 + doc_id % 7 AS h, doc_id % 2 = 0 AS is_pgm
  FROM documents
),
g AS (
  SELECT doc_id, w, h, is_pgm,
         list_transform(generate_series(0, w * h - 1),
                        i -> CASE WHEN is_pgm THEN (doc_id * 7 + i * 13) % 256
                                  ELSE CASE WHEN (doc_id + i) % 3 = 0 THEN 1 ELSE 0 END
                             END) AS px
  FROM params
)
SELECT doc_id,
       CASE WHEN is_pgm THEN 'pgm' ELSE 'pbm' END AS format,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(CASE WHEN is_pgm THEN list_aggregate(px, 'sum')
                 ELSE 255 * (w * h - list_aggregate(px, 'sum')) END AS BIGINT) AS sum_gray,
       CAST(CASE WHEN is_pgm THEN -1 ELSE list_aggregate(px, 'sum') END AS BIGINT) AS n_black
FROM g
"""


@register("mm_decode_pnm_stats", oracle=_PNM_SQL, tags=("multimodal", "udf"))
def mm_decode_pnm_stats(spark, sf_dir):
    """Binary netpbm family COMPLETED (r12): P5 graymaps and P4
    packed-bit bitmaps (rows byte-padded, MSB-first, 1 = black — the
    ink convention) decode alongside the existing P6 path, alternating
    per doc. The encode->decode round trip runs against a closed-form
    pixel oracle (deterministic gray ramp / every-third-bit ink
    pattern); third-party CPython fixtures pin the same decoders in
    tests/test_thirdparty_golden.py so the parser is proven on bytes
    no in-house writer produced. Partition-local Arrow batches,
    summary rows only."""
    from etlalchemy_spark.operators.multimodal import (
        decode_pbm,
        decode_pgm,
        encode_pbm_p4,
        encode_pgm_p5,
    )

    params = _spread_docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(3) + F.col("doc_id") % 11).cast("int").alias("w"),
        (F.lit(2) + F.col("doc_id") % 7).cast("int").alias("h"),
        (F.col("doc_id") % 2 == 0).alias("is_pgm"),
    )

    def synth_and_decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, w, h, is_pgm in zip(
                pdf["doc_id"], pdf["w"], pdf["h"], pdf["is_pgm"]
            ):
                doc, w, h = int(doc_id), int(w), int(h)
                if bool(is_pgm):
                    px = [
                        [(doc * 7 + (r * w + c) * 13) % 256 for c in range(w)]
                        for r in range(h)
                    ]
                    d = decode_pgm(encode_pgm_p5(px))
                    rows.append(
                        (doc, d["format"], d["width"], d["height"],
                         d["n_pixels"], d["sum_gray"], -1)
                    )
                else:
                    bits = [
                        [1 if (doc + r * w + c) % 3 == 0 else 0 for c in range(w)]
                        for r in range(h)
                    ]
                    d = decode_pbm(encode_pbm_p4(bits))
                    rows.append(
                        (doc, d["format"], d["width"], d["height"],
                         d["n_pixels"], d["sum_gray"], d["n_black"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "width", "height", "n_pixels",
                         "sum_gray", "n_black"],
            )

    return params.mapInPandas(
        synth_and_decode,
        "doc_id long, format string, width int, height int, n_pixels long, "
        "sum_gray long, n_black long",
    ).orderBy("doc_id")
