"""Multimodal-column inventory: binary payload metadata is oracle-
checked (md5/octet_length agree across engines); the mapInPandas
feature extraction is rows-only (Python UDF, no SQL equivalent) with
determinism asserted in tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators import multimodal as MM


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS mime
    FROM documents
    """,
    notes="binary payload + typed metadata columns; digest/length identical across engines",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = MM.attach_binary(table(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
        F.col("meta.mime").alias("mime"),
    )


@query(
    "multimodal_decode_features",
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    nib AS (
      SELECT doc_id, n,
             list_transform(range(1, CAST(n AS INT) + 1),
                            i -> substr(hx, CAST(2 * i AS INT), 1)) AS lows
      FROM h
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
           len(list_filter(lows, c -> c = '0')) / greatest(n, 1) AS f0,
           len(list_filter(lows, c -> c = '8')) / greatest(n, 1) AS f8
    FROM nib
    """,
    notes=(
        "Arrow-batched mapInPandas feature extraction over binary "
        "payloads, hash-green since r10 (was rows-only): the stub "
        "decoder's 16-bin histogram bins bytes by LOW NIBBLE "
        "(byte % 16), which SQL reads directly as the hex digit at "
        "each even position of hex(payload) — no byte iteration "
        "needed. count/total is an exact int division in both engines, "
        "so the doubles hash-match without rounding. (decode_image went "
        "REAL in r17 — see multimodal_image_decode below)"
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = MM.attach_binary(table(spark, sf_dir, "documents"))
    feats = MM.decode_features(docs)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 9).alias("f8"),
    )


@query(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    notes=(
        "driver-checkable companion to multimodal_decode_features: the "
        "metadata columns the mapInPandas decoder emits (doc_id, byte "
        "length), hashable by the SQL oracle — verifies the Arrow batch "
        "round-trip preserves every row and the payload length"
    ),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = MM.attach_binary(table(spark, sf_dir, "documents"))
    return MM.decode_features(docs).select("doc_id", "n_bytes")


@query(
    "multimodal_frame_sample_stats",
    oracle="""
    SELECT doc_id,
           CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64) AS INT) AS n_frames,
           CAST(ceil(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64) / 4) AS BIGINT) AS n_sampled
    FROM documents
    WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ORDER BY doc_id
    """,
    notes=(
        "frame-sampling plumbing through the driver gate: the mapInPandas "
        "sampler chunks each payload into 64-byte frames and keeps every "
        "4th; per-doc frame/sample counts are length-derivable, so the SQL "
        "oracle hash-checks that the Arrow-batched fan-out emits exactly "
        "the right rows (byte-exactness of the slices is asserted in "
        "tests/test_textbatch.py::TestFrameSampling)"
    ),
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = MM.attach_binary(table(spark, sf_dir, "documents"))
    frames = MM.sample_frames(docs, frame_bytes=64, every_k=4)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.first("n_frames").alias("n_frames"),
            F.count(F.lit(1)).alias("n_sampled"),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_image_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 200
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h, xs.x, ys.y
      FROM d, UNNEST(range(d.w)) AS xs(x), UNNEST(range(d.h)) AS ys(y)
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           3 AS n_channels,
           CAST(SUM((x*17 + doc_id) % 256) AS BIGINT) AS ch0_sum,
           CAST(SUM((y*29) % 256) AS BIGINT)          AS ch1_sum,
           CAST(SUM((x + y) % 256) AS BIGINT)         AS ch2_sum
    FROM px
    GROUP BY doc_id, w, h
    ORDER BY doc_id
    """,
    notes=(
        "REAL image decode over a PNG binary column (r17 — closes the "
        "r16 verdict probe task): synthetic_png_payloads encodes a "
        "deterministic RGB tile per doc (pixel formula closed-form), "
        "decode_image (pure zlib+numpy PNG decoder, Arrow-batched "
        "mapInPandas, map-only) recovers dims + exact per-channel "
        "pixel sums, and the SQL oracle recomputes the same sums from "
        "the pixel formula via a lateral pixel grid — a full "
        "encode/decode roundtrip verified by independent arithmetic. "
        "Cross-decoder parity with the JVM javax.imageio source is "
        "pinned in tests/test_textbatch.py::TestImageCodec"
    ),
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = MM.synthetic_png_payloads(docs)
    decoded = MM.decode_image(payloads)
    return decoded.select(
        "doc_id", "width", "height", "n_channels",
        "ch0_sum", "ch1_sum", "ch2_sum",
    ).orderBy("doc_id")


@query(
    "multimodal_image_source_scan",
    oracle="""
    SELECT n_nationkey,
           CAST(2 + n_nationkey % 9 AS INT) AS width,
           CAST(2 + n_nationkey % 6 AS INT) AS height,
           3 AS n_channels,
           16 AS mode
    FROM nation
    ORDER BY n_nationkey
    """,
    notes=(
        "Spark's built-in `image` data source (bundled mllib jars, JVM "
        "javax.imageio — probed working jar-free in this container, r17): "
        "the entry writes one deterministic PNG per nation row to a "
        "temp dir, scans it with read_images, recovers the key from the "
        "file name, and the oracle recomputes the expected dimensions "
        "arithmetically. mode 16 = CV_8UC3 (8-bit 3-channel), the "
        "constant the source emits for RGB"
    ),
)
def multimodal_image_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    import numpy as np

    keys = [int(r[0]) for r in table(spark, sf_dir, "nation").select("n_nationkey").collect()]
    # deterministic content => a content-keyed fixture dir is safe to
    # reuse across invocations (bench runs this 5+ times per session;
    # a fresh mkdtemp per call would litter /tmp unboundedly)
    tag = hashlib.md5(("img_scan_v1:" + ",".join(map(str, sorted(keys)))).encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"strake_img_scan_{tag}")
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        path = os.path.join(out_dir, f"img_{k:03d}.png")
        if os.path.exists(path):
            continue
        w, h = 2 + k % 9, 2 + k % 6
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0] = k % 256
        img[:, :, 1] = (k * 7) % 256
        img[:, :, 2] = (k * 13) % 256
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(MM.encode_png(img))
        os.replace(tmp, path)  # atomic: concurrent callers never scan a partial file
    scanned = MM.read_images(spark, out_dir).filter(
        # a crashed writer could leave a *.png.tmp behind; only scan
        # rows whose origin is a completed fixture file
        F.col("origin").rlike(r"img_\d+\.png$")
    )
    return scanned.select(
        F.regexp_extract("origin", r"img_(\d+)\.png", 1)
        .cast("int")
        .alias("n_nationkey"),
        "width",
        "height",
        "n_channels",
        "mode",
    ).orderBy("n_nationkey")


@query(
    "multimodal_audio_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 16 AS n, 8000 + 100 * (doc_id % 5) AS rate
      FROM documents WHERE doc_id < 300
    ),
    s AS (
      SELECT d.doc_id, d.n, d.rate,
             ((i.i * 37 + d.doc_id * 11) % 201) - 100 AS v
      FROM d, UNNEST(range(d.n)) AS i(i)
    )
    SELECT doc_id,
           CAST(rate AS INT) AS sample_rate,
           1 AS n_channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST(MAX(abs(v)) AS INT) AS peak,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           sqrt(CAST(SUM(v * v) AS DOUBLE) / n) AS rms
    FROM s
    GROUP BY doc_id, rate, n
    ORDER BY doc_id
    """,
    notes=(
        "REAL audio decode over a WAV/PCM binary column (r18 — the "
        "audio analogue of multimodal_image_decode, registration "
        "queued from r17): synthetic_wav_payloads encodes a "
        "deterministic mono 16-bit PCM clip per doc (closed-form "
        "sample formula), decode_audio (pure struct+numpy RIFF parser, "
        "Arrow-batched mapInPandas, map-only) recovers rate/frames "
        "plus exact integer peak and sum-of-squares, and the SQL "
        "oracle recomputes them via a lateral sample grid. rms = sqrt "
        "of a ratio of exact ints — correctly rounded on both engines, "
        "so even the float column is bit-stable"
    ),
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    payloads = MM.synthetic_wav_payloads(docs)
    decoded = MM.decode_audio(payloads)
    return decoded.select(
        "doc_id", "sample_rate", "n_channels", "n_frames",
        "peak", "sum_sq", "rms",
    ).orderBy("doc_id")


@query(
    "multimodal_image_resize",
    oracle="""
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 200
    ),
    g AS (
      SELECT d.doc_id,
             CAST(floor(((2 * xs.x + 1) * d.w) / 8.0) AS BIGINT) AS sx,
             CAST(floor(((2 * ys.y + 1) * d.h) / 6.0) AS BIGINT) AS sy
      FROM d, UNNEST(range(4)) AS xs(x), UNNEST(range(3)) AS ys(y)
    )
    SELECT doc_id,
           4 AS width,
           3 AS height,
           3 AS n_channels,
           CAST(SUM((sx * 17 + doc_id) % 256) AS BIGINT) AS ch0_sum,
           CAST(SUM((sy * 29) % 256) AS BIGINT)          AS ch1_sum,
           CAST(SUM((sx + sy) % 256) AS BIGINT)          AS ch2_sum
    FROM g
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    notes=(
        "REAL nearest-neighbor image resize verified end-to-end (r18): "
        "encode (synthetic PNG) -> resize_images (decode, NN resample "
        "to 4x3 via index = floor((i+0.5)*src/dst), re-encode) -> "
        "decode_image again for exact channel sums; the SQL oracle "
        "recomputes the SAME sums from the closed-form source-pixel "
        "formula through the NN index map — a double PNG roundtrip "
        "checked by independent integer arithmetic. The /8.0 and /6.0 "
        "index divisions are small-int quotients whose floor both "
        "engines round identically (numerators exact, integers exactly "
        "representable)"
    ),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = MM.synthetic_png_payloads(docs)
    resized = MM.resize_images(payloads, width=4, height=3)
    redecoded = MM.decode_image(
        resized.select("doc_id", F.col("resized").alias("payload"))
    )
    return redecoded.select(
        "doc_id", "width", "height", "n_channels",
        "ch0_sum", "ch1_sum", "ch2_sum",
    ).orderBy("doc_id")


@query(
    "multimodal_binaryfile_image_decode",
    oracle="""
    WITH d AS (
      SELECT CAST(n_nationkey AS BIGINT) AS doc_id,
             1 + n_nationkey % 7 AS w,
             1 + n_nationkey % 5 AS h
      FROM nation
    ),
    px AS (
      SELECT d.doc_id, d.w, d.h, xs.x, ys.y
      FROM d, UNNEST(range(d.w)) AS xs(x), UNNEST(range(d.h)) AS ys(y)
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           3 AS n_channels,
           CAST(SUM((x * 17 + doc_id) % 256) AS BIGINT) AS ch0_sum,
           CAST(SUM((y * 29) % 256) AS BIGINT)          AS ch1_sum,
           CAST(SUM((x + y) % 256) AS BIGINT)           AS ch2_sum
    FROM px
    GROUP BY doc_id, w, h
    ORDER BY doc_id
    """,
    notes=(
        "the file-scan INGESTION path chained into decode (r18): one "
        "deterministic PNG per nation row on local disk, scanned with "
        "Spark's built-in binaryFile source (pathGlobFilter pushdown — "
        "the listing never returns non-matching files; content-column "
        "pruning asserted in tests/test_plan_shapes.py), content "
        "aliased to payload and decoded by the pure zlib+numpy PNG "
        "decoder; the oracle recomputes dims + channel sums from the "
        "pixel formula. Same content-keyed fixture-dir reuse as "
        "multimodal_image_source_scan (bench runs entries repeatedly)"
    ),
)
def multimodal_binaryfile_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    import numpy as np

    keys = [
        int(r[0])
        for r in table(spark, sf_dir, "nation").select("n_nationkey").collect()
    ]
    tag = hashlib.md5(
        ("binimg_v1:" + ",".join(map(str, sorted(keys)))).encode()
    ).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"strake_binimg_{tag}")
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        path = os.path.join(out_dir, f"img_{k:03d}.png")
        if os.path.exists(path):
            continue
        w, h = 1 + k % 7, 1 + k % 5
        x = np.arange(w)
        y = np.arange(h)
        img = np.stack(
            [
                np.broadcast_to((x * 17 + k) % 256, (h, w)),
                np.broadcast_to(((y * 29) % 256)[:, None], (h, w)),
                np.add.outer(y, x) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(MM.encode_png(img))
        os.replace(tmp, path)  # atomic: concurrent callers never scan a partial file
    bf = MM.read_binary_files(spark, out_dir, glob="img_*.png")
    payloads = bf.select(
        F.regexp_extract("path", r"img_(\d+)\.png", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    decoded = MM.decode_image(payloads)
    return decoded.select(
        "doc_id", "width", "height", "n_channels",
        "ch0_sum", "ch1_sum", "ch2_sum",
    ).orderBy("doc_id")
