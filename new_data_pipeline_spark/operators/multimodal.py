"""Multimodal columns: opaque binary payloads + typed metadata structs,
with Arrow-batched decode/feature stages.

Reference analogs (SURVEY.md §1.2): ``ImgData`` carries
(height, width, channels, float32 bytes) and ``VideoData`` adds
(frames, duration) — reference datum.proto:10-31; the reference decodes
with cv2 in the reader thread (serialize.py:34). Here the payload is a
``binary`` column and metadata a struct column (the Spark `image`
source convention), and decode/resize/frame-sample run as Arrow-batched
``mapInPandas`` stages.

The container has no native image/audio codecs (no cv2/PIL), but PNG
needs only stdlib zlib: ``decode_images`` really decodes PNG payloads
(functions/png_codec.py) and falls back to deterministic byte stats for
foreign formats. The Spark-side plumbing — schema, batch iteration,
partitioning — is identical on both paths.

Scale design: binary payloads ride normal parquet columns (dictionary-
off, large row groups); metadata predicates (width ≥ X) prune via
parquet stats WITHOUT touching payload bytes thanks to parquet's
columnar layout — the query below demonstrates metadata-only pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark import catalog
from new_data_pipeline_spark.registry import register

IMG_META_SCHEMA = ("doc_id bigint, height int, width int, channels int, "
                   "n_bytes bigint, mean_byte double")


def synthesize_image_column(docs: DataFrame) -> DataFrame:
    """Fake multimodal table: text bytes stand in for an encoded image;
    metadata derived deterministically from doc_id. At ingest time the
    real pipeline fills these from the container format (S4 scan)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), 4) * 32 + 64).cast("int").alias("height"),
            (F.pmod(F.col("doc_id"), 3) * 64 + 64).cast("int").alias("width"),
            F.lit(3).alias("channels"),
        ).alias("meta"))


def decode_images(df: DataFrame, payload_col: str = "payload",
                  meta_col: str = "meta") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (payload, meta) batches.

    PNG payloads get a REAL pixel decode (pure-stdlib codec,
    functions/png_codec.py — signature check, IDAT inflate, all five
    scanline unfilters) and report decoded geometry + pixel statistics.
    Non-PNG payloads fall back to deterministic byte statistics with
    metadata passthrough (cv2/PIL absent in this container; a real
    deployment registers its codec in _DECODERS behind the same
    signature). Either way the UDF contract — schema in/out, Arrow
    batch iteration, no driver collect — is the production shape.
    """
    from new_data_pipeline_spark.functions.png_codec import decode_png, is_png

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            meta = pdf[meta_col]
            heights, widths, chans, n_bytes, means = [], [], [], [], []
            for m, b in zip(meta, payloads):
                b = bytes(b)
                if is_png(b):
                    h, w, c, pix = decode_png(b)
                    heights.append(h)
                    widths.append(w)
                    chans.append(c)
                    n_bytes.append(len(pix))
                    means.append(sum(pix) / len(pix) if pix else 0.0)
                else:
                    heights.append(m["height"])
                    widths.append(m["width"])
                    chans.append(m["channels"])
                    n_bytes.append(len(b))
                    means.append(sum(b) / len(b) if len(b) else 0.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "height": heights,
                "width": widths,
                "channels": chans,
                "n_bytes": n_bytes,
                "mean_byte": means,
            })

    return df.mapInPandas(batches, schema=IMG_META_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """VideoData descendant: frame sampling as a plan transform — emit
    one row per sampled frame index from (frames, duration) metadata.
    Decode is the same stub boundary as decode_images."""
    return (df.select("doc_id", "meta",
                      F.explode(F.sequence(
                          F.lit(0),
                          F.col("meta.height") - 1,  # stands in for frame count
                          F.lit(every_n))).alias("frame_idx")))


@register(
    "multimodal_metadata_stats",
    oracle="""
    WITH img AS (
      SELECT doc_id,
             encode(text) AS payload,
             (doc_id % 4) * 32 + 64 AS height,
             (doc_id % 3) * 64 + 64 AS width,
             3 AS channels
      FROM documents
    )
    SELECT CAST(height AS INTEGER) AS height,
           CAST(width AS INTEGER) AS width,
           COUNT(*) AS n_images,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           CAST(SUM(height * width * channels) AS BIGINT) AS total_pixels
    FROM img
    WHERE width >= 128
    GROUP BY 1, 2
    """,
    tags=("multimodal",),
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over a multimodal column: the filter
    and grouping touch only the struct metadata, so at scale the
    payload column is never read (columnar pruning) — the plan reads
    2 small columns out of a table that is 99% binary payload."""
    docs = catalog.load(spark, sf_dir, "documents")
    img = synthesize_image_column(docs)
    return (img
            .filter(F.col("meta.width") >= 128)
            .groupBy(F.col("meta.height").alias("height"),
                     F.col("meta.width").alias("width"))
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum(F.octet_length("payload")).cast("bigint")
                  .alias("total_bytes"),
                 F.sum(F.col("meta.height").cast("bigint")
                       * F.col("meta.width") * F.col("meta.channels"))
                  .cast("bigint").alias("total_pixels")))


@register(
    "multimodal_decode_stats",
    oracle="""
    SELECT doc_id,
           CAST((doc_id % 4) * 32 + 64 AS INTEGER) AS height,
           CAST((doc_id % 3) * 64 + 64 AS INTEGER) AS width,
           3 AS channels,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                ELSE CAST(list_sum([ascii(c) for c in string_split(text, '')])
                          AS DOUBLE) / octet_length(encode(text))
           END AS mean_byte
    FROM documents
    """,
    tags=("multimodal", "decode", "arrow"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow decode path under the VALUE gate: synthesize the
    multimodal table, run the ``decode_images`` mapInPandas stage (the
    production UDF contract with the codec body stubbed), and emit its
    per-image statistics. The corpus is pure ASCII, so the stub's
    byte-sum statistics replay exactly in SQL (ascii(c) per char =
    payload byte), turning the decode *plumbing* — schema, Arrow batch
    iteration, struct access — into a hash-gated component instead of a
    rows-only check.
    """
    docs = catalog.load(spark, sf_dir, "documents")
    return decode_images(synthesize_image_column(docs))
