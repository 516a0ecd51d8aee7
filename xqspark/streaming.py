"""Structured Streaming extraction — continuous crawl ingestion.

The reference processes a finite file list; the streaming analog is a
continuous pages source (new WARC-derived parquet dropping into a
directory, or Kafka) flowing through the SAME extraction UDFs:

    readStream(pages) -> salted columns -> mapInPandas(extract)
        -> (a) append sink of per-url extracted text
        -> (b) watermarked per-window lineage counts (late data bounded)

mapInPandas and pandas UDFs are streaming-safe (stateless per batch); the
lineage aggregate is the only stateful operator and uses a watermark so
state is evicted at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import PAGES_SCHEMA, extract_pages, with_host_salt, with_part_key


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-drop source with bounded per-trigger intake (backpressure)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(
    pages: DataFrame,
    mode: str = "xpath-single",
    query: str = "//title",
    salts: int = 16,
    n_buckets: int = 256,
) -> DataFrame:
    """Streaming extraction: same UDF path as batch, no shuffle before the
    map (repartition of an unbounded stream would force a stateful
    exchange per microbatch; salting still feeds the part_key)."""
    return extract_pages(
        pages, mode=mode, query=query, salts=salts, n_buckets=n_buckets,
        repartition_to=0,
    )


def windowed_lineage(
    pages: DataFrame,
    extracted: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-event-time-window lineage over the raw stream: docs and bytes
    per (window, part_key), late data bounded by the watermark."""
    keyed = with_part_key(with_host_salt(pages), 256).withWatermark(
        "warc_ts", watermark
    )
    return keyed.groupBy(
        F.window("warc_ts", window).alias("win"), "part_key"
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length(F.col("html"))).alias("bytes"),
    )


def run_stream_to_parquet(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    mode: str = "xpath-single",
    query: str = "//title",
):
    """Continuous extraction job with exactly-once file sink + checkpoint
    (the streaming analog of batch run_with_resume)."""
    extracted = extract_stream(pages_stream, mode=mode, query=query)
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
