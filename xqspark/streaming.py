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


def dedup_stream(pages: DataFrame, ttl_minutes: int = 0) -> DataFrame:
    """Custom stateful operator: cross-microbatch first-seen URL dedup,
    keyed by url-host, via applyInPandasWithState. Per host the state
    holds a seen-set of url hashes; only first-seen rows pass through —
    the streaming analog of dropDuplicates with bounded state.

    ttl_minutes > 0 enables ProcessingTimeTimeout state eviction for
    long-running continuous jobs. Leave it 0 for availableNow/batch-drain
    runs: with a processing-time timeout, Spark keeps scheduling
    "no new data but cleaning up state" batches until the TTL fires,
    so a drain-and-stop trigger never terminates."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    # full 16-byte digests (not truncated ints): collisions would silently
    # drop distinct URLs as "duplicates"
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.BinaryType()))]
    )

    import hashlib

    def _url_hash(url: str) -> bytes:
        # deterministic across processes/restarts (builtin hash() depends
        # on PYTHONHASHSEED and would silently invalidate persisted state)
        return hashlib.md5(url.encode("utf-8", "surrogateescape")).digest()

    def dedup(key, batches, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = set(bytes(b) for b in state.get[0]) if state.exists else set()
        for batch in batches:
            mask = []
            for url in batch["url"]:
                h = _url_hash(url)
                if h in seen:
                    mask.append(False)
                else:
                    seen.add(h)
                    mask.append(True)
            fresh = batch[pd.Series(mask, index=batch.index)]
            if len(fresh):
                yield fresh[["url", "warc_ts", "html", "lang"]]
        state.update((list(seen),))
        if ttl_minutes > 0:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes > 0
        else GroupStateTimeout.NoTimeout
    )
    keyed = with_host_salt(pages).select("host", "url", "warc_ts", "html", "lang")
    return keyed.groupBy("host").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
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
