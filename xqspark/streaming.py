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
    salts: int | None = None,
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


def _bloom_indexes(url: str, n_bits: int, k: int = 4) -> list[int]:
    """k bit positions via double hashing (h1 + i*h2) from the two md5
    halves — supports ANY k (a fixed 4-byte slicing would silently
    degenerate past k=4) and is deterministic across processes/restarts
    (builtin hash() depends on PYTHONHASHSEED and would silently
    invalidate persisted state)."""
    import hashlib

    d = hashlib.md5(url.encode("utf-8", "surrogateescape")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd: full-period stride
    return [(h1 + i * h2) % n_bits for i in range(k)]


def _bloom_has(buf, idxs) -> bool:
    return all(buf[i >> 3] & (1 << (i & 7)) for i in idxs)


def _bloom_add(buf: bytearray, idxs) -> None:
    for i in idxs:
        buf[i >> 3] |= 1 << (i & 7)


def dedup_stream(
    pages: DataFrame,
    ttl_minutes: int = 0,
    bloom_bits: int = 1 << 20,
    bloom_hashes: int = 4,
) -> DataFrame:
    """Custom stateful operator: cross-microbatch first-seen URL dedup,
    keyed by url-host, via applyInPandasWithState.

    State per host is BOUNDED at 2 x bloom_bits/8 bytes regardless of how
    many URLs the host has seen: two rotating-generation Bloom filters
    (current + previous). When the current generation reaches its
    capacity (bloom_bits/16 inserts ~= 0.25 fill at k=4, ~0.2% false-
    positive rate), it rotates to previous and a fresh one starts —
    membership checks consult both, so recently-seen URLs keep deduping
    while ancient ones age out (sliding-generation semantics). A false
    positive drops a never-seen URL as a duplicate; at crawl scale that
    trade (0.2% loss for O(1) state on a 10^8-url host) is the standard
    one. For exact small-scale dedup use batch `dedup_groups`.

    ttl_minutes > 0 adds ProcessingTimeTimeout whole-state eviction for
    long-running continuous jobs. Leave it 0 for availableNow/batch-drain
    runs: with a processing-time timeout, Spark keeps scheduling
    "no new data but cleaning up state" batches until the TTL fires,
    so a drain-and-stop trigger never terminates.

    UPGRADE NOTE (round 2): the state schema changed from the unbounded
    ``seen: array<binary>`` to the bounded ``(cur, prev, n_cur)`` Bloom
    generations. Streaming checkpoints written by the old operator are
    incompatible — discard the checkpoint directory (reprocess from the
    source) when upgrading; resuming on old state will fail or misread.
    Behavior also shifts from exact dedup to ~0.2%-false-positive dedup
    (a never-seen URL can be dropped), the standard trade for O(1) state."""
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
    state_schema = T.StructType(
        [
            T.StructField("cur", T.BinaryType()),
            T.StructField("prev", T.BinaryType()),
            T.StructField("n_cur", T.LongType()),
        ]
    )
    # rotation capacity keeps fill ~= k*n/bits at 0.25 for ANY k
    capacity = max(1, bloom_bits // (4 * bloom_hashes))
    n_bytes = bloom_bits >> 3

    def dedup(key, batches, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cur_b, prev_b, n_cur = state.get
            cur = bytearray(cur_b)
            prev = bytes(prev_b)
        else:
            cur, prev, n_cur = bytearray(n_bytes), bytes(n_bytes), 0
        for batch in batches:
            mask = []
            for url in batch["url"]:
                idxs = _bloom_indexes(url, bloom_bits, bloom_hashes)
                if _bloom_has(cur, idxs) or _bloom_has(prev, idxs):
                    mask.append(False)
                    continue
                _bloom_add(cur, idxs)
                n_cur += 1
                if n_cur >= capacity:  # rotate generations
                    prev = bytes(cur)
                    cur = bytearray(n_bytes)
                    n_cur = 0
                mask.append(True)
            fresh = batch[pd.Series(mask, index=batch.index)]
            if len(fresh):
                yield fresh[["url", "warc_ts", "html", "lang"]]
        state.update((bytes(cur), prev, n_cur))
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
