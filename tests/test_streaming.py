"""Structured Streaming extraction tests: file-drop source -> extract ->
exactly-once parquet sink with checkpoint; windowed lineage with watermark."""

import shutil
import tempfile

import pytest

from xqspark.pipeline import build_session, synthesize_pages
from xqspark.streaming import read_pages_stream, run_stream_to_parquet, windowed_lineage


@pytest.fixture(scope="module")
def spark():
    s = build_session(cpus=4, app="xq-streaming-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_extraction_end_to_end(spark):
    base = tempfile.mkdtemp(prefix="xq_stream_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    try:
        pages = synthesize_pages(spark, n_rows=200, n_hosts=10)
        pages.coalesce(2).write.parquet(src)

        stream = read_pages_stream(spark, src)
        assert stream.isStreaming
        q = run_stream_to_parquet(stream, out, ckpt)
        q.awaitTermination(300)

        result = spark.read.parquet(out)
        assert result.count() == 200
        row = result.filter("url like '%/p7'").collect()[0]
        assert row["extracted"] == "Page 7\n"
        assert row["error"] is None

        # restart with no new files: checkpoint prevents reprocessing
        q2 = run_stream_to_parquet(read_pages_stream(spark, src), out, ckpt)
        q2.awaitTermination(300)
        assert spark.read.parquet(out).count() == 200
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_windowed_lineage_plan(spark):
    base = tempfile.mkdtemp(prefix="xq_wl_")
    try:
        src = f"{base}/src"
        synthesize_pages(spark, n_rows=100, n_hosts=5).write.parquet(src)
        stream = read_pages_stream(spark, src)
        lin = windowed_lineage(stream, window="1 hour", watermark="2 hours")
        assert lin.isStreaming
        q = (
            lin.writeStream.format("memory")
            .queryName("lineage_mem")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.sql("select * from lineage_mem").collect()
        assert sum(r["docs"] for r in rows) == 100
        assert all(r["bytes"] > 0 for r in rows)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_stateful_dedup_across_microbatches(spark):
    """applyInPandasWithState: a url seen in batch 1 is suppressed when it
    reappears in batch 2 (state survives across microbatches)."""
    import pyspark.sql.functions as F
    from xqspark.streaming import dedup_stream

    base = tempfile.mkdtemp(prefix="xq_dedup_")
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    try:
        pages = synthesize_pages(spark, n_rows=100, n_hosts=5)
        pages.coalesce(1).write.parquet(src)  # file 1
        # file 2: 50 duplicate urls + 20 fresh ones (ids 100..119)
        dup = pages.limit(50)
        fresh = synthesize_pages(spark, n_rows=120, n_hosts=5).filter("url like '%/p1__'")
        dup.union(fresh).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(pages.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        deduped = dedup_stream(stream)
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_mem")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.sql("select url from dedup_mem").collect()
        urls = [r["url"] for r in got]
        assert len(urls) == len(set(urls)), "duplicates leaked through"
        assert len(urls) == 120  # 100 originals + 20 fresh, 50 dups dropped
    finally:
        shutil.rmtree(base, ignore_errors=True)
