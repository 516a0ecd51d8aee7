"""spark-submit entry point for the extraction pipeline.

Usage (the north-rule deployment path):

    zip -qr xqspark.zip xqspark
    spark-submit --master <cluster> --py-files xqspark.zip \
        examples/submit_extract.py --pages <in> --out <dir> \
        --mode xpath-single --query //title [--buckets 256]

Re-running after a kill replays only unfinished part_keys (manifest
anti-join), and re-written partitions replace rather than append
(dynamic partition overwrite) — exactly-once results per part_key.
"""

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", required=True, help="pages table path (parquet or iceberg:<tbl>)")
    parser.add_argument("--out", required=True, help="output dir (results/ + manifest/)")
    parser.add_argument("--mode", default="xpath-single")
    parser.add_argument("--query", default="//title")
    parser.add_argument("--buckets", type=int, default=256)
    parser.add_argument("--salts", type=int, default=None)
    args = parser.parse_args()

    spark = (
        SparkSession.builder.appName("xqspark-extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .getOrCreate()
    )
    from xqspark.pipeline import read_pages, run_with_resume

    pages = read_pages(spark, args.pages)
    stats = run_with_resume(
        pages, args.out, mode=args.mode, query=args.query,
        n_buckets=args.buckets, salts=args.salts,
    )
    print(f"xqspark-extract: {stats}")
    spark.stop()


if __name__ == "__main__":
    main()
