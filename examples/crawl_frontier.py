"""spark-submit entry point: crawl-frontier construction from WARC input.

    zip -qr xqspark.zip xqspark
    spark-submit --master <cluster> --py-files xqspark.zip \
        examples/crawl_frontier.py --warc <dir-of-warc-files> --out <dir>

Stages (all engine components, each scale-shaped):
  1. WARC source          — pipeline.read_warc (binaryFile -> mapInPandas,
                            per-file error containment)
  2. outlink extraction   — one parse per page via udfs.make_link_pairs_udf
                            (real WHATWG tree + CSS 'a[href]')
  3. robots politeness    — core/robots.py RFC 9309 decisions, one parse
                            of each host's robots.txt applied to all its
                            candidate paths (demo: an embedded policy)
  4. frontier dedup + out — first-seen per normalized URL, salted by host

Prints one JSON line of per-stage counts.
"""

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--warc", required=True, help="dir of .warc/.warc.gz")
    parser.add_argument("--out", required=True)
    parser.add_argument(
        "--robots",
        default="User-agent: *\nDisallow: /private\nAllow: /\n",
        help="robots.txt policy applied to every candidate (demo stand-in "
        "for a per-host robots table)",
    )
    args = parser.parse_args()

    spark = (
        SparkSession.builder.appName("xqspark-crawl-frontier")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from pyspark.sql import Window as W

    from xqspark.pipeline import read_warc
    from xqspark.udfs import make_link_pairs_udf, make_robots_udf

    counts = {}
    pages = read_warc(spark, args.warc)
    counts["pages"] = pages.count()

    links = make_link_pairs_udf("a", "href")
    outlinks = pages.select(
        F.col("url").alias("src"),
        F.explode(links(F.col("html"))).alias("l"),
    ).select("src", F.col("l.href").alias("href"))
    counts["outlinks"] = outlinks.count()

    # resolve relative hrefs against the source host; drop fragments
    host = F.parse_url("src", F.lit("HOST"))
    resolved = outlinks.select(
        "src",
        F.when(
            F.col("href").startswith("/"),
            F.concat(F.lit("http://"), host, F.col("href")),
        )
        .otherwise(F.col("href"))
        .alias("target"),
    ).withColumn("target", F.regexp_replace("target", "#.*$", ""))

    allowed = make_robots_udf("xqbot")
    checked = resolved.withColumn(
        "path", F.coalesce(F.parse_url("target", F.lit("PATH")), F.lit("/"))
    ).withColumn(
        "ok",
        F.element_at(
            allowed(F.lit(args.robots), F.array(F.col("path"))), 1
        ),
    )
    polite = checked.filter(F.col("ok")).select("src", "target")
    counts["allowed"] = polite.count()

    # frontier: first-seen per target, salted repartition by target host
    w = W.partitionBy("target").orderBy("src")
    frontier = (
        polite.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("target", F.col("src").alias("discovered_via"))
    )
    frontier.repartition(
        F.parse_url("target", F.lit("HOST"))
    ).write.mode("overwrite").parquet(args.out)
    counts["frontier"] = spark.read.parquet(args.out).count()
    print("xqspark-crawl-frontier: " + json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
