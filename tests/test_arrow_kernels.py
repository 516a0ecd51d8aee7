"""r6 optimization guards: the Arrow kernels that replaced per-row JVM
HOF shapes (winnow fingerprints, simhash, LSH-scale minhash) must stay
BIT-IDENTICAL to the original expressions — same md5 digests, exact
integer math. Each test recomputes the r5 JVM shape inline and compares
against the kernel-backed operator on the sf0.01 corpus."""

import pytest
from pyspark.sql import functions as F

from xqspark.pipeline import build_session
from xqspark.queries import (
    QUERIES,
    _MERSENNE31,
    _docs,
    _mh_params,
    _winnow_fps,
    minhash_sig_df,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = build_session(cpus=4, app="xq-kernel-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _toks(spark, min_size):
    return (
        _docs(spark, SF_DIR)
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
        .withColumn("t", F.expr("filter(t, x -> x != '')"))
        .filter(F.size("t") >= min_size)
    )


def test_winnow_fps_kernel_matches_jvm_hofs(spark):
    grams = _toks(spark, 6).select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(t) - 3), i -> "
            "cast(conv(substring(md5(encode(concat(t[i], ' ', t[i + 1], "
            "' ', t[i + 2]), 'UTF-8')), 1, 8), 16, 10) as bigint))"
        ).alias("h"),
    )
    jvm = grams.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(0, size(h) - 4), "
            "j -> array_min(slice(h, j + 1, 4))))"
        ).alias("fps"),
    )
    # the kernel emits the set SORTED; compare as sets (every consumer
    # is order-insensitive: size/min/xor aggregates, exploded join)
    old = {r["doc_id"]: frozenset(r["fps"]) for r in jvm.collect()}
    new = {
        r["doc_id"]: frozenset(r["fps"])
        for r in _winnow_fps(spark, SF_DIR).collect()
    }
    assert old == new and len(old) == 500


def test_simhash_kernel_matches_jvm_aggregates(spark):
    hashed = _toks(spark, 1).select(
        "doc_id",
        F.size("t").alias("n"),
        F.expr("transform(t, tok -> md5(encode(tok, 'UTF-8')))").alias("hs"),
    )
    words = hashed.select(
        "doc_id",
        "n",
        *[
            F.expr(
                f"transform(hs, m -> cast(conv(substring(m, {1 + 4 * w}, 4),"
                " 16, 10) as int))"
            ).alias(f"ws{w}")
            for w in range(4)
        ],
    )
    agg = lambda w: (  # noqa: E731
        f"aggregate(ws{w}, array_repeat(0L, 16), "
        f"(acc, x) -> transform(acc, (a, b) -> a + (shiftright(x, b) & 1)), "
        f"acc -> aggregate(sequence(0, 15), 0L, "
        f"(wv, b) -> wv + if(2 * element_at(acc, b + 1) > n, "
        f"shiftleft(1L, b), 0L)))"
    )
    jvm = words.select(
        "doc_id",
        *[F.expr(agg(w)).cast("long").alias(f"simhash_w{w}") for w in range(4)],
    )
    old = {tuple(r) for r in jvm.collect()}
    new = {tuple(r) for r in QUERIES["simhash"](spark, SF_DIR).collect()}
    assert old == new and len(old) == 500


def test_minhash_kernel_matches_jvm_hofs_at_lsh_scale(spark):
    n_hashes = 64  # the 16x4 bench shape that routes to the kernel
    d = _docs(spark, SF_DIR).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 3)
    sh = d.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(t)-3), "
            "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"
        ).alias("sh"),
    )
    hsh = sh.select(
        "doc_id",
        F.expr(
            "transform(sh, s -> cast(conv(substring(md5(encode(s, 'UTF-8')),"
            " 1, 8), 16, 10) as bigint))"
        ).alias("h"),
    )
    mh = [
        F.expr(
            f"array_min(transform(h, x -> pmod({a}L * x + {b}L,"
            f" {_MERSENNE31}L)))"
        ).alias(f"mh{k}")
        for k, (a, b) in enumerate(_mh_params(n_hashes), start=1)
    ]
    old = {tuple(r) for r in hsh.select("doc_id", *mh).collect()}
    new = {
        tuple(r)
        for r in minhash_sig_df(_docs(spark, SF_DIR), n_hashes=n_hashes).collect()
    }
    assert old == new and len(old) == 500


def test_kernel_paths_stay_map_only(spark):
    """The kernel swap must not change the 100 TB plan shape: map-only,
    no Generate, no data exchange beyond the adaptive input spread."""
    from test_plans import data_exchanges

    for df in (
        QUERIES["winnow_fp"](spark, SF_DIR),
        QUERIES["simhash"](spark, SF_DIR),
        minhash_sig_df(_docs(spark, SF_DIR), n_hashes=64),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert data_exchanges(plan) == 0, plan[:1500]
        assert "Generate" not in plan, plan[:1500]


def test_ivf_assign_kernel_matches_jvm_hof_argmax(spark):
    """The IVF assignment kernel (r6: broadcast-closure centroids,
    sequential-fold dots, first-max tie-break) must reproduce the old
    plan-literal JVM shape bucket-for-bucket, and the driver-side query
    branch of _bucket_topk must agree with both."""
    from xqspark.queries import _assign_buckets, _emb, _seed_centroids

    emb = _emb(spark, SF_DIR, spread=False).select(
        "vec_id", F.col("embedding").alias("v")
    )
    cents = [[float(x) for x in cv] for cv in _seed_centroids(emb, 8)]
    # the r5 JVM expression, verbatim
    cents_col = F.array(*[F.array(*[F.lit(x) for x in cv]) for cv in cents])
    dots = (
        "transform(_cents, c -> aggregate(zip_with(v, c, "
        "(x, y) -> cast(x as double) * y), 0D, (acc, q) -> acc + q))"
    )
    jvm = (
        emb.withColumn("_cents", cents_col)
        .withColumn("_dots", F.expr(dots))
        .withColumn(
            "bucket",
            F.expr(
                "cast(array_position(_dots, array_max(_dots)) - 1 as bigint)"
            ),
        )
        .select("vec_id", "bucket")
    )
    old = {r["vec_id"]: r["bucket"] for r in jvm.collect()}
    new = {
        r["vec_id"]: r["bucket"]
        for r in _assign_buckets(emb, cents).select("vec_id", "bucket").collect()
    }
    assert old == new and len(old) == 500
    # driver-side fold (the _bucket_topk query branch) agrees too
    for r in emb.filter(F.col("vec_id") < 5).collect():
        v = [float(x) for x in r["v"]]
        ds = []
        for c in cents:
            acc = 0.0
            for x, y in zip(v, c):
                acc += x * y
            ds.append(acc)
        assert ds.index(max(ds)) == old[r["vec_id"]]


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up (driver-side centroid rounding) must equal
    F.round on doubles, including exact .5-at-6dp boundaries where
    Python's builtin banker's round would diverge."""
    from xqspark.queries import _round_half_up

    vals = [0.1234565, 0.1234575, -0.1234565, 1.9999995, 0.33333333333,
            -2.7182818, 123.45678949999, 5e-07, -5e-07, 0.0]
    rows = spark.createDataFrame(
        [(v,) for v in vals], "x double"
    ).select(F.round("x", 6).alias("r")).collect()
    for v, r in zip(vals, rows):
        assert _round_half_up(v, 6) == r["r"], v
