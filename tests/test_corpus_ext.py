"""Tests for the round-2 corpus-extension operators: two-phase epoch
shuffle ranking and incremental-ingest dedup semantics."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators import dedup


def _two_phase_positions(df, key_col, id_col):
    """The epoch_shuffle ranking scheme, extracted for testing:
    bucket-local row_number + broadcast cumulative offsets."""
    keyed = df.withColumn("bkt", F.substring(key_col, 1, 2))
    wloc = Window.partitionBy("bkt").orderBy(key_col, id_col)
    local = keyed.withColumn("lrank", F.row_number().over(wloc))
    wcum = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        keyed.groupBy("bkt")
        .agg(F.count("*").alias("n"))
        .withColumn("off", F.coalesce(F.sum("n").over(wcum), F.lit(0)))
        .select("bkt", "off")
    )
    return local.join(F.broadcast(offsets), "bkt").select(
        id_col, (F.col("off") + F.col("lrank")).alias("pos")
    )


def test_two_phase_ranking_equals_global_row_number(spark):
    ids = list(range(300))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id", F.md5(F.concat(F.lit("s:"), F.col("doc_id").cast("string"))).alias("k")
    )
    got = {
        r["doc_id"]: r["pos"]
        for r in _two_phase_positions(df, "k", "doc_id").collect()
    }
    want = {
        r["doc_id"]: r["pos"]
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy("k", "doc_id"))
        ).collect()
    }
    assert got == want


def test_incremental_dedup_verdicts(spark):
    # corpus: docs 1..4; batch: 9 (exact dup of 1), 19 (near dup of 2),
    # 29 (genuinely new)
    base2 = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "hello world exact duplicate text"),
        (2, base2),
        (3, "completely unrelated corpus document three"),
        (4, "another corpus document with different words"),
        (9, "hello world exact duplicate text"),
        (19, base2 + " ok"),  # shares most shingles with doc 2
        (29, "zebra xylophone quartz vortex jackdaw flummox"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    is_batch = F.col("doc_id") % 10 == 9

    fp = docs.select(
        "doc_id", F.md5(F.trim(F.lower("text"))).alias("fp"), is_batch.alias("b")
    )
    exact_hit = (
        fp.where("b")
        .join(fp.where(~F.col("b")).select("fp").distinct(), "fp")
        .select("doc_id")
        .distinct()
    )
    tok = dedup.distinct_shingles(docs, "doc_id", "text")
    wide = dedup.minhash_wide_tokens(tok, "doc_id")
    bands = dedup.band_keys_wide(wide, "doc_id").withColumn("b", is_batch)
    near_hit = (
        bands.where("b")
        .join(
            bands.where(~F.col("b")).select("band", "band_key").distinct(),
            ["band", "band_key"],
        )
        .select("doc_id")
        .distinct()
    )
    verdicts = {
        r["doc_id"]: r["verdict"]
        for r in (
            docs.where(is_batch)
            .select("doc_id")
            .join(exact_hit.withColumn("e", F.lit(1)), "doc_id", "left")
            .join(near_hit.withColumn("n", F.lit(1)), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("e").isNotNull(), "exact_dup")
                .when(F.col("n").isNotNull(), "near_dup")
                .otherwise("new")
                .alias("verdict"),
            )
            .collect()
        )
    }
    assert verdicts[9] == "exact_dup"
    assert verdicts[19] == "near_dup"
    assert verdicts[29] == "new"


def test_band_keys_wide_pairs_roundtrip(spark):
    # band_keys_wide must reproduce exactly the candidates
    # lsh_candidate_pairs_wide finds (the refactor's invariant)
    docs = spark.createDataFrame(
        [(i, f"shared prefix tokens here variant {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    tok = dedup.distinct_shingles(docs, "doc_id", "text")
    wide = dedup.minhash_wide_tokens(tok, "doc_id")
    via_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs_wide(wide, "doc_id").collect()
    }
    bands = dedup.band_keys_wide(wide, "doc_id")
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "band_key")
    via_bands = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    assert via_pairs == via_bands


def test_hostile_session_timezone_repinned(spark):
    # The driver may hand queries a session with a non-UTC timezone;
    # load_table is the choke point that re-pins UTC, so epoch
    # formatting must be unchanged under a hostile session config.
    from kissmetrics_to_database_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    baseline = catalog.QUERIES["epoch_format"](spark, sf).limit(5).collect()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        hostile = catalog.QUERIES["epoch_format"](spark, sf).limit(5).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert hostile == baseline
