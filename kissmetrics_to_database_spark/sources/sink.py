"""Sinks: lake (parquet) + warehouse (JDBC) writers (SURVEY.md S6,
S7, S9, J3).

The reference buffers row tuples and flushes multi-row INSERTs every
DB_QUERIES_PER_CALL rows (reference: src/KissmetricsToDatabase.php:
810-867), bootstraps DDL (src/Commands/CreateDatabaseCommand.php:
19-35), and VACUUMs post-load (:642-649).

Spark restatement: the JDBC writer batches natively (``batchsize``);
DDL bootstrap/evolution happens once per batch driver-side via the
schema_evolution module; compaction is a repartition-on-write. The
JDBC path is exercised for real against embedded Apache Derby (the
JDBC database that ships inside Spark's own jars) — see
tests/test_jdbc_derby.py for the append round-trip and the
advance-after-commit contract against a JDBC sink.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from kissmetrics_to_database_spark.operators import dedup as _dedup


@dataclass
class JdbcConfig:
    """Warehouse coordinates — mirrors the reference env surface
    (.env.example: DB_HOST/PORT/NAME/USER/PASS, DB_QUERIES_PER_CALL)."""

    url: str  # e.g. jdbc:postgresql://host:5439/db
    table: str
    user: str
    password: str
    batch_size: int = 1000
    isolation: str = "READ_COMMITTED"
    driver: str | None = None  # e.g. org.apache.derby.jdbc.EmbeddedDriver


def write_jdbc_append(df: DataFrame, cfg: JdbcConfig) -> None:
    """S6: batched warehouse append. Spark's JDBC writer issues
    multi-row batches of ``batch_size`` per executor task — the
    distributed version of the reference's stash/flush loop. Partition
    count controls write parallelism; repartition upstream to match
    the warehouse's ingest concurrency."""
    w = (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("batchsize", str(cfg.batch_size))
        .option("isolationLevel", cfg.isolation)
    )
    if cfg.driver:
        w = w.option("driver", cfg.driver)
    w.mode("append").save()


def write_jdbc_staged(
    spark,
    df: DataFrame,
    cfg: JdbcConfig,
    expected_rows: int | None = None,
    load_id: str | None = None,
    epoch_id: int | None = None,
) -> int:
    """S6 at warehouse grade: staged atomic load (VERDICT r4 item 4).

    The reference wraps each file's inserts in one transaction so a
    file lands whole or not at all (src/Operations/FileImporter.php:
    142-163). A distributed JDBC append can't give that — each
    executor task commits its own batch, so a mid-load failure leaves
    partial rows. This restores per-load atomicity the warehouse way:

    1. executors OVERWRITE a staging table ``<table>_stage`` (a task
       failure corrupts only the stage, which the next run recreates);
    2. the driver moves stage → target with ONE transactional
       ``INSERT INTO target (cols) SELECT cols FROM stage``,
       validating the moved row count against ``expected_rows`` when
       given, and ROLLS BACK on any failure — the target is never
       half-loaded, so the S5 watermark contract (advance only after
       commit) composes with it directly;
    3. the stage is dropped after commit (left in place on failure
       for inspection; the next load overwrites it).

    Concurrency contract (ADVICE r5): with the default shared stage
    name ``<table>_stage`` this is SINGLE-WRITER per target — two
    concurrent loads would clobber each other's stage between steps 1
    and 2 (compose with ``sources.lock.SingleWriterLock``, as
    ``pipeline.py`` does). For concurrent loads pass a distinct
    ``load_id`` per caller: the stage becomes
    ``<table>_stage_<load_id>`` (private to the load) and is dropped
    on success AND on validated failure, so no per-load garbage
    accumulates.

    Returns the number of rows landed in the target. The target table
    is created from the stage's shape if it doesn't exist yet (same
    bootstrap-on-first-load behavior as the reference's
    CreateDatabaseCommand).

    EXACTLY-ONCE replay guard (VERDICT r6 item 4): pass ``epoch_id``
    (the Structured Streaming micro-batch epoch) and the load becomes
    idempotent — a ledger table ``<table>_epochs`` records committed
    epochs, and the ledger INSERT rides in the SAME transaction as
    the stage→target move, so the marker and the rows land atomically
    (or neither does). A replayed micro-batch — foreachBatch reruns
    after a crash BETWEEN the sink returning and the checkpoint
    commit — finds its epoch in the ledger and skips, returning 0.
    Without ``epoch_id`` the semantics stay at-least-once-per-load
    (batch callers that manage their own watermark, S5).
    """
    if load_id is not None:
        if not load_id.replace("_", "").isalnum():
            raise ValueError(
                f"load_id must be alphanumeric/underscore, got {load_id!r}"
            )
        stage = f"{cfg.table}_stage_{load_id}"
    else:
        stage = f"{cfg.table}_stage"
    stage_cfg = JdbcConfig(
        url=cfg.url, table=stage, user=cfg.user, password=cfg.password,
        batch_size=cfg.batch_size, isolation=cfg.isolation,
        driver=cfg.driver,
    )
    w = (
        df.write.format("jdbc")
        .option("url", stage_cfg.url)
        .option("dbtable", stage_cfg.table)
        .option("user", stage_cfg.user)
        .option("password", stage_cfg.password)
        .option("batchsize", str(stage_cfg.batch_size))
    )
    if stage_cfg.driver:
        w = w.option("driver", stage_cfg.driver)
    w.mode("overwrite").save()

    # Spark's JDBC writer creates columns as delimited identifiers, so
    # they are case-sensitive in Derby — quote them the same way
    cols = ", ".join(f'"{c}"' for c in df.columns)
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    ledger = f"{cfg.table}_epochs"
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            meta = conn.getMetaData()
            rs = meta.getTables(None, None, cfg.table.upper(), None)
            target_exists = rs.next()
            rs.close()
            if epoch_id is not None:
                rs = meta.getTables(None, None, ledger.upper(), None)
                ledger_exists = rs.next()
                rs.close()
                if not ledger_exists:
                    st.execute(
                        f"CREATE TABLE {ledger} "
                        "(epoch_id BIGINT NOT NULL PRIMARY KEY)"
                    )
                rs = st.executeQuery(
                    f"SELECT MAX(epoch_id) FROM {ledger}"
                )
                rs.next()
                max_epoch = rs.getObject(1)
                rs.close()
                if max_epoch is not None and int(epoch_id) < int(max_epoch):
                    # epoch REGRESSION guard (r8): streaming epochs are
                    # monotone and foreachBatch only ever replays the
                    # LAST uncommitted batch, so a requested epoch
                    # strictly below the ledger high-water mark means a
                    # fresh checkpoint dir is running against a stale
                    # ledger — silently "skipping" would drop every
                    # early micro-batch (data loss) until the counter
                    # passes the old mark. Mirror the parquet state
                    # sinks' contract and refuse loudly instead.
                    conn.rollback()
                    st.execute(f"DROP TABLE {stage}")
                    conn.commit()
                    raise ValueError(
                        f"epoch regression: batch epoch {int(epoch_id)} < "
                        f"ledger high-water mark {int(max_epoch)} in "
                        f"{ledger} — the checkpoint dir was reset without "
                        f"clearing the epoch ledger; clear both together "
                        f"(DROP TABLE {ledger}) or resume from the old "
                        "checkpoint"
                    )
                already = max_epoch is not None and int(epoch_id) == int(
                    max_epoch
                )
                if already:
                    # replayed micro-batch: the epoch committed before
                    # the checkpoint did — drop the re-staged rows and
                    # leave the target untouched
                    conn.rollback()
                    st.execute(f"DROP TABLE {stage}")
                    conn.commit()
                    return 0
            if not target_exists:
                st.execute(
                    f"CREATE TABLE {cfg.table} AS "
                    f"SELECT {cols} FROM {stage} WITH NO DATA"
                )
            moved = st.executeUpdate(
                f"INSERT INTO {cfg.table} ({cols}) SELECT {cols} FROM {stage}"
            )
            if expected_rows is not None and moved != expected_rows:
                raise ValueError(
                    f"staged load validation failed: moved {moved} rows, "
                    f"expected {expected_rows} — rolled back, target untouched"
                )
            if epoch_id is not None:
                # marker + rows commit ATOMICALLY: replay-after-crash
                # either sees both (skips) or neither (reloads)
                st.executeUpdate(
                    f"INSERT INTO {ledger} VALUES ({int(epoch_id)})"
                )
            conn.commit()
            st.execute(f"DROP TABLE {stage}")
            conn.commit()
            return moved
        except Exception:
            conn.rollback()
            if load_id is not None:
                # private per-load stage: drop on failure too (best
                # effort) so retries with fresh load_ids don't leak
                # tables; the shared default stays for inspection.
                try:
                    st.execute(f"DROP TABLE {stage}")
                    conn.commit()
                except Exception:
                    pass
            raise
        finally:
            st.close()
    finally:
        conn.close()


def execute_ddl(spark, cfg: JdbcConfig, statements: list[str]) -> None:
    """S7/S8: run warehouse DDL (CREATE/ALTER) over the same JDBC
    coordinates the writer uses.

    The reference issues its ALTER TABLE ADD per new key inline
    (src/KissmetricsToDatabase.php:202-257); here the statements come
    pre-computed from `schema_evolution.ddl_add_columns` and execute
    once per batch, driver-side, on a single short-lived connection —
    DDL is metadata work and never belongs on executors.  Uses the
    JVM's DriverManager (the JDBC driver already sits on Spark's
    classpath), so no extra Python DB client is needed.
    """
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    try:
        st = conn.createStatement()
        try:
            for stmt in statements:
                st.execute(stmt)
        finally:
            st.close()
    finally:
        conn.close()


def read_jdbc(spark, cfg: JdbcConfig) -> DataFrame:
    """Read a warehouse table back (round-trip verification path)."""
    r = (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
    )
    if cfg.driver:
        r = r.option("driver", cfg.driver)
    return r.load()


def write_lake(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    compact_to: int | None = None,
    dedup_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Lake write: columnar append with optional pre-write dedup (J3)
    and compaction (S9: the reference's VACUUM becomes
    repartition-on-write; with Delta available this would be
    OPTIMIZE/VACUUM).

    ``partition_by`` should be a low-cardinality ingest-time column
    (load date) so downstream reads prune partitions. ``fmt`` is any
    Spark-native columnar format (``parquet`` default, ``orc`` for
    Hive-ecosystem consumers) — both carry footer min/max stats, so
    the pruning story (PLANS.md pushdown rows) is format-independent.
    """
    out = df
    if dedup_cols:
        out = _dedup.dedup_exact(out, dedup_cols)
    if compact_to:
        out = out.repartition(compact_to)
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)
