"""End-to-end batch pipeline: the reference's process-files command,
restated as one declarative flow (SURVEY.md §3.1).

  discover new files (natural order, after watermark)
  → one multi-file NDJSON scan (+ repair/quarantine)
  → per-row transform (sanitize, _n null-out, _t format, md5hash,
    created_at)
  → schema union vs. the existing lake table
  → lake append (+ optional exact dedup)
  → incremental identity closure from the new batch's alias pairs
  → advance watermark (only after the writes committed)

Everything before the writes is ONE Catalyst plan — scan, repair,
projection, fingerprint fuse into a single whole-stage-codegen pass
over the input files.
"""

from __future__ import annotations

import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kissmetrics_to_database_spark.functions import events_transform
from kissmetrics_to_database_spark.operators import identity
from kissmetrics_to_database_spark.sources import ndjson
from kissmetrics_to_database_spark.sources.json_repair import read_ndjson_with_repair
from kissmetrics_to_database_spark.sources.lock import PipelineLock


@dataclass
class PipelineResult:
    """Run report — the reference's counters/progress surface (A1/A5:
    before/after counts, rows/sec, elapsed; KissmetricsToDatabase.php:
    54-66,314-326,916-922) as a structured result instead of prints."""

    files: list[str] = field(default_factory=list)
    n_rows: int = 0
    n_repaired: int = 0
    n_quarantined: int = 0
    n_identity_members: int = 0
    elapsed_sec: float = 0.0

    @property
    def rows_per_sec(self) -> float:
        return round(self.n_rows / self.elapsed_sec, 2) if self.elapsed_sec else 0.0


def read_events_lake(spark: SparkSession, lake_dir: str) -> DataFrame:
    """Read the evolving events lake with schema merge across batches
    (the read-side half of S8: older files lack newer dynamic keys,
    which surface as NULL — same as the warehouse after ALTER ADD)."""
    return spark.read.option("mergeSchema", "true").parquet(
        str(Path(lake_dir) / "events")
    )


def run_incremental(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    lake_dir: str,
    fixed_date: str | None = None,
    process_identities: bool = True,
    dedup_on_fingerprint: bool = False,
) -> PipelineResult:
    """One incremental run. Idempotent: a second invocation with no
    new files writes nothing (watermark semantics, S4/S5). A lock
    file under ``state_dir`` enforces single-writer (S10)."""
    t0 = time.perf_counter()
    with PipelineLock(Path(state_dir) / "run.lock"):
        return _run_locked(
            spark,
            source_dir,
            state_dir,
            lake_dir,
            fixed_date,
            process_identities,
            dedup_on_fingerprint,
            t0,
        )


def _run_locked(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    lake_dir: str,
    fixed_date: str | None,
    process_identities: bool,
    dedup_on_fingerprint: bool,
    t0: float,
) -> PipelineResult:
    wm = ndjson.Watermark(Path(state_dir) / "watermark.json")
    session_start = wm.read()
    files = ndjson.discover_files(source_dir, after=session_start)
    if not files:
        return PipelineResult()

    lines = spark.read.text(files)
    good, quarantined = read_ndjson_with_repair(spark, lines)
    # one scan+repair pass feeds counts, the write, and identity
    # extraction — without the persist each action re-reads and
    # re-parses every source file
    good = good.persist()
    transformed = events_transform.transform_events(
        good.drop("was_repaired"), fixed_date=fixed_date
    )
    if dedup_on_fingerprint:
        transformed = transformed.dropDuplicates(["md5hash"])
    transformed = transformed.persist()

    n_rows = transformed.count()
    n_repaired = good.where(F.col("was_repaired")).count()
    n_quarantined = quarantined.count()

    try:
        transformed.write.mode("append").parquet(str(Path(lake_dir) / "events"))
        n_members = 0
        if process_identities and "_p" in transformed.columns:
            edges = identity.alias_edges_kissmetrics(transformed)
            comp_path = Path(lake_dir) / "identity_components"
            if comp_path.exists():
                # fold the new batch into the existing map — alias
                # chains that span runs must merge (the reference's
                # incremental path KTD:359-394)
                existing = spark.read.parquet(str(comp_path))
                comp = identity.update_components(existing, edges)
            else:
                comp = identity.connected_components(edges)
            # stage to a temp dir: comp's lineage may read comp_path
            tmp = str(comp_path) + ".staging"
            comp.write.mode("overwrite").parquet(tmp)
            staged = spark.read.parquet(tmp)
            n_members = staged.count()
            staged.write.mode("overwrite").parquet(str(comp_path))
            shutil.rmtree(tmp, ignore_errors=True)
        wm.advance(files[-1])
    except Exception:
        wm.rollback(session_start)
        raise
    finally:
        transformed.unpersist()
        good.unpersist()

    return PipelineResult(
        files=files,
        n_rows=n_rows,
        n_repaired=n_repaired,
        n_quarantined=n_quarantined,
        n_identity_members=n_members,
        elapsed_sec=round(time.perf_counter() - t0, 3),
    )
