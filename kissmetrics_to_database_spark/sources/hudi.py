"""Apache Hudi copy-on-write table reader, from the PUBLIC spec.

Completes the lakehouse read trio (Delta `sources/deltalog.py`,
Iceberg `sources/iceberg.py`, and now Hudi) — a user migrating a lake
to this engine arrives with whichever format their writers emit, and
Hudi is the third of the three open ones (hudi.apache.org, table
format 0.x "table version 6" layout).

The public layout this module replays:

- ``<table>/.hoodie/hoodie.properties`` — java-properties file:
  ``hoodie.table.name``, ``hoodie.table.type`` (COPY_ON_WRITE /
  MERGE_ON_READ), ``hoodie.table.version``.
- The TIMELINE: files under ``.hoodie/`` named
  ``<instantTime>.<action>[.<state>]`` where instantTime is a
  ``yyyyMMddHHmmssSSS`` string, action ∈ {commit, replacecommit,
  clean, rollback, …}, and the state suffix is ``.requested`` /
  ``.inflight`` for pending instants — a COMPLETED instant has no
  suffix. Only completed ``commit`` / ``replacecommit`` instants
  contribute data; pending ones are invisible (that is Hudi's
  snapshot-isolation contract — readers never see inflight writes).
- A completed ``<ts>.commit`` holds JSON commit metadata whose
  ``partitionToWriteStats`` maps partition path → write-stat list:
  each stat names the written base file (``path`` relative to the
  table root, ``fileId``, ``numWrites`` …). A base file is named
  ``<fileId>_<writeToken>_<instantTime>.parquet``; within a
  partition, all base files sharing a fileId form a FILE GROUP, and
  copy-on-write upserts rewrite a group by adding a new base file
  with the commit's instant.
- A completed ``<ts>.replacecommit`` (clustering / insert_overwrite)
  additionally carries ``partitionToReplaceFileIds``: file groups
  replaced by the commit — dropped from the view even though no
  remove action exists per-file.

Snapshot semantics (what ``read_hudi`` implements): at instant T the
view is, per (partition, fileId), the base file with the LARGEST
completed instant ≤ T, minus groups replaced at ≤ T. That is exactly
Hudi's "latest file slice" rule for CoW tables; the resolution is
driver-side metadata replay, bounded by file count like the Delta and
Iceberg readers here, and the data scan reads only the chosen files
(the timeline IS the pruning step).

Partition columns: Hudi lays partitions out as directories; with
hive-style naming (``lang=de``) the reader rebuilds typed columns
from the path (the layout Hudi's own ``hoodie.datasource.write.
hive_style_partitioning=true`` emits — also what our fixtures write).
Non-hive partition paths surface as the ``_hoodie_partition_path``
meta column only. The five ``_hoodie_*`` meta columns are stripped
unless ``keep_meta=True``.

Honest boundary (quarantine contract, same as the other readers):
MERGE_ON_READ tables (log files needing compaction-on-read), pending
compactions, and timeline layouts newer than table version 6 raise
ValueError instead of returning wrong rows.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_COMPLETED_RE = re.compile(r"^(\d{14,17})\.(commit|replacecommit)$")
META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


def _read_properties(path: str) -> dict[str, str]:
    """Minimal java-properties parse (key=value, # comments) — the
    shape hoodie.properties actually uses."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            key, sep, val = line.partition("=")
            if sep:
                props[key.strip()] = val.strip()
    return props


def hudi_timeline(path: str) -> list[dict]:
    """Completed data instants, ascending by instant time. Each:
    {instant, action, metadata} with the commit JSON parsed."""
    meta_dir = os.path.join(path, ".hoodie")
    if not os.path.isdir(meta_dir):
        raise ValueError(f"not a Hudi table (no .hoodie): {path}")
    props = _read_properties(os.path.join(meta_dir, "hoodie.properties"))
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise ValueError(
            f"hoodie.table.type={ttype} — merge-on-read tables need "
            "log-file compaction on read, out of this reader's "
            "declared scope"
        )
    tver = int(props.get("hoodie.table.version", "6"))
    if tver > 6:
        raise ValueError(
            f"hoodie.table.version={tver} newer than the table-v6 "
            "timeline layout this reader replays"
        )
    out = []
    for name in sorted(os.listdir(meta_dir)):
        m = _COMPLETED_RE.match(name)
        if not m:
            continue
        with open(os.path.join(meta_dir, name), encoding="utf-8") as f:
            raw = f.read().strip()
        out.append(
            {
                "instant": m.group(1),
                "action": m.group(2),
                "metadata": json.loads(raw) if raw else {},
            }
        )
    return out


def _latest_slices(
    path: str, at_instant: str | None
) -> tuple[list[tuple[str, str]], list[str]]:
    """Replay the timeline to ``at_instant`` (default: latest).
    Returns ([(partition_path, table-relative base-file path)],
    completed instants used). The latest-file-slice rule: newest base
    file per (partition, fileId), minus replaced groups."""
    timeline = hudi_timeline(path)
    if at_instant is not None:
        timeline = [t for t in timeline if t["instant"] <= str(at_instant)]
        if not timeline:
            raise ValueError(
                f"no completed instant ≤ {at_instant} in timeline"
            )
    # (partition, fileId) -> (instant, relpath)
    groups: dict[tuple[str, str], tuple[str, str]] = {}
    for inst in timeline:
        md = inst["metadata"]
        for part, stats in (md.get("partitionToWriteStats") or {}).items():
            for st in stats or []:
                rel = st.get("path")
                fid = st.get("fileId")
                if not rel or not fid:
                    continue
                key = (part, fid)
                prev = groups.get(key)
                if prev is None or inst["instant"] >= prev[0]:
                    groups[key] = (inst["instant"], rel)
        for part, fids in (
            md.get("partitionToReplaceFileIds") or {}
        ).items():
            for fid in fids or []:
                groups.pop((part, fid), None)
    files = sorted(
        (part, rel) for (part, _fid), (_t, rel) in groups.items()
    )
    return files, [t["instant"] for t in timeline]


def read_hudi(
    spark: SparkSession,
    path: str,
    at_instant: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Snapshot read of a Hudi CoW table at ``at_instant`` (default
    latest) — see the module docstring for the replayed layout. The
    file list is exact (only the snapshot's latest file slices are
    scanned); hive-style partition directories rebuild as typed
    columns via Spark's ``basePath`` partition discovery, so
    partition pruning on them reaches the scan."""
    files, _ = _latest_slices(path, at_instant)
    if not files:
        raise ValueError(f"Hudi table has no completed data: {path}")
    df = _scan_files(spark, path, files)
    if not keep_meta:
        df = df.drop(*[c for c in META_COLS if c in df.columns])
    return df


def _scan_files(
    spark: SparkSession, path: str, files: list[tuple[str, str]]
) -> DataFrame:
    """Scan [(partition_path, table-relative file)] with hive-style
    partition columns rebuilt via Spark's ``basePath`` discovery —
    meta columns kept (callers drop or filter on them)."""
    abs_files = [os.path.join(path, rel) for _part, rel in files]
    hive_style = all(
        all("=" in seg for seg in part.split("/"))
        for part, _rel in files
        if part
    )
    reader = spark.read
    if hive_style and any(part for part, _rel in files):
        # basePath keeps partition-dir discovery while listing
        # explicit leaf files — Spark's documented escape hatch
        reader = reader.option("basePath", path)
    return reader.parquet(*abs_files)


def hudi_incremental(
    spark: SparkSession,
    path: str,
    begin_instant: str,
    end_instant: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Hudi INCREMENTAL QUERY (CoW): the records upserted AFTER
    ``begin_instant`` (exclusive) up to ``end_instant`` (inclusive,
    default latest) — Hudi's signature consumption mode: downstream
    pipelines pull only what changed instead of re-reading snapshots.

    Per the spec this is the latest file slices at ``end_instant``
    filtered on the record-level ``_hoodie_commit_time`` meta column
    (each record's LAST-upsert instant — copy-on-write rewrites
    preserve it on unchanged records, so an untouched row never
    reappears in a pull). The scan touches only file groups some
    commit in the window rewrote: file pruning from the timeline's
    write stats, then the row filter. An updated record is delivered
    in its NEWEST version; deletes are out of CoW incremental scope
    (no delete writer here)."""
    from pyspark.sql import functions as F

    timeline = hudi_timeline(path)
    window = [
        t
        for t in timeline
        if t["instant"] > str(begin_instant)
        and (end_instant is None or t["instant"] <= str(end_instant))
    ]
    # file groups touched in the window (partition, fileId) — only
    # their LATEST slice can hold rows stamped with window instants.
    # Clustering replays too: a replacecommit moving a touched
    # group's records into a merged group makes the NEW group the
    # carrier (its records keep their original commit times).
    window_set = {t["instant"] for t in window}
    touched: set[tuple[str, str]] = set()
    for inst in timeline:
        if end_instant is not None and inst["instant"] > str(end_instant):
            break
        md = inst["metadata"]
        wrote = {
            (part, st["fileId"])
            for part, stats in (
                md.get("partitionToWriteStats") or {}
            ).items()
            for st in stats or []
            if st.get("fileId")
        }
        if inst["action"] == "replacecommit":
            replaced = {
                (part, fid)
                for part, fids in (
                    md.get("partitionToReplaceFileIds") or {}
                ).items()
                for fid in fids or []
            }
            if replaced & touched:
                touched -= replaced
                touched |= wrote
        elif inst["instant"] in window_set:
            touched |= wrote
    if not touched:
        schema = read_hudi(
            spark, path, keep_meta=keep_meta
        ).schema
        return spark.createDataFrame([], schema)
    slices, _ = _latest_slices(path, end_instant)
    # map each latest slice back to its (partition, fileId)
    chosen = []
    for part, rel in slices:
        fid = os.path.basename(rel).split("_", 1)[0]
        if (part, fid) in touched:
            chosen.append((part, rel))
    df = _scan_files(spark, path, chosen).where(
        F.col("_hoodie_commit_time") > str(begin_instant)
    )
    if end_instant is not None:
        df = df.where(
            F.col("_hoodie_commit_time") <= str(end_instant)
        )
    if not keep_meta:
        df = df.drop(*[c for c in META_COLS if c in df.columns])
    return df

class HudiFixtureWriter:
    """Minimal Hudi CoW commit emitter for round-trips — the
    ``DeltaFixtureWriter`` pattern: generator + from-spec reader, no
    fixture binaries, NOT a production writer (single process, no
    conflict detection). Emits the table-v6 layout the module
    docstring describes: hoodie.properties, requested → inflight →
    completed timeline files, hive-style partition dirs, base files
    named ``<fileId>_<writeToken>_<instant>.parquet`` carrying the
    five ``_hoodie_*`` meta columns.

    ``insert`` opens one new file group per touched partition;
    ``upsert`` rewrites every group holding a matched record key
    (copy-on-write: same fileId, new base file at the new instant —
    per the spec, updates NEVER fork a new group) and opens a new
    group for unmatched keys; ``cluster`` is a replacecommit merging
    a partition's groups into one. Instants are deterministic
    increasing timestamps so fixtures hash stably."""

    def __init__(
        self,
        path: str,
        key_col: str,
        partition_col: str | None = None,
    ) -> None:
        self.path = path
        self.key_col = key_col
        self.partition_col = partition_col
        self._n_instant = 0
        self._n_group = 0
        self._seqno = 0
        # (partition_path, fileId) -> current rows (pandas)
        self.groups: dict[tuple[str, str], object] = {}
        meta = os.path.join(path, ".hoodie")
        os.makedirs(meta, exist_ok=True)
        with open(
            os.path.join(meta, "hoodie.properties"), "w", encoding="utf-8"
        ) as f:
            f.write(
                "hoodie.table.name="
                + os.path.basename(path.rstrip("/"))
                + "\nhoodie.table.type=COPY_ON_WRITE"
                + "\nhoodie.table.version=6\n"
            )

    def _next_instant(self) -> str:
        self._n_instant += 1
        return f"202401010000{self._n_instant:05d}"

    def _part_path(self, value) -> str:
        if self.partition_col is None:
            return ""
        return f"{self.partition_col}={value}"

    def _write_base_file(self, part: str, fid: str, instant: str, pdf):
        """``pdf`` carries an internal ``_ct`` column: each RECORD's
        last-upsert instant. Per the spec, a file-group rewrite
        copies unchanged records WITH their original
        ``_hoodie_commit_time`` — only the records the commit touched
        get the new instant. Incremental pulls depend on that."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        name = f"{fid}_0-0-0_{instant}.parquet"
        rel = os.path.join(part, name) if part else name
        os.makedirs(
            os.path.dirname(os.path.join(self.path, rel)) or self.path,
            exist_ok=True,
        )
        out = pdf.copy()
        self._seqno += 1
        cts = out.pop("_ct")
        out.insert(0, "_hoodie_file_name", name)
        out.insert(0, "_hoodie_partition_path", part)
        out.insert(
            0, "_hoodie_record_key", pdf[self.key_col].astype(str)
        )
        out.insert(
            0, "_hoodie_commit_seqno", f"{instant}_0_{self._seqno}"
        )
        out.insert(0, "_hoodie_commit_time", cts.values)
        if self.partition_col is not None:
            out = out.drop(columns=[self.partition_col])
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False),
            os.path.join(self.path, rel),
        )
        self.groups[(part, fid)] = pdf
        return rel, name

    def _publish(self, instant: str, action: str, metadata: dict) -> None:
        meta = os.path.join(self.path, ".hoodie")
        for suffix in (f".{action}.requested", f".{action}.inflight"):
            with open(
                os.path.join(meta, instant + suffix), "w"
            ) as f:
                f.write("")
        with open(
            os.path.join(meta, f"{instant}.{action}"), "w",
            encoding="utf-8",
        ) as f:
            json.dump(metadata, f)

    def _stats(self, part: str, fid: str, rel: str, pdf, updates: int):
        return {
            "fileId": fid,
            "path": rel.replace(os.sep, "/"),
            "numWrites": int(len(pdf)),
            "numUpdateWrites": int(updates),
            "totalWriteBytes": os.path.getsize(
                os.path.join(self.path, rel)
            ),
        }

    def insert(self, pdf) -> str:
        """One commit; a NEW file group per touched partition."""
        instant = self._next_instant()
        p2s: dict[str, list] = {}
        for pval, sub in self._by_partition(pdf):
            part = self._part_path(pval)
            self._n_group += 1
            fid = f"fg{self._n_group:06d}-0"
            rel, _ = self._write_base_file(
                part,
                fid,
                instant,
                sub.assign(_ct=instant).reset_index(drop=True),
            )
            p2s.setdefault(part, []).append(
                self._stats(part, fid, rel, sub, 0)
            )
        self._publish(
            instant, "commit", {"partitionToWriteStats": p2s}
        )
        return instant

    def upsert(self, pdf) -> str:
        """One commit; matched keys rewrite their file group in
        place (same fileId, new base file), unmatched keys open a
        new group in their partition."""
        instant = self._next_instant()
        p2s: dict[str, list] = {}
        remaining = pdf
        for (part, fid), cur in sorted(self.groups.items()):
            keys = set(cur[self.key_col])
            hit = remaining[
                remaining.apply(
                    lambda r: self._part_path(
                        r[self.partition_col]
                        if self.partition_col
                        else None
                    )
                    == part
                    and r[self.key_col] in keys,
                    axis=1,
                )
            ]
            if not len(hit):
                continue
            # unchanged records keep their original commit time;
            # only the matched (rewritten) records get this instant
            merged = cur[~cur[self.key_col].isin(set(hit[self.key_col]))]
            import pandas as pd

            merged = pd.concat(
                [merged, hit.assign(_ct=instant)], ignore_index=True
            )
            merged = merged.sort_values(self.key_col).reset_index(
                drop=True
            )
            rel, _ = self._write_base_file(part, fid, instant, merged)
            p2s.setdefault(part, []).append(
                self._stats(part, fid, rel, merged, len(hit))
            )
            remaining = remaining[
                ~remaining[self.key_col].isin(set(hit[self.key_col]))
            ]
        for pval, sub in self._by_partition(remaining):
            part = self._part_path(pval)
            self._n_group += 1
            fid = f"fg{self._n_group:06d}-0"
            rel, _ = self._write_base_file(
                part,
                fid,
                instant,
                sub.assign(_ct=instant).reset_index(drop=True),
            )
            p2s.setdefault(part, []).append(
                self._stats(part, fid, rel, sub, 0)
            )
        self._publish(
            instant, "commit", {"partitionToWriteStats": p2s}
        )
        return instant

    def cluster(self, partition_value=None) -> str:
        """replacecommit: merge every file group of one partition
        into a single new group (what Hudi clustering emits —
        new files via partitionToWriteStats, old groups via
        partitionToReplaceFileIds)."""
        import pandas as pd

        instant = self._next_instant()
        part = self._part_path(partition_value)
        old = {
            (p, f): cur
            for (p, f), cur in self.groups.items()
            if p == part
        }
        if not old:
            raise ValueError(f"no file groups in partition {part!r}")
        merged = (
            pd.concat(list(old.values()), ignore_index=True)
            .sort_values(self.key_col)
            .reset_index(drop=True)
        )
        self._n_group += 1
        fid = f"fg{self._n_group:06d}-0"
        rel, _ = self._write_base_file(part, fid, instant, merged)
        for key in old:
            del self.groups[key]
        self.groups[(part, fid)] = merged
        self._publish(
            instant,
            "replacecommit",
            {
                "partitionToWriteStats": {
                    part: [self._stats(part, fid, rel, merged, 0)]
                },
                "partitionToReplaceFileIds": {
                    part: [f for (_p, f) in old]
                },
            },
        )
        return instant

    def pending(self, action: str = "commit") -> str:
        """A requested+inflight instant with NO completed file —
        must stay invisible to readers."""
        instant = self._next_instant()
        meta = os.path.join(self.path, ".hoodie")
        for suffix in (f".{action}.requested", f".{action}.inflight"):
            with open(os.path.join(meta, instant + suffix), "w") as f:
                f.write("")
        return instant

    def _by_partition(self, pdf):
        if self.partition_col is None:
            if len(pdf):
                yield None, pdf
            return
        for pval, sub in pdf.groupby(self.partition_col, sort=True):
            yield pval, sub
