"""Read-only Apache Iceberg table reader, from the PUBLIC table spec.

The second half of the lakehouse-interop gap (VERDICT r8 #3; Delta in
``sources/deltalog.py``): an Iceberg table (iceberg.apache.org/spec,
format v1/v2) is data files plus a ``metadata/`` tree —

- ``vN.metadata.json`` (+ ``version-hint.text``): table schema,
  snapshot log, ``current-snapshot-id``; each snapshot points at a
  **manifest list** (Avro) whose entries point at **manifest files**
  (Avro), whose entries carry data-file paths + status
  (1 ADDED / 0 EXISTING / 2 DELETED).

A snapshot read is: metadata JSON → its manifest list → each
manifest → data files with status ≠ DELETED → plain parquet scan of
exactly that file list. All metadata hops decode through the from-spec
Avro codec (``functions/avroc.py``) — the files are self-describing,
so no manifest schema is hardcoded here.

Scale shape: like Delta, the metadata tree is metadata-scale by
design (one Avro row per FILE); the replay is driver-side — the same
place Iceberg's own readers plan — and the data scan touches only
the snapshot's files (the log IS the pruning).

Honest boundary: v2 DELETE manifests (``content`` ≠ data, positional
/ equality deletes) and format-version > 2 raise ValueError rather
than returning wrong rows.

``IcebergFixtureWriter`` emits a spec-shaped metadata tree (JSON +
real Avro manifests) so tests and catalog queries round-trip real
bytes without an Iceberg distribution in the container.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from kissmetrics_to_database_spark.functions import avroc

_VMETA_RE = re.compile(r"^v(\d+)\.metadata\.json$")


def _latest_metadata(path: str) -> str:
    meta_dir = os.path.join(path, "metadata")
    if not os.path.isdir(meta_dir):
        raise ValueError(f"not an Iceberg table (no metadata/): {path}")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint, encoding="utf-8") as f:
            v = int(f.read().strip())
        return os.path.join(meta_dir, f"v{v}.metadata.json")
    versions = sorted(
        int(m.group(1))
        for m in (_VMETA_RE.match(n) for n in os.listdir(meta_dir))
        if m
    )
    if not versions:
        raise ValueError(f"no vN.metadata.json under {meta_dir}")
    return os.path.join(meta_dir, f"v{versions[-1]}.metadata.json")


def table_metadata(path: str) -> dict:
    with open(_latest_metadata(path), encoding="utf-8") as f:
        meta = json.load(f)
    if int(meta.get("format-version", 1)) > 2:
        raise ValueError(
            f"Iceberg format-version {meta['format-version']} beyond "
            "this reader's declared v1/v2 scope"
        )
    return meta


def _local(path_like: str, table_path: str) -> str:
    """Manifest/data paths may be absolute URIs; the fixtures write
    table-relative paths. Strip a file: scheme, else join."""
    if path_like.startswith("file:"):
        return path_like[len("file:") :]
    if os.path.isabs(path_like):
        return path_like
    return os.path.join(table_path, path_like)


def snapshot_files(path: str, snapshot_id: int | None = None) -> dict:
    """Resolve a snapshot (default: current) to its live data files.
    → {snapshot_id, files: [paths], record_count}."""
    meta = table_metadata(path)
    snaps = {int(s["snapshot-id"]): s for s in meta.get("snapshots", [])}
    if not snaps:
        return {"snapshot_id": None, "files": [], "record_count": 0}
    sid = (
        int(meta["current-snapshot-id"])
        if snapshot_id is None
        else int(snapshot_id)
    )
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in table (have {sorted(snaps)})")
    mlist_path = _local(snaps[sid]["manifest-list"], path)
    with open(mlist_path, "rb") as f:
        _, mentries = avroc.read_container(f.read())
    files: list[str] = []
    n_rows = 0
    for me in mentries:
        if int(me.get("content", 0)) != 0:
            raise ValueError(
                "v2 delete manifest present — positional/equality "
                "deletes are out of this reader's declared scope"
            )
        with open(_local(me["manifest_path"], path), "rb") as f:
            _, entries = avroc.read_container(f.read())
        for e in entries:
            if int(e["status"]) == 2:  # DELETED
                continue
            df = e["data_file"]
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise ValueError(f"non-parquet data file ({fmt})")
            files.append(_local(df["file_path"], path))
            n_rows += int(df.get("record_count", 0))
    return {"snapshot_id": sid, "files": sorted(files), "record_count": n_rows}


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Snapshot read (default: current snapshot; pass a snapshot-id
    for time travel). Iceberg data files carry ALL columns (identity
    partition values included), so the scan is a plain parquet read
    of the resolved file list."""
    state = snapshot_files(path, snapshot_id)
    if not state["files"]:
        raise ValueError("empty table (no snapshots)")
    return spark.read.parquet(*state["files"])


def iceberg_history(path: str) -> list[dict]:
    """Snapshot log, newest first: id, parent, operation, summary
    counts — the `.history`/`.snapshots` metadata-table readout."""
    meta = table_metadata(path)
    out = []
    for s in sorted(
        meta.get("snapshots", []),
        key=lambda s: int(s["snapshot-id"]),
        reverse=True,
    ):
        out.append(
            {
                "snapshot_id": int(s["snapshot-id"]),
                "parent_snapshot_id": (
                    int(s["parent-snapshot-id"])
                    if s.get("parent-snapshot-id") is not None
                    else None
                ),
                "operation": (s.get("summary") or {}).get("operation"),
            }
        )
    return out


# ---------------------------------------------------------------------------
# fixture writer (spec-shaped bytes for round-trips; not a production writer)
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int", "default": 0},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None},
    ],
}


class IcebergFixtureWriter:
    """Append/overwrite commits as real metadata bytes: parquet data
    files, Avro manifest + manifest-list per snapshot, vN.metadata.json
    + version-hint.text. Single-writer, test/fixture use only."""

    def __init__(self, path: str, schema_fields: list[dict]) -> None:
        self.path = path
        self.schema_fields = schema_fields  # iceberg JSON schema fields
        self.version = 0
        self.snapshots: list[dict] = []
        self.live: dict[str, int] = {}  # rel data path -> record count
        self._file_no = 0
        os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    def commit(
        self,
        pdf=None,
        remove_paths: list[str] | None = None,
        operation: str = "append",
    ) -> list[str]:
        """One snapshot: add ``pdf`` as a data file, drop
        ``remove_paths`` (table-relative). Returns added rel paths."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        for rp in remove_paths or []:
            self.live.pop(rp, None)
        added: list[str] = []
        if pdf is not None and len(pdf):
            rel = f"data/f-{self._file_no:05d}.parquet"
            self._file_no += 1
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                os.path.join(self.path, rel),
            )
            self.live[rel] = len(pdf)
            added.append(rel)
        sid = 1000 + len(self.snapshots)
        entries = [
            {
                "status": 1 if rel in added else 0,
                "snapshot_id": sid,
                "data_file": {
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(self.path, rel)
                    ),
                },
            }
            for rel, n in sorted(self.live.items())
        ]
        man_rel = f"metadata/manifest-{sid}.avro"
        with open(os.path.join(self.path, man_rel), "wb") as f:
            f.write(avroc.write_container(_MANIFEST_SCHEMA, entries))
        mlist_rel = f"metadata/snap-{sid}.avro"
        with open(os.path.join(self.path, mlist_rel), "wb") as f:
            f.write(
                avroc.write_container(
                    _MANIFEST_LIST_SCHEMA,
                    [
                        {
                            "manifest_path": man_rel,
                            "manifest_length": os.path.getsize(
                                os.path.join(self.path, man_rel)
                            ),
                            "content": 0,
                            "added_snapshot_id": sid,
                        }
                    ],
                )
            )
        parent = self.snapshots[-1]["snapshot-id"] if self.snapshots else None
        snap = {
            "snapshot-id": sid,
            "manifest-list": mlist_rel,
            "summary": {"operation": operation},
        }
        if parent is not None:
            snap["parent-snapshot-id"] = parent
        self.snapshots.append(snap)
        self.version += 1
        meta = {
            "format-version": 2,
            "table-uuid": f"fixture-{os.path.basename(self.path)}",
            "location": self.path,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": self.schema_fields,
                }
            ],
            "current-schema-id": 0,
            "current-snapshot-id": sid,
            "snapshots": self.snapshots,
        }
        with open(
            os.path.join(self.path, "metadata", f"v{self.version}.metadata.json"),
            "w",
            encoding="utf-8",
        ) as f:
            json.dump(meta, f)
        with open(
            os.path.join(self.path, "metadata", "version-hint.text"),
            "w",
            encoding="utf-8",
        ) as f:
            f.write(str(self.version))
        return added
