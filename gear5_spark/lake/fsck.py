"""Offline lake-table consistency checker (``fsck``).

Validates that a table's metadata and data agree, without a Spark job:

- every file referenced by ANY retained snapshot exists on disk
  (current-snapshot misses break reads; historical misses break time
  travel — both are errors, reported separately);
- (``deep=True``) the current snapshot's recorded per-file row counts
  match the parquet footers; unreadable/corrupt files are reported as
  ``corrupt_files``, never crash the check;
- the retained snapshot chain is contiguous (expiration trims the
  oldest prefix; a HOLE means lost metadata);
- data files on disk referenced by no retained snapshot are reported as
  orphans (uncommitted leftovers or vacuum candidates — informational,
  not an error: a concurrent writer's pending commit looks identical).

Bucket-scoping of manifest lists is correct by construction
(``_resolve_files`` filters on the declared bucket sets), so there is
deliberately no check for it here.

The reference has no durability layer at all (its sink is stdout,
``protocol/read.go:76``); this is part of the write-side rigor the
engine adds. Driver-side metadata/footer IO only — O(files) like
vacuum, intended as a maintenance command (CLI ``fsck``), not a hot
path.
"""

from __future__ import annotations

import os
from typing import Any

from gear5_spark.lake.table import DATA_DIR, LakeTable


def _referenced_paths(table: LakeTable) -> dict[str, list[int]]:
    """Table-relative data path -> retained snapshot versions that
    reference it (the same history walk vacuum's liveness is based on)."""
    refs: dict[str, list[int]] = {}
    for s in table.history():
        for f in s.files:
            refs.setdefault(f["path"], []).append(s.version)
    return refs


def fsck(table: LakeTable, deep: bool = False) -> dict[str, Any]:
    """Returns a report dict; ``report["ok"]`` is True when no ERRORS
    were found (orphans are informational)."""
    report: dict[str, Any] = {
        "missing_files": [],
        "missing_historical_files": [],
        "rowcount_mismatches": [],
        "corrupt_files": [],
        "version_holes": [],
        "orphan_files": [],
        "checked_files": 0,
        "deep": deep,
    }
    snap = table.snapshot()
    current_paths = {f["path"] for f in snap.files}
    refs = _referenced_paths(table)
    for rel in sorted(refs):
        full = os.path.join(table.table_dir, rel)
        report["checked_files"] += 1
        if not os.path.exists(full):
            if rel in current_paths:
                report["missing_files"].append(rel)
            else:
                report["missing_historical_files"].append(
                    {"path": rel, "versions": refs[rel]}
                )
    if deep:
        import pyarrow.parquet as pq

        for f in snap.files:
            if f.get("rows") is None or f["path"] in report["missing_files"]:
                continue
            full = os.path.join(table.table_dir, f["path"])
            try:
                actual = pq.ParquetFile(full).metadata.num_rows
            except Exception as exc:
                report["corrupt_files"].append(
                    {"path": f["path"], "error": str(exc)[:200]}
                )
                continue
            if actual != f["rows"]:
                report["rowcount_mismatches"].append(
                    {
                        "path": f["path"],
                        "recorded": f["rows"],
                        "actual": actual,
                    }
                )
    versions = table._list_versions()
    for a, b in zip(versions, versions[1:]):
        if b != a + 1:
            report["version_holes"].append({"after": a, "next": b})
    data_root = os.path.join(table.table_dir, DATA_DIR)
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            rel = os.path.relpath(
                os.path.join(dirpath, name), table.table_dir
            )
            if rel not in refs:
                report["orphan_files"].append(rel)
    report["ok"] = not (
        report["missing_files"]
        or report["missing_historical_files"]
        or report["rowcount_mismatches"]
        or report["corrupt_files"]
        or report["version_holes"]
    )
    return report
