"""Fold per-chunk preflight --json records into one sweep artifact.

Usage: python scripts/merge_sweep.py OUT chunk1.json chunk2.json ...

Duplicate names take the LATEST chunk's record (re-runs of a
timed-out query overwrite the timeout row).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out, *chunks = sys.argv[1:]
    merged: dict[str, dict] = {}
    for p in chunks:
        merged.update(json.load(open(p)))
    counts: dict[str, int] = {}
    for row in merged.values():
        counts[row["status"]] = counts.get(row["status"], 0) + 1
    with open(out, "w") as f:
        json.dump(
            {"summary": counts, "queries": merged}, f, indent=1, sort_keys=True
        )
    print(f"{out}: {len(merged)} queries, {counts}")


if __name__ == "__main__":
    main()
