"""Small-file compaction — the table-maintenance operator every
100 TB parquet estate runs continuously (what OPTIMIZE does in table
formats): many small files destroy scan throughput (per-file open
cost, tiny row groups, starved vectorized readers) and bloat the
file listing the planner must process.

Design points that matter at scale:

- **Rewrite cost is proportional to SMALL-file bytes only.** Files
  already at/above the target are left untouched — the plan selects
  victims under ``small_threshold`` and bin-packs only those.
- **Bin packing is first-fit-decreasing** on file size into
  ``target_bytes`` bins: FFD is the classic 11/9-OPT guarantee and
  keeps every output file near the target instead of producing one
  giant merged file plus crumbs.
- **Execution is one Spark job per bin group** reading exactly that
  group's files (`spark.read.parquet(*files)` prunes the listing to
  the group) and writing ``coalesce(1)`` — each output file is one
  bin, so output sizes track the plan. Bins are independent; a
  production scheduler would run them as parallel jobs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class CompactionPlan:
    bins: list = field(default_factory=list)      # list[list[path]]
    untouched: list = field(default_factory=list)  # list[path]
    small_bytes: int = 0
    total_bytes: int = 0


def plan_compaction(
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: float = 0.5,
) -> CompactionPlan:
    """Bin-pack every parquet file under ``path`` smaller than
    ``small_threshold * target_bytes`` into ``target_bytes`` bins,
    first-fit-decreasing. Files at/above the threshold are listed as
    untouched."""
    files = sorted(
        (
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    )
    sizes = {f: os.path.getsize(f) for f in files}
    plan = CompactionPlan(total_bytes=sum(sizes.values()))
    cutoff = small_threshold * target_bytes
    victims = sorted(
        (f for f in files if sizes[f] < cutoff),
        key=lambda f: (-sizes[f], f),
    )
    plan.untouched = [f for f in files if sizes[f] >= cutoff]
    plan.small_bytes = sum(sizes[f] for f in victims)
    bin_free: list = []  # parallel to plan.bins
    for f in victims:
        placed = False
        for i, free in enumerate(bin_free):
            if sizes[f] <= free:
                plan.bins[i].append(f)
                bin_free[i] -= sizes[f]
                placed = True
                break
        if not placed:
            plan.bins.append([f])
            bin_free.append(target_bytes - sizes[f])
    return plan


def compact_parquet(
    spark: SparkSession,
    path: str,
    out: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: float = 0.5,
) -> CompactionPlan:
    """Execute ``plan_compaction``: each bin becomes one output file
    under ``out``; untouched files are NOT rewritten (a production
    run would hard-link/move them — here they stay in place and the
    caller unions the two directories)."""
    plan = plan_compaction(path, target_bytes, small_threshold)
    for i, group in enumerate(plan.bins):
        (
            spark.read.parquet(*group)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"bin-{i:05d}"))
        )
    return plan
