"""Derive next round's _FRONT from the UNION of all driver rounds.

The driver samples the FIRST ~50 registry entries each round
(CORRECTNESS_r{N}.json). _FRONT must pin, in order:
  1. every registry name that has NEVER produced a driver-side
     value-checked green row in ANY round (the r6 verdict's class:
     a per-round derivation missed a name whose only row was an
     r03-era `no_oracle`);
  2. the current round's new additions (never sampled by
     construction) — this tool lists them as "never sampled".

    python tools/derive_front.py        # prints the derived front

Output is a ready-to-paste Python list plus the evidence per name.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    from hive_hdfs_practise_spark.plans import QUERIES

    greens: dict[str, list[str]] = {}
    sampled: dict[str, list[str]] = {}
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = f.rsplit("CORRECTNESS_", 1)[-1].removesuffix(".json")
        d = json.load(open(f))
        for name, row in d.items():
            sampled.setdefault(name, []).append(rnd)
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok:
                greens.setdefault(name, []).append(rnd)

    names = list(QUERIES)
    never_green = [n for n in names if n not in greens]
    never_sampled = [n for n in names if n not in sampled]
    print(f"registry: {len(names)}  union-green: {len(greens)}")
    print(f"\nnever driver-green ({len(never_green)}):")
    for n in never_green:
        why = f"sampled {sampled[n]}" if n in sampled else "never sampled"
        print(f"  {n}  ({why})")
    print("\n_FRONT = [")
    for n in never_green:
        print(f'    "{n}",')
    print("]")
    stale = [n for n in names[:50] if n in greens and n not in never_green]
    if stale:
        print(
            f"\nnote: {len(stale)} of the current first-50 slots are already "
            "union-green and can drop out of _FRONT:"
        )
        for n in stale[:60]:
            print(f"  {n}  (green in {greens[n]})")


if __name__ == "__main__":
    main()
