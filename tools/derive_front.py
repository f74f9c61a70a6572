"""Derive next round's _FRONT from the UNION of all driver rounds.

The driver samples the FIRST ~50 registry entries each round
(CORRECTNESS_r{N}.json). _FRONT must pin, in order:
  1. every registry name that has NEVER produced a driver-side
     value-checked green row in ANY round (the r6 verdict's class:
     a per-round derivation missed a name whose only row was an
     r03-era `no_oracle`);
  2. the current round's new additions (never sampled by
     construction) — this tool lists them as "never sampled";
  3. once the union is fully green (r7+), the front's job becomes
     RE-VALIDATION coverage: rotate in the greens whose most recent
     driver evidence is OLDEST, so every name's green stays fresh.

    python tools/derive_front.py        # prints the derived front

Output is a ready-to-paste Python list plus the evidence per name.
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FRONT_BUDGET = 50


def main() -> None:
    from hive_hdfs_practise_spark.plans import QUERIES

    greens: dict[str, list[str]] = {}
    sampled: dict[str, list[str]] = {}
    for f in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
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
    last_round = max(
        (r for rs in sampled.values() for r in rs), default="r00"
    )
    print(f"registry: {len(names)}  union-green: {len(greens)}")
    print(f"\nnever driver-green ({len(never_green)}):")
    for n in never_green:
        why = f"sampled {sampled[n]}" if n in sampled else "never sampled"
        print(f"  {n}  ({why})")

    # Rotation: greens whose latest evidence is oldest, skipping anything
    # the most recent round already covered.
    rotate = sorted(
        (n for n in names if n in greens and last_round not in greens[n]),
        key=lambda n: (max(greens[n]), names.index(n)),
    )
    front = list(dict.fromkeys(never_green + never_sampled))
    budget = FRONT_BUDGET - len(front)
    front += rotate[: max(budget, 0)]

    print(f"\n_FRONT ({len(front)} = never-green/new + stalest greens, "
          f"budget {FRONT_BUDGET}; last round = {last_round}):")
    print("_FRONT = [")
    for n in front:
        ev = f"green {greens[n]}" if n in greens else "never sampled"
        print(f'    "{n}",  # {ev}')
    print("]")


if __name__ == "__main__":
    main()
