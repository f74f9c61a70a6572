"""Ad-hoc best-of-N timer for a subset of registered queries.

    python tools/time_queries.py sf_dir name [name ...]
    N_RUNS=3 python tools/time_queries.py ...

Mirrors bench.py's discipline: session warm-ups first (JVM, Arrow
worker pool), best-of-N per query (this host's ~15% hypervisor CPU
steal makes single runs lie), clearCache between runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from hive_hdfs_practise_spark import plans  # noqa: E402
from hive_hdfs_practise_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    n_runs = int(os.environ.get("N_RUNS", "2"))
    spark = get_spark("time-queries")
    plans.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").collect()
    total = 0.0
    for name in names:
        fn = plans.QUERIES[name]
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        total += best
        print(f"{name}: {best:.2f}s")
    print(f"total: {total:.2f}s")


if __name__ == "__main__":
    main()
