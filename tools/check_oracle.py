"""Local replica of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at
the given scale factor, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by
their full value tuple). Run me before every commit that touches
plans/:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # mirror probable driver tolerance: exact compare is the goal,
                # but repr-level noise below 1e-9 is not a real mismatch
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from hive_hdfs_practise_spark import plans

    if os.environ.get("ORACLE_VANILLA"):
        # simulate the driver: a bare session with none of our confs
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("oracle-vanilla").getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    else:
        from hive_hdfs_practise_spark.session import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    results: dict[str, dict] = {}
    for name, fn in sorted(plans.QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # drop any intermediates the builder persist()ed so a
            # long sweep doesn't accumulate cached blocks
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "FAIL", "err": f"spark error: {exc}"}
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        oracle = plans.ORACLES.get(name)
        if oracle is None:
            results[name] = {"status": "rows_only", "spark_rows": len(srows)}
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.execute(oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "FAIL", "err": f"duckdb error: {exc}"}
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not status:
            sn, on_ = normalize(srows, scols), normalize(orows, ocols)
            if sn != on_:
                diff = [(x, y) for x, y in zip(sn, on_) if x != y][:3]
                status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append(name)
            results[name] = {"status": "FAIL", "err": "; ".join(status)}
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            results[name] = {
                "status": "OK",
                "spark_rows": len(srows),
                "secs": round(time.time() - t0, 1),
            }
            print(f"OK    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    out = os.environ.get("ORACLE_JSON")
    if out:
        import json

        n_ok = sum(1 for r in results.values() if r["status"] == "OK")
        n_rows_only = sum(1 for r in results.values() if r["status"] == "rows_only")
        with open(out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "n_ok": n_ok,
                    "n_rows_only": n_rows_only,
                    "n_fail": len(failures),
                    "failures": failures,
                    "results": results,
                },
                fh,
                indent=1,
            )
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
