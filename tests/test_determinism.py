"""Layout-independence: query results must not depend on the
physical file layout of the input (file count, row order within
files). The driver's parquet could arrive in any arrangement; every
LIMIT/window/iterative query carries explicit tiebreaks precisely
so this holds — this test catches any hidden order-dependence by
re-running order-sensitive queries against a re-partitioned,
re-ordered copy of the tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_hdfs_practise_spark import plans

SF = "/root/testdata/sf0.001"

# order-sensitive shapes: top-k, window rank, keep-latest, iterative
# label propagation, scalar-threshold filter, LSH candidate pairs
QUERIES = [
    "recommend_top15",
    "monthly_sales_ranked",
    "events_dedup_latest",
    "knn_brute_cosine",
    "q10_returned_items",
    "dedup_clusters",
    "events_ohlc_hourly",
]


@pytest.fixture(scope="module")
def relaid_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("relaid"))
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    )
    from hive_hdfs_practise_spark.sources.catalog import (
        _EVENTS_RAW_SCHEMA,
        events_ts_unit,
    )

    for t in tables:
        if t == "events" and events_ts_unit(SF) == "ns":
            # keep ts as raw int64 nanos so the catalog's explicit
            # long-schema read applies to the copy exactly as it does
            # to a TIMESTAMP(NANOS) original (the relaid copy's plain
            # int64 column is detected as 'ns' by the unit sniffer)
            df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(f"{SF}/{t}.parquet")
        else:
            # micros data round-trips natively (timestamp[us] logical
            # type is preserved by the plain read+write)
            df = spark.read.parquet(f"{SF}/{t}.parquet")
        # different file count AND different row order within files
        cols = df.columns
        df.repartition(5).sortWithinPartitions(F.desc(cols[0])).write.parquet(
            f"{out}/{t}.parquet"
        )
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_result_independent_of_layout(spark, relaid_dir, name):
    base = [tuple(r) for r in plans.QUERIES[name](spark, SF).collect()]
    alt = [tuple(r) for r in plans.QUERIES[name](spark, relaid_dir).collect()]
    # ordered compare for LIMIT/sorted queries; set compare otherwise
    assert sorted(map(repr, base)) == sorted(map(repr, alt))
    assert len(base) > 0
