"""Driver-contract tests: entry smoke, registry consistency, and the
sf0.001 oracle sweep (the cheap version of tools/check_oracle.py so
plain pytest catches parity regressions)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

# quadratic verifier + slow-by-design queries excluded from the
# in-test sweep (covered by tools/check_oracle.py pre-commit)
SWEEP_SKIP = {"dedup_ngram_jaccard", "dedup_simhash", "dedup_minhash_lsh"}


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema) == 10


def test_every_oracle_has_query():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


def test_comment_stripper_is_quote_aware():
    """The registry's `--`-comment stripper must treat `--` inside
    string literals / quoted identifiers as data (the old regex
    truncated the line there, and the EXPLAIN sweep only caught it
    when the mangled SQL happened not to parse)."""
    from hive_hdfs_practise_spark.plans.registry import _strip_sql_comments

    assert (
        _strip_sql_comments("SELECT 1 -- trailing\nFROM t")
        == "SELECT 1 \nFROM t"
    )
    kept = "SELECT * FROM t WHERE s LIKE '%--%' -- real comment"
    assert _strip_sql_comments(kept) == "SELECT * FROM t WHERE s LIKE '%--%' "
    escaped = "SELECT 'it''s -- not a comment' AS v"
    assert _strip_sql_comments(escaped) == escaped
    ident = 'SELECT "a--b" FROM t -- strip me'
    assert _strip_sql_comments(ident) == 'SELECT "a--b" FROM t '


def test_every_oracle_parses():
    """Guard against the comment-flattening class of bug: every
    registered oracle must EXPLAIN-parse in DuckDB after registry
    normalization, without touching data."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"{name}: oracle does not parse: {exc}")


def test_queries_callable_shape(spark):
    df = E.queries()["customer_count"](spark, SF)
    assert df.collect()[0].n_customers > 0


@pytest.mark.parametrize(
    "name", sorted(set(E.oracle_sql()) - SWEEP_SKIP)
)
def test_oracle_parity(spark, name):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sdf = E.queries()[name](spark, SF)
    res = con.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(ocols), "column names must match"
    assert len(srows) == len(orows), "row count mismatch"

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            (
                tuple(
                    round(r[i], 9) if isinstance(r[i], float) else r[i]
                    for i in order
                )
                for r in rows
            ),
            key=repr,
        )

    assert norm(srows, sdf.columns) == norm(orows, ocols)


def test_sql_text_interface(spark):
    """North-star surface: plain Spark SQL over registered views
    produces the same result as the DataFrame plan (same Catalyst
    plan either way)."""
    from hive_hdfs_practise_spark import plans
    from hive_hdfs_practise_spark.sources.catalog import register_views

    register_views(spark, SF)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = (
        plans.QUERIES["q1_pricing_summary"](spark, SF)
        .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))
