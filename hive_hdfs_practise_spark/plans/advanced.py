"""Advanced operator plans: as-of join, TF-IDF, CUBE grouping —
operator classes beyond the reference's surface that a complete
engine (and a training-data pipeline) needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as tx
from ..sources.catalog import table, wide_table
from .registry import register


@register(
    "events_asof_join",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS side,
               CASE WHEN event_type = 'click' THEN value END AS cv,
               CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END AS cts
        FROM events
        WHERE event_type IN ('error', 'click')
    ), carried AS (
        SELECT user_id, event_id, ts, side,
               last_value(cv IGNORE NULLS) OVER w AS click_value_asof,
               last_value(cts IGNORE NULLS) OVER w AS click_ts_asof
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts,
           round(click_value_asof, 2) AS click_value_asof,
           click_ts_asof
    FROM carried WHERE side = 1
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (merge_asof semantics): each error event joined to
    the user's most recent click at or before it.

    Implemented via the union + carry-forward window (see
    ``operators/asof.py`` for the generic operator and the
    scale rationale: one co-partitioned shuffle, zero row
    amplification, vs the |L|×|R| blow-up of an inequality join).
    Deterministic ordering: (ts, side, event_id) is unique per user.
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "click")
    )
    ev = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("side"),
        F.when(F.col("event_type") == "click", F.col("value")).alias("cv"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("cts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "user_id",
        "event_id",
        "ts",
        "side",
        F.last("cv", ignorenulls=True).over(w).alias("click_value_asof"),
        F.last("cts", ignorenulls=True).over(w).alias("click_ts_asof"),
    )
    return carried.filter(F.col("side") == 1).select(
        "user_id",
        "event_id",
        "ts",
        F.round("click_value_asof", 2).alias("click_value_asof"),
        "click_ts_asof",
    )


@register(
    "text_tfidf_topk",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, t.word AS word
        FROM documents, unnest(regexp_extract_all(lower(trim(text)), '\S+')) AS t(word)
    ), tf AS (
        SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
    ), df AS (
        SELECT word, count(*) AS dfreq FROM tf GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word,
           round(tf * ln(CAST(n_docs AS DOUBLE) / dfreq), 6) AS tfidf
    FROM (
        SELECT tf.doc_id, tf.word, tf.tf, df.dfreq, n.n_docs,
               row_number() OVER (ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.dfreq) DESC,
                                  tf.doc_id, tf.word) AS rn
        FROM tf JOIN df USING (word), n
    )
    WHERE rn <= 20
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the corpus, global top-20 (doc, word) scores.

    Shuffle shape at scale: explode → (doc,word) partial-agg (tf) →
    word-agg (df) joined back onto tf on ``word`` → top-k
    (TakeOrdered, no global sort). No forced broadcast on df: the
    vocabulary grows with the corpus (Heaps' law — ~1e8 distinct
    tokens at 100 TB), so the hint is left to Catalyst/AQE, which
    broadcasts below the size threshold (true at every test SF) and
    falls back to a shuffle join on ``word`` — the same key df was
    just aggregated on, so only the tf side reshuffles."""
    d = wide_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf_raw",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
        )
    )
    return (
        scored.orderBy(F.desc("tfidf_raw"), F.asc("doc_id"), F.asc("word"))
        .limit(20)
        .select("doc_id", "word", F.round("tfidf_raw", 6).alias("tfidf"))
    )


@register(
    "sales_cube",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           o_orderstatus,
           round(sum(o_totalprice), 2) AS total_sales,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (1, 2)
    """,
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, status): all four grouping sets in one
    shuffle — the §2.4 'grouping sets' surface (ABSENT in the
    reference, engine-complete here)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            "o_orderstatus",
            "o_totalprice",
        )
        .cube("o_year", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "sales_grouping_sets",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           o_orderstatus,
           round(sum(o_totalprice), 2) AS total_sales,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((1), (2))
    """,
)
def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the asymmetric case cube/rollup
    can't express (per-year totals AND per-status totals, no
    cross product, no grand total) in ONE Expand+aggregate pass
    instead of a union of two scans."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "o_orderstatus",
            "o_totalprice",
        )
        .groupingSets([["o_year"], ["o_orderstatus"]], "o_year", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
