"""Event-stream queries — batch forms of the streaming surface
(SURVEY.md §2.10) over the ``events`` table.

The reference's only genuinely stateful code is the GreilFS
heartbeat/liveness loop (``Server/managers.py:44-62``,
``Client/managers.py:22-37``). Its semantics — per-key last-seen
tracking with a silence timeout — are expressed here in batch form
(same plan works incrementally under Structured Streaming; the
streaming variants live in ``streaming/heartbeat.py`` and are
exercised by tests with ``Trigger.availableNow``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import table
from . import event_oracles as EO
from .registry import register


@register("events_hourly_tumbling", oracle=EO.HOURLY_TUMBLING)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (1h). In streaming form this is
    ``withWatermark('ts', ...).groupBy(window('ts', '1 hour'), ...)``
    — identical results on complete data; the batch form uses
    date_trunc so the oracle matches scalar-for-scalar."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "heartbeat_liveness",
    oracle="""
    WITH beats AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    last_seen AS (
        SELECT user_id AS node, max(ts) AS last_ts, count(*) AS n_beats
        FROM beats GROUP BY user_id
    ), horizon AS (SELECT max(ts) AS now_ts FROM beats)
    SELECT node, last_ts, n_beats,
           CASE WHEN last_ts < now_ts - INTERVAL 72 HOURS THEN 'Dead' ELSE 'Alive' END AS status
    FROM last_seen, horizon
    """,
)
def heartbeat_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 liveness monitor, batch form: per-node last-seen + timeout
    classification (node ≙ user_id, timeout scaled from the
    reference's 25 s silence threshold, ``Server/managers.py:54``,
    to the testdata's event cadence).

    The watermark horizon is max(ts) — a scalar aggregate joined
    back via a 1-row broadcast cross join, not a driver collect.
    Streaming form: ``streaming/heartbeat.py`` keeps the same state
    per key with ``applyInPandasWithState`` timeouts.
    """
    e = table(spark, sf_dir, "events")
    last_seen = e.groupBy(F.col("user_id").alias("node")).agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_beats")
    )
    horizon = e.agg(F.max("ts").alias("now_ts"))
    return (
        last_seen.join(F.broadcast(horizon))
        .select(
            "node",
            "last_ts",
            "n_beats",
            F.when(
                F.col("last_ts") < F.col("now_ts") - F.expr("INTERVAL 72 HOURS"),
                F.lit("Dead"),
            )
            .otherwise(F.lit("Alive"))
            .alias("status"),
        )
    )


@register(
    "events_sessionize",
    oracle="""
    WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                    THEN 1 ELSE 0 END AS is_new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               sum(is_new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) in batch form: the
    lag-gap-flag + running-sum idiom. One shuffle on user_id serves
    both window functions and the final per-session aggregate.
    Streaming equivalent: ``session_window('ts', '30 minutes')``.

    Ordering tie-break on (ts, event_id) keeps lag() deterministic
    when two events share a timestamp.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tiebreak in the running sum too: with ts-only
    # ordering, same-microsecond rows at a session boundary get
    # engine-unspecified peer order and the session_id assignment is
    # nondeterministic (the stream twin's r5 advice fix, applied to
    # the batch form)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # gap test at MICROSECOND precision (unix_micros), matching the
    # oracle's exact `ts - lag(ts) > INTERVAL 30 MINUTES`: the old
    # second-truncated cast("long") diff silently disagreed with the
    # oracle for fractional gaps inside (1800 s, 1801 s) — it passed
    # only when the corpus's fractional parts happened to floor the
    # same way (r5 review finding).
    flagged = e.withColumn(
        "is_new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new_session").over(run))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
        )
    )


@register("events_dedup_latest", oracle=EO.DEDUP_LATEST)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup by key: the standard CDC/compaction
    primitive (row_number() = 1 per key, ordered by recency). At
    scale this is one shuffle on the key; AQE handles skewed keys."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", F.round("value", 2).alias("value"))
    )


@register(
    "events_sliding_rate",
    oracle="""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS BIGINT) AS events_last_hour
    FROM events
    WHERE event_type = 'error'
    """,
)
def events_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-rate: per-user count of errors in the trailing
    hour (RANGE interval window) — the alerting-style sliding window
    from §2.10's mapping table."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "user_id",
        "ts",
        "event_id",
        F.count(F.lit(1)).over(w).alias("events_last_hour"),
    )


@register("events_click_purchase_join", oracle=EO.CLICK_PURCHASE_JOIN)
def events_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: purchases within one hour AFTER a
    click by the same user — the attribution-join shape. Equi-join
    on user_id carries the co-partitioning; the time-range predicate
    evaluates post-join (bounded fan-out per user). The streaming
    twin (stream_click_purchase_join) runs the same condition as a
    watermarked stream-stream join."""
    e = table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.round("value", 2).alias("purchase_value"),
        )
    )


@register("events_enriched_nation", oracle=EO.ENRICHED_NATION)
def events_enriched_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment of the event stream: every event picks up
    its user's nation. nation carries a broadcast hint (25 rows at
    every SF); customer GROWS with SF, so its join is left to
    Catalyst/AQE — auto-broadcast while it fits the threshold, a
    user_id-keyed shuffle join once it doesn't (a forced hint would
    OOM at the 100 TB design point). The streaming twin
    (stream_enriched_nation) runs the identical joins stream-static."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        e.join(c, e.user_id == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "event_id",
            "user_id",
            F.col("n_name").alias("nation"),
            "event_type",
            F.round("value", 2).alias("value"),
        )
    )


@register(
    "events_salted_join",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_events,
           round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skewed-fact-join form: SALT the fact side and replicate
    the dimension across the salt space (operators/skew.py::
    salted_join) so a hot user_id spreads over n_salt tasks instead
    of one. Semantically identical to the plain join — the oracle is
    the unsalted SQL. Companion to events_salted_agg (salted
    aggregation); together they cover the two shuffle shapes a
    dominant key can stall."""
    from ..operators.skew import salted_join

    e = table(spark, sf_dir, "events").select("user_id", "value")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(e, c, "user_id", n_salt=8)
    return (
        joined.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket
        FROM events
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts, event_id) AS rn_open,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_close
        FROM e
    )
    SELECT event_type, bucket,
           round(max(CASE WHEN rn_open = 1 THEN value END), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(max(CASE WHEN rn_close = 1 THEN value END), 2) AS close,
           count(*) AS n_events
    FROM ranked
    GROUP BY event_type, bucket
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style OHLC rollup: per (series, hour bucket) the
    first/max/min/last value — the time-series downsampling
    primitive (continuous-aggregate shape). First/last are
    deterministic via the (ts, event_id) tiebreak; the windows and
    the final aggregate share one (event_type, bucket) shuffle
    partitioning. At scale this rollup is written incrementally per
    closed window (see stream builders) — the batch form here is the
    backfill path."""
    e = table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    )
    w = Window.partitionBy("event_type", "bucket")
    ranked = e.withColumn(
        "rn_open", F.row_number().over(w.orderBy(F.asc("ts"), F.asc("event_id")))
    ).withColumn(
        "rn_close", F.row_number().over(w.orderBy(F.desc("ts"), F.desc("event_id")))
    )
    return (
        ranked.groupBy("event_type", "bucket")
        .agg(
            F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "lineitem_bloom_semi_join",
    oracle="""
    SELECT l.l_orderkey, l.l_suppkey,
           round(l.l_extendedprice, 2) AS l_extendedprice
    FROM lineitem l
    WHERE l.l_suppkey IN (
        SELECT s.s_suppkey
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
    )
    """,
)
def lineitem_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join accelerated by a broadcast BLOOM prefilter
    (operators/bloom.py): a 4096-bit md5-family filter over the
    dimension keys drops non-matching fact rows BEFORE the join
    shuffle (~97% of lineitem here). False positives only, so the
    exact semi join downstream keeps the oracle exact — the explicit
    form of AQE's runtime bloom filtering, available to any plan.
    The filter's bit family is md5-derived, so the same filter is
    reconstructible in any engine."""
    from ..operators.bloom import bloom_semi_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    return bloom_semi_join(li, s, "l_suppkey", "s_suppkey").select(
        "l_orderkey", "l_suppkey", F.round("l_extendedprice", 2).alias("l_extendedprice")
    )


@register(
    "lineitem_quality_report",
    oracle="""
    WITH s AS (
        SELECT count(*) AS n,
               count(l_orderkey) AS c_ok,
               count(l_quantity) AS c_q,
               count(DISTINCT (l_orderkey, l_linenumber)) AS u,
               sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS r_d,
               sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS r_q
        FROM lineitem
    )
    SELECT check_name, metric, metric = 1.0 AS passed
    FROM (
        SELECT 'completeness:l_orderkey' AS check_name,
               round(CAST(c_ok AS DOUBLE) / n, 6) AS metric FROM s
        UNION ALL
        SELECT 'completeness:l_quantity', round(CAST(c_q AS DOUBLE) / n, 6) FROM s
        UNION ALL
        SELECT 'unique:l_orderkey,l_linenumber', round(CAST(u AS DOUBLE) / n, 6) FROM s
        UNION ALL
        SELECT 'range:l_discount', round(CAST(r_d AS DOUBLE) / n, 6) FROM s
        UNION ALL
        SELECT 'range:l_quantity', round(CAST(r_q AS DOUBLE) / n, 6) FROM s
    )
    """,
)
def lineitem_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality validation (operators/checks.py): completeness,
    key uniqueness, and range conformance for the fact table — ALL
    constraints in one aggregate scan, unpivoted with stack() (a
    per-check union would replay the scan per constraint). The ETL
    gate that decides whether a batch lands."""
    from ..operators.checks import quality_report

    li = table(spark, sf_dir, "lineitem")
    return quality_report(
        li,
        completeness=["l_orderkey", "l_quantity"],
        unique=[["l_orderkey", "l_linenumber"]],
        ranges={"l_discount": (0.0, 0.1), "l_quantity": (1, 50)},
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_suppkey->supplier' AS fk, count(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part', count(*)
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'orders.o_custkey->customer', count(*)
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'events.user_id->customer', count(*)
    FROM events e WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit across the star schema: one LEFT ANTI join
    per relationship, counts unioned into one report — the companion
    to lineitem_quality_report for the constraints a single-table
    scan can't see. Zero counts are the passing state and are still
    value-checked. The audited dimensions (supplier/part/customer)
    all scale with SF, so no forced broadcast hint: Catalyst
    broadcasts the key-only projection while it fits and falls back
    to a key-partitioned shuffle anti join at 100 TB."""
    def orphans(fact: DataFrame, key: str, dim: DataFrame, dim_key: str, label: str):
        return (
            fact.join(dim, fact[key] == dim[dim_key], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    li = table(spark, sf_dir, "lineitem")
    report = orphans(
        li.select("l_suppkey"), "l_suppkey",
        table(spark, sf_dir, "supplier").select("s_suppkey"), "s_suppkey",
        "lineitem.l_suppkey->supplier",
    )
    report = report.unionByName(
        orphans(
            li.select("l_partkey"), "l_partkey",
            table(spark, sf_dir, "part").select("p_partkey"), "p_partkey",
            "lineitem.l_partkey->part",
        )
    )
    c = table(spark, sf_dir, "customer").select("c_custkey")
    report = report.unionByName(
        orphans(
            table(spark, sf_dir, "orders").select("o_custkey"), "o_custkey",
            c, "c_custkey", "orders.o_custkey->customer",
        )
    )
    return report.unionByName(
        orphans(
            table(spark, sf_dir, "events").select("user_id"), "user_id",
            c, "c_custkey", "events.user_id->customer",
        )
    )


# Time grain of the moving-median window shards. Output is invariant
# to this value (shards only re-key the physical partitioning and
# every shard carries its exact 99-row lookback), so it can be tuned
# per deployment: 'day' gives ~30 shards/type on the month-long
# testdata; a 100 TB deployment ingesting far more rows per day drops
# to 'hour'. A data-independent grain (vs bucketing the observed
# min/max range) needs no bounds pre-scan and keeps shard count
# growing with the data's time span.
_MEDIAN_SHARD_GRAIN = "day"


@register(
    "events_moving_median",
    oracle="""
    SELECT event_id, event_type,
           round(quantile_cont(value, 0.5) OVER (
               PARTITION BY event_type
               ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW), 4) AS moving_median
    FROM events
    """,
)
def events_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median of event value over the trailing 100 rows per
    event type — the robust-smoothing window class (rank-based
    aggregate over a rows frame, unlike the algebraic sliding sums
    of events_sliding_rate). Ordered by (ts, event_id) so the frame
    is unique and deterministic; both engines define percentile by
    linear interpolation, so the oracle is value-exact at 4 dp.

    Scale shape (r4): a plain ``partitionBy(event_type)`` window
    caps parallelism at |event_type| (~5) — one task sorts and
    buffers an entire type's rows. Instead the window runs per
    (event_type, time shard): ts is truncated to
    ``_MEDIAN_SHARD_GRAIN`` (no bounds pre-scan; shard count grows
    with the data's time span), and each shard is prepended with the
    99 rows that globally precede its first row (the "carried
    tail"), so every non-carried row's trailing ROWS frame inside
    its shard equals the global frame exactly. The tail is
    deterministic: a tiny per-shard count table (|types|x|shards|
    rows, derived from the rank pass's own partition counts — no
    second scan) yields each shard's global start rank; a broadcast
    self-join of that table maps (source shard, tail length) →
    target shard, covering shards so small the tail spans several
    predecessors. All three consumers (main rows, tail candidates,
    the count table) hang off one Exchange(event_type, shard), which
    Spark's exchange reuse evaluates once. Output is independent of
    the grain — shards only re-key the physical partitioning, so the
    SQL oracle is unchanged and stays value-exact. Parallelism now
    grows with the time span of the data instead of event-type
    cardinality; at 100 TB the same question can also run as the
    mergeable fixed-boundary histogram sketch
    (order_value_percentiles_approx) per tumbling window when 4-dp
    exactness is not required."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    unioned, w = _sharded_trailing_frame(spark, e, lookback=99)
    return (
        unioned.withColumn(
            "moving_median",
            F.round(F.percentile("value", F.lit(0.5)).over(w), 4),
        )
        .where(F.col("carried") == 0)
        .select("event_id", "event_type", "moving_median")
    )


def _sharded_trailing_frame(spark, e: DataFrame, lookback: int):
    """The r4 sharded trailing-ROWS-frame scaffolding shared by the
    rank-based window operators (moving median, MAD anomaly): returns
    ``(unioned, w)`` where ``unioned`` is the input re-keyed to
    (event_type, time shard) with each shard prepended by the
    ``lookback`` rows that globally precede it (flagged
    ``carried=1``), and ``w`` is the per-(event_type, shard) trailing
    window over (ts, event_id). Consumers compute frame aggregates
    over ``w``, then drop carried rows — the result is exactly the
    naive single-partition-per-type window, but with parallelism that
    grows with the data's time span. See events_moving_median's
    docstring for the full design rationale."""
    # Shard key: grain-truncated ts. Coarser than the (ts, event_id)
    # sort key, so equal-ts rows can never straddle a shard boundary
    # and carried rows always sort strictly before a shard's own rows.
    sharded = e.withColumn(
        "shard", F.date_trunc(_MEDIAN_SHARD_GRAIN, F.col("ts"))
    )
    # Explicit repartition (REPARTITION_BY_NUM) rather than letting
    # the Window insert ENSURE_REQUIREMENTS: AQE coalesces the latter
    # down to ~1 MB partitions on small inputs, silently re-serializing
    # the percentile stage (measured: 3.3 s coalesced vs 1.0 s pinned
    # at sf0.1) — the per-row frame recompute is CPU-dense, not
    # byte-dense, so byte-targeted coalescing is the wrong policy here.
    n_parts = spark.sparkContext.defaultParallelism
    rep = sharded.repartition(n_parts, "event_type", "shard")
    # One shuffled pass carrying both the within-shard ascending rank
    # and the shard size (same partitioning, one Exchange).
    wp = Window.partitionBy("event_type", "shard")
    wa = wp.orderBy("ts", "event_id")
    base = rep.select(
        "*",
        F.row_number().over(wa).alias("rn_asc"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )

    # Tiny rank table: each shard's global start rank within its
    # type, read off base's rn_asc==1 rows (no second scan of events).
    wc = Window.partitionBy("event_type").orderBy("shard")
    ranked = (
        base.where(F.col("rn_asc") == 1)
        .select("event_type", "shard", "cnt")
        .select(
            "event_type",
            "shard",
            (F.coalesce(
                F.sum("cnt").over(
                    wc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ) + 1).alias("start"),
            F.sum("cnt").over(
                wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("end"),
        )
    )
    # (source shard → target shard) pairs whose row ranges intersect
    # the target's lookback; tail_len = how many of the source
    # shard's last rows the target needs.
    src = ranked.select(
        F.col("event_type").alias("t"),
        F.col("shard").alias("src_shard"),
        F.col("end").alias("src_end"),
    )
    tgt = ranked.select(
        F.col("event_type").alias("t"),
        F.col("shard").alias("tgt_shard"),
        F.col("start").alias("tgt_start"),
    )
    tail_map = src.join(
        tgt,
        (src["t"] == tgt["t"])
        & (F.col("src_shard") < F.col("tgt_shard"))
        & (F.col("src_end") >= F.col("tgt_start") - lookback),
    ).select(
        src["t"].alias("event_type"),
        "src_shard",
        "tgt_shard",
        (F.col("src_end") - F.col("tgt_start") + lookback + 1).alias("tail_len"),
    )

    # Carried tails: the last min(lookback, tail_len) rows of each
    # source shard, re-keyed to the target shard. rn_desc =
    # cnt - rn_asc + 1 comes straight from the shared rank pass — no
    # descending re-sort, no second scan.
    tail_candidates = base.withColumn(
        "rn_desc", F.col("cnt") - F.col("rn_asc") + 1
    ).where(F.col("rn_desc") <= lookback)
    tails = (
        tail_candidates.join(
            F.broadcast(tail_map),
            (tail_candidates["event_type"] == tail_map["event_type"])
            & (tail_candidates["shard"] == tail_map["src_shard"])
            & (tail_candidates["rn_desc"] <= tail_map["tail_len"]),
        )
        .select(
            tail_candidates["event_id"],
            tail_candidates["event_type"],
            tail_candidates["ts"],
            tail_candidates["value"],
            F.col("tgt_shard").alias("shard"),
            F.lit(1).alias("carried"),
        )
    )
    unioned = (
        base.select("event_id", "event_type", "ts", "value", "shard")
        .withColumn("carried", F.lit(0))
        .unionByName(tails)
        .repartition(n_parts, "event_type", "shard")
    )

    w = (
        Window.partitionBy("event_type", "shard")
        .orderBy("ts", "event_id")
        .rowsBetween(-lookback, Window.currentRow)
    )
    return unioned, w


# Ordered-funnel conversion (the MATCH_RECOGNIZE / windowFunnel
# operator class): per user, the earliest signup, the earliest click
# STRICTLY after it, and the earliest purchase strictly after that —
# all within FUNNEL_DAYS of the funnel start. Reports users reaching
# each step. Strict ts ordering (ties excluded) keeps the step
# definition engine-exact at µs precision.
FUNNEL_DAYS = 7


@register(
    "events_funnel_conversion",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT ev.user_id, min(ev.ts) AS t2
           FROM ev JOIN s1 USING (user_id)
           WHERE ev.event_type = 'click' AND ev.ts > s1.t1
             AND ev.ts <= s1.t1 + INTERVAL {FUNNEL_DAYS} DAY
           GROUP BY ev.user_id),
    s3 AS (SELECT ev.user_id, min(ev.ts) AS t3
           FROM ev JOIN s1 USING (user_id) JOIN s2 USING (user_id)
           WHERE ev.event_type = 'purchase' AND ev.ts > s2.t2
             AND ev.ts <= s1.t1 + INTERVAL {FUNNEL_DAYS} DAY
           GROUP BY ev.user_id)
    SELECT step, step_name, n_users FROM (
        SELECT 1 AS step, 'signup' AS step_name, count(*) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click_within_{FUNNEL_DAYS}d', count(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase_within_{FUNNEL_DAYS}d', count(*) FROM s3
    )
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step counts (see note above). Scale shape (verified on
    the executed plan): each step reads only ITS event-type slice —
    the type filter pushes into the scan — and shuffles that slice
    once on user_id for its aggregate, so no event row ever crosses
    the wire more than once and the signup/click cohort tables join
    back as broadcasts while the funnel cohort is small (the common
    case: cohorts shrink monotonically down the funnel). When a
    cohort outgrows the broadcast threshold Catalyst degrades that
    join to a co-partitioned sort-merge on the same user_id keying.
    The final union is three 1-row aggregates. Adding steps adds one
    slice-shuffle each, never a re-shuffle of earlier steps."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    window_end = F.col("t1") + F.expr(f"INTERVAL {FUNNEL_DAYS} DAYS")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= window_end))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= window_end))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def cnt(df, step, name):
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        cnt(s1, 1, "signup")
        .unionByName(cnt(s2, 2, f"click_within_{FUNNEL_DAYS}d"))
        .unionByName(cnt(s3, 3, f"purchase_within_{FUNNEL_DAYS}d"))
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    cohort AS (
        -- CAST: DuckDB date_trunc returns DATE, Spark returns
        -- TIMESTAMP — align the output type
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT c.cohort_week,
               CAST(date_diff('week', c.cohort_week,
                              date_trunc('week', ev.ts)) AS INT) AS week_offset,
               ev.user_id
        FROM ev JOIN cohort c USING (user_id)
        WHERE date_trunc('week', ev.ts) >= c.cohort_week
    )
    SELECT cohort_week, week_offset,
           count(*) AS n_active
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by signup week, then
    counted as active in each whole-week offset from their cohort
    week — the standard retention triangle. Scale shape: the cohort
    table is one filtered-slice aggregate (signup rows only) that
    joins back as a broadcast while small / co-partitioned
    sort-merge at scale; the distinct + count pair shuffles on
    (cohort_week, week_offset, user_id) — map-side partial distinct
    collapses each user's events within a week before the exchange,
    so the shuffle carries at most one row per (user, week), not the
    event log. Week truncation keeps the offset arithmetic integer-
    exact across engines."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    act = (
        ev.join(cohort, "user_id")
        .withColumn("act_week", F.date_trunc("week", F.col("ts")))
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


# Robust anomaly detection: |value − median| > MAD_K × MAD over the
# same trailing 100-row frame as events_moving_median. Median +
# median-absolute-deviation is the outlier rule that survives the
# outliers themselves (mean/stddev z-scores get dragged by the very
# points they should flag). Both engines evaluate the identical
# interpolation arithmetic on the identical sorted frame, and the
# flag comparison is 9dp-rounded on both sides, so the emitted
# anomaly set is value-exact.
MAD_K = 3


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH ev AS (SELECT event_id, event_type, value,
                       CAST(ts AS TIMESTAMP) AS ts FROM events),
    m AS (
        SELECT event_id, event_type, value,
               list(value) OVER w AS arr,
               quantile_cont(value, 0.5) OVER w AS med
        FROM ev
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
    ),
    d AS (
        SELECT event_id, event_type, value, med,
               unnest(arr) AS x
        FROM m
    ),
    dm AS (
        SELECT event_id, event_type, value, med,
               quantile_cont(abs(x - med), 0.5) AS mad
        FROM d GROUP BY event_id, event_type, value, med
    )
    SELECT event_id, event_type,
           round(value, 4) AS value,
           round(med, 4) AS med,
           round(mad, 4) AS mad
    FROM dm
    WHERE round(abs(value - med), 9) > round({MAD_K} * mad, 9)
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates from the trailing-frame median by
    more than MAD_K MADs (see note above). Runs on the same
    ``_sharded_trailing_frame`` scaffolding as events_moving_median,
    so the rank-based frame work parallelizes over (event_type, time
    shard) instead of serializing per type.

    The deviation median is EXPLODE + a codegen'd ``percentile``
    hash aggregate — no interpreted array lambdas anywhere (the r1-r4
    form paid ~25 µs/row in a per-row transform+array_sort+fold;
    measured 3.8 s at sf0.1, 107 s at 40×). Crucially the aggregate
    adds NO shuffle: its grouping keys are a superset of the frame
    window's (event_type, shard) hash partitioning, which satisfies
    the aggregate's ClusteredDistribution, so the exploded deviations
    are consumed in place (plan-asserted in tests — exactly the two
    scaffolding exchanges). Per row the cost is ≤100 codegen'd
    abs+hash-insert ops and one 100-element JVM percentile buffer.
    Spark ``percentile`` / DuckDB ``quantile_cont`` is the same
    value-exact pairing the window median already relies on."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    unioned, w = _sharded_trailing_frame(spark, e, lookback=99)

    # med and arr are WINDOW expressions on purpose: a window output
    # is a materialized attribute, so downstream references see a
    # value, not an expression CollapseProject can inline per element
    # (the inlined form measured 152 s at sf0.1 vs ~4 s).
    framed = unioned.select(
        "*",
        F.percentile("value", F.lit(0.5)).over(w).alias("med"),
        F.collect_list("value").over(w).alias("arr"),
    ).where(F.col("carried") == 0)
    exploded = framed.select(
        "event_id",
        "event_type",
        "shard",
        "value",
        "med",
        F.explode("arr").alias("x"),
    )
    # event_id is globally unique, so grouping by it alone would be
    # correct — shard/event_type/value/med ride along to (a) keep the
    # grouping keys a superset of the upstream hash partitioning
    # (exchange-free aggregate) and (b) carry the output columns.
    dm = exploded.groupBy(
        "event_type", "shard", "event_id", "value", "med"
    ).agg(
        F.percentile(F.abs(F.col("x") - F.col("med")), F.lit(0.5)).alias(
            "mad"
        )
    )
    return dm.where(
        F.round(F.abs(F.col("value") - F.col("med")), 9)
        > F.round(MAD_K * F.col("mad"), 9)
    ).select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
    )


# Approximate scale path for the MAD anomaly rule: per-window
# fixed-boundary histogram sketches instead of per-row trailing-frame
# rank math. The exact form above is linear with a ~25 µs/row
# constant (collect_list frame rebuild + interpreted per-row sorts);
# this twin is two hash aggregates + two tiny joins — the per-window
# histograms merge by adding counts (the same mergeability contract
# as t-digest), so parallelism grows with data and the shuffle
# carries (key, bucket) counts, never values. Same machinery as
# order_value_percentiles_approx (plans/stats.py), proven value-
# exact cross-engine: every interpolation step is restated
# identically in the oracle.
_MAD_HIST_W = 5.0


def _hist_median_sql(src: str, key: str, val: str, out: str) -> str:
    """Fixed-boundary histogram median of ``val`` per (event_type, w)
    from ``src`` — cumulative-count crossing + in-bucket linear
    interpolation, 6dp-rounded so the downstream bucket assignment
    and flag comparison see an identical double in both engines."""
    W = _MAD_HIST_W
    return f"""
    {key}h AS (
        SELECT event_type, w, CAST(floor({val} / {W}) AS BIGINT) AS b,
               count(*) AS c
        FROM {src} GROUP BY 1, 2, 3
    ),
    {key}cum AS (
        SELECT event_type, w, b, c,
               sum(c) OVER (PARTITION BY event_type, w ORDER BY b) AS cum,
               sum(c) OVER (PARTITION BY event_type, w) AS n
        FROM {key}h
    ),
    {key}pick AS (
        SELECT event_type, w,
               round(CAST(b AS DOUBLE) * {W}
                     + {W} * (0.5 * n - (cum - c)) / c, 6) AS {out}
        FROM {key}cum
        WHERE (cum - c) < 0.5 * n AND cum >= 0.5 * n
    )"""


@register(
    "events_anomaly_mad_hist",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, event_type, value,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS w
        FROM events
    ),
    {_hist_median_sql('ev', 'm', 'value', 'med')},
    dev AS (
        SELECT ev.event_id, ev.event_type, ev.w, ev.value, mp.med,
               abs(ev.value - mp.med) AS d
        FROM ev JOIN mpick mp
          ON ev.event_type = mp.event_type AND ev.w = mp.w
    ),
    {_hist_median_sql('dev', 'd', 'd', 'mad')}
    SELECT dev.event_id, dev.event_type,
           -- TIMESTAMP (not DATE) so both engines materialize
           -- datetime64 through pandas — the r10 dtype-grain warn
           CAST(dev.w AS TIMESTAMP) AS window_start,
           round(dev.value, 4) AS value,
           round(dev.med, 4) AS med_est,
           round(dp.mad, 4) AS mad_est
    FROM dev JOIN dpick dp
      ON dev.event_type = dp.event_type AND dev.w = dp.w
    WHERE round(dev.d, 9) > round({MAD_K} * dp.mad, 9)
    """,
)
def events_anomaly_mad_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch MAD anomaly detection — the 100 TB twin of
    ``events_anomaly_mad``. Per (event_type, day) window: (1) one
    hash aggregate builds fixed-boundary value-bucket counts; (2)
    the window median is interpolated inside the bucket whose
    cumulative count crosses n/2 (6dp-rounded both engines so the
    deviation pass sees an identical double); (3) a second hash
    aggregate histograms |value − med| and interpolates the MAD the
    same way; (4) rows with |value − med| > MAD_K·MAD are flagged.

    Scale shape: the heavy inputs only ever pass through hash
    aggregates whose output cardinality is (windows × buckets) —
    mergeable map-side, so the exchanges carry counts. The two joins
    bring one row per (event_type, day) back to the events — tiny
    relative to the fact side at any SF (AQE broadcasts them; the
    cardinality grows with the time span, not the data volume, so no
    fixed-size broadcast hint). Estimate error is bounded by the
    bucket width; the estimates themselves are value-checked against
    the identical SQL restatement, not rows-only."""
    W = _MAD_HIST_W

    def hist_median(df: DataFrame, val: str, out: str) -> DataFrame:
        h = df.groupBy(
            "event_type",
            "w",
            F.floor(F.col(val) / W).cast("bigint").alias("b"),
        ).agg(F.count(F.lit(1)).alias("c"))
        win = Window.partitionBy("event_type", "w")
        cum = h.select(
            "event_type",
            "w",
            "b",
            "c",
            F.sum("c").over(win.orderBy("b")).alias("cum"),
            F.sum("c").over(win).alias("n"),
        )
        t = F.lit(0.5) * F.col("n")
        est = F.col("b").cast("double") * F.lit(W) + F.lit(W) * (
            t - (F.col("cum") - F.col("c"))
        ) / F.col("c")
        return cum.filter(
            ((F.col("cum") - F.col("c")) < t) & (F.col("cum") >= t)
        ).select("event_type", "w", F.round(est, 6).alias(out))

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.date_trunc("day", "ts").alias("w"),
    )
    med = hist_median(ev, "value", "med")
    dev = ev.join(med, ["event_type", "w"]).withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = hist_median(dev, "d", "mad")
    return (
        dev.join(mad, ["event_type", "w"])
        .where(F.round(F.col("d"), 9) > F.round(F.lit(MAD_K) * F.col("mad"), 9))
        .select(
            "event_id",
            "event_type",
            F.col("w").alias("window_start"),
            F.round("value", 4).alias("value"),
            F.round("med", 4).alias("med_est"),
            F.round("mad", 4).alias("mad_est"),
        )
    )


@register(
    "events_transition_matrix",
    oracle=EO.TRANSITION_MATRIX,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and row-normalized probabilities of
    event_type → next event_type (sequence mining's base table; the
    input to next-action prediction and funnel-drop diagnostics).

    Scale shape: one hash-partition exchange on user_id feeds the
    lead() window (per-user sequences sort within partitions), the
    pair counts reduce map-side before the (from, to) exchange, and
    the row-normalizing window runs over the ≤|types|² aggregate —
    driver-scale. Ordering inside a user is (ts, event_id): the
    unique tiebreak that keeps lead() deterministic across engines.
    The probability divides two exact integers — bit-identical
    before the 6dp round."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("p"),
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH ev AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS n, round(sum(value), 2) AS tv
        FROM ev GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM ev
    ),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM ev) t,
             bounds, unnest(generate_series(bounds.h0, bounds.h1,
                                            INTERVAL 1 HOUR)) AS g(h)
    )
    SELECT grid.event_type, grid.h AS hour,
           CAST(coalesce(hourly.n, 0) AS BIGINT) AS n_events,
           hourly.tv AS total_value,
           last_value(hourly.tv IGNORE NULLS)
               OVER (PARTITION BY grid.event_type ORDER BY grid.h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS total_value_ffill
    FROM grid LEFT JOIN hourly
      ON grid.event_type = hourly.event_type AND grid.h = hourly.h
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: the complete (event_type × hour)
    grid between the corpus's first and last hour, hourly counts
    zero-filled and the hourly value total forward-filled across
    gaps — the resample/densify operator every monitoring dashboard
    and feature pipeline needs before windowed models.

    Scale shape: the only corpus-sized stage is the hourly
    pre-aggregate (map-side combine). The grid is |types| ×
    |hours| — metadata-scale, built from a 1-row bounds aggregate
    broadcast-crossed with the distinct types (both engines restate
    the same construction); the left join back and the forward-fill
    window run over grid-sized data. The fill value is the
    2dp-rounded hourly total, so the carried value is bit-identical
    cross-engine."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = ev.select("event_type").distinct()
    grid = types.join(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.col("tv").alias("total_value"),
            F.last("tv", ignorenulls=True).over(w).alias("total_value_ffill"),
        )
    )


@register(
    "events_scd2_intervals",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type, ts, event_id,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flagged
    ),
    collapsed AS (
        SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
               min(event_type) AS event_type,
               min(ts) AS valid_from,
               count(*) AS n_events
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, run_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
               AS valid_to,
           CAST(n_events AS BIGINT) AS n_events
    FROM collapsed
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse
    each user's consecutive same-type event runs into validity
    intervals [valid_from, valid_to) — valid_to is the next run's
    start, NULL for the open current run. The gaps-and-islands →
    interval idiom every warehouse CDC pipeline runs.

    Scale shape: ONE hash exchange on user_id serves the change-flag
    window, the running-sum run numbering, the per-run aggregate,
    and the lead() that closes the intervals — four operators, one
    shuffle. Ordering inside a user is (ts, event_id), the unique
    tiebreak; run ids and counts are integers and the interval
    bounds are µs timestamps, so every emitted value is exact
    cross-engine."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn("run_id", F.sum("chg").over(run))
    collapsed = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("run_id")
    return collapsed.select(
        "user_id",
        "run_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events",
    )


# CUSUM change-point detection over hourly event rates. The
# textbook recursion s_h = max(0, s_{h-1} + (c_h − K)) is not a
# window function, but it has a closed form two windows CAN express:
# s_h = cum_h − min(0, min_{j≤h} cum_j) where cum is the running sum
# of (c_h − K). Everything is integer (counts, drift K, threshold H),
# so the whole detector is value-exact cross-engine. Hours with no
# events matter (they DECAY the statistic by K), hence the dense
# hour grid, same construction as events_gap_fill.
CUSUM_K = EO.CUSUM_K
CUSUM_H = EO.CUSUM_H


@register(
    "events_rate_cusum",
    oracle=EO.RATE_CUSUM,
)
def events_rate_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours where a type's event rate is in a sustained burst: the
    one-sided CUSUM statistic (drift CUSUM_K/hour) exceeds CUSUM_H
    (see closed-form note above) — change-point detection, the
    sequential-analysis complement of the per-row MAD outlier rule.

    Scale shape: the corpus collapses to per-(type, hour) counts
    map-side; the grid, running sum, and running min all operate on
    |types| × |hours| rows — metadata-scale, one partition key. The
    statistic is integer arithmetic end to end."""
    ev = table(spark, sf_dir, "events").select("event_type", "ts")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
                "h"
            ),
        )
    )
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    j = grid.join(c, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = j.select(
        "event_type", "h", "n", F.sum(F.col("n") - CUSUM_K).over(w).alias("cs")
    )
    cusum = (
        F.col("cs") - F.least(F.min("cs").over(w), F.lit(0))
    ).cast("bigint")
    return (
        cum.select(
            "event_type",
            F.col("h").alias("hour"),
            F.col("n").cast("bigint").alias("n_events"),
            cusum.alias("cusum"),
        )
        .where(F.col("cusum") > CUSUM_H)
    )


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        FROM events
    ), steps AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_us) AS BIGINT) AS span_us,
           round(sum(value * dt_us) / sum(dt_us), 6) AS twa_value
    FROM steps WHERE dt_us IS NOT NULL AND dt_us > 0
    GROUP BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user: treat each user's
    event stream as a step function (the value holds until the next
    event) and integrate — Σ value·Δt / Σ Δt. The irregular-sampling
    average a plain AVG gets wrong whenever event spacing correlates
    with value (the classic sensor/telemetry pitfall).

    Δt is exact integer microseconds from one lead() over the
    (user, ts, event_id) order — per-user windows, so parallelism
    grows with users, and one shuffle total (the groupBy reuses the
    window's user partitioning). Zero-length steps (same-µs ties)
    carry no weight and are excluded on both sides. The only float
    sum (Σ value·Δt) is rounded at 6dp after the division.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = e.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts", 1).over(w)) - F.unix_micros(F.col("ts"))
        ).alias("dt_us"),
    )
    return (
        steps.filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us"), 6
            ).alias("twa_value"),
        )
    )


# Row-pattern recognition (the MATCH_RECOGNIZE A{3,} shape — SQL:2016
# surface Spark lacks natively): maximal runs of >= RUN_MIN consecutive
# 'error' events per user, with run bounds and length.
RUN_MIN = 3


@register(
    "events_error_run_alerts",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, ts, is_err,
               CASE WHEN is_err = 1 AND coalesce(lag(is_err) OVER w, 0) = 0
                    THEN 1 ELSE 0 END AS run_start
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_id, ts, is_err,
               sum(run_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flagged
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
           min(ts) AS run_start_ts, max(ts) AS run_end_ts,
           count(*) AS run_len
    FROM runs WHERE is_err = 1
    GROUP BY user_id, run_id
    HAVING count(*) >= {RUN_MIN}
    """,
)
def events_error_run_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern alerting: maximal runs of >= RUN_MIN consecutive
    error events per user (the MATCH_RECOGNIZE ``(E){{3,}}`` pattern,
    composed from the gaps-and-islands idiom since Spark has no
    native row-pattern operator). A run is maximal by construction —
    bounded by non-error events or stream ends — so alerts don't
    re-fire for every suffix.

    One shuffle on user_id serves the lag flag, the running run-id,
    and the per-run aggregate. Deterministic ordering via the
    (ts, event_id) tiebreak; all outputs integer/µs-exact.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        is_err.alias("is_err"),
    ).withColumn(
        "run_start",
        F.when(
            (F.col("is_err") == 1)
            & (F.coalesce(F.lag("is_err").over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("run_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.filter(F.col("is_err") == 1)
        .groupBy("user_id", "run_id")
        .agg(
            F.min("ts").alias("run_start_ts"),
            F.max("ts").alias("run_end_ts"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .filter(F.col("run_len") >= RUN_MIN)
        .select(
            "user_id", "run_id", "run_start_ts", "run_end_ts", "run_len"
        )
    )


# Row-pattern recognition, 3-state form (MATCH_RECOGNIZE
# ``A B* C`` with per-match MEASURES — the r5 generalization of the
# single-state A{3,} islands above): click → any number of views →
# purchase, per user, consecutive rows. The declarative rule "for
# each C-row, the LATEST preceding non-B row must be an A" is
# exactly the automaton with greedy B* and AFTER MATCH SKIP PAST
# LAST ROW: a completed match's interior is all-B, so no other
# match can start inside it, and a failed prefix (A followed by a
# non-B non-C) is abandoned precisely when the carry-forward
# overwrites the A.
@register("events_pattern_browse_buy", oracle=EO.PATTERN_BROWSE_BUY)
def events_pattern_browse_buy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ``click (view)* purchase`` with per-match
    measures (see note above for the automaton-equivalence argument).
    Measures: view count (row-number difference), summed view value
    (difference of an INTEGER micro-unit running sum — float
    window-frame sums are engine-order-dependent, integers are not),
    and µs duration. All carry-forwards are ``last(..., ignorenulls)``
    over the same (user, ts, event_id) ordering, so ONE shuffle on
    user_id serves the row numbers, the running view-value sum, and
    the four carried A-row attributes; the per-row cost is constant.
    end_event_id keeps output rows unique (deterministic compare)."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    vmicro = F.round(F.col("value") * 1_000_000).cast("bigint")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    nonview = F.col("event_type") != "view"
    seq = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(wo).alias("rn"),
        F.sum(
            F.when(F.col("event_type") == "view", vmicro).otherwise(0)
        )
        .over(wcum)
        .alias("cumv"),
    )
    carried = seq.select(
        "*",
        F.last(F.when(nonview, F.col("rn")), ignorenulls=True)
        .over(wprev)
        .alias("rn_a"),
        F.last(F.when(nonview, F.col("event_type")), ignorenulls=True)
        .over(wprev)
        .alias("type_a"),
        F.last(F.when(nonview, F.col("ts")), ignorenulls=True)
        .over(wprev)
        .alias("ts_a"),
        F.last(F.when(nonview, F.col("cumv")), ignorenulls=True)
        .over(wprev)
        .alias("cumv_a"),
    )
    return carried.where(
        (F.col("event_type") == "purchase") & (F.col("type_a") == "click")
    ).select(
        "user_id",
        F.col("event_id").alias("end_event_id"),
        F.col("ts_a").alias("match_start_ts"),
        F.col("ts").alias("match_end_ts"),
        (F.col("rn") - F.col("rn_a") - 1).cast("int").alias("n_views"),
        F.round((F.col("cumv") - F.col("cumv_a")) / 1_000_000.0, 6).alias(
            "views_value"
        ),
        (F.unix_micros("ts") - F.unix_micros("ts_a")).alias("duration_us"),
    )


# Watermark lateness audit: how much data WOULD a given watermark
# delay drop, and how late is it? The testdata's events are recorded
# in (near-)event-time order — a vacuous arrival log — so the audit
# REPLAYS the stream in md5-scrambled arrival order (deterministic in
# both engines, and the worst case for out-of-orderness): the
# operator's math is arrival-source-agnostic, and a deployment feeds
# it the real ingestion sequence instead.
WM_DELAY_US = 2 * 3600 * 1_000_000
WM_BUCKET_US = 900 * 1_000_000  # 15-min lateness buckets


@register(
    "events_lateness_audit",
    oracle=f"""
    WITH ev AS (
        SELECT md5(CAST(event_id AS VARCHAR)) AS m, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    w AS (
        SELECT us,
               max(us) OVER (ORDER BY m, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
        FROM ev
    ),
    late AS (
        SELECT (hw - {WM_DELAY_US} - us) AS late_us
        FROM w WHERE hw IS NOT NULL AND us < hw - {WM_DELAY_US}
    )
    SELECT CAST(late_us // {WM_BUCKET_US} AS BIGINT) AS lateness_bucket,
           count(*) AS n_dropped,
           CAST(max(late_us) AS BIGINT) AS max_late_us
    FROM late GROUP BY 1
    """,
)
def events_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit: events a 2h event-time watermark
    would DROP (their timestamp is older than the high-water mark of
    everything that ARRIVED before them, minus the delay), bucketed
    into 15-min lateness bands — the diagnostic that sizes
    withWatermark() before deploying the streaming twins. Arrival
    order here is the md5-scrambled replay (see module note).

    The high-water mark is a running MAX over the arrival order,
    which has no partitions — so it runs two-level, like
    operators/prefix_sum.py but for max: per-(arrival-shard) running
    max plus each shard's broadcast prior-shard high-water mark (max
    is associative, and shards — the first two md5 hex chars — are
    monotone in the arrival order, so greatest(in-shard prior max,
    prior shards' max) IS the global prior high-water mark, exactly,
    in integer µs).
    """
    e = table(spark, sf_dir, "events").select(
        F.md5(F.col("event_id").cast("string")).alias("m"),
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    g = e.withColumn("shard", F.substring("m", 1, 2))
    ws = Window.partitionBy("shard").orderBy("m", "event_id")
    st = g.groupBy("shard").agg(F.max("us").alias("smax"))
    wf = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    off = st.select("shard", F.max("smax").over(wf).alias("prior_max"))
    w = (
        g.withColumn(
            "in_prev",
            F.max("us").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .join(F.broadcast(off), "shard")
        .select(
            "us",
            F.greatest(F.col("in_prev"), F.col("prior_max")).alias("hw"),
        )
    )
    late = w.filter(
        F.col("hw").isNotNull() & (F.col("us") < F.col("hw") - WM_DELAY_US)
    ).select((F.col("hw") - WM_DELAY_US - F.col("us")).alias("late_us"))
    return late.groupBy(
        F.expr(f"late_us div {WM_BUCKET_US}").cast("bigint").alias(
            "lateness_bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_dropped"),
        F.max("late_us").cast("bigint").alias("max_late_us"),
    )


# Top user journeys (r5): the per-session event-type PATH (ordered
# '>'-joined sequence), counted corpus-wide — the product-analytics
# companion of the funnel/sessionize family. Path construction is
# LAMBDA-FREE: an ordered-frame collect_list preserves frame order,
# so the session's last row holds the full ordered type sequence and
# one codegen array_join renders it; no per-session interpreted
# transform anywhere.
TOP_PATHS_K = 20


@register(
    "events_top_paths",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, event_type,
                       CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, event_type, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sess GROUP BY user_id, sid
    )
    SELECT path, n_sessions FROM (
        SELECT path, count(*) AS n_sessions,
               row_number() OVER (ORDER BY count(*) DESC, path) AS rn
        FROM paths GROUP BY path
    ) WHERE rn <= {TOP_PATHS_K}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {TOP_PATHS_K} session journeys (see note above). One
    user-keyed shuffle serves the gap flag, the running session id,
    the ordered path accumulation, and the per-session last-row
    pick; the path counting is a map-side-combining aggregate on
    path strings (bounded by the journey vocabulary, which
    saturates), and the final top-k ranks the path grid —
    metadata-scale."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # µs-exact gap, same as events_sessionize (see its note)
    flagged = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("sid", F.sum("is_new").over(run))
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    wsf = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ordered-frame collect_list preserves frame order; the session's
    # LAST row (rn_desc = 1 via count-over-partition minus rn) holds
    # the complete sequence
    seq = sess.select(
        "user_id",
        "sid",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id", "sid"))
        .alias("cnt"),
        F.array_join(F.collect_list("event_type").over(wsf), ">").alias(
            "path"
        ),
    ).where(F.col("rn") == F.col("cnt"))
    return (
        seq.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .select(
            "path",
            "n_sessions",
            F.row_number()
            .over(Window.orderBy(F.desc("n_sessions"), F.asc("path")))
            .alias("rn"),
        )
        .where(F.col("rn") <= TOP_PATHS_K)
        .select("path", "n_sessions")
    )


# Stationary distribution of the event-type Markov chain (r10) —
# where a user's long-run attention settles (the steady state the
# transition matrix implies; the session-mix planning number). The
# pagerank lesson applies verbatim: an ITERATIVE aggregate is
# cross-engine bit-exact only in integer arithmetic — mass is a
# ×1e12 fixed-point integer vector, each step distributes
# (v_i · n_ij) div row_i per EDGE (truncating div; products reach
# SCALE·n ≈ 1e20 at 40×, so DECIMAL(38,0)/HUGEINT, never int64),
# and dangling states (appear as a to_type but never transition out)
# get an explicit self-loop so no mass leaks. MARKOV_ROUNDS fixed
# rounds unrolled in the oracle (MATERIALIZED round CTEs — the
# doubly-referenced-CTE rule).
MARKOV_SCALE = 10**12
MARKOV_ROUNDS = 20


def _markov_stationary_oracle() -> str:
    parts = [
        """
    WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events
    ),
    seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM ev
    ),
    c AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ),
    states AS (
        SELECT from_type AS t FROM c
        UNION
        SELECT to_type FROM c
    ),
    outs AS (
        SELECT s.t, coalesce(sum(c.n), 0) AS row_n
        FROM states s LEFT JOIN c ON c.from_type = s.t GROUP BY s.t
    ),
    edges AS MATERIALIZED (
        SELECT from_type, to_type, CAST(n AS HUGEINT) AS n FROM c
        UNION ALL
        SELECT t, t, CAST(1 AS HUGEINT) FROM outs WHERE row_n = 0
    ),
    rows_ AS (
        SELECT from_type, sum(n) AS rn FROM edges GROUP BY from_type
    ),
    v0 AS (
        SELECT t,
               CAST({scale} AS HUGEINT)
                   // (SELECT count(*) FROM states) AS v
        FROM states
    )""".format(scale=MARKOV_SCALE)
    ]
    for k in range(1, MARKOV_ROUNDS + 1):
        parts.append(
            f"""v{k} AS MATERIALIZED (
        SELECT s.t,
               coalesce(sum((v.v * e.n) // r.rn), 0) AS v
        FROM states s
        LEFT JOIN edges e ON e.to_type = s.t
        LEFT JOIN v{k - 1} v ON v.t = e.from_type
        LEFT JOIN rows_ r ON r.from_type = e.from_type
        GROUP BY s.t
    )"""
        )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT t AS event_type, CAST(v AS BIGINT) AS stationary_fp
    FROM v{MARKOV_ROUNDS}
    """
    )


@register("events_markov_stationary", oracle=_markov_stationary_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type transition chain
    (see note above): per event type, the ×1e12 fixed-point long-run
    mass after {MARKOV_ROUNDS} integer power-iteration rounds.

    Scale shape: the ONLY corpus-sized work is the per-user lead()
    chain build (one exchange on user_id) reduced to the ≤|types|²
    count matrix, which is collected (metadata-scale — the MMR
    bounded-collect precedent) and iterated driver-side on exact
    Python ints (non-negative values make // == engine trunc div; a
    DataFrame loop measured ~4 s of pure per-round job overhead on a
    25-cell matrix). Integer arithmetic end to end. Collects at plan
    time: BUILD_EXECUTES."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # the count matrix is metadata-scale (≤ |types|² rows) — the
    # iteration runs driver-side on exact Python ints (the MMR
    # bounded-collect precedent; 20 tiny Spark jobs measured ~4 s of
    # pure scheduling overhead). Every value is non-negative, so
    # Python's flooring // equals the engines' truncating div.
    counts = {(r.from_type, r.to_type): int(r.n) for r in c.collect()}
    states = sorted(
        {t for ft, tt in counts for t in (ft, tt)}
    )
    row_n = {t: 0 for t in states}
    for (ft, _), n in counts.items():
        row_n[ft] += n
    for t in states:
        if row_n[t] == 0:
            counts[(t, t)] = 1
            row_n[t] = 1
    v = {t: MARKOV_SCALE // len(states) for t in states} if states else {}
    for _ in range(MARKOV_ROUNDS):
        nv = {t: 0 for t in states}
        for (ft, tt), n in counts.items():
            nv[tt] += (v[ft] * n) // row_n[ft]
        v = nv
    out = [(t, v[t]) for t in states]
    return spark.createDataFrame(
        out, "event_type string, stationary_fp long"
    )


# Change-point detection by BINARY SEGMENTATION (r11) — the offline
# twin of events_rate_cusum: find the BINSEG_ROUNDS largest level
# shifts in the daily event-volume series by recursively splitting at
# the point that maximizes the SSE reduction (the classic top-down
# changepoint algorithm; Scott & Knott 1974 lineage). Exactness: the
# corpus collapses to the observed-day grid in ONE hash aggregate
# (metadata scale — |days| rows no matter the corpus), and every
# split score is a FIXED-POINT integer: with S/Q/n the segment's
# exact integer sum / sum-of-squares / length,
#   SSE_fp = Q·SCALE − (S²·SCALE) div n
# (DECIMAL(38,0) products, truncating div — Spark decimal `div` ==
# DuckDB HUGEINT `//`, the outlier-audit idiom), and the round picks
# argmax of ΔSSE_fp = SSE_fp(seg) − SSE_fp(left) − SSE_fp(right)
# with the day as tiebreak — deterministic and engine-identical by
# construction (the RRF fixed-point idiom). SCALE=1000 bounds the
# div quotient: S²·SCALE div n must fit Spark's BIGINT quotient, so
# segments up to ~1e8·√n events are safe; beyond that drop SCALE.
# Cumulative S/Q come from per-segment ordered windows over the
# GRID (integer window sums are combine-order-exact), so each round
# is one window pass + one TakeOrdered(1) — no corpus rescan (the
# grid checkpoints once: BUILD_EXECUTES).
BINSEG_ROUNDS = 3
BINSEG_SCALE = 1000


def _binseg_round_frame(g: DataFrame) -> DataFrame:
    """One binary-segmentation round over (dd, x, seg): the 1-row
    (dd, delta) argmax of the fixed-point SSE reduction across every
    admissible split of every current segment."""
    w = Window.partitionBy("seg").orderBy("dd")
    ws = Window.partitionBy("seg")
    xd = F.col("x").cast("decimal(38,0)")
    t = g.select(
        "dd",
        "seg",
        F.sum(xd).over(w).alias("s"),
        F.sum(xd * xd).over(w).alias("q"),
        F.row_number().over(w).alias("i"),
        F.sum(xd).over(ws).alias("st"),
        F.sum(xd * xd).over(ws).alias("qt"),
        F.count(F.lit(1)).over(ws).alias("nt"),
    )
    delta = F.expr(
        f"(qt * {BINSEG_SCALE}"
        f" - (st * st * {BINSEG_SCALE}) div CAST(nt AS DECIMAL(38,0)))"
        f" - (q * {BINSEG_SCALE}"
        f" - (s * s * {BINSEG_SCALE}) div CAST(i AS DECIMAL(38,0)))"
        f" - ((qt - q) * {BINSEG_SCALE}"
        f" - ((st - s) * (st - s) * {BINSEG_SCALE})"
        f" div CAST(nt - i AS DECIMAL(38,0)))"
    )
    return (
        t.where(F.col("i") < F.col("nt"))
        .select("dd", delta.alias("delta"))
        .orderBy(F.desc("delta"), "dd")
        .limit(1)
    )


def _binseg_round_sql(tag: int, seg_expr: str) -> str:
    h = "CAST(x AS HUGEINT)"
    return f"""
    c{tag} AS (SELECT dd, x, {seg_expr} AS seg FROM g),
    t{tag} AS (
        SELECT dd, seg,
               sum({h}) OVER (PARTITION BY seg ORDER BY dd) AS s,
               sum({h} * {h}) OVER (PARTITION BY seg ORDER BY dd) AS q,
               row_number() OVER (PARTITION BY seg ORDER BY dd) AS i,
               sum({h}) OVER (PARTITION BY seg) AS st,
               sum({h} * {h}) OVER (PARTITION BY seg) AS qt,
               count(*) OVER (PARTITION BY seg) AS nt
        FROM c{tag}
    ),
    d{tag} AS (
        SELECT dd,
               (qt * {BINSEG_SCALE}
                - (st * st * {BINSEG_SCALE}) // CAST(nt AS HUGEINT))
               - (q * {BINSEG_SCALE}
                  - (s * s * {BINSEG_SCALE}) // CAST(i AS HUGEINT))
               - ((qt - q) * {BINSEG_SCALE}
                  - ((st - s) * (st - s) * {BINSEG_SCALE})
                    // CAST(nt - i AS HUGEINT)) AS delta
        FROM t{tag} WHERE i < nt
    ),
    p{tag} AS MATERIALIZED (
        SELECT dd AS bp, delta FROM d{tag}
        ORDER BY delta DESC, dd LIMIT 1
    )"""


def _binseg_oracle() -> str:
    segs = [
        "0",
        "CASE WHEN dd > (SELECT bp FROM p1) THEN 1 ELSE 0 END",
        "(CASE WHEN dd > (SELECT bp FROM p1) THEN 1 ELSE 0 END"
        " + CASE WHEN dd > (SELECT bp FROM p2) THEN 1 ELSE 0 END)",
    ]
    rounds = ",".join(
        _binseg_round_sql(r + 1, seg) for r, seg in enumerate(segs)
    )
    outs = "\n    UNION ALL ".join(
        f"SELECT {r} AS cp_round,"
        f" CAST(DATE '1970-01-01' + CAST(bp AS INTEGER) AS TIMESTAMP)"
        f" AS change_day,"
        f" CAST(delta AS BIGINT) AS sse_drop_fp FROM p{r}"
        for r in range(1, BINSEG_ROUNDS + 1)
    )
    return f"""
    WITH g AS MATERIALIZED (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
                   AS dd,
               count(*) AS x
        FROM events GROUP BY 1
    ),{rounds}
    {outs}
    """


@register("events_change_points", oracle=_binseg_oracle())
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BINSEG_ROUNDS} change points of the daily event-volume
    series by exact fixed-point binary segmentation (design note
    above): per round, the (segment, split) pair with the largest
    integer SSE reduction becomes a breakpoint, and the next round
    re-segments on it. Output: (cp_round, change_day, sse_drop_fp).

    Scale shape: ONE corpus-scale hash aggregate builds the
    observed-day grid (mergeable map-side counts), checkpointed;
    each round is a per-segment window pass + TakeOrdered(1) over
    grid-sized data. Breakpoints feed the next round via 1-row
    broadcast crossJoins — no corpus rescans, no driver loop.
    Grid checkpoint at plan time: BUILD_EXECUTES."""
    e = table(spark, sf_dir, "events")
    g = (
        e.groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("dd")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=True)
    )
    p1 = _binseg_round_frame(g.withColumn("seg", F.lit(0)))
    b1 = p1.select(F.col("dd").alias("bp1"))
    g2 = g.crossJoin(F.broadcast(b1)).withColumn(
        "seg", (F.col("dd") > F.col("bp1")).cast("int")
    )
    p2 = _binseg_round_frame(g2.select("dd", "x", "seg"))
    b2 = p2.select(F.col("dd").alias("bp2"))
    g3 = (
        g.crossJoin(F.broadcast(b1))
        .crossJoin(F.broadcast(b2))
        .withColumn(
            "seg",
            (F.col("dd") > F.col("bp1")).cast("int")
            + (F.col("dd") > F.col("bp2")).cast("int"),
        )
    )
    p3 = _binseg_round_frame(g3.select("dd", "x", "seg"))
    day_ts = (
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("dd"))
        .cast("timestamp")
        .alias("change_day")
    )
    parts = [
        p.select(
            F.lit(r).cast("int").alias("cp_round"),
            day_ts,
            F.col("delta").cast("bigint").alias("sse_drop_fp"),
        )
        for r, p in ((1, p1), (2, p2), (3, p3))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Holt linear-trend smoothing (r11) — the FORECASTING operator of the
# events family (the offline companion of the stream monitors):
# exponentially-weighted level+trend over the daily event-volume
# series, h=1..7-day-ahead forecasts, and the in-sample one-step SSE.
# Exactness: the series lives in x1000 fixed-point BIGINTs and the
# recursion uses alpha = beta = 1/4 as integer arithmetic with
# truncating div (Spark `div` == DuckDB `//`, toward zero on both,
# negatives included — trends go negative), so every state value is
# an exact integer. The recursion is inherently SEQUENTIAL; it
# crosses engines as a Spark aggregate(array_sort(collect_list(...)))
# struct fold — snapshot semantics, verified equal to a Python-int
# reference — against a DuckDB RECURSIVE CTE stepping t -> t+1 over
# the row-numbered grid. NOT DuckDB list_reduce: measured (r11),
# DuckDB 1.0's list_reduce MUTATES a struct accumulator
# field-by-field, so later field expressions see already-updated
# earlier fields (the trend computed with the NEW level) — a
# cross-engine trap for any MULTI-FIELD fold; the scalar list_reduce
# folds (orders_survival_km, documents_temperature_mix) are
# unaffected. The ONE update-expression generator below feeds both
# dialects (the _zorder_expr pattern), so the twins cannot drift.
HOLT_FP = 1000
HOLT_H = 7


def _holt_exprs(x: str, l: str, b: str, div: str) -> tuple[str, str, str]:
    """(new_level, new_trend, one_step_error) update expressions over
    the previous state — div is 'div' (Spark) or '//' (DuckDB).
    l_1 = x_1, b_1 = 0 is the documented init; alpha = beta = 1/4."""
    lt = f"(({x} + 3 * ({l} + {b})) {div} 4)"
    bt = f"(({lt} - {l} + 3 * {b}) {div} 4)"
    err = f"({x} - ({l} + {b}))"
    return lt, bt, err


def _holt_oracle() -> str:
    lt, bt, err = _holt_exprs("g.gx", "r.l", "r.b", "//")
    fcols = ",\n           ".join(
        f"CAST(l + {h} * b AS BIGINT) AS f{h}_fp"
        for h in range(1, HOLT_H + 1)
    )
    return f"""
    WITH RECURSIVE g0 AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01'
                   AS dd,
               CAST(count(*) * {HOLT_FP} AS BIGINT) AS gx
        FROM events GROUP BY 1
    ),
    g AS MATERIALIZED (
        SELECT gx, row_number() OVER (ORDER BY dd) AS i FROM g0
    ),
    rec AS (
        SELECT CAST(1 AS BIGINT) AS t, gx AS l, CAST(0 AS BIGINT) AS b,
               CAST(0 AS BIGINT) AS sse
        FROM g WHERE i = 1
        UNION ALL
        SELECT r.t + 1, {lt}, {bt}, r.sse + {err} * {err}
        FROM rec r JOIN g ON g.i = r.t + 1
    )
    SELECT CAST(t AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_fp,
           CAST(b AS BIGINT) AS trend_fp,
           CAST(sse AS BIGINT) AS sse_fp,
           {fcols}
    FROM rec WHERE t = (SELECT count(*) FROM g)
    """


@register("events_holt_forecast", oracle=_holt_oracle())
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of daily event volume (design note
    above): one row — days observed, final level/trend (×{HOLT_FP}
    fixed point), in-sample one-step SSE, and the h=1..{HOLT_H}
    day-ahead forecasts level + h·trend.

    Scale shape: ONE corpus-scale hash aggregate collapses events to
    the observed-day grid (mergeable map-side counts); the
    grid-sized series then folds SEQUENTIALLY in a single
    aggregate() — metadata-scale by construction (|days| elements no
    matter the corpus), the only honest shape for an order-dependent
    recursion. SSE is Σ(x1000 err)² in BIGINT — fine to ~1e5 events/
    day at decade grids; beyond that drop HOLT_FP."""
    prev_l = "(CASE WHEN acc.i = 1 THEN acc.x ELSE acc.l END)"
    prev_b = "(CASE WHEN acc.i = 1 THEN CAST(0 AS BIGINT) ELSE acc.b END)"
    lt, bt, err = _holt_exprs("e.x", prev_l, prev_b, "div")
    mk = (
        f"named_struct('l', {lt}, 'b', {bt}, 'x', e.x,"
        f" 'i', acc.i + CAST(1 AS BIGINT),"
        f" 'sse', acc.sse + {err} * {err})"
    )
    step = f"CASE WHEN acc.i = CAST(0 AS BIGINT) THEN e ELSE {mk} END"
    e = table(spark, sf_dir, "events")
    g = e.groupBy(
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dd")
    ).agg((F.count(F.lit(1)) * HOLT_FP).cast("bigint").alias("xfp"))
    arr = g.agg(
        F.expr(
            # element 'l' seeds to the value itself (l_1 = x_1), so a
            # SINGLE-day corpus already carries the correct final
            # level without a second fold step reaching the lazy-init
            # CASE (r11 review: st.l read 0 vs the oracle's anchor
            # l = gx on a one-day corpus)
            "transform(array_sort(collect_list(struct(dd, xfp))),"
            " s -> named_struct('l', s.xfp,"
            " 'b', CAST(0 AS BIGINT), 'x', s.xfp,"
            " 'i', CAST(1 AS BIGINT), 'sse', CAST(0 AS BIGINT)))"
        ).alias("es")
    )
    zero = (
        "named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),"
        " 'x', CAST(0 AS BIGINT), 'i', CAST(0 AS BIGINT),"
        " 'sse', CAST(0 AS BIGINT))"
    )
    folded = arr.select(
        F.expr(f"aggregate(es, {zero}, (acc, e) -> {step})").alias("st")
    )
    fcols = [
        (F.col("st.l") + h * F.col("st.b")).cast("bigint").alias(f"f{h}_fp")
        for h in range(1, HOLT_H + 1)
    ]
    return folded.where(F.col("st.i") > 0).select(
        F.col("st.i").cast("bigint").alias("n_days"),
        F.col("st.l").cast("bigint").alias("level_fp"),
        F.col("st.b").cast("bigint").alias("trend_fp"),
        F.col("st.sse").cast("bigint").alias("sse_fp"),
        *fcols,
    )


# Purchase ATTRIBUTION (r11) — the funnel-analytics operator every
# marketing/product stack runs: each purchase is credited to a
# touch-point channel (here: the event_type of a non-purchase event)
# under the two textbook models — LAST-touch (the latest non-purchase
# event strictly before the purchase in the user's stream) and
# FIRST-touch (the earliest). Purchases with no preceding touch
# credit the 'direct' sentinel (never NULL — NULL channels would
# float the driver canon and NULL-order differs cross-engine).
# Exactness: per-user ordering is (ts, event_id) — the unique
# tiebreak rule; both models are one IGNORE-NULLS window value over
# the unbounded-preceding-to-1-preceding frame (Spark first/last
# (ignorenulls) == DuckDB first_value/last_value IGNORE NULLS, probe-
# verified); revenue is exact cents.
ATTR_DIRECT = "direct"


@register(
    "events_purchase_attribution",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    t AS (
        SELECT user_id, event_id, event_type, value,
               first_value(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                   OVER w AS ft,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER w AS lt
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (
        SELECT coalesce(ft, '{ATTR_DIRECT}') AS ft,
               coalesce(lt, '{ATTR_DIRECT}') AS lt,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM t WHERE event_type = 'purchase'
    )
    SELECT 'first_touch' AS model, ft AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM p GROUP BY ft
    UNION ALL
    SELECT 'last_touch', lt, CAST(count(*) AS BIGINT),
           CAST(sum(cents) AS BIGINT)
    FROM p GROUP BY lt
    """,
)
def events_purchase_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch and last-touch purchase attribution per channel
    (design note above): (model, channel, n_purchases, value_cents).

    Scale shape: ONE exchange on user_id feeds both window models
    (same partitioning, same ordered frame — one sort serves both
    IGNORE-NULLS values); each purchase then EXPLODES into its two
    (model, channel) credits and ONE hash aggregate builds the grid —
    a union of two groupBys would re-run the scan+window pass per
    branch (the r6 AQE-no-dedupe lesson; r11 review). Nothing
    quadratic, nothing collected."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase", F.col("event_type")
    )
    t = ev.select(
        "event_type",
        "value",
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    )
    p = t.where(F.col("event_type") == "purchase").select(
        F.coalesce(F.col("ft"), F.lit(ATTR_DIRECT)).alias("ft"),
        F.coalesce(F.col("lt"), F.lit(ATTR_DIRECT)).alias("lt"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    credits = p.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("ft").alias("channel"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("lt").alias("channel"),
                ),
            )
        ).alias("mc"),
        "cents",
    )
    return (
        credits.groupBy(
            F.col("mc.model").alias("model"),
            F.col("mc.channel").alias("channel"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("value_cents"),
        )
        .select("model", "channel", "n_purchases", "value_cents")
    )


# Inter-event-timing BOT detection (r11) — the crawl/traffic-hygiene
# screen a training-data pipeline runs before trusting clickstream-
# derived corpora: scripted clients fire at machine cadence, so a
# user whose MEDIAN inter-event gap is sub-second is flagged. Exact
# integers end to end: gaps are epoch-microsecond differences over
# the per-user (ts, event_id)-ordered stream; the median is the
# LOWER median (the ⌈n/2⌉-th order statistic — an actual gap value,
# never an interpolated float); the mean is a truncating integer
# div. The value at the median rank is deterministic even under
# row_number ties because the ordering key IS the value.
BOT_MIN_GAPS = 5
BOT_BURST_US = 1_000_000


@register(
    "events_bot_detection",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    g AS (
        SELECT user_id,
               us - lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS gap
        FROM ev
        QUALIFY gap IS NOT NULL
    ),
    r AS (
        SELECT user_id, gap,
               row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n,
               sum(gap) OVER (PARTITION BY user_id) AS tot
        FROM g
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(gap AS BIGINT) AS median_gap_us,
           CAST(tot // n AS BIGINT) AS mean_gap_us,
           CAST(CASE WHEN gap < {BOT_BURST_US} THEN 1 ELSE 0 END AS INT)
               AS is_burst
    FROM r
    WHERE rn = (n + 1) // 2 AND n >= {BOT_MIN_GAPS}
    """,
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event timing profile + burst-bot flag (design
    note above): (user_id, n_gaps, median_gap_us, mean_gap_us,
    is_burst) for users with ≥ {BOT_MIN_GAPS} gaps.

    Scale shape: ONE exchange on user_id; the gap window, the median
    rank, and the per-user totals all ride the same partitioning
    (follow-up windows re-sort without re-shuffling). Output is
    |users|-scale."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = ev.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    wg = Window.partitionBy("user_id").orderBy("gap")
    wn = Window.partitionBy("user_id")
    r = g.select(
        "user_id",
        "gap",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("gap").over(wn).alias("tot"),
    )
    return r.where(
        (F.col("rn") == F.expr("(n + 1) div 2"))
        & (F.col("n") >= BOT_MIN_GAPS)
    ).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.col("gap").cast("bigint").alias("median_gap_us"),
        F.expr("CAST(tot div n AS BIGINT)").alias("mean_gap_us"),
        F.when(F.col("gap") < BOT_BURST_US, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_burst"),
    )
