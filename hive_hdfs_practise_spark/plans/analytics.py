"""Dashboard analytics queries (SURVEY.md §2.4/2.5/2.6).

The reference computes these CLIENT-SIDE: the sales dashboard
fetches the entire order table into the browser and aggregates with
nested JS loops (``Chart.vue:88-111,182-190``). Pushing them into
the engine is the flagship "old way vs engine" win — the transfer
shrinks from |orders| rows to |years|×12.

Group-by keys are typed year()/month() expressions, not string
prefixes — at scale these align with date-partitioned storage and
prune partitions, unlike the reference's LIKE-on-string dates
(``DatabaseAccessor.py:107``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import (
    basket_pair_counts,
    order_baskets,
    pair_counts_from_baskets,
)
from ..sources.catalog import table
from .registry import register


def _orders_ym(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        "o_totalprice",
        "o_orderstatus",
    )


@register(
    "sales_by_year_month",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           round(sum(o_totalprice), 2)         AS total_sales,
           count(*)                            AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def sales_by_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: monthly sales — the bar-chart aggregation
    (``Chart.vue:96-111``) as a native hash aggregate."""
    return (
        _orders_ym(spark, sf_dir)
        .groupBy("o_year", "o_month")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "sales_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           round(sum(o_totalprice), 2)         AS total_sales
    FROM orders
    GROUP BY ROLLUP (1, 2)
    """,
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4 in one operator: ROLLUP produces (year,month) buckets,
    yearly subtotals (month NULL) and the grand total in a single
    shuffle — subsumes the pie chart's re-sum (``Chart.vue:182-190``).
    """
    return (
        _orders_ym(spark, sf_dir)
        .rollup("o_year", "o_month")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_sales"))
    )


@register(
    "max_monthly_sales",
    oracle="""
    SELECT round(max(total_sales), 2) AS max_monthly_sales
    FROM (
        SELECT round(sum(o_totalprice), 2) AS total_sales
        FROM orders
        GROUP BY year(o_orderdate), month(o_orderdate)
    )
    """,
)
def max_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: max over the grouped result (the chart's axis-scaling
    value, ``Chart.vue:153-158``)."""
    return (
        _orders_ym(spark, sf_dir)
        .groupBy("o_year", "o_month")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_sales"))
        .agg(F.round(F.max("total_sales"), 2).alias("max_monthly_sales"))
    )


@register(
    "monthly_sales_ranked",
    oracle="""
    SELECT o_year, o_month, total_sales, month_rank
    FROM (
        SELECT o_year, o_month, total_sales,
               CAST(row_number() OVER (PARTITION BY o_year ORDER BY total_sales DESC, o_month)
                    AS INTEGER) AS month_rank
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER)  AS o_year,
                   CAST(month(o_orderdate) AS INTEGER) AS o_month,
                   round(sum(o_totalprice), 2)         AS total_sales
            FROM orders GROUP BY 1, 2
        )
    )
    WHERE month_rank <= 3
    """,
)
def monthly_sales_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 window surface (ABSENT in the reference; nearest analog
    is the ORDER BY+LIMIT leaderboard): top-3 months per year via
    row_number() over a year partition — the ranked-view form of the
    口碑榜 leaderboard."""
    monthly = (
        _orders_ym(spark, sf_dir)
        .groupBy("o_year", "o_month")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_sales"))
    )
    w = Window.partitionBy("o_year").orderBy(F.desc("total_sales"), F.asc("o_month"))
    return (
        monthly.withColumn("month_rank", F.row_number().over(w))
        .filter(F.col("month_rank") <= 3)
    )


@register(
    "sales_pivot_status",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS status_O,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS status_F,
           round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS status_P
    FROM orders
    GROUP BY 1
    """,
)
def sales_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: yearly sales broken out by order status. Explicit value
    list keeps it a single-pass aggregate (no values-discovery job)."""
    return (
        _orders_ym(spark, sf_dir)
        .groupBy("o_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_year",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("status_O"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("status_F"),
            F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("status_P"),
        )
    )


@register("customer_count", oracle="SELECT count(*) AS n_customers FROM customer")
def customer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: the client-side ``res.data.length`` count
    (``MovieList.vue:91``) as an engine aggregate."""
    return table(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "paginate_by_window",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn > 100 AND rn <= 150
    """,
)
def paginate_by_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-paged variant: window row_number BETWEEN page bounds — the
    stable-pagination form (same page contents regardless of
    partitioning), vs the LIMIT/OFFSET form in ``part_list_search``.

    SCALE CAVEAT: the global window single-tasks the sort; at scale
    use keyset pagination (``operators/pagination.py::keyset_page``)
    — a pushed-down range predicate instead of a global ordering."""
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 100) & (F.col("rn") <= 150))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "set_ops_status_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_ops_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations (ABSENT in the reference — provided for
    engine completeness): customers with both open and finished
    orders but no pending ones. INTERSECT/EXCEPT plan as left-semi /
    left-anti joins in Catalyst."""
    o = table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    pend_c = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_c.intersect(fin_c).exceptAll(pend_c.distinct())


@register(
    "semi_anti_join_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
                   AND o2.o_orderstatus = 'P')
    """,
)
def semi_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (§2.3, ABSENT in reference): EXISTS / NOT
    EXISTS as left_semi + left_anti — no row duplication, the build
    side reduces to distinct keys."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    pend = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .join(pend, c.c_custkey == pend.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "customer_value_deciles",
    oracle="""
    SELECT decile, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_balance
    FROM (
        SELECT c_acctbal,
               CAST(ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS decile
        FROM customer
    )
    GROUP BY decile
    """,
)
def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window: customer-value deciles (unique ordering via the
    custkey tiebreak keeps bucket boundaries deterministic).

    SCALE CAVEAT: an unpartitioned window funnels all rows through
    one task. The scale-safe twin is ``customer_deciles_scalable``
    (distributed percentile boundaries + row-local bucketing)."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


# Pivot: the wide-format dashboard table (one column per order
# status). The status domain is the TPC-H enum {O, F, P} — pivoting
# on an explicit value list keeps the output schema static (a
# values-discovering pivot runs an extra distinct job and its column
# order depends on data).
PIVOT_STATUSES = ["O", "F", "P"]


@register(
    "sales_pivot_by_status",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
               AS status_o,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
               AS status_f,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
               AS status_p,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def sales_pivot_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue pivoted to one column per order status, plus
    the month's order count — the long→wide reshape every BI layer
    runs. Implemented as conditional aggregates (what ``groupBy().
    pivot(col, values)`` compiles to): one hash aggregate, map-side
    combine, no distinct-values discovery job, and the column set is
    schema-stable regardless of which statuses a data slice
    contains. Sums are 2dp-rounded both engines."""
    o = table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    return o.groupBy(month).agg(
        *[
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == s, F.col("o_totalprice"))),
                2,
            ).alias(f"status_{s.lower()}")
            for s in PIVOT_STATUSES
        ],
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH horizon AS (SELECT max(o_orderdate) AS now_d FROM orders),
    base AS (
        SELECT o_custkey AS c_custkey,
               CAST(date_diff('day', max(o_orderdate),
                              (SELECT now_d FROM horizon)) AS BIGINT)
                   AS recency_days,
               count(*) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, c_custkey)
                AS INT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency ASC, c_custkey)
                AS INT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary ASC, c_custkey)
                AS INT) AS m_score
    FROM base
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last
    order, relative to the corpus horizon), frequency (order count)
    and monetary (2dp-rounded revenue), each quintile-scored 1-5 —
    the classic customer-value segmentation.

    Scale shape (r12 — the r11 verdict's de-ntile item): one hash
    aggregate per customer, then each quintile rides
    ``operators/prefix_sum.py::sharded_ntile`` — grid prefix sum +
    high-cardinality tiebreak window + ntile's closed form — so NO
    global single-partition window remains (was three
    `WindowExec: No Partition Defined` sorts; plan-pinned in
    test_prefix_sum). Output is bit-identical to the window ntile
    (sharded_ntile implements ntile's exact remainder placement, not
    the rank law), so the oracle is unchanged. The quintile ordering
    carries a unique custkey tiebreak, and monetary is rounded to 2dp
    on BOTH sides before ordering — sums of 2dp prices are decimal
    multiples of 0.01, so the round snaps identically in both engines
    and the tiebreak settles equal values; ranking internally uses
    exact integer cents (the same doubles scaled by 100), never a
    float sort key. The customer-cardinality base is persist()ed —
    each of the three independent rank frames reads it twice (grid +
    tiebreak join) plus the final output, and the flat
    derive-from-base shape keeps only 2 columns in every window sort
    (a chained form re-sorted the full width per level — measured
    ~3.9 s chained vs ~2.6 s flat at sf0.1)."""
    from ..operators.prefix_sum import sharded_ntile

    o = table(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("now_d"))
    base = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .join(F.broadcast(horizon))
        .select(
            "c_custkey",
            F.datediff("now_d", "last_d").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
        # negated recency ranks ASC == recency DESC; exact cents ==
        # the 2dp monetary's order (multiples of 0.01 scale exactly)
        .withColumn("neg_recency", -F.col("recency_days"))
        .withColumn(
            "cents", F.round(F.col("monetary") * 100).cast("bigint")
        )
        .persist()
    )
    # three INDEPENDENT narrow rank frames (2 columns each through
    # the window stages) joined back once — a chained form would
    # serialize the levels and push the full base width through every
    # window sort (measured ~3.9 s chained vs ~2.6 s flat at sf0.1)
    specs = [
        ("neg_recency", 64, "r_score"),
        ("frequency", 8, "f_score"),
        ("cents", 1_000_000, "m_score"),
    ]
    scored = base
    for col, width, out in specs:
        ranked = sharded_ntile(
            base.select("c_custkey", col), col, "c_custkey", 5,
            shard=F.floor(F.col(col) / width), out_name=out,
        ).select("c_custkey", out)
        scored = scored.join(ranked, "c_custkey")
    return scored.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    )


# Frequent itemset mining (pair level) — the market-basket operator:
# parts that co-occur in the same order with support ≥ FIS_MIN_SUP,
# scored by lift. The pair join is keyed on the order (bounded
# fan-out: |items-per-order|² pairs, ~20 for TPC-H-shaped orders),
# never on the part — the classic a-priori trick of generating
# candidates within baskets instead of across the catalog.
FIS_MIN_SUP = 3


@register(
    "orders_frequent_part_pairs",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    cnt AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey),
    p AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS sup
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.pa AS part_a, p.pb AS part_b,
           CAST(p.sup AS BIGINT) AS support,
           round(CAST(p.sup AS DOUBLE) * n.n_orders / (ca.c * cb.c), 6)
               AS lift
    FROM p, n
    JOIN cnt ca ON ca.l_partkey = p.pa
    JOIN cnt cb ON cb.l_partkey = p.pb
    WHERE p.sup >= {FIS_MIN_SUP}
    """,
)
def orders_frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs bought together in ≥ FIS_MIN_SUP orders, with lift
    (observed co-occurrence over the independence expectation). See
    basket-keyed candidate note above.

    Scale shape: the distinct item set reduces map-side; the pair
    self-join shuffles on the ORDER key, so candidate generation is
    per-basket (quadratic only in basket size, which is bounded by
    order shape, not catalog size); pair counts reduce map-side
    before the (pa, pb) exchange. The two identical item-set join
    branches deduplicate via AQE's runtime exchange reuse (same
    lesson as documents_tfidf_similarity — a checkpoint measured as
    a wash). Supports and counts are integers; lift divides exact
    integers — deterministic before the 6dp round."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = l.distinct()
    n_orders = l.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    # shared tuned pair build (operators/graph.py): basket arrays +
    # suffix explode instead of the items self-join — identical pair
    # counts, one fewer corpus-sized shuffle. Pipelined (no persist):
    # each consumer here reads pairs once; association_rules, whose
    # direction union reads pairs twice and whose cnt/total can ride
    # the basket table, is the variant that persists (measured there:
    # 57 -> 33 s at 40x; persisting HERE costs ~0.8 s at sf0.1 for
    # nothing).
    pairs = basket_pair_counts(l, "l_orderkey", "l_partkey", FIS_MIN_SUP)
    ca = cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    return (
        pairs.join(ca, "pa")
        .join(cb, "pb")
        .join(F.broadcast(n_orders))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("sup").cast("bigint").alias("support"),
            F.round(
                F.col("sup").cast("double")
                * F.col("n_orders")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


# Association rules — the directional layer over the pair counts
# (Agrawal & Srikant, VLDB'94): each co-occurrence pair yields two
# rules A=>B and B=>A; confidence = sup/cnt(A) answers "given A in
# the basket, how often B?", which the symmetric pair/lift view
# cannot. Thresholds are INTEGER predicates (sup >= min_sup;
# DEN*sup >= NUM*cnt(A) for confidence >= NUM/DEN), so the rule set
# is exact;
# the display confidence/lift divide exact integers in the identical
# IEEE order on both engines before the 6-dp round. Floor calibrated
# to the corpus: max observed confidence is 0.22/0.14 at
# sf0.001/sf0.01 (sup is capped by the small basket overlap while
# cnt(A) grows with the corpus), so 1/10 keeps a meaningful rule set
# at every test SF.
RULE_MIN_CONF_NUM = 1  # confidence >= 1/10 as the integer predicate
RULE_MIN_CONF_DEN = 10


@register(
    "orders_association_rules",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    cnt AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey),
    p AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS sup
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {FIS_MIN_SUP}
    ),
    rules AS (
        SELECT pa AS antecedent, pb AS consequent, sup FROM p
        UNION ALL
        SELECT pb, pa, sup FROM p
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.sup AS BIGINT) AS support,
           round(CAST(r.sup AS DOUBLE) / ca.c, 6) AS confidence,
           round(CAST(r.sup AS DOUBLE) * n.n_orders / (ca.c * cb.c), 6)
               AS lift
    FROM rules r, n
    JOIN cnt ca ON ca.l_partkey = r.antecedent
    JOIN cnt cb ON cb.l_partkey = r.consequent
    WHERE {RULE_MIN_CONF_DEN} * r.sup >= {RULE_MIN_CONF_NUM} * ca.c
    """,
)
def orders_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules over basket pair counts (see
    note above): antecedent => consequent with exact integer support
    and the confidence >= {RULE_MIN_CONF_NUM}/{RULE_MIN_CONF_DEN}
    filter as a cross-multiplied integer predicate.

    Scale shape: rides the shared tuned pair build
    (operators/graph.py — basket arrays, one corpus shuffle); the
    direction union doubles a support-thresholded, hence tiny, rule
    stream; per-item counts reduce map-side and broadcast into the
    rule joins. No windows, no LIMIT — the rule set is closed-form,
    so the output needs no ordering determinism beyond the exact
    predicates."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE persisted basket table backs the pair counts, the per-part
    # basket counts AND the basket total — the raw lineitem rows
    # shuffle exactly once (three separate distinct-shaped shuffles
    # before this refactor; the 40x corpus measured 57 -> 41 s)
    baskets = order_baskets(l, "l_orderkey", "l_partkey")
    baskets.persist()
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    cnt = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # checkpoint: both branches of the direction union read pairs —
    # un-checkpointed, the 40x corpus's ~126M-row pair mass (~34 s
    # once, measured) generates twice. Stores 1.2M rows at 40x.
    pairs = pair_counts_from_baskets(baskets, FIS_MIN_SUP).localCheckpoint(
        eager=True
    )
    rules = pairs.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "sup",
    ).unionByName(
        pairs.select(
            F.col("pb").alias("antecedent"),
            F.col("pa").alias("consequent"),
            "sup",
        )
    )
    ca = cnt.select(F.col("l_partkey").alias("antecedent"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("consequent"), F.col("c").alias("cb"))
    return (
        rules.join(ca, "antecedent")
        .join(cb, "consequent")
        .join(F.broadcast(n_orders))
        .filter(
            RULE_MIN_CONF_DEN * F.col("sup")
            >= RULE_MIN_CONF_NUM * F.col("ca")
        )
        .select(
            "antecedent",
            "consequent",
            F.col("sup").cast("bigint").alias("support"),
            F.round(F.col("sup").cast("double") / F.col("ca"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("sup").cast("double")
                * F.col("n_orders")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "sales_mom_growth",
    oracle="""
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT month, revenue, CAST(n_orders AS BIGINT) AS n_orders,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2)
               AS revenue_delta,
           round((revenue / lag(revenue) OVER (ORDER BY month) - 1.0)
                 * 100, 4) AS growth_pct
    FROM m
    """,
)
def sales_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the period-over-period lag
    comparison every finance dashboard runs. The lag window operates
    on the months-cardinality aggregate (metadata-scale single
    partition — bounded by the calendar, not the data); revenue is
    2dp-rounded BEFORE the delta/ratio so both engines difference
    identical snapped decimals, and month strings sort identically
    (zero-padded ISO)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        "n_orders",
        F.round(F.col("revenue") - prev, 2).alias("revenue_delta"),
        F.round((F.col("revenue") / prev - 1.0) * 100, 4).alias("growth_pct"),
    )


@register(
    "sales_seasonal_decomposition",
    oracle="""
    WITH m AS (
        -- TIMESTAMP (not DATE) so both engines materialize
        -- datetime64 through pandas — the r10 dtype-grain warn
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                   AS month,
               CAST(month(o_orderdate) AS INTEGER) AS moy,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2
    ),
    t AS (
        SELECT month, moy, cents,
               CASE WHEN lag(cents, 6) OVER w IS NOT NULL
                     AND lead(cents, 6) OVER w IS NOT NULL
                    THEN 2 * sum(cents) OVER (ORDER BY month
                              ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
                          + lag(cents, 6) OVER w
                          + lead(cents, 6) OVER w
               END AS tnum
        FROM m WINDOW w AS (ORDER BY month)
    ),
    s AS (
        SELECT moy,
               CAST(round(CAST(sum(24 * cents - tnum) AS DOUBLE)
                          / (count(*) * 2400) * 1000000) AS BIGINT) AS raw_u
        FROM t WHERE tnum IS NOT NULL GROUP BY moy
    ),
    st AS (SELECT sum(raw_u) AS tot_u, count(*) AS n_moy FROM s),
    s0 AS (
        SELECT s.moy, st.n_moy * s.raw_u - st.tot_u AS snum, st.n_moy
        FROM s, st
    )
    SELECT t.month, round(t.cents / 100.0, 2) AS revenue,
           round(t.tnum / 2400.0, 6) AS trend,
           round(CAST(s0.snum AS DOUBLE) / (s0.n_moy * 1000000.0), 6)
               AS seasonal,
           round(t.cents / 100.0 - t.tnum / 2400.0
                 - CAST(s0.snum AS DOUBLE) / (s0.n_moy * 1000000.0), 6)
               AS residual
    FROM t JOIN s0 USING (moy)
    WHERE t.tnum IS NOT NULL
    """,
)
def sales_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue:
    centered 12-month moving-average trend (half-weight endpoints —
    the textbook CMA-12), month-of-year seasonal indices normalized
    to mean zero, and the residual. Edge months without a full ±6
    window are excluded (no partial-window trend).

    Determinism: ALL linear combinations run on exact integer
    numerators — monthly revenue in cents, the trend as its x2400
    numerator (2·MA-window sum + both half-weight endpoints), the
    seasonal index as micro-unit integers snapped once after the only
    unavoidable division — so no float SUM exists anywhere (window
    frame sums are engine-order-dependent on doubles; on bigints they
    are bit-exact). The final divisions/subtractions are fixed-shape
    IEEE expressions over identical integers — identical cross-engine.
    The corpus collapses to the month grid in one aggregate; every
    window runs on the ~|months| grid (metadata scale).
    """
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.month("o_orderdate").alias("moy"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("month")
    ma = F.sum("cents").over(w.rowsBetween(-5, 5))
    l6 = F.lag("cents", 6).over(w)
    d6 = F.lead("cents", 6).over(w)
    t = m.select(
        "month",
        "moy",
        "cents",
        F.when(l6.isNotNull() & d6.isNotNull(), 2 * ma + l6 + d6).alias("tnum"),
    )
    tn = t.filter(F.col("tnum").isNotNull())
    s = tn.groupBy("moy").agg(
        F.round(
            F.sum(24 * F.col("cents") - F.col("tnum")).cast("double")
            / (F.count(F.lit(1)) * 2400)
            * 1000000
        )
        .cast("bigint")
        .alias("raw_u")
    )
    st = s.agg(F.sum("raw_u").alias("tot_u"), F.count(F.lit(1)).alias("n_moy"))
    s0 = s.join(F.broadcast(st)).select(
        "moy",
        (F.col("n_moy") * F.col("raw_u") - F.col("tot_u")).alias("snum"),
        "n_moy",
    )
    seasonal = F.col("snum").cast("double") / (F.col("n_moy") * 1000000.0)
    return tn.join(F.broadcast(s0), "moy").select(
        "month",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("tnum") / 2400.0, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(
            F.col("cents") / 100.0 - F.col("tnum") / 2400.0 - seasonal, 6
        ).alias("residual"),
    )


@register(
    "sales_incremental_refresh",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           o_orderstatus,
           round(sum(o_totalprice), 2) AS total_sales,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def sales_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-(year,
    status) sales summary is maintained as BASE ⊕ DELTA — the base
    summary over already-ingested orders merged with the partial
    summary of a late-arriving batch (orderkey ≡ 0 mod 50, derived
    deterministically so the query is self-contained) by ADDING
    partial aggregates, never rescanning the base fact table. The
    oracle is the full recompute over all orders: the value check IS
    the proof that the merge law (sum/count are commutative monoids;
    the 2dp round happens only after the merge) reproduces it.

    Scale shape: at deployment the base summary is a stored table and
    only the delta is scanned; here both partials are one map-side-
    combining aggregate each, and the merge is a grid-sized union +
    re-aggregate.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.year("o_orderdate").alias("o_year"), "o_orderstatus"
        ).agg(
            F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("c")
        )

    base = partial(o.filter(F.col("o_orderkey") % 50 != 0))
    delta = partial(o.filter(F.col("o_orderkey") % 50 == 0))
    return (
        base.unionByName(delta)
        .groupBy("o_year", "o_orderstatus")
        .agg(
            F.round(F.sum("s"), 2).alias("total_sales"),
            F.sum("c").alias("n_orders"),
        )
    )


@register(
    "supplier_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_suppkey
    ),
    c AS (
        SELECT l_suppkey, cents,
               sum(cents) OVER (ORDER BY cents DESC, l_suppkey) AS cum,
               sum(cents) OVER () AS tot
        FROM rev
    ),
    cls AS (
        SELECT CASE WHEN 100 * cum <= 80 * tot THEN 'A'
                    WHEN 100 * cum <= 95 * tot THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents, tot
        FROM c
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(cents) AS DOUBLE) / max(tot), 6) AS revenue_share
    FROM cls GROUP BY abc_class
    """,
)
def supplier_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of suppliers by revenue: 'A' =
    suppliers inside the first 80% of cumulative revenue (largest
    first), 'B' to 95%, 'C' the tail — the inventory-management
    classic. Class boundaries compare exact integer cents
    (100·cum <= 80·tot), so membership is bit-stable cross-engine;
    only the reported share is a rounded ratio.

    Scale shape: the corpus collapses to per-supplier revenue (one
    map-side-combining aggregate); the descending cumulative sum runs
    two-level (``operators/prefix_sum.py`` on the NEGATED cents as
    the ascending order key — supplier cardinality grows with the
    catalog, so a flat ORDER BY window would be single-task), and the
    3-class rollup is metadata-scale.
    """
    from ..operators.prefix_sum import sharded_cumsum

    l = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    # ascending order key = (-cents, suppkey): unique per row and
    # equivalent to (cents DESC, suppkey ASC); combine into one
    # sortable BIGINT-safe pair via two columns is not supported by
    # the helper (single order col), so encode as a decimal-free
    # string?  No — use the exact integer composite:
    # ord = -cents * 1e6 + suppkey  (suppkey < 1e6 at every SF here;
    # documented domain bound, keeps the composite a single BIGINT)
    g = rev.withColumn(
        "ord", (-F.col("cents")) * F.lit(1_000_000) + F.col("l_suppkey")
    )
    c = sharded_cumsum(
        g,
        [],
        "ord",
        "cents",
        # 2^41 ~ 2.2e12: ~hundreds of shards over the revenue range at
        # bench SF (shard count rides the range, not the row count)
        F.expr("ord div 2199023255552").cast("int"),
    )
    cls = c.select(
        F.when(100 * F.col("cum") <= 80 * F.col("tot"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("tot"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "tot",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.round(F.sum("cents").cast("double") / F.max("tot"), 6).alias(
            "revenue_share"
        ),
    )


# Top-k per group (r5): each supplier's top-3 parts by revenue — the
# canonical BI "group top-N". Revenue is summed in EXACT integer
# cents (2-dp prices scaled per row before the sum), so the ranking
# never compares merge-order-noisy doubles; ties break on partkey.
SUPP_TOP_K = 3


@register(
    "supplier_top_parts",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_suppkey, l_partkey
    )
    SELECT l_suppkey, l_partkey,
           -- sum(BIGINT) is HUGEINT in DuckDB and its pandas
           -- materialization turns un-cast HUGEINT into float64,
           -- which hash-mismatches Spark's int64 (driver r05)
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT l_suppkey, l_partkey, cents,
               row_number() OVER (PARTITION BY l_suppkey
                                  ORDER BY cents DESC, l_partkey) AS rnk
        FROM rev
    ) WHERE rnk <= {SUPP_TOP_K}
    """,
)
def supplier_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top {SUPP_TOP_K} parts per supplier by exact integer-cent
    revenue (see note above). The rank filter pushes down as
    WindowGroupLimit (plan-asserted): each map task forwards at most
    {SUPP_TOP_K} rows per supplier it sees before the exchange, so
    at 100 TB the window shuffle carries O(suppliers × k × tasks)
    rows, not the (supplier, part) grid — the same pushdown
    documents_source_quota rides."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_extendedprice"
    )
    rev = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("cents")
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("cents"), F.asc("l_partkey")
    )
    return (
        rev.select(
            "l_suppkey",
            "l_partkey",
            F.col("cents").alias("revenue_cents"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= SUPP_TOP_K)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


@register(
    "lineitem_measures_unpivot",
    oracle="""
    WITH g AS (
        -- outer CASTs: DuckDB sum(BIGINT) returns HUGEINT, which its
        -- pandas materialization converts to float64 — hash-mismatch
        -- against Spark's int64 (driver r05)
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS qty_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT))
                    AS BIGINT) AS disc_cents
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, 'qty_cents' AS measure,
           qty_cents AS value FROM g
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'price_cents', price_cents FROM g
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'disc_cents', disc_cents FROM g
    """,
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of the pivot surface: the
    per-(returnflag, linestatus) measure grid in wide form, melted to
    (keys, measure, value) long form via ``DataFrame.unpivot`` —
    Spark plans it as one Expand over the aggregate output (grid
    rows × measures), so the melt itself is metadata-scale; measures
    are exact integer cents. The oracle states the equivalent
    UNION ALL."""
    l = table(spark, sf_dir, "lineitem")
    cents = lambda c: F.sum(F.round(F.col(c) * 100).cast("bigint"))  # noqa: E731
    g = l.groupBy("l_returnflag", "l_linestatus").agg(
        cents("l_quantity").alias("qty_cents"),
        cents("l_extendedprice").alias("price_cents"),
        cents("l_discount").alias("disc_cents"),
    )
    return g.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["qty_cents", "price_cents", "disc_cents"],
        "measure",
        "value",
    )


# Item-to-item collaborative similarity — the recommendation-engine
# primitive ("customers who bought X also bought Y", Linden et al.,
# IEEE Internet Computing 2003): each part's top-k neighbors by
# cosine of basket co-occurrence vectors. Ranking is exact: cosine
# is monotone in c_xy^2 / (c_x * c_y), so neighbors order by the
# integer fixed-point quotient c_xy^2 * 1e12 div (c_x * c_y)
# (HUGEINT/DECIMAL product — c_xy^2 * 1e12 passes int64 once baskets
# co-occur ~3e3 times); the display cosine divides exact-integer-
# derived doubles and takes one sqrt, which IEEE 754 requires
# correctly rounded — identical cross-engine.
I2I_MIN_CO = 2
I2I_TOP = 3
I2I_SCALE = 1_000_000_000_000


@register(
    "part_similar_items",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    cnt AS (SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey),
    p0 AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS co
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {I2I_MIN_CO}
    ),
    p AS (
        SELECT pa, pb, co FROM p0
        UNION ALL
        SELECT pb AS pa, pa AS pb, co FROM p0
    ),
    scored AS (
        SELECT p.pa, p.pb, p.co, ca.c AS c_a, cb.c AS c_b,
               CAST((CAST(p.co AS HUGEINT) * p.co * {I2I_SCALE})
                    // (ca.c * cb.c) AS BIGINT) AS cos_fp
        FROM p
        JOIN cnt ca ON ca.l_partkey = p.pa
        JOIN cnt cb ON cb.l_partkey = p.pb
    )
    SELECT pa AS part, pb AS neighbor,
           CAST(co AS BIGINT) AS co_count,
           CAST(c_a AS BIGINT) AS n_part, CAST(c_b AS BIGINT) AS n_neighbor,
           cos_fp,
           round(CAST(co AS DOUBLE)
                 / sqrt(CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)), 6)
               AS cosine
    FROM (
        SELECT *, row_number() OVER (PARTITION BY pa
                                     ORDER BY cos_fp DESC, pb) AS rn
        FROM scored
    ) WHERE rn <= {I2I_TOP}
    """,
)
def part_similar_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{I2I_TOP} similar parts per part by basket co-occurrence
    cosine (see exactness note above — ranking on the exact integer
    quotient, display cosine from exact integers + one correctly-
    rounded sqrt).

    Scale shape: same candidate discipline as
    orders_frequent_part_pairs — the pair self-join shuffles on the
    ORDER key (quadratic per basket, not per catalog), pair counts
    reduce map-side before the (pa, pb) exchange, and the min-count
    floor prunes before the direction mirror doubles rows. Part
    totals join broadcast (catalog-sized). The per-part top-{I2I_TOP}
    window is rank-filtered, so WindowGroupLimit keeps {I2I_TOP} rows
    per partition pre-shuffle instead of sorting whole groups."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = l.distinct()
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = items.alias("a"), items.alias("b")
    p0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= I2I_MIN_CO)
    )
    p = p0.unionByName(
        p0.select(
            F.col("pb").alias("pa"), F.col("pa").alias("pb"), "co"
        )
    )
    ca = cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("c_a"))
    cb = cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("c_b"))
    scored = (
        p.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .select(
            "pa",
            "pb",
            "co",
            "c_a",
            "c_b",
            F.expr(
                f"cast((cast(co as decimal(38,0)) * co * {I2I_SCALE})"
                " div (c_a * c_b) as bigint)"
            ).alias("cos_fp"),
        )
    )
    w = Window.partitionBy("pa").orderBy(F.desc("cos_fp"), F.asc("pb"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= I2I_TOP)
        .select(
            F.col("pa").alias("part"),
            F.col("pb").alias("neighbor"),
            F.col("co").cast("bigint").alias("co_count"),
            F.col("c_a").cast("bigint").alias("n_part"),
            F.col("c_b").cast("bigint").alias("n_neighbor"),
            "cos_fp",
            F.round(
                F.col("co").cast("double")
                / F.sqrt(F.col("c_a").cast("double") * F.col("c_b").cast("double")),
                6,
            ).alias("cosine"),
        )
    )


# Decile MIGRATION matrix — the churn/upsell dashboard a retention
# team actually reads: each customer's spend decile in the first
# temporal half of the corpus vs the second, counted into a 10×10
# matrix (diagonal = stable, below = churn, above = growth). Spend
# is exact integer cents; decile assignment is the exact rank law
# (rank−1)·10 div n over (cents, custkey) — computed WITHOUT a
# 2-partition window (the low-cardinality trap): the (half, cents)
# count grid rides the two-level sharded prefix sum, the custkey
# tiebreak is a row_number over the high-cardinality (half, cents)
# partitions, and their sum is the global per-half rank.
DECILE_PIVOT = "1998-01-01"


@register(
    "orders_decile_migration",
    oracle=f"""
    WITH s AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '{DECILE_PIVOT}'
                    THEN 1 ELSE 2 END AS half,
               o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    r AS (
        SELECT half, o_custkey,
               row_number() OVER (PARTITION BY half
                                  ORDER BY cents, o_custkey) AS rnk,
               count(*) OVER (PARTITION BY half) AS n
        FROM s
    ),
    d AS (
        SELECT half, o_custkey,
               CAST((rnk - 1) * 10 // n AS INT) + 1 AS decile
        FROM r
    )
    SELECT a.decile AS decile_h1, b.decile AS decile_h2,
           count(*) AS n_customers
    FROM d a JOIN d b ON a.o_custkey = b.o_custkey
    WHERE a.half = 1 AND b.half = 2
    GROUP BY 1, 2
    """,
)
def orders_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10×10 customer spend-decile migration matrix between the two
    temporal halves of the order history (see note above) — only
    customers active in both halves appear.

    Scale shape: one map-side-combining (half, custkey) cents
    aggregate, then everything runs on the customer-cardinality
    table: grid prefix sum (sharded — no 2-partition window),
    high-cardinality tiebreak window, and a shuffle join of the two
    decile assignments on custkey. Output is 10×10."""
    from ..operators.prefix_sum import sharded_cumsum

    o = table(spark, sf_dir, "orders")
    s = (
        o.select(
            F.when(
                F.col("o_orderdate") < F.lit(DECILE_PIVOT).cast("timestamp"),
                1,
            )
            .otherwise(2)
            .alias("half"),
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("half", "o_custkey")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    grid = s.groupBy("half", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    cum = sharded_cumsum(
        grid,
        ["half"],
        "cents",
        "cnt",
        shard=F.floor(F.col("cents") / F.lit(1_000_000)),
    ).select(
        "half",
        "cents",
        (F.col("cum") - F.col("cnt")).alias("below"),
        F.col("tot").alias("n"),
    )
    w = Window.partitionBy("half", "cents").orderBy("o_custkey")
    d = (
        s.join(cum, ["half", "cents"])
        .withColumn("rnk", F.col("below") + F.row_number().over(w))
        .select(
            "half",
            "o_custkey",
            (
                F.expr("CAST((rnk - 1) * 10 div n AS INT)") + 1
            ).alias("decile"),
        )
    )
    a = d.filter(F.col("half") == 1).select(
        "o_custkey", F.col("decile").alias("decile_h1")
    )
    b = d.filter(F.col("half") == 2).select(
        "o_custkey", F.col("decile").alias("decile_h2")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("decile_h1", "decile_h2")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# Cohort LTV triangle (r9): cumulative revenue per acquisition
# cohort by month age — the revenue twin of events_retention_cohorts
# (that one counts weekly ACTIVITY from events; this one accumulates
# ORDER REVENUE by first-purchase month). Months are the integer
# y·12+m index (no date-type cross-engine pitfalls); revenue is
# exact integer cents; the cumulative window runs over the
# metadata-scale (cohort × age) grid, and per-customer LTV is the
# truncating integer division cum div cohort_size on both engines.
@register(
    "orders_cohort_ltv",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT)
                   AS mix
        FROM orders
    ),
    c AS (SELECT o_custkey, min(mix) AS cohort_mix FROM o GROUP BY 1),
    coh AS (
        SELECT cohort_mix, CAST(count(*) AS BIGINT) AS cohort_size
        FROM c GROUP BY 1
    ),
    a AS (
        SELECT c.cohort_mix, o.mix - c.cohort_mix AS age,
               CAST(sum(o.cents) AS BIGINT) AS rev,
               CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active
        FROM o JOIN c USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT CAST((a.cohort_mix - 1) // 12 AS INT) AS cohort_year,
           CAST((a.cohort_mix - 1) % 12 + 1 AS INT) AS cohort_month,
           CAST(a.age AS INT) AS age,
           a.n_active,
           CAST(sum(a.rev) OVER (PARTITION BY a.cohort_mix ORDER BY a.age
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_revenue_cents,
           CAST(CAST(sum(a.rev) OVER (PARTITION BY a.cohort_mix
                                      ORDER BY a.age
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                // coh.cohort_size AS BIGINT) AS ltv_cents
    FROM a JOIN coh ON coh.cohort_mix = a.cohort_mix
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-revenue LTV triangle (see note above): per
    (acquisition cohort, month age), active buyers, cumulative
    cohort revenue, and per-customer LTV in cents.

    Scale shape: one order scan → per-customer min-month aggregate →
    one (cohort, age) grouped aggregate; the cumulative window and
    the cohort-size broadcast join run on the metadata-scale grid.
    Integer cents end to end; the LTV division truncates identically
    (Spark div / DuckDB //)."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        )
        .cast("int")
        .alias("mix"),
    )
    c = o.groupBy("o_custkey").agg(F.min("mix").alias("cohort_mix"))
    coh = c.groupBy("cohort_mix").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    a = (
        o.join(c, "o_custkey")
        .groupBy(
            "cohort_mix", (F.col("mix") - F.col("cohort_mix")).alias("age")
        )
        .agg(
            F.sum("cents").cast("bigint").alias("rev"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
        )
    )
    w = (
        Window.partitionBy("cohort_mix")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = a.withColumn("cum_revenue_cents", F.sum("rev").over(w).cast("bigint"))
    return cum.join(F.broadcast(coh), "cohort_mix").select(
        F.expr("CAST((cohort_mix - 1) div 12 AS INT)").alias("cohort_year"),
        ((F.col("cohort_mix") - 1) % 12 + 1).cast("int").alias("cohort_month"),
        F.col("age").cast("int").alias("age"),
        "n_active",
        "cum_revenue_cents",
        F.expr("CAST(cum_revenue_cents div cohort_size AS BIGINT)").alias(
            "ltv_cents"
        ),
    )


# Herfindahl–Hirschman market-concentration index (r9): per nation,
# HHI = Σ_i share_i² over its suppliers' revenue shares — the
# antitrust/market-structure statistic, and (unlike the Gini, which
# this repo computes over customers) a SUM OF SQUARES of exact
# integers: hhi_fp = (Σ cents_i²) · 1e6 div (Σ cents_i)², computed
# entirely in DECIMAL(38,0)/HUGEINT (cents² ≈ 1e18 per supplier and
# the squared total overflow int64 at scale; the ×1e6 quotient is
# the truncating integer division on both engines). 1e6/n ≤ hhi_fp
# ≤ 1e6 by construction.
@register(
    "supplier_hhi_concentration",
    oracle="""
    WITH r AS (
        SELECT s.s_nationkey, s.s_suppkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey, s.s_suppkey
    ),
    m AS (
        SELECT s_nationkey,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(cents) AS BIGINT) AS revenue_cents,
               sum(CAST(cents AS HUGEINT) * cents) AS sumsq
        FROM r GROUP BY s_nationkey
    )
    SELECT n.n_name, m.n_suppliers, m.revenue_cents,
           CAST((CAST(m.sumsq AS HUGEINT) * 1000000)
                // (CAST(m.revenue_cents AS HUGEINT) * m.revenue_cents)
                AS BIGINT) AS hhi_fp
    FROM m JOIN nation n ON n.n_nationkey = m.s_nationkey
    WHERE m.revenue_cents > 0
    """,
)
def supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier revenue concentration (see note above):
    supplier count, total revenue cents, and the ×1e6 fixed-point
    HHI.

    Scale shape: one lineitem scan reduced map-side to (nation,
    supplier) cents, a supplier-cardinality squared-sum aggregate in
    exact decimals, and a broadcast nation-name join. The
    revenue_cents > 0 guard keeps the division total (an all-refund
    nation is legal; predicates reorder, so the guard is in the
    WHERE on both sides identically)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    su = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    r = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("c").cast("bigint").alias("cents"))
    )
    m = r.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("sumsq"),
    )
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        m.filter(F.col("revenue_cents") > 0)
        .join(F.broadcast(na), m.s_nationkey == na.n_nationkey)
        .select(
            "n_name",
            "n_suppliers",
            "revenue_cents",
            F.expr(
                "CAST(CAST(sumsq AS DECIMAL(38,0)) * 1000000"
                " div (CAST(revenue_cents AS DECIMAL(38,0))"
                " * revenue_cents) AS BIGINT)"
            ).alias("hhi_fp"),
        )
    )


# Kaplan–Meier repeat-purchase survival (r10) — the time-to-second-
# order curve a retention team reads (the survival-analysis
# workhorse, with right-censoring done properly instead of dropping
# non-converters): per customer, t = days from first to second order
# (event) or to the corpus's last order date (censored). S(t) =
# Π_{u≤t} (n_u − d_u)/n_u over event days. Cross-engine exactness:
# every factor divides two exact integers (IEEE-identical), and the
# cumulative product is a genuinely SEQUENTIAL left fold on both
# sides — DuckDB `list_reduce` over the t-ordered factor list vs a
# Python left fold on the driver (the r9 temperature_mix idiom:
# list_reduce is bit-equal to a Python left fold; multiplication is
# as deterministic as addition) — so the raw double needs NO
# rounding. The at-risk counts ride a DESC-ordered integer window
# sum (integers are combine-order-proof).
def _survival_km_oracle() -> str:
    return """
    WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey FROM orders),
    r AS (
        SELECT o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM o
    ),
    f AS (
        SELECT o_custkey,
               min(CASE WHEN rn = 1 THEN o_orderdate END) AS d1,
               min(CASE WHEN rn = 2 THEN o_orderdate END) AS d2
        FROM r GROUP BY o_custkey
    ),
    mx AS (SELECT max(o_orderdate) AS dmax FROM o),
    obs AS (
        SELECT CASE WHEN d2 IS NOT NULL
                    THEN datediff('day', d1, d2)
                    ELSE datediff('day', d1, dmax) END AS t,
               (d2 IS NOT NULL) AS ev
        FROM f, mx
    ),
    byday AS (
        SELECT t, count(*) AS n_obs,
               sum(CASE WHEN ev THEN 1 ELSE 0 END) AS d
        FROM obs GROUP BY t
    ),
    wd AS (
        SELECT t, d,
               sum(n_obs) OVER (ORDER BY t DESC
                                ROWS UNBOUNDED PRECEDING) AS n_risk
        FROM byday
    ),
    fac AS (
        SELECT t, d, n_risk,
               CAST(n_risk - d AS DOUBLE) / n_risk AS f
        FROM wd WHERE d > 0
    ),
    allf AS (
        SELECT list(f ORDER BY t) AS fs, list(t ORDER BY t) AS ts
        FROM fac
    )
    SELECT fac.t AS t_days,
           CAST(fac.n_risk AS BIGINT) AS n_at_risk,
           CAST(fac.d AS BIGINT) AS n_events,
           list_reduce(fs[1:list_position(ts, fac.t)],
                       (x, y) -> x * y) AS survival
    FROM fac, allf
    """


@register("orders_survival_km", oracle=_survival_km_oracle())
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-repeat-purchase curve (see note above):
    per event day, the at-risk count, events, and the survival
    probability S(t).

    Scale shape: one orders scan → per-customer 2-row window pick →
    per-day aggregate, which is metadata-scale (≤ corpus date-range
    days); the at-risk cumsum and the sequential product run
    driver-side on the collected day table (the MMR bounded-collect
    precedent). Collects at plan time: BUILD_EXECUTES."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.select("o_custkey", "o_orderdate", F.row_number().over(w).alias("rn"))
    f = r.filter(F.col("rn") <= 2).groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("o_orderdate"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias("d2"),
    )
    mx = o.agg(F.max("o_orderdate").alias("dmax"))
    obs = f.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff("dmax", "d1"))
        .alias("t"),
        F.col("d2").isNotNull().alias("ev"),
    )
    byday = (
        obs.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.when(F.col("ev"), 1).otherwise(0)).alias("d"),
        )
        .collect()
    )
    days = sorted(byday, key=lambda x: x.t)
    total = sum(x.n_obs for x in days)
    out, seen, surv = [], 0, None
    for x in days:
        n_risk = total - seen
        seen += x.n_obs
        if x.d > 0:
            fct = float(n_risk - x.d) / float(n_risk)
            surv = fct if surv is None else surv * fct
            out.append((int(x.t), int(n_risk), int(x.d), surv))
    return spark.createDataFrame(
        out, "t_days int, n_at_risk long, n_events long, survival double"
    )
