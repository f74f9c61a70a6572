"""Oracle SQL shared between batch event queries and their
Structured-Streaming twins.

On bounded input (Trigger.availableNow over a finite source) every
streaming twin's result set EQUALS its batch form — the unit tests
assert exactly that — so the twins carry the SAME value-checking
oracle instead of a weaker rows-only gate. Kept in a registration-
free module because plans/__init__ imports streaming_plans before
events (driver-budget ordering), so neither module can read the
other's registry entry at decoration time.
"""

from __future__ import annotations

HOURLY_TUMBLING = """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*)                 AS n_events,
           round(sum(value), 2)     AS total_value
    FROM events
    GROUP BY 1, 2
    """

DEDUP_LATEST = """
    SELECT event_id, user_id, event_type, ts, round(value, 2) AS value
    FROM (
        SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """

CLICK_PURCHASE_JOIN = """
    WITH c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'purchase')
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           round(p.value, 2) AS purchase_value
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """

ENRICHED_NATION = """
    SELECT e.event_id, e.user_id, n.n_name AS nation, e.event_type,
           round(e.value, 2) AS value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    """

DEDUP_KEYS = """
    SELECT DISTINCT user_id, event_type FROM events
    """

PATTERN_BROWSE_BUY = """
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               CAST(round(value * 1000000) AS BIGINT) AS vmicro
        FROM events
    ),
    seq AS (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER w AS rn,
               sum(CASE WHEN event_type = 'view' THEN vmicro ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS cumv
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    carried AS (
        SELECT user_id, event_id, ts, event_type, rn, cumv,
               last_value(CASE WHEN event_type <> 'view' THEN rn END
                          IGNORE NULLS) OVER wp AS rn_a,
               last_value(CASE WHEN event_type <> 'view' THEN event_type END
                          IGNORE NULLS) OVER wp AS type_a,
               last_value(CASE WHEN event_type <> 'view' THEN ts END
                          IGNORE NULLS) OVER wp AS ts_a,
               last_value(CASE WHEN event_type <> 'view' THEN cumv END
                          IGNORE NULLS) OVER wp AS cumv_a
        FROM seq
        WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS end_event_id,
           ts_a AS match_start_ts, ts AS match_end_ts,
           CAST(rn - rn_a - 1 AS INTEGER) AS n_views,
           round((cumv - cumv_a) / 1000000.0, 6) AS views_value,
           epoch_us(ts) - epoch_us(ts_a) AS duration_us
    FROM carried
    WHERE event_type = 'purchase' AND type_a = 'click'
    """

TRANSITION_MATRIX = """
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
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """


# CUSUM burst detection — shared by events_rate_cusum and its r11
# streaming twin stream_rate_cusum (the TRANSITION_MATRIX precedent:
# one oracle text, two plans that cannot drift).
CUSUM_K = 3
CUSUM_H = 6
RATE_CUSUM = f"""
    WITH ev AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                 date_trunc('hour', max(ts)) AS h1 FROM ev),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM ev) t, b,
             unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(h)
    ),
    c AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        FROM ev GROUP BY 1, 2
    ),
    j AS (
        SELECT grid.event_type, grid.h, coalesce(c.n, 0) AS n
        FROM grid LEFT JOIN c
          ON grid.event_type = c.event_type AND grid.h = c.h
    ),
    cum AS (
        SELECT event_type, h, n,
               sum(n - {CUSUM_K})
                   OVER (PARTITION BY event_type ORDER BY h) AS cs
        FROM j
    )
    SELECT event_type, h AS hour, CAST(n AS BIGINT) AS n_events,
           CAST(cs - least(min(cs) OVER (PARTITION BY event_type ORDER BY h),
                           0) AS BIGINT) AS cusum
    FROM cum
    QUALIFY cusum > {CUSUM_H}
    """
