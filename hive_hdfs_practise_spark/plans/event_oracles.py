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
