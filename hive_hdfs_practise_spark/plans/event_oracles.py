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
