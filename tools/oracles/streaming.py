"""Streaming family oracle SQL (batch twins of the
watermarked drains).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""

from tools.oracles.params import _STREAM_SHARD_BOUND, _STREAM_WINDOW_US
from tools.oracles.ann import _ann_index_probe_sql
from tools.oracles.dedup import _incremental_dedup_sql

_STREAMING_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS s_start_us,
       CAST(MAX(epoch_us(ts)) + 21600000000 AS BIGINT) AS s_end_us,
       user_id, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""

_STREAMING_BINDATA_SQL = """
SELECT user_id,
       (CAST(ceil(CAST(value AS DOUBLE) / 100.0) AS BIGINT) - 1) * 100.0 + 50.0
           AS bin_center,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value)
           AS mean_value
FROM events
GROUP BY 1, 2
"""

# the batch despike oracle (see _DESPIKE_SQL) with block=10, filtered to
# each cast's stable prefix: rows with at least 2*block-1 = 19 rows of
# lookahead (rn <= n - 20)
_STATEFUL_DESPIKE_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS v,
         row_number() OVER w0 - 1 AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         avg(CAST(value AS DOUBLE)) OVER wf AS m1r,
         stddev_pop(CAST(value AS DOUBLE)) OVER wf AS s1r
  FROM events
  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id),
         wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)
), p1 AS (
  SELECT *,
         last_value(CASE WHEN rn <= n - 10 THEN m1r END IGNORE NULLS) OVER wp AS m1,
         last_value(CASE WHEN rn <= n - 10 THEN s1r END IGNORE NULLS) OVER wp AS s1
  FROM e
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), c1 AS (
  SELECT *, CASE WHEN abs(v - m1) > 1.0 * s1 THEN NULL ELSE v END AS v1
  FROM p1
), e2 AS (
  SELECT *, avg(v1) OVER wf2 AS m2r, stddev_pop(v1) OVER wf2 AS s2r
  FROM c1
  WINDOW wf2 AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING)
), p2 AS (
  SELECT *,
         last_value(CASE WHEN rn <= n - 10 THEN m2r END IGNORE NULLS) OVER wp2 AS m2,
         last_value(CASE WHEN rn <= n - 10 THEN s2r END IGNORE NULLS) OVER wp2 AS s2
  FROM e2
  WINDOW wp2 AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CASE WHEN abs(v - m2) > 2.0 * s2 THEN NULL ELSE v END AS v
FROM p2
WHERE rn <= n - 20
"""

_STREAMING_DEDUP_SQL = """
SELECT event_id, user_id, event_type, value FROM events
"""

_STREAMING_ENRICH_SQL = """
SELECT event_id, user_id, c_mktsegment AS segment, value
FROM events LEFT JOIN customer ON user_id = c_custkey
"""

def _streaming_inc_dedup_sql() -> str:
    return f"""
SELECT CAST({_STREAM_WINDOW_US} AS BIGINT) AS w_start_us, x.*
FROM ({_incremental_dedup_sql()}) x
WHERE x.doc_id < {_STREAM_SHARD_BOUND}
"""

def _streaming_ann_sql() -> str:
    return f"""
SELECT CAST({_STREAM_WINDOW_US} AS BIGINT) AS w_start_us, x.*
FROM ({_ann_index_probe_sql()}) x
"""

_STREAMING_JOIN_SQL = """
SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
       CAST(epoch_us(l.ts) AS BIGINT) AS l_time_us,
       CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS lag_us
FROM events l
JOIN events r
  ON l.user_id = r.user_id
 AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
"""

# the batch despike oracle restricted to each cast's TAIL (rn > n - 20):
# exactly the rows the streaming query's stable-prefix filter excludes
_DESPIKE_CLOSEOUT_SQL = _STATEFUL_DESPIKE_SQL.replace(
    """SELECT event_id, user_id,
       CASE WHEN abs(v - m2) > 2.0 * s2 THEN NULL ELSE v END AS v
FROM p2
WHERE rn <= n - 20""",
    """SELECT user_id, event_id, v AS value,
       CASE WHEN abs(v - m2) > 2.0 * s2 THEN NULL ELSE v END AS despiked
FROM p2
WHERE rn > n - 20""",
)
assert "WHERE rn > n - 20" in _DESPIKE_CLOSEOUT_SQL

_STREAMING_WINDOWED_SQL = """
SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS w_start_us,
       user_id,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 4) AS sum_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
"""



def _streaming_clean_sql() -> str:
    """Streaming ingest-time boilerplate strip: the batch
    strip_boilerplate rule (template set mined from the FULL corpus at
    the same threshold) applied to the arriving shard, plus the
    constant day-window column the streaming aggregate adds."""
    return rf"""
WITH l AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, ' ')) AS line,
         unnest(range(1, len(regexp_split_to_array(text, ' ')) + 1)) AS pos
  FROM documents
), e AS (
  SELECT doc_id, pos, line, length(trim(line)) >= 4 AS elig FROM l
), b AS (
  SELECT trim(line) AS k FROM e WHERE elig
  GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 390
), shard AS (
  SELECT e.doc_id, e.pos, e.line,
         (e.elig AND b.k IS NOT NULL) AS dropped
  FROM e LEFT JOIN b ON trim(e.line) = b.k
  WHERE e.doc_id % 5 = 0 AND e.doc_id < {_STREAM_SHARD_BOUND}
)
SELECT CAST({_STREAM_WINDOW_US} AS BIGINT) AS w_start_us,
       doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       COALESCE(string_agg(CASE WHEN NOT dropped THEN line END, ' ' ORDER BY pos), '')
         AS text_clean
FROM shard
GROUP BY doc_id
"""
