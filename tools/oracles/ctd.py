"""CTD/ordered-operator family oracle SQL (filters, split,
press_check, bindata, despike, smooth, derive ops, fluent chain).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""

from tools.oracles.params import _SMOOTH_WINDOW_LEN

_REMOVE_ABOVE_WATER_SQL = """
SELECT event_id, user_id, CAST(value AS DOUBLE) - 250.0 AS depth
FROM events WHERE CAST(value AS DOUBLE) - 250.0 >= 0
"""

_REMOVE_UP_TO_SQL = """
SELECT event_id, user_id, value FROM events WHERE value >= 100.0
"""

_SPLIT_SQL = """
WITH m AS (
  SELECT user_id, max(value) AS mx FROM events GROUP BY user_id
), s AS (
  SELECT e.user_id, min(e.ts) AS split_ts
  FROM events e JOIN m ON e.user_id = m.user_id AND e.value = m.mx
  GROUP BY e.user_id
)
SELECT e.event_id, e.user_id,
       CASE WHEN e.ts <= s.split_ts THEN 'down' ELSE 'up' END AS leg
FROM events e JOIN s ON e.user_id = s.user_id
"""

_PRESS_CHECK_SQL = """
SELECT event_id, user_id, value,
       CASE WHEN value < max(value) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            THEN NULL ELSE CAST(value AS DOUBLE) END AS v
FROM events
"""

_MOVINGAVERAGE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS DOUBLE) / 4.0 AS ma4
FROM events
"""

_GAP_SQL = "CASE WHEN event_type = 'click' THEN NULL ELSE CAST(value AS DOUBLE) END"

_FFILL_SQL = f"""
SELECT event_id, user_id,
       last_value({_GAP_SQL} IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
FROM events
"""

_INTERPOLATE_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(epoch_us(ts) AS DOUBLE) AS tpos,
         {_GAP_SQL} AS v
  FROM events
), nb AS (
  SELECT event_id, user_id, tpos, v,
         last_value(CASE WHEN v IS NOT NULL THEN tpos END IGNORE NULLS) OVER wp AS pp,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         first_value(CASE WHEN v IS NOT NULL THEN tpos END IGNORE NULLS) OVER wn AS np,
         first_value(v IGNORE NULLS) OVER wn AS nv
  FROM base
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       ROUND(CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              CASE WHEN np = pp THEN pv
                   ELSE pv + (tpos - pp) * (nv - pv) / (np - pp) END
            ELSE NULL END, 4) AS v
FROM nb
"""

_BINDATA_SQL = """
WITH bounds AS (
  SELECT user_id,
         -- direction-insensitive bounds (the operator binds least/greatest
         -- of the endpoint values so the upcast bins too)
         CAST(CEIL(LEAST(first(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                         last(CAST(value AS DOUBLE) ORDER BY ts, event_id))) AS DOUBLE) AS start,
         CAST(FLOOR(GREATEST(first(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                             last(CAST(value AS DOUBLE) ORDER BY ts, event_id))) AS DOUBLE) AS stop
  FROM events GROUP BY user_id
), spans AS (
  SELECT user_id, start, CAST(CEIL((stop - start) / 50.0) AS BIGINT) AS nedges
  FROM bounds
), grid AS (
  SELECT user_id, start, unnest(generate_series(0, nedges - 2)) AS bin
  FROM spans WHERE nedges >= 2
), binned0 AS (
  SELECT e.user_id, s.start, s.nedges,
         CAST(CEIL((CAST(e.value AS DOUBLE) - s.start) / 50.0) AS BIGINT) - 1 AS bin0,
         CAST(e.value AS DOUBLE) AS ch
  FROM events e JOIN spans s ON e.user_id = s.user_id
  WHERE s.nedges >= 2
), binned AS (
  -- edge-comparison correction, mirroring the Spark operator: the
  -- arithmetic bin index can be 1 ULP off pd.cut's direct comparisons
  SELECT user_id, nedges,
         CASE WHEN ch > start + (bin0 + 1) * 50.0 THEN bin0 + 1
              WHEN ch <= start + bin0 * 50.0 THEN bin0 - 1
              ELSE bin0 END AS bin,
         ch
  FROM binned0
), aggd AS (
  SELECT user_id, bin,
         CAST(SUM(CAST(ch AS DECIMAL(25,6))) AS DOUBLE) / COUNT(ch) AS ch
  FROM binned
  WHERE bin BETWEEN 0 AND nedges - 2
  GROUP BY user_id, bin
)
SELECT g.user_id,
       g.start + (g.bin + 0.5) * 50.0 AS bin_center,
       a.ch AS ch
FROM grid g LEFT JOIN aggd a ON g.user_id = a.user_id AND g.bin = a.bin
"""

_DESPIKE_SQL = """
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
"""

_BOTTLE_MEAN_SQL = """
SELECT user_id,
       CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(CAST(value AS DOUBLE)) AS mean_value,
       COUNT(*) AS n_scans
FROM events GROUP BY user_id
"""

_MAXDEPTH_SQL = f"""
SELECT user_id,
       max(CASE WHEN {_GAP_SQL} IS NOT NULL THEN CAST(value AS DOUBLE) END) AS maxdepth
FROM events GROUP BY user_id
"""

_NUNIQUE_SQL = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types FROM events GROUP BY user_id
"""

def _ctm_sql() -> str:
    alpha = 0.03
    beta = 1.0 / 7
    sample_interval = 1.0 / 15
    a = 2 * alpha / (sample_interval * beta + 2)
    b = 1 - (2 * a / alpha)
    return f"""
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(value AS DOUBLE) / 20.0 AS t,
         CAST(value AS DOUBLE) / 100.0 AS c
  FROM events
)
SELECT event_id, user_id,
       ROUND(-1.0 * {b!r} * c + {a!r} * (0.1 * (1.0 + 0.006 * (t - 20.0)))
             * (t - lag(t, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)), 6) AS ctm
FROM e
"""

_MLD_SQL = """
SELECT event_id, user_id,
       (first_value(CAST(value AS DOUBLE) / 10.0) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - CAST(value AS DOUBLE) / 10.0) < 0.5 AS mld
FROM events
"""

_CUMSUM_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
"""

_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM g GROUP BY user_id
"""

_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'view') AS n_view,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'error') AS n_error
FROM events GROUP BY user_id
"""

_CTD_PIPELINE_SQL = """
WITH f AS (
  SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS p,
         CAST(value AS DOUBLE) * 0.5 + 10.0 AS ch
  FROM events
  WHERE CAST(value AS DOUBLE) >= 25.0
), m AS (
  SELECT user_id, max(p) AS mx FROM f GROUP BY user_id
), s AS (
  SELECT f.user_id, min(f.ts) AS split_ts
  FROM f JOIN m ON f.user_id = m.user_id AND f.p = m.mx
  GROUP BY f.user_id
), down AS (
  SELECT f.* FROM f JOIN s ON f.user_id = s.user_id WHERE f.ts <= s.split_ts
), checked AS (
  SELECT event_id, user_id, ts, p,
         CASE WHEN p < max(p) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN NULL ELSE ch END AS ch
  FROM down
), bounds AS (
  SELECT user_id,
         CAST(CEIL(LEAST(first(p ORDER BY ts, event_id),
                         last(p ORDER BY ts, event_id))) AS DOUBLE) AS start,
         CAST(FLOOR(GREATEST(first(p ORDER BY ts, event_id),
                             last(p ORDER BY ts, event_id))) AS DOUBLE) AS stop
  FROM checked GROUP BY user_id
), spans AS (
  SELECT user_id, start, CAST(CEIL((stop - start) / 50.0) AS BIGINT) AS nedges
  FROM bounds
), grid AS (
  SELECT user_id, start, unnest(generate_series(0, nedges - 2)) AS bin
  FROM spans WHERE nedges >= 2
), binned0 AS (
  SELECT c.user_id, s.start, s.nedges,
         CAST(CEIL((c.p - s.start) / 50.0) AS BIGINT) - 1 AS bin0, c.p, c.ch
  FROM checked c JOIN spans s ON c.user_id = s.user_id
  WHERE s.nedges >= 2
), binned AS (
  SELECT user_id, nedges,
         CASE WHEN p > start + (bin0 + 1) * 50.0 THEN bin0 + 1
              WHEN p <= start + bin0 * 50.0 THEN bin0 - 1
              ELSE bin0 END AS bin,
         ch
  FROM binned0
), aggd AS (
  SELECT user_id, bin,
         CAST(SUM(CAST(ch AS DECIMAL(25,6))) AS DOUBLE) / COUNT(ch) AS ch
  FROM binned WHERE bin BETWEEN 0 AND nedges - 2
  GROUP BY user_id, bin
)
SELECT g.user_id, g.start + (g.bin + 0.5) * 50.0 AS bin_center,
       ROUND(a.ch, 4) AS ch
FROM grid g LEFT JOIN aggd a ON g.user_id = a.user_id AND g.bin = a.bin
"""

_BINDATA_INTERP_SQL = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(value AS DOUBLE) AS p,
         CAST(value AS DOUBLE) * 1.5 + 3.0 AS ch
  FROM events
), bounds AS (
  SELECT user_id,
         CAST(CEIL(LEAST(first(p ORDER BY ts, event_id),
                         last(p ORDER BY ts, event_id))) AS DOUBLE) AS start,
         CAST(FLOOR(GREATEST(first(p ORDER BY ts, event_id),
                             last(p ORDER BY ts, event_id))) AS DOUBLE) AS stop
  FROM base GROUP BY user_id
), spans AS (
  SELECT user_id, start, CAST(CEIL((stop - start) / 50.0) AS BIGINT) AS n
  FROM bounds
), grid AS (
  SELECT user_id, start + unnest(generate_series(0, n - 1)) * 50.0 AS p,
         1 AS is_grid, NULL::DOUBLE AS ch
  FROM spans WHERE n >= 1
), u AS (
  SELECT user_id, p, 0 AS is_grid, ch FROM base
  UNION ALL
  SELECT user_id, p, is_grid, ch FROM grid
), nb AS (
  SELECT user_id, p, is_grid,
         last_value(CASE WHEN is_grid = 0 THEN p END IGNORE NULLS) OVER wp AS pp,
         last_value(CASE WHEN is_grid = 0 THEN ch END IGNORE NULLS) OVER wp AS pv,
         first_value(CASE WHEN is_grid = 0 THEN p END IGNORE NULLS) OVER wn AS np_,
         first_value(CASE WHEN is_grid = 0 THEN ch END IGNORE NULLS) OVER wn AS nv
  FROM u
  WINDOW wp AS (PARTITION BY user_id ORDER BY p, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY p, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, p AS grid_p,
       ROUND(CASE WHEN pp IS NULL THEN nv
                  WHEN np_ IS NULL THEN pv
                  WHEN np_ = pp THEN pv
                  ELSE pv + (p - pp) * (nv - pv) / (np_ - pp) END, 4) AS ch
FROM nb WHERE is_grid = 1
"""

def _golden_sql(name: str) -> str:
    """Oracle over a kernel-golden parquet: expected values precomputed by
    the pure-NumPy reference kernels (tools/make_golden.py).  Only valid at
    sf0.01 — the scale the driver's correctness gate runs at."""
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[2] / "tests" / "data" / "golden"
    return f"SELECT event_id, user_id, v FROM read_parquet('{p}/{name}_sf0.01.parquet')"

def _smooth_native_sql() -> str:
    """Generated oracle: the same kernel weights as explicit lead/lag
    terms, chained left-to-right so double accumulation order is identical
    to the Spark expression."""
    from python_ctd_spark.functions.signal_numpy import window_weights

    wl = _SMOOTH_WINDOW_LEN
    weights = window_weights("hanning", wl)
    c_off = (wl - 1) // 2
    terms, norms = [], []
    for j, wt in enumerate(weights):
        d = j - c_off
        if d == 0:
            xj = "v"
        elif d < 0:
            xj = f"lag(v, {-d}) OVER wo"
        else:
            xj = f"lead(v, {d}) OVER wo"
        terms.append(f"COALESCE(({xj}) * {float(wt)!r}, 0.0)")
        norms.append(f"CASE WHEN ({xj}) IS NOT NULL THEN {float(wt)!r} ELSE 0.0 END")
    num = terms[0]
    for t in terms[1:]:
        num = f"({num} + {t})"
    den = norms[0]
    for t in norms[1:]:
        den = f"({den} + {t})"
    return f"""
WITH base AS (
  SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS v FROM events
), sm AS (
  SELECT event_id, user_id, {num} AS num, {den} AS den
  FROM base
  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
       ROUND(CASE WHEN den > 0 THEN num / den END, 4) AS v
FROM sm
"""

_SIGMA0_SQL = (
    "(1026.45 * (1.0 - (2.07e-4 + 5.0e-6 * ({ct} - 15.0)) * ({ct} - 15.0)"
    " + 7.6e-4 * ({sa} - 35.16504)) - 1000.0)"
)

_BARRIER_LAYER_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, ts,
         35.0 + CAST(value AS DOUBLE) / 1000.0 AS sa,
         28.0 - CAST(value AS DOUBLE) / 50.0 AS ct
  FROM events
), l1 AS (
  SELECT event_id, user_id, ts, sa, ct,
         {_SIGMA0_SQL.format(sa='sa', ct='ct')} AS sig,
         first_value(ct) OVER wa AS ct0,
         first_value(sa) OVER wa AS sa0,
         first_value({_SIGMA0_SQL.format(sa='sa', ct='ct')}) OVER wa AS sig0
  FROM base
  WINDOW wa AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
), l2 AS (
  SELECT event_id, user_id, sa, ct, sig, ct0, sa0, sig0,
         last_value(CASE WHEN ct0 - ct < 0.5 THEN ct END IGNORE NULLS) OVER wa AS ct_mld
  FROM l1
  WINDOW wa AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       (sig - {_SIGMA0_SQL.format(sa='sa0', ct='ct_mld')})
         < (sig0 - {_SIGMA0_SQL.format(sa='sa0', ct='ct_mld')}) AS BLT
FROM l2
"""

