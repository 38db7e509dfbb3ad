"""ANSI-SQL oracle for every query in plans/queries.py, runnable by
DuckDB over the same parquet tables (driver pre-registers the views).

The SQL mirrors the *semantics and column aliases* of the DataFrame
side exactly; money math goes through DECIMAL(18,2) (exact, so parallel
Spark sums equal DuckDB's sequential sums bit-for-bit once cast to
double), hashes are sha256 over chr(31)-separated normalized strings —
identical to functions/hashing.delta_hash.
"""

from __future__ import annotations

# chr(31) == unit separator, functions/hashing.SEP
_HASH4 = (
    "sha256(concat_ws(chr(31), "
    "coalesce({c1}, ''), "
    "coalesce(CAST(CAST({c2} AS DECIMAL(18,2)) AS VARCHAR), ''), "
    "coalesce(CAST(CAST({c3} AS DATE) AS VARCHAR), ''), "
    "coalesce({c4}, '')))"
)

_STG = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 2 = 1
"""

_TGT = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 3 <> 0
"""

_STG_HASHED = f"""
SELECT o_orderkey,
       {_HASH4.format(c1='o_orderstatus', c2='o_totalprice', c3='o_orderdate', c4='o_orderpriority')} AS delta_hash
FROM ({_STG})
"""

_TGT_HASHED = f"""
SELECT o_orderkey,
       {_HASH4.format(c1='o_orderstatus', c2='o_totalprice', c3='o_orderdate', c4='o_orderpriority')} AS delta_hash
FROM ({_TGT})
"""

_J2 = f"""
SELECT coalesce(stg.o_orderkey, tgt.o_orderkey) AS natural_key,
       CASE WHEN tgt.o_orderkey IS NULL THEN 'I'
            WHEN stg.o_orderkey IS NULL THEN 'PD'
            WHEN stg.delta_hash <> tgt.delta_hash THEN 'U'
            ELSE 'NC' END AS upsert_cd,
       stg.delta_hash AS stg_hash,
       tgt.delta_hash AS tgt_hash
FROM ({_STG_HASHED}) stg
FULL OUTER JOIN ({_TGT_HASHED}) tgt ON stg.o_orderkey = tgt.o_orderkey
"""

ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",

    "a1_latest_order_per_customer": """
SELECT o_custkey,
       o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS latest_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",

    "a2_high_water_marks": """
SELECT o.o_orderkey, o.o_custkey, m.max_key, m.max_price
FROM orders o
CROSS JOIN (
  SELECT MAX(o_orderkey) AS max_key,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
  FROM orders
) m
WHERE o.o_orderstatus = 'O'
""",

    "j1_interface_registration": """
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",

    "j6_semi_join_latest": """
SELECT o_orderkey, o_custkey, o_orderdate
FROM orders
WHERE o_orderdate IN (SELECT MAX(o_orderdate) FROM orders)
""",

    "j_anti_customers_without_orders": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",

    "q3_unshipped_revenue": """
SELECT l.l_orderkey, o.o_orderdate,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",

    "j2_scd2_delta_classify": _J2,

    "w1_surrogate_key_mint": f"""
SELECT natural_key,
       CAST(ROW_NUMBER() OVER (ORDER BY natural_key) + 1000000 AS BIGINT) AS surrogate_key
FROM ({_J2})
WHERE upsert_cd = 'I'
""",

    "f6_legacy_key_guard": """
SELECT o_orderkey,
       CASE WHEN SUBSTRING(CAST(o_orderkey AS VARCHAR), 1, 4) <> '9999' THEN o_orderkey
            ELSE TRY_CAST(SUBSTRING(CAST(o_orderkey AS VARCHAR), 5, 18) AS BIGINT) END AS effective_key,
       CASE WHEN SUBSTRING(CAST(o_orderkey AS VARCHAR), 1, 4) = '9999' THEN 'Y' ELSE 'N' END AS legacy_flag
FROM orders
""",

    "p1_incremental_watermark": """
SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
""",

    "s10_load_stamp": """
SELECT event_id, user_id, value, CAST(42 AS BIGINT) AS load_key
FROM events
WHERE event_type = 'purchase'
""",

    "f_scalar_normalization": """
SELECT event_id,
       coalesce(event_type, 'N/A') AS etype,
       CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_str,
       CASE WHEN value >= 100 THEN 'HIGH' WHEN value >= 10 THEN 'MID' ELSE 'LOW' END AS value_band,
       UPPER(SUBSTRING(event_type, 1, 3)) AS etype_prefix,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
FROM events
""",

    "o_set_ops_snapshot_diff": f"""
SELECT o_orderkey, 'both' AS membership FROM (
  SELECT o_orderkey FROM ({_STG}) INTERSECT SELECT o_orderkey FROM ({_TGT})
)
UNION ALL
SELECT o_orderkey, 'staging_only' AS membership FROM (
  SELECT o_orderkey FROM ({_STG}) EXCEPT ALL SELECT o_orderkey FROM ({_TGT})
)
UNION ALL
SELECT o_orderkey, 'target_only' AS membership FROM (
  SELECT o_orderkey FROM ({_TGT}) EXCEPT ALL SELECT o_orderkey FROM ({_STG})
)
""",

    "w_running_user_value": """
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       LAG(event_id) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_event_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS INTEGER) AS event_seq
FROM events
""",

    "q5_region_supplier_volume": """
SELECT n.n_name AS nation_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",

    "a_rollup_status_priority": """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",

    "a_cube_type_band": """
WITH banded AS (
  SELECT event_type,
         CASE WHEN value >= 100 THEN 'HIGH' WHEN value >= 10 THEN 'MID' ELSE 'LOW' END AS value_band,
         value
  FROM events
)
SELECT event_type, value_band,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(GROUPING(event_type, value_band) AS BIGINT) AS gid
FROM banded
GROUP BY CUBE (event_type, value_band)
""",

    "a_distinct_counts": """
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
FROM customer
GROUP BY c_mktsegment
""",

    "a_percentiles": """
SELECT o_orderstatus,
       round(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 0.5), 2) AS p50,
       round(quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 0.9), 2) AS p90,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",

    # Sketch queries: estimates aren't portable, so the Spark side emits
    # exact aggregates + bound-verdict booleans; the oracle pins the exact
    # values and asserts the verdicts are uniformly TRUE.
    "a_approx_distinct_sketch": """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS hll_within_2pct,
       TRUE AS approx_within_10pct
FROM events
GROUP BY event_type
""",

    "a_quantile_sketch": """
SELECT event_type,
       round(quantile_cont(value, 0.50), 2) AS p50_exact,
       round(quantile_cont(value, 0.90), 2) AS p90_exact,
       round(quantile_cont(value, 0.99), 2) AS p99_exact,
       TRUE AS p50_in_rank_bound,
       TRUE AS p90_in_rank_bound,
       TRUE AS p99_in_rank_bound
FROM events
GROUP BY event_type
""",

    "a_grouping_sets_sql": """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",

    "w_rank_suite": """
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER det AS INTEGER) AS rn,
       CAST(RANK() OVER tie AS INTEGER) AS rk,
       CAST(DENSE_RANK() OVER tie AS INTEGER) AS drk,
       CAST(NTILE(4) OVER det AS INTEGER) AS quartile,
       LEAD(o_orderkey) OVER det AS next_orderkey
FROM orders
WINDOW det AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC),
       tie AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC)
""",

    "f_date_arithmetic": """
SELECT o_orderkey,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_1995,
       CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow_sun0
FROM orders
""",

    "f_string_suite": """
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_words,
       TRY_CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INTEGER) AS brand_num,
       UPPER(p_type) || '-' || lpad(CAST(p_size AS VARCHAR), 2, '0') AS type_size,
       CAST(length(p_name) AS INTEGER) AS name_len
FROM part
""",

    "n_props_extract": """
SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""",

    "t_sliding_window_agg": """
WITH b AS (
  SELECT event_type, value,
         CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS b0
  FROM events
),
expanded AS (
  SELECT event_type, value, unnest([b0, b0 - 21600]) AS window_start FROM b
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY 1, 2
""",

    "j_asof_latest_event_before_order": """
SELECT user_id, err_id, err_ts, asof_event_id, asof_ts
FROM (
  SELECT e.user_id, e.event_id AS err_id, CAST(e.ts AS TIMESTAMP) AS err_ts,
         c.event_id AS asof_event_id, CAST(c.ts AS TIMESTAMP) AS asof_ts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY CAST(c.ts AS TIMESTAMP) DESC, c.event_id DESC) AS rn
  FROM events e
  JOIN events c ON e.user_id = c.user_id
                AND CAST(c.ts AS TIMESTAMP) <= CAST(e.ts AS TIMESTAMP)
  WHERE e.event_type = 'error' AND c.event_type = 'click'
)
WHERE rn = 1
""",

    "t5_tumbling_window_agg": """
SELECT CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(CASE WHEN value > 50 THEN 1 END) AS n_high
FROM events
GROUP BY 1, 2
""",

    # conditional-aggregation form of PIVOT: identical result columns
    # (one per priority) so the order-insensitive compare lines up
    "a_pivot_price_by_priority": """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "1-URGENT",
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "2-HIGH",
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "3-MEDIUM",
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "4-NOT SPECIFIED",
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "5-LOW"
FROM orders
GROUP BY o_orderstatus
""",

    "o_unpivot_part_metrics": """
SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
""",

    "n_props_variant": """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract(props, '$.missing') AS INTEGER) AS missing_field
FROM events
""",

    "q18_large_volume_customers": """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       o.o_orderdate AS orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       big.total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",

    "o_top_revenue_orders": """
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
FROM orders
ORDER BY total_price DESC, o_orderkey
LIMIT 10
""",

    "w_range_frame_rolling_spend": """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER spend AS DOUBLE) AS spend_30d,
       COUNT(*) OVER spend AS n_orders_30d,
       CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER first_w AS DOUBLE) AS first_order_price
FROM orders
WINDOW
  spend AS (PARTITION BY o_custkey ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
            RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW),
  first_w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",

    # the oracle states the interval join as the plain theta form the
    # banded plan must be equivalent to
    "j_interval_bucketed": """
SELECT a.o_orderkey,
       COUNT(*) AS n_followups,
       CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS followup_total
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND CAST(b.o_orderdate AS DATE) > CAST(a.o_orderdate AS DATE)
 AND CAST(b.o_orderdate AS DATE) <= CAST(a.o_orderdate AS DATE) + INTERVAL 90 DAY
GROUP BY a.o_orderkey
""",
    "f_higher_order_arrays": """
WITH toks AS (
  SELECT p_partkey, list_sort(string_split(p_name, ' ')) AS tokens FROM part
)
SELECT p_partkey,
       array_to_string(list_transform(tokens, x -> upper(x)), ',') AS upper_csv,
       CAST(length(list_filter(tokens, x -> length(x) > 4)) AS INT) AS n_long_tokens,
       CAST(coalesce(list_sum(list_transform(tokens, x -> length(x))), 0) AS INT) AS char_total,
       tokens[1] AS first_token
FROM toks
""",
    "ts_gap_fill_daily": """
WITH daily AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS day_value,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM spans)
SELECT g.user_id,
       CAST(CAST(g.day AS DATE) AS VARCHAR) AS day,
       CAST(last_value(d.day_value IGNORE NULLS) OVER (
            PARTITION BY g.user_id ORDER BY g.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS filled_value,
       CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN d.day_value IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM grid g
LEFT OUTER JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
""",
    # full recompute — must equal the three-batch incremental merge
    "a_incremental_rollup": """
SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR) AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
FROM events
GROUP BY day, event_type
""",
    "a_heavy_hitters": """
WITH per_user AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
total AS (SELECT SUM(cnt) AS total FROM per_user)
SELECT user_id, cnt, CAST(cnt AS DOUBLE) / total AS share
FROM per_user, total
WHERE cnt * 1000 > total * 8
""",
    # UNION-by-name with null-fill of drifted columns, stated explicitly
    "o_union_evolved_schemas": """
SELECT o_orderkey, o_orderstatus,
       CAST(NULL AS VARCHAR) AS o_orderpriority,
       CAST(NULL AS VARCHAR) AS o_channel
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus, o_orderpriority, 'web' AS o_channel
FROM orders WHERE o_orderkey % 2 = 1
""",
    "j_nullsafe_snapshot_match": """
WITH src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END AS grp,
         o_totalprice
  FROM orders
),
a_g AS (
  SELECT grp, count(*) AS n_a, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_a
  FROM src WHERE o_orderkey % 2 = 1 GROUP BY grp
),
b_g AS (
  SELECT grp, count(*) AS n_b, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_b
  FROM src WHERE o_orderkey % 2 = 0 GROUP BY grp
)
SELECT a_g.grp, n_a, n_b,
       CAST(sum_a AS DOUBLE) AS sum_a, CAST(sum_b AS DOUBLE) AS sum_b
FROM a_g JOIN b_g ON a_g.grp IS NOT DISTINCT FROM b_g.grp
""",
    # direct fact aggregate — must equal the rollup-routed answer
    "a_rollup_routed": """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
       CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
FROM events
GROUP BY event_type
""",
    "p_inactive_devices": """
WITH last_seen AS (
  SELECT user_id, MAX(CAST(ts AS TIMESTAMP)) AS last_ts FROM events GROUP BY user_id
),
hw AS (SELECT MAX(last_ts) AS high_water FROM last_seen)
SELECT user_id,
       strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
       CAST(epoch_us(high_water) - epoch_us(last_ts) AS DOUBLE) / 86400000000.0 AS days_silent
FROM last_seen, hw
WHERE last_ts < high_water - INTERVAL 7 DAY
""",
    "scd2_asof_snapshot": """
WITH chain AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         o_orderdate AS valid_from,
         COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                  TIMESTAMP '3000-01-01 00:00:00') AS valid_to
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to
FROM chain
WHERE valid_from <= TIMESTAMP '1996-06-01 00:00:00'
  AND TIMESTAMP '1996-06-01 00:00:00' < valid_to
""",
    "scd2_change_feed": """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS change_ts,
       CASE WHEN prev_price IS NULL THEN 'I'
            WHEN prev_price <> o_totalprice THEN 'U'
            ELSE 'NC' END AS change_type,
       o_totalprice, prev_price,
       CAST(CAST(o_totalprice AS DECIMAL(18,2))
            - CAST(prev_price AS DECIMAL(18,2)) AS DOUBLE) AS price_delta
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_price
  FROM orders
)
""",
    "w_fill_forward": """
WITH holes AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, v,
       LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM holes
""",
    "f_bitwise_suite": """
SELECT o_orderkey,
       o_orderkey & o_custkey AS b_and,
       o_orderkey | o_custkey AS b_or,
       xor(o_orderkey, o_custkey) AS b_xor,
       o_orderkey << 3 AS b_shl,
       o_orderkey >> 2 AS b_shr,
       CAST(bit_count(o_orderkey) AS INTEGER) AS b_pop
FROM orders
""",
    "a_mode_event_type": """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_event_type, n AS n_occurrences
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rk
  FROM counts
)
WHERE rk = 1
""",
    "scd2_interval_align": """
WITH chain AS (
  SELECT o_custkey, o_orderkey, o_orderkey % 2 AS parity,
         o_orderdate AS valid_from,
         COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey, o_orderkey % 2
                                          ORDER BY o_orderdate, o_orderkey),
                  TIMESTAMP '3000-01-01 00:00:00') AS valid_to
  FROM orders
)
SELECT a.o_custkey, a.o_orderkey AS a_orderkey, b.o_orderkey AS b_orderkey,
       strftime(GREATEST(a.valid_from, b.valid_from), '%Y-%m-%d %H:%M:%S') AS overlap_from,
       strftime(LEAST(a.valid_to, b.valid_to), '%Y-%m-%d %H:%M:%S') AS overlap_to
FROM (SELECT * FROM chain WHERE parity = 0) a
JOIN (SELECT * FROM chain WHERE parity = 1) b USING (o_custkey)
WHERE a.valid_from < b.valid_to AND b.valid_from < a.valid_to
""",
    "meta_quality_audit": """
WITH li AS (
  SELECT SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS fk_orphans,
         SUM(CASE WHEN l.l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 ELSE 0 END) AS domain_discount,
         SUM(CASE WHEN l.l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_shipdate,
         COUNT(*) AS n
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
),
od AS (
  SELECT SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS fk_orphans,
         COUNT(*) - COUNT(DISTINCT o.o_orderkey) AS pk_dups,
         COUNT(*) AS n
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
),
cu AS (
  SELECT SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS nulls,
         COUNT(*) AS n
  FROM customer
),
checks AS (
  SELECT 'lineitem_fk_orderkey' AS check_name, fk_orphans AS violations, n AS rows_scanned FROM li
  UNION ALL SELECT 'lineitem_discount_domain', domain_discount, n FROM li
  UNION ALL SELECT 'lineitem_shipdate_not_null', null_shipdate, n FROM li
  UNION ALL SELECT 'orders_fk_custkey', fk_orphans, n FROM od
  UNION ALL SELECT 'orders_pk_unique', pk_dups, n FROM od
  UNION ALL SELECT 'customer_acctbal_not_null', nulls, n FROM cu
)
SELECT check_name,
       CAST(violations AS BIGINT) AS violations,
       CAST(rows_scanned AS BIGINT) AS rows_scanned,
       CASE WHEN violations = 0 THEN 'Y' ELSE 'N' END AS pass
FROM checks
""",
}
