"""DuckDB oracle SQL for every entry in ``__spark_entry__.queries()``.

Each statement mirrors the Spark query's arithmetic *operation for
operation* (same associativity, same guards) so IEEE double results are
bit-identical, with DECIMAL casts wherever a sum's accumulation order
would otherwise differ between engines.
"""

# normalized-text + token expressions shared by the text queries
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)
_NTOKS = f"len({_TOKS})"

# exact mirror of Spark's shingles(): tokens of *normalized* text
_NORMTOKS = (
    f"list_filter(string_split_regex(lower(trim({_NORM})), '\\s+'),"
    " x -> x != '')"
)



def _stop_ratio(words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"CAST(len(list_filter({_TOKS}, t -> list_contains({arr}, t))) AS DOUBLE)"
        f" / CAST({_NTOKS} AS DOUBLE)"
    )


_EN = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]
_ES = ["el", "la", "de", "que", "y", "en", "un", "una", "los", "las"]
_FR = ["le", "la", "de", "et", "un", "une", "les", "des", "que", "est"]
_DE = ["der", "die", "das", "und", "ein", "eine", "zu", "den", "von", "ist"]
_ZH = ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"]

# 3-gram shingle list over normalized tokens (distinct)
_SHINGLES = """
list_distinct(
  CASE WHEN len(toks) - 2 >= 1 THEN
    list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
  ELSE [] END)
"""

ORACLES: dict[str, str] = {}

ORACLES["q01_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 100.0 AS sum_qty,
  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 100.0 AS sum_base_price,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q02_horizontal_em"] = """
WITH b AS (
  SELECT l_orderkey, l_linenumber,
         l_quantity AS v1,
         nullif(l_discount, 0.04) AS v2,
         nullif(l_tax, 0.0) AS v3
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
  ((0.0 + coalesce(v1, 0.0)) + coalesce(v2, 0.0)) + coalesce(v3, 0.0) AS e,
  sqrt(((0.0 + coalesce(v1 * v1, 0.0)) + coalesce(v2 * v2, 0.0))
       + coalesce(v3 * v3, 0.0)) AS m
FROM b
"""

ORACLES["q03_vertical_moe"] = """
WITH b AS (SELECT c_nationkey, nullif(c_acctbal, 0.0) AS m FROM customer)
SELECT c_nationkey,
  coalesce(CAST(sum(CAST(m AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS e_sum,
  sqrt(coalesce(CAST(sum(CAST(m * m AS DECIMAL(25,6))) AS DOUBLE), 0.0)) AS m_agg,
  count(*) AS n
FROM b GROUP BY c_nationkey
"""

ORACLES["q04_sentinel_scrub"] = """
WITH injected AS (
  SELECT o_orderpriority,
    CASE WHEN o_orderkey % 11 = 0 THEN 999999999.0
         WHEN o_orderkey % 13 = 0 THEN -555555555.0
         ELSE o_totalprice END AS val
  FROM orders),
scrubbed AS (
  SELECT o_orderpriority,
    CASE WHEN val IN (999999999.0, 333333333.0, 222222222.0, 666666666.0,
                      888888888.0, 555555555.0, -999999999.0, -333333333.0,
                      -222222222.0, -666666666.0, -888888888.0, -555555555.0)
         THEN NULL ELSE val END AS val
  FROM injected)
SELECT o_orderpriority,
  count(*) AS n_rows,
  count(*) FILTER (WHERE val IS NULL) AS n_scrubbed,
  CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_kept
FROM scrubbed GROUP BY o_orderpriority
"""

ORACLES["q05_dim_join_rollup"] = """
SELECT r_name,
  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

ORACLES["q06_multi_source_zip"] = """
SELECT c_mktsegment,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

ORACLES["q07_crosswalk_apportion"] = """
WITH split AS (
  SELECT l_orderkey, l_partkey,
    l_quantity / sum(l_quantity) OVER (PARTITION BY l_orderkey) AS ratio
  FROM lineitem),
facts AS (
  SELECT o_orderkey, o_totalprice AS e, o_totalprice / 10 AS m FROM orders),
joined AS (
  SELECT l_partkey, e * ratio AS e2,
    CASE WHEN ratio = 1 THEN m
         WHEN e * ratio = 0 THEN NULL
         WHEN pow(ratio * 100, 0.56901) * 7.96309 >= 100 THEN m
         ELSE pow(ratio * 100, 0.56901) * 7.96309 / 100 * m END AS m2
  FROM split JOIN facts ON l_orderkey = o_orderkey),
quant AS (
  SELECT l_partkey, e2,
    CAST(floor(m2 * 100 + 0.5) AS DOUBLE) / 100 AS mq
  FROM joined)
SELECT l_partkey,
  CAST(sum(CAST(floor(e2 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1000000.0 AS e,
  count(*) AS n_splits,
  sqrt(CAST(sum(CAST(floor(mq * mq * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       / 10000.0) AS m
FROM quant GROUP BY l_partkey
"""

# interpolated grouped median + MOE over quantity bins per supplier;
# bins lo = [0,10,20,30,40], hi = [10,20,30,40,50]; DF=1.1, both codings
ORACLES["q08_median_groups"] = """
WITH binned AS (
  SELECT l_suppkey, CAST(least(floor(l_quantity / 10), 4) AS INT) AS bin
  FROM lineitem),
counts AS (
  SELECT l_suppkey,
    CAST(count(*) FILTER (WHERE bin = 0) AS DOUBLE) AS n0,
    CAST(count(*) FILTER (WHERE bin = 1) AS DOUBLE) AS n1,
    CAST(count(*) FILTER (WHERE bin = 2) AS DOUBLE) AS n2,
    CAST(count(*) FILTER (WHERE bin = 3) AS DOUBLE) AS n3,
    CAST(count(*) FILTER (WHERE bin = 4) AS DOUBLE) AS n4
  FROM binned GROUP BY l_suppkey),
cums AS (
  SELECT *, n0 AS c0, n0 + n1 AS c1, n0 + n1 + n2 AS c2,
         n0 + n1 + n2 + n3 AS c3, n0 + n1 + n2 + n3 + n4 AS c4
  FROM counts),
base AS (
  SELECT *, c4 AS B,
    CASE WHEN c0 >= c4 / 2 THEN 0 WHEN c1 >= c4 / 2 THEN 1
         WHEN c2 >= c4 / 2 THEN 2 WHEN c3 >= c4 / 2 THEN 3
         WHEN c4 >= c4 / 2 THEN 4 END AS mi
  FROM cums),
med AS (
  SELECT *,
    list_value(n0, n1, n2, n3, n4) AS nl,
    list_value(c0, c1, c2, c3, c4) AS cl,
    list_value(0.0, 10.0, 20.0, 30.0, 40.0) AS lol,
    list_value(10.0, 20.0, 30.0, 40.0, 50.0) AS hil,
    CASE WHEN B = 0 THEN NULL
         WHEN mi = 0 THEN 10.0
         WHEN cl[mi + 1] = 0 THEN NULL
         WHEN mi = 4 THEN 40.0
         ELSE lol[mi + 1]
              + (B / 2 - (cl[mi + 1] - nl[mi + 1]))
                * (hil[mi + 1] - lol[mi + 1]) / nl[mi + 1]
    END AS median_qty
  FROM base),
moe AS (
  SELECT *,
    CASE WHEN B != 0 THEN 1.1 * sqrt(93.0 / (7.0 * B) * 2500.0) END AS se,
    CASE WHEN B != 0 THEN list_transform(cl, c -> c / B * 100) END AS cpl
  FROM med),
binsfound AS (
  SELECT *,
    CASE WHEN cpl[1] > 50.0 - se THEN 0 WHEN cpl[2] > 50.0 - se THEN 1
         WHEN cpl[3] > 50.0 - se THEN 2 WHEN cpl[4] > 50.0 - se THEN 3
         WHEN cpl[5] > 50.0 - se THEN 4 END AS lb,
    CASE WHEN cpl[1] > 50.0 + se THEN 0 WHEN cpl[2] > 50.0 + se THEN 1
         WHEN cpl[3] > 50.0 + se THEN 2 WHEN cpl[4] > 50.0 + se THEN 3
         WHEN cpl[5] > 50.0 + se THEN 4 END AS ub,
    CASE WHEN cpl[1] != 0.0 THEN 0 WHEN cpl[2] != 0.0 THEN 1
         WHEN cpl[3] != 0.0 THEN 2 WHEN cpl[4] != 0.0 THEN 3
         WHEN cpl[5] != 0.0 THEN 4 END AS fnz
  FROM moe),
bounds AS (
  SELECT *,
    CASE WHEN lb = fnz THEN 0.0 ELSE lol[lb + 1] END AS a1l,
    CASE WHEN lb = fnz THEN 10.0
         WHEN lb + 1 <= 4 THEN lol[lb + 2] END AS a2l,
    CASE WHEN lb = 0 THEN 0.0 ELSE cpl[lb] END AS c1l,
    cpl[lb + 1] AS c2l,
    CASE WHEN (ub = (lb & ub)) AND ((lb & ub) = fnz) THEN 0.0
         WHEN ub = 4 THEN 40.0 ELSE lol[ub + 1] END AS a1u,
    CASE WHEN (ub = (lb & ub)) AND ((lb & ub) = fnz) THEN 10.0
         WHEN ub = 4 THEN 40.0
         WHEN ub + 1 <= 4 THEN lol[ub + 2] END AS a2u,
    cpl[((ub - 1 + 5) % 5) + 1] AS c1u,
    cpl[ub + 1] AS c2u
  FROM binsfound),
final AS (
  SELECT *,
    CASE WHEN ((c2l - c1l) + a1l) != 0 THEN
      CASE WHEN (c2l - c1l) = 0 THEN NULL
           ELSE ((50.0 - se) - c1l) * (a2l - a1l) / (c2l - c1l) + a1l END
    END AS lbound,
    CASE WHEN ((c2u - c1u) + a1u) != 0 THEN
      CASE WHEN (c2u - c1u) = 0 THEN NULL
           ELSE ((50.0 + se) - c1u) * (a2u - a1u) / (c2u - c1u) + a1u END
    END AS ubound
  FROM bounds)
SELECT l_suppkey, median_qty,
  CASE WHEN median_qty >= 40.0 THEN NULL
       WHEN B = 0 THEN NULL
       WHEN se >= 50 THEN NULL
       WHEN lb >= 4 THEN NULL
       ELSE (ubound - lbound) * 1.645 / 2 END AS median_moe
FROM final
"""

ORACLES["q09_special_ratio"] = """
WITH num AS (
  SELECT c_nationkey,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS num_e,
    count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey),
num2 AS (SELECT *, num_e / 20 AS num_m FROM num),
den AS (
  SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS den_e FROM customer
  GROUP BY c_nationkey),
den2 AS (SELECT *, sqrt(den_e) AS den_m FROM den)
SELECT c_nationkey,
  num_e / den_e AS e,
  sqrt(num_m * num_m + pow(num_e * den_m / den_e, 2)) / den_e AS m
FROM num2 JOIN den2 USING (c_nationkey)
"""

ORACLES["q10_pz_stats"] = """
WITH oc AS (
  SELECT c_nationkey, c_mktsegment, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey),
child AS (
  SELECT c_nationkey,
    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / 100.0 AS e
  FROM oc WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey),
child2 AS (SELECT *, e / 10 AS m FROM child),
base AS (
  SELECT c_nationkey,
    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      / 100.0 AS agg_e
  FROM oc GROUP BY c_nationkey),
base2 AS (SELECT *, agg_e / 10 AS agg_m FROM base),
j AS (SELECT child2.*, agg_e, agg_m
      FROM child2 LEFT JOIN base2 USING (c_nationkey)),
withp AS (
  SELECT *,
    CASE WHEN agg_e = 0 THEN NULL ELSE e / agg_e * 100 END AS p
  FROM j)
SELECT c_nationkey, e, m, p,
  CASE WHEN p = 0 THEN NULL
       WHEN p = 100 THEN NULL
       WHEN agg_e = 0 THEN NULL
       WHEN m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e) < 0
         THEN sqrt(m * m + (e * agg_m / agg_e) * (e * agg_m / agg_e)) / agg_e * 100
       ELSE sqrt(m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e)) / agg_e * 100
  END AS z,
  CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
FROM withp
"""

ORACLES["q11_cleaning_cascade"] = """
WITH t0 AS (
  SELECT
    CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)
      AS census_geoid,
    'var_' || l_returnflag AS pff_variable,
    CASE WHEN l_linestatus = 'O' THEN 'city' ELSE 'tract' END AS geotype,
    l_quantity - 25 AS c,
    l_extendedprice - 30000 AS e,
    CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity * 2 - 10 END AS m,
    l_discount * 1200 - 10 AS p,
    l_tax * 100 - 2 AS z
  FROM lineitem),
t1 AS (  -- negatives -> NULL
  SELECT census_geoid, pff_variable, geotype,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM t0),
t2 AS (  -- p > 100 -> NULL
  SELECT census_geoid, pff_variable, geotype, c, e, m,
    CASE WHEN p > 100 THEN NULL ELSE p END AS p, z
  FROM t1),
t3 AS (  -- p IS NULL -> z NULL
  SELECT census_geoid, pff_variable, geotype, c, e, m, p,
    CASE WHEN p IS NULL THEN NULL ELSE z END AS z
  FROM t2),
t4 AS (  -- p == 100 -> z = 0
  SELECT census_geoid, pff_variable, geotype, c, e, m, p,
    CASE WHEN p = 100 THEN 0.0 ELSE z END AS z
  FROM t3),
t5 AS (  -- borough/city base vars: NULL c/m -> 0
  SELECT census_geoid, pff_variable, geotype,
    CASE WHEN geotype IN ('borough', 'city') AND pff_variable IN ('var_A')
              AND c IS NULL THEN 0.0 ELSE c END AS c,
    e,
    CASE WHEN geotype IN ('borough', 'city') AND pff_variable IN ('var_A')
              AND m IS NULL THEN 0.0 ELSE m END AS m,
    p, z
  FROM t4),
t6 AS (  -- base (non-median) vars: p = 100, z = 0
  SELECT census_geoid, pff_variable, geotype, c, e, m,
    CASE WHEN pff_variable IN ('var_A')
              AND pff_variable NOT IN ('var_N') THEN 100.0 ELSE p END AS p,
    CASE WHEN pff_variable IN ('var_A')
              AND pff_variable NOT IN ('var_N') THEN 0.0 ELSE z END AS z
  FROM t5),
t7 AS (  -- special vars: p/z -> NULL
  SELECT census_geoid, pff_variable, geotype, c, e, m,
    CASE WHEN pff_variable IN ('var_R') THEN NULL ELSE p END AS p,
    CASE WHEN pff_variable IN ('var_R') THEN NULL ELSE z END AS z
  FROM t6)
SELECT census_geoid, pff_variable, geotype,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z
FROM t7
"""

ORACLES["q12_pivot_status"] = """
SELECT o_custkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_amt,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS filled_amt,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
       FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS partial_amt
FROM orders GROUP BY o_custkey
"""

ORACLES["q13_unpivot_long"] = """
WITH wide AS (
  SELECT c_nationkey,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_amt,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_amt,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_amt
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey)
SELECT c_nationkey, 'O' AS status, o_amt AS amount FROM wide
UNION ALL
SELECT c_nationkey, 'F', f_amt FROM wide
UNION ALL
SELECT c_nationkey, 'P', p_amt FROM wide
"""

ORACLES["q14_outer_assembly"] = """
WITH big AS (
  SELECT o_custkey, count(*) AS n_big FROM orders
  WHERE o_totalprice > 150000 GROUP BY o_custkey),
rich AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000)
SELECT coalesce(o_custkey, c_custkey) AS custkey,
  coalesce(n_big, 0) AS n_big,
  c_acctbal AS acctbal
FROM big FULL OUTER JOIN rich ON o_custkey = c_custkey
"""

ORACLES["q15_semi_anti"] = """
WITH w AS (
  SELECT c_nationkey, count(*) AS n_with FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_nationkey),
wo AS (
  SELECT c_nationkey, count(*) AS n_without FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_nationkey)
SELECT c_nationkey,
  coalesce(n_with, 0) AS n_with,
  coalesce(n_without, 0) AS n_without
FROM w FULL OUTER JOIN wo USING (c_nationkey)
"""

ORACLES["q16_distinct_union"] = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier)
"""

ORACLES["q17_topk_per_group"] = """
SELECT bucket, rk, o_orderkey, o_totalprice FROM (
  SELECT o_custkey % 10 AS bucket, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey % 10
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders)
WHERE rk <= 3
"""

ORACLES["q18_rounding"] = """
SELECT l_orderkey, l_linenumber,
  round(l_extendedprice / 7, 2) AS r2,
  round(l_extendedprice / 7, 3) AS r0,
  round(l_quantity / 3, 1) AS r1
FROM lineitem
"""

ORACLES["q19_geoid_format"] = """
WITH g AS (
  SELECT c_custkey,
    '36' || lpad(CAST(c_nationkey % 5 * 20 + 5 AS VARCHAR), 3, '0')
         || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS geoid
  FROM customer)
SELECT c_custkey, geoid,
  (CASE substr(geoid, 3, 3)
     WHEN '005' THEN '2' WHEN '025' THEN '3' WHEN '045' THEN '1'
     WHEN '065' THEN '4' ELSE '5' END) || substr(geoid, 6, 6) AS labs_geoid
FROM g
"""

ORACLES["q20_event_windows"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
  event_type,
  count(*) AS n_events,
  CAST(CAST(sum(value) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

ORACLES["q21_sessionize"] = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, value FROM events),
flagged AS (
  SELECT user_id, s, value,
    CASE WHEN s - lag(s) OVER (PARTITION BY user_id ORDER BY s) > 1800
              OR lag(s) OVER (PARTITION BY user_id ORDER BY s) IS NULL
         THEN 1 ELSE 0 END AS ns
  FROM e),
sessions AS (
  SELECT user_id,
    sum(ns) OVER (PARTITION BY user_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
per_session AS (
  SELECT user_id, sid, count(*) AS n_events FROM sessions
  GROUP BY user_id, sid)
SELECT user_id,
  count(*) AS n_sessions,
  max(n_events) AS max_session_events,
  CAST(sum(n_events) AS BIGINT) AS n_events_total
FROM per_session GROUP BY user_id
"""

ORACLES["q22_convert_moe_formula"] = """
WITH b AS (
  SELECT l_orderkey, l_linenumber,
    l_extendedprice AS e,
    l_extendedprice / 20 AS m,
    CASE WHEN l_discount >= 0.08 THEN 1.0
         ELSE greatest(l_discount * 8, 0.05) END AS ratio,
    l_quantity
  FROM lineitem),
b2 AS (
  SELECT *,
    CASE WHEN l_quantity <= 2 THEN 0.0 ELSE e * ratio END AS e2020
  FROM b)
SELECT l_orderkey, l_linenumber,
  CAST(floor((CASE WHEN ratio = 1 THEN m
       WHEN e2020 = 0 THEN NULL
       WHEN pow(ratio * 100, 0.56901) * 7.96309 >= 100 THEN m
       ELSE pow(ratio * 100, 0.56901) * 7.96309 / 100 * m END) * 100 + 0.5)
    AS DOUBLE) / 100 AS m_out
FROM b2
"""

ORACLES["q23_text_stats"] = f"""
SELECT doc_id,
  {_NTOKS} AS n_tokens,
  CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
       AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
  {_stop_ratio(_EN)} AS stop_ratio,
  list_aggregate(list_transform({_TOKS}, t -> CAST(length(t) AS DOUBLE)), 'sum')
    / CAST({_NTOKS} AS DOUBLE) AS mean_tok_len,
  md5({_NORM}) AS fp
FROM documents
"""

ORACLES["q24_langid"] = f"""
WITH scores AS (
  SELECT doc_id,
    coalesce({_stop_ratio(_EN)}, 0.0) AS r_en,
    coalesce({_stop_ratio(_ES)}, 0.0) AS r_es,
    coalesce({_stop_ratio(_FR)}, 0.0) AS r_fr,
    coalesce({_stop_ratio(_DE)}, 0.0) AS r_de,
    coalesce({_stop_ratio(_ZH)}, 0.0) AS r_zh
  FROM documents)
SELECT doc_id,
  CASE WHEN greatest(r_en, r_es, r_fr, r_de, r_zh) <= 0.0 THEN 'und'
       WHEN r_en >= r_es AND r_en >= r_fr AND r_en >= r_de AND r_en >= r_zh
         THEN 'en'
       WHEN r_es >= r_fr AND r_es >= r_de AND r_es >= r_zh THEN 'es'
       WHEN r_fr >= r_de AND r_fr >= r_zh THEN 'fr'
       WHEN r_de >= r_zh THEN 'de'
       ELSE 'zh' END AS lang_guess
FROM scores
"""

ORACLES["q25_exact_dedup"] = f"""
SELECT coalesce(md5({_NORM}), 'null:' || CAST(doc_id AS VARCHAR))
    AS fingerprint,
  min(doc_id) AS doc_id,
  count(*) AS n_copies
FROM documents GROUP BY 1
"""

ORACLES["q26_jaccard_pairs"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, {_SHINGLES} AS grams FROM d),
sized AS (SELECT doc_id, grams, len(grams) AS n_sh FROM sh),
exploded AS (SELECT doc_id, n_sh, unnest(grams) AS g FROM sized),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, n_common / (n_a + n_b - n_common) AS jaccard
FROM pairs
WHERE n_common / (n_a + n_b - n_common) >= 0.6
"""

# mirror dedup._mh_params / _md5_long28: one 28-bit md5 prefix per
# shingle, then per-slot affine transforms (a·h + b) mod 2^31−1
import sys  # noqa: E402

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")
from db_factfinder_spark.llmdata.dedup import _MH_P, _mh_params  # noqa: E402

_MH_HS = "list_transform(grams, g -> ('0x' || substr(md5(g), 1, 7))::BIGINT)"
_MH_SLOTS = ",\n  ".join(
    f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {_MH_P})) AS mh_{i}"
    for i, (a, b) in enumerate(_mh_params(8))
)
ORACLES["q27_minhash_signatures"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id AS id, {_SHINGLES} AS grams FROM d),
hashed AS (SELECT id, {_MH_HS} AS hs FROM sh)
SELECT id,
  {_MH_SLOTS}
FROM hashed
"""

ORACLES["q28_simhash"] = f"""
WITH d AS (
  SELECT doc_id, list_distinct({_NORMTOKS}) AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
h AS (
  SELECT doc_id,
    (('0x' || substr(md5(t), 1, 15)))::BIGINT AS hv
  FROM tok),
bits AS (
  SELECT doc_id, b.b,
    sum(CASE WHEN (hv & (1::BIGINT << b.b)) != 0 THEN 1 ELSE -1 END) AS v
  FROM h, (SELECT unnest(range(32)) AS b) b
  GROUP BY doc_id, b.b),
sigs AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
  FROM bits GROUP BY doc_id)
SELECT d2.doc_id, s.sig AS sig
FROM documents d2 LEFT JOIN sigs s USING (doc_id)
"""

ORACLES["q29_ann_topk"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
p AS (SELECT * FROM e WHERE vec_id < 10),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_dot_product(p.v, c.v)
      / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v)))
      AS cosine
  FROM p JOIN e c ON p.vec_id != c.vec_id)
SELECT probe_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""

_QUALITY = f"""
(((least(CAST({_NTOKS} AS DOUBLE) / 100.0, 1.0)
  + (1.0 - least(coalesce(
      CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
           AS DOUBLE) / CAST(length(text) AS DOUBLE), 0.0) * 4, 1.0)))
  + least(coalesce({_stop_ratio(_EN)}, 0.0) * 3, 1.0))
  + (CASE WHEN
       list_aggregate(list_transform({_TOKS}, t -> CAST(length(t) AS DOUBLE)),
                      'sum') / CAST({_NTOKS} AS DOUBLE)
       BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 4
"""

ORACLES["q30_quality_filter"] = f"""
WITH scored AS (SELECT lang, {_QUALITY} AS q FROM documents)
SELECT lang,
  count(*) AS n_docs,
  count(*) FILTER (WHERE q >= 0.6) AS n_good,
  CAST(sum(CAST(q AS DECIMAL(18,9))) AS DOUBLE) AS q_sum
FROM scored GROUP BY lang
"""

ORACLES["q31_embedding_centroids"] = """
SELECT label, pos,
  CAST(sum(CAST(floor(CAST(embedding[pos + 1] AS DOUBLE) * 1e7 + 0.5)
                AS BIGINT)) AS DOUBLE) / 1e7 AS sum_val,
  count(*) AS n
FROM embeddings, (SELECT unnest(range(64)) AS pos) p
GROUP BY label, pos
"""

# ---------------------------------------------------------------------
# q32–q37: LSH dedup, simhash pairs, ANN LSH, rolling hash, e2e spine
# ---------------------------------------------------------------------

_MH8 = "[" + ", ".join(
    f"list_min(list_transform({_MH_HS}, h -> ({a} * h + {b}) % {_MH_P}))"
    for a, b in _mh_params(8)
) + "]"

# bands of 2 rows each over the 8-slot signature (bands=4)
_BANDS32 = " UNION ALL ".join(
    f"SELECT id, {b} AS band, md5(CAST(sig[{2*b+1}] AS VARCHAR) || '|' ||"
    f" CAST(sig[{2*b+2}] AS VARCHAR)) AS bucket FROM sigs"
    for b in range(4)
)

ORACLES["q32_lsh_neardup_pairs"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id AS id, {_SHINGLES} AS grams FROM d),
sigs AS (
  SELECT id, grams, CASE WHEN len(grams) > 0 THEN {_MH8} END AS sig FROM sh),
bands AS ({_BANDS32}),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
verified AS (
  SELECT id_a, id_b,
    CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
      / (CAST(len(sa.grams) + len(sb.grams) AS DOUBLE)
         - CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE))
      AS jaccard
  FROM cands
  JOIN sigs sa ON sa.id = id_a
  JOIN sigs sb ON sb.id = id_b)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.6
"""

ORACLES["q33_simhash_pairs"] = f"""
WITH d AS (
  SELECT doc_id, list_distinct({_NORMTOKS}) AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
h AS (
  SELECT doc_id, (('0x' || substr(md5(t), 1, 15)))::BIGINT AS hv FROM tok),
bits AS (
  SELECT doc_id, b.b,
    sum(CASE WHEN (hv & (1::BIGINT << b.b)) != 0 THEN 1 ELSE -1 END) AS v
  FROM h, (SELECT unnest(range(32)) AS b) b
  GROUP BY doc_id, b.b),
persig AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
  FROM bits GROUP BY doc_id),
sigs AS (
  SELECT d2.doc_id AS id, s.sig::BIGINT AS sig,
         (s.sig::BIGINT >> 24) AS bucket
  FROM documents d2 LEFT JOIN persig s USING (doc_id))
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 1
"""


def _ann_lsh_sql() -> str:
    """Mirror lsh_bucketed_topk(dim=64, planes=8, tables=2, seed=42):
    the same driver-generated hyperplane literals are embedded in the
    SQL, signatures via sign-bit sums of exact dot products."""
    import sys
    sys.path.insert(0, "/root/repo")
    from db_factfinder_spark.llmdata.similarity import _hyperplanes

    def sig_expr(table: int) -> str:
        planes = _hyperplanes(64, 8, 42 + table)
        terms = []
        for i, plane in enumerate(planes):
            lits = "[" + ", ".join(repr(v) for v in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(v, {lits}) > 0"
                f" THEN {1 << i} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")::BIGINT"

    tables_sql = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS t, {sig_expr(t)} AS b FROM e"
        for t in range(2)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
buckets AS ({tables_sql}),
p AS (SELECT * FROM buckets WHERE vec_id < 10),
cands AS (
  SELECT DISTINCT p.vec_id AS probe_id, p.v AS pv,
                  c.vec_id AS neighbor_id, c.v AS cv
  FROM p JOIN buckets c
    ON p.t = c.t AND p.b = c.b AND p.vec_id != c.vec_id),
scored AS (
  SELECT probe_id, neighbor_id,
    list_dot_product(pv, cv)
      / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(cv, cv)))
      AS cosine
  FROM cands)
SELECT probe_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""


ORACLES["q34_ann_lsh_topk"] = _ann_lsh_sql()

ORACLES["q35_rolling_fingerprint"] = f"""
WITH n AS (SELECT doc_id, {_NORM} AS norm FROM documents)
SELECT doc_id,
  CASE WHEN length(norm) = 0 THEN 0::BIGINT
       ELSE list_reduce(
              list_prepend(0::BIGINT,
                list_transform(string_split(norm, ''),
                               c -> ascii(c)::BIGINT)),
              (a, x) -> (a * 31 + x) % 1000000007)
  END AS rhash
FROM n
"""

ORACLES["q36_multimodal_features"] = """
WITH p AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)]
           AS media_type,
         text
  FROM documents
), h AS (
  SELECT media_id, media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS payload_hash,
         -- hex expansion of payload[:4096] (2 hex chars per byte)
         substr(hex(encode(text)), 1, 8192) AS hx
  FROM p
), b AS (
  SELECT media_id,
         ((strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1) * 16
        + (strpos('0123456789ABCDEF', substr(hx, 2 * i + 2, 1)) - 1)) // 32
           AS bucket
  FROM h, unnest(range(0, CAST(length(hx) // 2 AS BIGINT))) AS t(i)
), hist AS (
  SELECT media_id,
         CAST(sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
         CAST(sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
         CAST(sum(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
         CAST(sum(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
         CAST(sum(CASE WHEN bucket = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
         CAST(sum(CASE WHEN bucket = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
         CAST(sum(CASE WHEN bucket = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h6,
         CAST(sum(CASE WHEN bucket = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h7
  FROM b GROUP BY media_id
)
SELECT h.media_id, h.media_type, h.n_bytes, h.payload_hash,
       CAST(8 AS INT) AS feature_dim,
       coalesce(h0, 0) AS h0, coalesce(h1, 0) AS h1,
       coalesce(h2, 0) AS h2, coalesce(h3, 0) AS h3,
       coalesce(h4, 0) AS h4, coalesce(h5, 0) AS h5,
       coalesce(h6, 0) AS h6, coalesce(h7, 0) AS h7
FROM h LEFT JOIN hist USING (media_id)
ORDER BY media_id
"""

ORACLES["q37_factfinder_e2e"] = """
WITH wide AS (
  SELECT
    'NTA' || CAST(c_nationkey AS VARCHAR) AS census_geoid,
    CASE WHEN c_custkey % 11 = 0 THEN NULL
         ELSE CAST(floor(c_acctbal) AS DOUBLE) END AS E1,
    CASE WHEN c_custkey % 7 = 0 THEN NULL
         ELSE CAST(floor(c_acctbal / 10) AS DOUBLE) END AS M1,
    CASE WHEN c_custkey % 13 = 0 THEN NULL
         ELSE CAST(floor(c_acctbal / 2) AS DOUBLE) END AS E2,
    CAST(floor(c_acctbal / 20) AS DOUBLE) AS M2,
    CAST(floor(c_acctbal) * 2 AS DOUBLE) AS BE,
    CAST(floor(c_acctbal / 8) AS DOUBLE) AS BM
  FROM customer),
horizontal AS (
  SELECT census_geoid,
    0.0 + coalesce(E1, 0.0) + coalesce(E2, 0.0) AS e,
    sqrt(0.0 + coalesce(M1 * M1, 0.0) + coalesce(M2 * M2, 0.0)) AS m,
    BE, BM
  FROM wide),
child AS (
  SELECT census_geoid,
    coalesce(sum(e), 0.0) AS e,
    sqrt(coalesce(sum(m * m), 0.0)) AS m
  FROM horizontal GROUP BY census_geoid),
base AS (
  SELECT census_geoid,
    coalesce(sum(BE), 0.0) AS agg_e,
    sqrt(coalesce(sum(BM * BM), 0.0)) AS agg_m
  FROM horizontal GROUP BY census_geoid),
j AS (SELECT child.*, agg_e, agg_m FROM child LEFT JOIN base USING (census_geoid)),
withp AS (
  SELECT *, CASE WHEN agg_e = 0 THEN NULL ELSE e / agg_e * 100 END AS p
  FROM j),
stats AS (
  SELECT census_geoid, e, m, p,
    CASE WHEN p = 0 THEN NULL
         WHEN p = 100 THEN NULL
         WHEN agg_e = 0 THEN NULL
         WHEN m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e) < 0
           THEN sqrt(m * m + (e * agg_m / agg_e) * (e * agg_m / agg_e))
                / agg_e * 100
         ELSE sqrt(m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e))
              / agg_e * 100
    END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  -- e/m are exact integers (bround(x,0) = x).  c/p/z round half-even
  -- to 1 digit: DuckDB round() on DOUBLE is half-AWAY-from-zero, so
  -- true decimal ties (only dyadic .x25/.x75 doubles can tie exactly)
  -- get an explicit even-selection branch to match Spark's bround.
  SELECT census_geoid, 'synth_var' AS pff_variable, 'NTA' AS geotype,
    CASE WHEN (c) * 10 - floor((c) * 10) = 0.5 THEN (CASE WHEN CAST(floor((c) * 10) AS BIGINT) % 2 = 0 THEN floor((c) * 10) ELSE floor((c) * 10) + 1 END) / 10 ELSE round((c), 1) END AS c, round(e, 0) AS e, round(m, 0) AS m,
    CASE WHEN (p) * 10 - floor((p) * 10) = 0.5 THEN (CASE WHEN CAST(floor((p) * 10) AS BIGINT) % 2 = 0 THEN floor((p) * 10) ELSE floor((p) * 10) + 1 END) / 10 ELSE round((p), 1) END AS p, CASE WHEN (z) * 10 - floor((z) * 10) = 0.5 THEN (CASE WHEN CAST(floor((z) * 10) AS BIGINT) % 2 = 0 THEN floor((z) * 10) ELSE floor((z) * 10) + 1 END) / 10 ELSE round((z), 1) END AS z
  FROM stats),
t1 AS (
  SELECT census_geoid, pff_variable, geotype,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT census_geoid, pff_variable, geotype, c, e, m,
         CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT census_geoid, pff_variable, geotype, c, e, m, p,
         CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT census_geoid, pff_variable, geotype, c, e, m, p,
         CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3)
SELECT census_geoid, pff_variable, geotype,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z
FROM t4
"""


def _neardup_lsh_sql() -> str:
    """Mirror embedding_neardup_pairs(threshold=0.4, dim=64, planes=4,
    tables=4, seed=42) with the same driver-generated plane literals."""
    import sys
    sys.path.insert(0, "/root/repo")
    from db_factfinder_spark.llmdata.similarity import _hyperplanes

    def sig_expr(table: int) -> str:
        planes = _hyperplanes(64, 4, 42 + table)
        terms = []
        for i, plane in enumerate(planes):
            lits = "[" + ", ".join(repr(v) for v in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(v, {lits}) > 0"
                f" THEN {1 << i} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")::BIGINT"

    tables_sql = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS t, {sig_expr(t)} AS b FROM e"
        for t in range(4)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
buckets AS ({tables_sql}),
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, a.v AS va, b.vec_id AS id_b, b.v AS vb
  FROM buckets a JOIN buckets b
    ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id),
scored AS (
  SELECT id_a, id_b,
    list_dot_product(va, vb)
      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
      AS cosine
  FROM cands)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.4
"""


ORACLES["q38_embedding_neardup"] = _neardup_lsh_sql()

ORACLES["q39_bpe_tokens"] = f"""
SELECT lang,
  count(*) AS n_docs,
  CAST(sum(len({_TOKS})) AS BIGINT) AS ws_tokens,
  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+')))
    AS BIGINT) AS bpe_tokens
FROM documents GROUP BY lang
"""

_IVF_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

ORACLES["q40_ann_ivf_topk"] = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
cent0 AS (
  SELECT label, pos,
    round(CAST(sum(CAST(v[pos + 1] AS DECIMAL(20,9))) AS DOUBLE)
          / count(*), 6) AS cv
  FROM e, (SELECT unnest(range(64)) AS pos) p
  GROUP BY label, pos),
cent AS (
  SELECT label AS cluster_id, list(cv ORDER BY pos) AS centroid
  FROM cent0 GROUP BY label),
assign_c AS (
  SELECT vec_id AS neighbor_id, v AS cand_vec, cluster_id FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_IVF_COS.format(a='e.v', b='c.centroid')} DESC, c.cluster_id ASC)
        AS rn
    FROM e, cent c)
  WHERE rn <= 1),
assign_p AS (
  SELECT vec_id AS probe_id, v AS probe_vec, cluster_id FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        {_IVF_COS.format(a='e.v', b='c.centroid')} DESC, c.cluster_id ASC)
        AS rn
    FROM e, cent c WHERE e.vec_id < 10)
  WHERE rn <= 3),
scored AS (
  SELECT probe_id, neighbor_id,
    {_IVF_COS.format(a='probe_vec', b='cand_vec')} AS cosine
  FROM assign_p p JOIN assign_c c USING (cluster_id)
  WHERE probe_id != neighbor_id)
SELECT probe_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
WHERE rank <= 5
"""

ORACLES["q41_stream_windowed_counts"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

ORACLES["q42_bucketed_join"] = """
SELECT o_orderpriority,
  count(*) AS n_items,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
       AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

ORACLES["q43_salted_skew_join"] = """
SELECT r_name,
  count(*) AS n_items,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN region ON (l_suppkey % 5) = r_regionkey
GROUP BY r_name
"""

ORACLES["q44_two_phase_skew_agg"] = """
SELECT event_type,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  count(DISTINCT user_id) AS uniq_users
FROM events GROUP BY event_type
"""


def _kmeans_sql(k: int = 4, iters: int = 3, dim: int = 64) -> str:
    """Mirror kmeans_assignments(k, iters): Lloyd iterations unrolled
    as CTE pairs — assignment = argmax cosine via row_number (the same
    strict-max/lowest-cid tie-break as the Spark fold), update =
    exact-decimal element-wise mean quantized to 6 decimals, empty
    clusters keep the previous centroid (LEFT JOIN + coalesce)."""

    def assign(i: int, cent: str) -> str:
        cos = _IVF_COS.format(a="e.v", b="c.centroid")
        return f"""a{i} AS (
  SELECT id, v, cid, cos FROM (
    SELECT e.id, e.v, c.cid, {cos} AS cos,
      row_number() OVER (PARTITION BY e.id ORDER BY
        {cos} DESC NULLS LAST, c.cid ASC) AS rn
    FROM e, {cent} c)
  WHERE rn = 1 AND cos IS NOT NULL)"""

    parts = [
        """e AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings)""",
        f"""c0 AS (
  SELECT id AS cid, v AS centroid FROM e ORDER BY id LIMIT {k})""",
    ]
    for i in range(1, iters + 1):
        parts.append(assign(i, f"c{i - 1}"))
        parts.append(f"""u{i} AS (
  SELECT cid, pos,
    round(CAST(sum(CAST(v[pos + 1] AS DECIMAL(20,9))) AS DOUBLE)
          / count(*), 6) AS cv
  FROM a{i}, (SELECT unnest(range({dim})) AS pos) p
  GROUP BY cid, pos)""")
        parts.append(f"""u{i}c AS (
  SELECT cid, list(cv ORDER BY pos) AS centroid FROM u{i} GROUP BY cid)""")
        parts.append(f"""c{i} AS (
  SELECT c.cid, coalesce(u.centroid, c.centroid) AS centroid
  FROM c{i - 1} c LEFT JOIN u{i}c u USING (cid))""")
    parts.append(assign(iters + 1, f"c{iters}"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id AS vec_id, cid AS cluster_id, cos AS cosine"
        f" FROM a{iters + 1}"
    )


ORACLES["q45_kmeans"] = _kmeans_sql()

# q46: components of the q32 near-dup pair graph.  The label fixpoint
# (per-component min id) is iteration-order-independent, so transitive
# closure + min mirrors Spark's min-label propagation exactly.
ORACLES["q46_neardup_groups"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({ORACLES["q32_lsh_neardup_pairs"]})
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a),
sizes AS (SELECT rep_id, count(*) AS group_size FROM comp GROUP BY rep_id)
SELECT doc_id, comp.rep_id, group_size FROM comp JOIN sizes USING (rep_id)
"""

ORACLES["q47_geo2010_rollup"] = """
WITH f AS (
  SELECT CAST(c_custkey % 200 AS INT) AS k,
         CAST(floor(c_acctbal) AS DOUBLE) AS e,
         CAST(floor(c_acctbal / 10) AS DOUBLE) AS m
  FROM customer
), facts_tract AS (
  SELECT '36047' || lpad(CAST(k AS VARCHAR), 6, '0') AS census_geoid, e, m
  FROM f
), facts_bg AS (
  SELECT '36047' || lpad(CAST(k AS VARCHAR), 6, '0') || '1' AS census_geoid,
         e, m
  FROM f
), lk AS (
  SELECT DISTINCT
    CAST(c_custkey % 250 AS INT) AS k2
  FROM customer
), lookup AS (
  SELECT
    '36047' || lpad(CAST(k2 AS VARCHAR), 6, '0') || '1001' AS geoid_block,
    '36047' || lpad(CAST(k2 AS VARCHAR), 6, '0') || '1' AS geoid_block_group,
    '36047' || lpad(CAST(k2 AS VARCHAR), 6, '0') AS geoid_tract,
    'BK' || lpad(CAST(k2 % 10 AS VARCHAR), 2, '0') AS nta,
    '7903' || lpad(CAST(k2 % 5 AS VARCHAR), 2, '0') AS cd,
    CASE WHEN k2 % 3 = 0 THEN '7903' || lpad(CAST(k2 % 5 AS VARCHAR), 2, '0')
    END AS cd_fp_500,
    CASE WHEN k2 % 2 = 0 THEN '7903' || lpad(CAST(k2 % 5 AS VARCHAR), 2, '0')
    END AS cd_park_access
  FROM lk
), nta_roll AS (
  SELECT l.nta AS census_geoid, 'pop_1' AS pff_variable, 'NTA' AS geotype,
         coalesce(sum(f.e), 0.0) AS e,
         sqrt(coalesce(sum(f.m * f.m), 0.0)) AS m
  FROM facts_tract f
  LEFT JOIN (SELECT DISTINCT geoid_tract, nta FROM lookup) l
    ON f.census_geoid = l.geoid_tract
  WHERE l.nta IS NOT NULL
  GROUP BY l.nta
), cd_roll AS (
  SELECT l.cd AS census_geoid, 'pop_1' AS pff_variable, 'cd' AS geotype,
         coalesce(sum(f.e), 0.0) AS e,
         sqrt(coalesce(sum(f.m * f.m), 0.0)) AS m
  FROM facts_tract f
  LEFT JOIN (SELECT DISTINCT geoid_tract, cd FROM lookup) l
    ON f.census_geoid = l.geoid_tract
  WHERE l.cd IS NOT NULL
  GROUP BY l.cd
), fp500_roll AS (
  SELECT d.cd_fp_500 AS census_geoid, 'pop_1' AS pff_variable,
         'cd_fp_500' AS geotype,
         coalesce(sum(f.e), 0.0) AS e,
         sqrt(coalesce(sum(f.m * f.m), 0.0)) AS m
  FROM facts_bg f
  RIGHT JOIN (SELECT DISTINCT geoid_block_group, cd_fp_500 FROM lookup
              WHERE cd_fp_500 IS NOT NULL) d
    ON f.census_geoid = d.geoid_block_group
  GROUP BY d.cd_fp_500
), park_roll AS (
  SELECT d.cd_park_access AS census_geoid, 'pop_1' AS pff_variable,
         'cd_park_access' AS geotype,
         coalesce(sum(f.e), 0.0) AS e,
         sqrt(coalesce(sum(f.m * f.m), 0.0)) AS m
  FROM facts_bg f
  RIGHT JOIN (SELECT DISTINCT geoid_block_group, cd_park_access FROM lookup
              WHERE cd_park_access IS NOT NULL) d
    ON f.census_geoid = d.geoid_block_group
  GROUP BY d.cd_park_access
), unioned AS (
  SELECT * FROM nta_roll
  UNION ALL SELECT * FROM cd_roll
  UNION ALL SELECT * FROM fp500_roll
  UNION ALL SELECT * FROM park_roll
)
SELECT census_geoid, pff_variable, geotype, e, m,
  CASE
    WHEN substr(census_geoid, 1, 2) IN ('MN', 'QN', 'BX', 'BK', 'SI')
      THEN census_geoid
    WHEN substr(census_geoid, 1, 2) = '79'
      THEN substr(census_geoid, length(census_geoid) - 3, 4)
  END AS labs_geoid,
  CASE WHEN geotype = 'NTA' THEN 'NTA2010' ELSE geotype END AS labs_geotype
FROM unioned
ORDER BY geotype, census_geoid
"""

# q48: the d+1 blocked-prefix-table plan has GUARANTEED recall at
# hamming <= d (pigeonhole), so its result set is exactly the
# brute-force all-pairs hamming join.
ORACLES["q48_simhash_multiprobe"] = f"""
WITH d AS (
  SELECT doc_id, list_distinct({_NORMTOKS}) AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
h AS (
  SELECT doc_id, (('0x' || substr(md5(t), 1, 15)))::BIGINT AS hv FROM tok),
bits AS (
  SELECT doc_id, b.b,
    sum(CASE WHEN (hv & (1::BIGINT << b.b)) != 0 THEN 1 ELSE -1 END) AS v
  FROM h, (SELECT unnest(range(32)) AS b) b
  GROUP BY doc_id, b.b),
sigs AS (
  SELECT doc_id AS id,
    CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
  FROM bits GROUP BY doc_id)
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY id_a, id_b
"""


def _bround1(x: str) -> str:
    """Half-even 1-digit rounding in DuckDB (mirrors Spark bround):
    explicit even-selection on exact dyadic ties, round() otherwise."""
    return (
        f"CASE WHEN ({x}) * 10 - floor(({x}) * 10) = 0.5"
        f" THEN (CASE WHEN CAST(floor(({x}) * 10) AS BIGINT) % 2 = 0"
        f" THEN floor(({x}) * 10) ELSE floor(({x}) * 10) + 1 END) / 10"
        f" ELSE round(({x}), 1) END"
    )


ORACLES["q49_decennial_e2e"] = f"""
WITH f AS (
  SELECT CAST(c_custkey % 200 AS INT) AS k,
    CASE WHEN c_custkey % 11 = 0 THEN NULL
         ELSE CAST(floor(c_acctbal) AS DOUBLE) END AS P1,
    CASE WHEN c_custkey % 7 = 0 THEN NULL
         ELSE CAST(floor(c_acctbal / 2) AS DOUBLE) END AS P2,
    CAST(floor(c_acctbal) * 2 AS DOUBLE) AS BP
  FROM customer),
horiz AS (
  -- tract → NTA is a function of k (every tract maps to one NTA), so
  -- the lookup join collapses to direct grouping by the NTA code
  SELECT 'BK' || lpad(CAST(k % 10 AS VARCHAR), 2, '0') AS census_geoid,
    0.0 + coalesce(P1, 0.0) + coalesce(P2, 0.0) AS e,
    CAST(NULL AS DOUBLE) AS m,
    BP
  FROM f),
child AS (
  SELECT census_geoid,
    coalesce(sum(e), 0.0) AS e,
    sqrt(coalesce(sum(m * m), 0.0)) AS m
  FROM horiz GROUP BY census_geoid),
base AS (
  SELECT census_geoid,
    coalesce(sum(BP), 0.0) AS agg_e,
    sqrt(coalesce(sum(m * m), 0.0)) AS agg_m
  FROM horiz GROUP BY census_geoid),
j AS (SELECT child.*, agg_e, agg_m
      FROM child LEFT JOIN base USING (census_geoid)),
withp AS (
  SELECT *, CASE WHEN agg_e = 0 THEN NULL ELSE e / agg_e * 100 END AS p
  FROM j),
stats AS (
  SELECT census_geoid, e, m, p,
    CASE WHEN p = 0 THEN NULL
         WHEN p = 100 THEN NULL
         WHEN agg_e = 0 THEN NULL
         WHEN m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e) < 0
           THEN sqrt(m * m + (e * agg_m / agg_e) * (e * agg_m / agg_e))
                / agg_e * 100
         ELSE sqrt(m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e))
              / agg_e * 100
    END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  SELECT census_geoid, 'pop_p1' AS pff_variable, 'NTA' AS geotype,
    {_bround1('c')} AS c, round(e, 0) AS e, round(m, 0) AS m,
    {_bround1('p')} AS p, {_bround1('z')} AS z
  FROM stats),
t1 AS (
  SELECT census_geoid, pff_variable, geotype,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT census_geoid, pff_variable, geotype, c, e, m,
         CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT census_geoid, pff_variable, geotype, c, e, m, p,
         CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT census_geoid, pff_variable, geotype, c, e, m, p,
         CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3)
SELECT census_geoid, pff_variable, geotype,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z,
  CASE WHEN substr(census_geoid, 1, 2) IN ('MN', 'QN', 'BX', 'BK', 'SI')
       THEN census_geoid END AS labs_geoid,
  CASE WHEN geotype = 'NTA' THEN 'NTA2010' ELSE geotype END AS labs_geotype
FROM t4
ORDER BY census_geoid
"""

ORACLES["q50_manual_update"] = """
WITH dem AS (
  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE 'NTA2020' END
           AS geotype,
         'G' || CAST(n_nationkey AS VARCHAR) AS geoid,
         CAST(n_nationkey * 10 AS DOUBLE) AS pop_1e,
         CAST(n_nationkey + 1 AS DOUBLE) AS pop_1m,
         CAST(n_nationkey AS DOUBLE) / 2 AS pop_1c,
         CAST(100.0 AS DOUBLE) AS pop_1p,
         CAST(0.0 AS DOUBLE) AS pop_1z,
         CAST(n_nationkey * 3 AS DOUBLE) AS hsp1e,
         CAST(n_nationkey + 2 AS DOUBLE) AS hsp1m
  FROM nation),
reg AS (
  SELECT 'Boro2020' AS geotype,
         'B' || CAST(r_regionkey AS VARCHAR) AS geoid,
         CAST(r_regionkey * 100 AS DOUBLE) AS pop_1e,
         CAST(r_regionkey + 5 AS DOUBLE) AS pop_1m
  FROM region),
long AS (
  SELECT geotype, geoid, 'pop_1' AS pff_variable,
         pop_1c AS c, pop_1e AS e, pop_1m AS m, pop_1p AS p, pop_1z AS z,
         'demographic' AS domain
  FROM dem
  UNION ALL
  SELECT geotype, geoid, 'hsp1',
         CAST(NULL AS DOUBLE), hsp1e, hsp1m,
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 'demographic'
  FROM dem
  UNION ALL
  SELECT geotype, geoid, 'pop_1',
         CAST(NULL AS DOUBLE), pop_1e, pop_1m,
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 'social'
  FROM reg)
SELECT CAST(NULL AS VARCHAR) AS census_geoid,
       l.geoid AS labs_geoid,
       CAST(NULL AS VARCHAR) AS geotype,
       l.geotype AS labs_geotype,
       l.pff_variable, l.c, l.e, l.m, l.p, l.z, l.domain
FROM long l
WHERE l.geotype IS NOT NULL
ORDER BY domain, pff_variable, labs_geoid
"""


def _resize_sql(src_w=16, src_h=8, out_w=4, out_h=4) -> str:
    """Mirror resize_images' raw codec + nearest-neighbor floor mapping:
    output byte (r, c) = src[(r*src_h)//out_h * src_w + (c*src_w)//out_w],
    with the source zero-padded to src_w*src_h bytes.  Byte extraction
    slices the hex expansion (2 chars per byte)."""
    idxs = [
        ((r * src_h) // out_h) * src_w + (c * src_w) // out_w
        for r in range(out_h)
        for c in range(out_w)
    ]
    concat = " || ".join(f"substr(hx, {2 * i + 1}, 2)" for i in idxs)
    pad = 2 * src_w * src_h
    return f"""
WITH p AS (
  SELECT doc_id AS media_id,
         substr(rpad(hex(encode(text)), {pad}, '0'), 1, {pad}) AS hx
  FROM documents)
SELECT media_id, {concat} AS resized_hex,
       CAST({out_w} AS INT) AS width, CAST({out_h} AS INT) AS height
FROM p
ORDER BY media_id
"""


ORACLES["q51_resize_images"] = _resize_sql()

# q52: q46's closure gives the groups; quality is the q30 expression;
# survivor = rank-1 row of the (quality DESC, doc_id ASC) group window.
ORACLES["q52_dedup_survivors"] = f"""
WITH groups AS ({ORACLES["q46_neardup_groups"]}),
scored AS (SELECT doc_id, {_QUALITY} AS quality FROM documents),
g AS (
  SELECT s.doc_id, s.quality,
         coalesce(gr.rep_id, s.doc_id) AS group_id,
         coalesce(gr.group_size, 1) AS group_size
  FROM scored s LEFT JOIN groups gr USING (doc_id))
SELECT doc_id, group_id, group_size, quality,
       (row_number() OVER (PARTITION BY group_id
                           ORDER BY quality DESC, doc_id ASC)) = 1 AS keep
FROM g
ORDER BY doc_id
"""

ORACLES["q53_vocab_topk"] = f"""
WITH tok AS (SELECT lang, unnest({_TOKS}) AS token FROM documents),
counts AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY n DESC, token ASC) AS rank
  FROM counts)
SELECT lang, token, n, rank FROM ranked WHERE rank <= 20
ORDER BY lang, rank
"""

ORACLES["q54_sample_split"] = """
WITH b AS (
  SELECT lang, n_chars,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100
      AS bucket
  FROM documents)
SELECT lang,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split,
  count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1, 2
ORDER BY lang, split
"""

# q55: the stateful stream emits every CLOSED session (append mode) —
# the µs-grain sessionization minus each user's last (still-open)
# session.  The fold works in epoch microseconds, mirrored exactly.
ORACLES["q55_stream_sessionize"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events),
flagged AS (
  SELECT user_id, us, value,
    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
              > 1800000000
              OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         THEN 1 ELSE 0 END AS ns
  FROM e),
sess AS (
  SELECT user_id, us, value,
    sum(ns) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
per AS (
  SELECT user_id, sid,
    min(us) AS start_us, max(us) AS end_us,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM sess GROUP BY user_id, sid),
last AS (SELECT user_id, max(sid) AS last_sid FROM per GROUP BY user_id)
SELECT p.user_id,
  strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
  strftime(make_timestamp(end_us), '%Y-%m-%d %H:%M:%S.%f') AS s_end,
  p.n_events, p.sum_value
FROM per p JOIN last l ON p.user_id = l.user_id AND p.sid != l.last_sid
ORDER BY p.user_id, s_start
"""

# q56: DuckDB's native ASOF JOIN is the oracle for the union-window
# as-of implementation (backward, inclusive >=).
ORACLES["q56_asof_join"] = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
q AS (
  SELECT user_id, ts, max(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id,
  strftime(make_timestamp(epoch_us(p.ts)), '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
  q.pvalue AS pvalue_asof
FROM p ASOF LEFT JOIN q
  ON p.user_id = q.user_id AND p.ts >= q.ts
ORDER BY event_id
"""

# q57: plain inequality join is the oracle for the bucketed range join.
ORACLES["q57_range_join"] = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'click'),
iv AS (
  SELECT user_id,
         epoch_us(ts) - 300000000 AS s,
         epoch_us(ts) + 300000000 AS e
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
  CAST(count(iv.s) AS BIGINT) AS n_windows
FROM p LEFT JOIN iv
  ON p.user_id = iv.user_id AND p.t >= iv.s AND p.t <= iv.e
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""

# q58: the cascade (raw → minute → hour → day) must equal the direct
# raw → day aggregation — algebraic aggregates compose exactly.
ORACLES["q58_rollup_cascade"] = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
  CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""

ORACLES["q59_percentiles"] = """
SELECT event_type,
  quantile_cont(value, 0.25) AS p25,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
ORDER BY event_type
"""

ORACLES["q60_rollup_grouping"] = """
SELECT l_returnflag, l_linestatus,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""

# q61: same injection + RE2 regexes in DuckDB; md5 of the redacted
# text proves byte-exact replacement parity with Java regex.
ORACLES["q61_pii_redaction"] = """
WITH injected AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@ex-' || CAST(doc_id % 7 AS VARCHAR)
         || '.com or 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t
  FROM documents),
counted AS (
  SELECT doc_id, t,
    len(regexp_extract_all(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
    len(regexp_extract_all(t,
        '\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b')) AS n_phone,
    len(regexp_extract_all(t,
        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4
  FROM injected),
redacted AS (
  SELECT doc_id, n_email, n_phone, n_ipv4,
    regexp_replace(
      regexp_replace(
        regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b', '<PHONE>', 'g'),
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS rt
  FROM counted)
SELECT doc_id,
  CAST(n_email AS INT) AS n_email,
  CAST(n_phone AS INT) AS n_phone,
  CAST(n_ipv4 AS INT) AS n_ipv4,
  md5(rt) AS redacted_md5
FROM redacted
ORDER BY doc_id
"""

ORACLES["q62_repetition_stats"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
uni AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_distinct,
    CAST(max(c) AS BIGINT) AS top_c
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS g FROM t)
        GROUP BY doc_id, g)
  GROUP BY doc_id),
bi AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n_bigrams,
    CAST(max(c) AS BIGINT) AS top_bi_c
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id,
                unnest(CASE WHEN len(toks) >= 2 THEN
                  list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])
                ELSE [] END) AS g
              FROM t)
        GROUP BY doc_id, g)
  GROUP BY doc_id)
SELECT d.doc_id,
  coalesce(uni.n_tokens, 0) AS n_tokens,
  CAST(uni.n_distinct AS DOUBLE) / uni.n_tokens AS distinct_ratio,
  CAST(uni.top_c AS DOUBLE) / uni.n_tokens AS top_token_frac,
  CAST(bi.top_bi_c AS DOUBLE) / bi.n_bigrams AS top_bigram_frac
FROM documents d
LEFT JOIN uni ON d.doc_id = uni.doc_id
LEFT JOIN bi ON d.doc_id = bi.doc_id
ORDER BY d.doc_id
"""

ORACLES["q63_sequence_packing"] = """
WITH t AS (
  SELECT doc_id, lang,
    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+'))
         AS BIGINT) AS n_tok
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tok,
    coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t)
SELECT doc_id, lang, n_tok,
  CAST(cum // 4096 AS BIGINT) AS chunk_id,
  CAST(cum % 4096 AS BIGINT) AS chunk_offset
FROM c ORDER BY doc_id
"""

ORACLES["q64_mixture_sample"] = """
WITH b AS (
  SELECT lang, n_chars,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000
      AS bucket
  FROM documents),
k AS (
  SELECT * FROM b WHERE bucket <
    CASE lang WHEN 'en' THEN 9000 WHEN 'es' THEN 5000
              WHEN 'fr' THEN 2500 WHEN 'de' THEN 1000
              ELSE 500 END)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM k GROUP BY lang ORDER BY lang
"""


def _shingles_sql(n: int) -> str:
    """n-gram shingle list (distinct) over `toks`, generalizing the
    3-gram _SHINGLES constant."""
    concat = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
list_distinct(
  CASE WHEN len(toks) - {n - 1} >= 1 THEN
    list_transform(range(1, len(toks) - {n - 2}), i -> {concat})
  ELSE [] END)"""


ORACLES["q65_ngram_contamination"] = f"""
WITH d AS (SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (SELECT doc_id, {_shingles_sql(5)} AS grams FROM d),
exploded AS (SELECT doc_id, unnest(grams) AS g FROM sh),
per_gram AS (SELECT g, count(*) AS n_docs FROM exploded GROUP BY g),
per_doc AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM exploded JOIN per_gram USING (g) GROUP BY doc_id)
SELECT d2.doc_id,
  coalesce(per_doc.n_grams, 0) AS n_grams,
  CAST(per_doc.n_shared AS DOUBLE) / per_doc.n_grams AS shared_frac
FROM documents d2 LEFT JOIN per_doc USING (doc_id)
ORDER BY d2.doc_id
"""

# q66: int8 quantization mirrored exactly — codes are floor(x/scale+0.5)
# on identical doubles, integer dots are exact in double (≤ 127²·64).
ORACLES["q66_quantized_topk"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
sc AS (
  SELECT vec_id, v,
    greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) / 127.0
      AS scale
  FROM e),
q AS (
  SELECT vec_id,
    list_transform(v, x -> floor(x / scale + 0.5)) AS ld
  FROM sc),
selfd AS (
  SELECT vec_id, ld, list_dot_product(ld, ld) AS sd FROM q),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_dot_product(p.ld, c.ld) / (sqrt(p.sd) * sqrt(c.sd)) AS qcosine
  FROM (SELECT * FROM selfd WHERE vec_id < 5) p, selfd c
  WHERE c.vec_id != p.vec_id)
SELECT probe_id, neighbor_id, qcosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY qcosine DESC, neighbor_id ASC)
            AS rank
  FROM scored)
WHERE rank <= 5
ORDER BY probe_id, rank
"""

ORACLES["q67_set_ops"] = """
WITH with_orders AS (
  SELECT c_custkey, c_nationkey FROM customer
  INTERSECT
  SELECT c_custkey, c_nationkey FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders)),
poor AS (
  SELECT c_custkey, c_nationkey FROM with_orders
  EXCEPT ALL
  SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
FROM poor GROUP BY c_nationkey
ORDER BY c_nationkey
"""

# q68: the literal reduce-full-outer-join assembly the reference uses
# (acs_community_profiles.py:52-54) — independent cross-check of the
# engine's single-shuffle union+group formulation.  floor() sums are
# integer adds on both engines (Spark sums LONGs; DuckDB sums are cast
# to BIGINT), so totals are exact and order-independent.
ORACLES["q68_community_profiles"] = """
WITH acct AS (
  SELECT 'N' || lpad(CAST(c_nationkey AS VARCHAR), 2, '0') AS census_geoid,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS DOUBLE) AS sum_acct,
         CAST(sum(CAST(floor(c_acctbal / 10) AS BIGINT)) AS DOUBLE)
           AS moe_acct
  FROM customer GROUP BY 1),
cnt AS (
  SELECT 'N' || lpad(CAST(c_nationkey AS VARCHAR), 2, '0') AS census_geoid,
         CAST(count(*) AS DOUBLE) AS pct_cust
  FROM customer GROUP BY 1),
reg AS (
  SELECT 'R' || CAST(s_nationkey % 5 AS VARCHAR) AS census_geoid,
         CAST(sum(CAST(floor(s_acctbal) AS BIGINT)) AS DOUBLE)
           AS sum_acct_region
  FROM supplier GROUP BY 1)
SELECT coalesce(a.census_geoid, b.census_geoid, r.census_geoid)
         AS census_geoid,
       a.sum_acct, a.moe_acct, b.pct_cust, r.sum_acct_region
FROM acct a
FULL OUTER JOIN cnt b ON a.census_geoid = b.census_geoid
FULL OUTER JOIN reg r
  ON coalesce(a.census_geoid, b.census_geoid) = r.census_geoid
ORDER BY census_geoid
"""

# q69: support-geoids dimension export — per-level DISTINCT over the
# synthetic lookup + the constant city row (reference
# geography/2010_to_2020.py:266-290).
ORACLES["q69_support_geoids"] = """
WITH lk AS (
  SELECT
    'BK' || lpad(CAST(c_custkey % 50 % 20 AS VARCHAR), 2, '0') AS nta2020,
    'Neighborhood ' || CAST(c_custkey % 50 % 20 AS VARCHAR) AS ntaname,
    'BK' || lpad(CAST(c_custkey % 50 % 10 AS VARCHAR), 2, '0') AS cdta2020,
    'District ' || CAST(c_custkey % 50 % 10 AS VARCHAR) AS cdtaname,
    CAST(c_custkey % 50 % 5 + 1 AS VARCHAR) AS borocode,
    'Borough ' || CAST(c_custkey % 50 % 5 + 1 AS VARCHAR) AS boroname
  FROM customer),
levels AS (
  SELECT DISTINCT nta2020 AS geoid, 'NTA2020' AS geotype,
         ntaname AS geogname FROM lk
  UNION ALL
  SELECT DISTINCT cdta2020, 'CDTA2020', cdtaname FROM lk
  UNION ALL
  SELECT DISTINCT borocode, 'Boro2020', boroname FROM lk
  UNION ALL
  SELECT '0', 'City2020', 'New York City')
SELECT geoid, geotype, geogname FROM levels
ORDER BY geotype, geoid
"""

# q70: decennial-2020 registry spine at native tract grain.  The
# cleaning cascade collapses for a tract-grain decennial base variable
# (m NULL throughout → c NULL; p=100/z=0 reasserted by the base rule;
# e==0 suppresses c/m/p/z) — derived independently from
# calculate.py:293-352 rather than restating the full chain.
ORACLES["q70_decennial2020_e2e"] = """
WITH pre AS (
  SELECT c_custkey % 200 AS k,
         CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS DOUBLE) AS tot
  FROM customer GROUP BY 1),
wide AS (
  SELECT '36047' || lpad(CAST(k AS VARCHAR), 6, '0') AS census_geoid,
         CASE WHEN k % 11 = 0 THEN NULL ELSE tot END AS P1
  FROM pre),
horiz AS (
  SELECT census_geoid, round(0.0 + coalesce(P1, 0.0), 0) AS e
  FROM wide),
neg AS (
  SELECT census_geoid, CASE WHEN e < 0 THEN NULL ELSE e END AS e
  FROM horiz),
final AS (
  SELECT census_geoid,
    CAST(NULL AS DOUBLE) AS c,
    e,
    CAST(NULL AS DOUBLE) AS m,
    CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE 100.0 END AS p,
    CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE 0.0 END AS z
  FROM neg)
SELECT census_geoid, 'decennial_pop' AS pff_variable,
  'tract' AS geotype, c, e, m, p, z,
  CASE WHEN substr(census_geoid, 4, 2) = '47'
       THEN '3' || substr(census_geoid, 6, 6) END AS labs_geoid,
  'CT2010' AS labs_geotype
FROM final
ORDER BY census_geoid
"""

# q71: the streaming dedup's kept KEY SET equals batch DISTINCT when
# the watermark horizon covers the bounded fixture.
ORACLES["q71_stream_dedup"] = """
WITH kept AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_event_types
FROM kept GROUP BY user_id
ORDER BY user_id
"""


def _positional_shingles_sql(n: int) -> str:
    """Positional (idx, gram) struct list over `toks` — the
    non-distinct, ordered twin of _shingles_sql for span analysis."""
    concat = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
CASE WHEN len(toks) - {n - 1} >= 1 THEN
  list_transform(range(1, len(toks) - {n - 2}),
                 i -> struct_pack(idx := i, g := {concat}))
ELSE [] END"""


# q72: gaps-and-islands longest shared-shingle run, mirrored over the
# same positional shingle definition (grp = idx − row_number is
# offset-invariant, so Spark's 0-based posexplode and this 1-based
# range agree).
ORACLES["q72_shared_spans"] = f"""
WITH d AS (SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (SELECT doc_id, {_positional_shingles_sql(5)} AS pairs FROM d),
posx AS (SELECT doc_id, unnest(pairs, recursive := true) FROM sh),
per_gram AS (
  SELECT g, count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, g FROM posx) GROUP BY g),
sharedpos AS (
  SELECT doc_id, idx FROM posx JOIN per_gram USING (g)
  WHERE n_docs >= 2),
runs AS (
  SELECT doc_id,
         idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
           AS grp
  FROM sharedpos),
run_lens AS (
  SELECT doc_id, grp, count(*) AS run_len FROM runs GROUP BY doc_id, grp),
totals AS (SELECT doc_id, count(*) AS n_grams FROM posx GROUP BY doc_id),
shared_counts AS (
  SELECT doc_id, count(*) AS n_shared_pos FROM sharedpos GROUP BY doc_id),
maxruns AS (
  SELECT doc_id, max(run_len) AS max_shared_run FROM run_lens
  GROUP BY doc_id)
SELECT docs.doc_id,
  coalesce(totals.n_grams, 0) AS n_grams,
  coalesce(shared_counts.n_shared_pos, 0) AS n_shared_pos,
  coalesce(maxruns.max_shared_run, 0) AS max_shared_run
FROM documents docs
LEFT JOIN totals ON docs.doc_id = totals.doc_id
LEFT JOIN shared_counts ON docs.doc_id = shared_counts.doc_id
LEFT JOIN maxruns ON docs.doc_id = maxruns.doc_id
ORDER BY docs.doc_id
"""


# q73: CDC merge — identical union + row_number formulation; the
# tombstone (odd-id update with value < 10) is evaluated on the
# winning row exactly as merge_upsert's delete_flag is.
ORACLES["q73_merge_upsert"] = """
WITH allr AS (
  SELECT user_id, event_type, ts, event_id, value,
         CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS src,
         (event_id % 2 = 1 AND value < 10.0) AS is_delete
  FROM events),
w AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC, src DESC) AS rn
  FROM allr)
SELECT user_id, event_type,
  strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
  value
FROM w WHERE rn = 1 AND NOT is_delete
ORDER BY user_id, event_type
"""


# q74: SCD2 — change flag (null-safe lag compare) + running segment
# sum share one window order (ts, event_id), runs roll up by segment,
# valid_to chains via lead over the run rows.
ORACLES["q74_scd2_intervals"] = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN lag(event_id) OVER w IS NULL
              OR event_type IS DISTINCT FROM lag(event_type) OVER w
         THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
seg AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS seg
  FROM flagged),
runs AS (
  SELECT user_id, seg, event_type, min(ts) AS valid_from,
         count(*) AS n_obs
  FROM seg GROUP BY user_id, seg, event_type),
fin AS (
  SELECT user_id, event_type, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
           AS valid_to,
         n_obs
  FROM runs)
SELECT user_id, event_type,
  strftime(make_timestamp(epoch_us(valid_from)), '%Y-%m-%d %H:%M:%S.%f')
    AS valid_from_s,
  strftime(make_timestamp(epoch_us(valid_to)), '%Y-%m-%d %H:%M:%S.%f')
    AS valid_to_s,
  n_obs
FROM fin
ORDER BY user_id, valid_from_s
"""


# q75: tf-idf with rational idf — tf·N exact integer, one IEEE
# division; ranking window mirrors the Spark orderBy exactly.
ORACLES["q75_tfidf_topterms"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) DESC,
                    term) AS rank
  FROM tf JOIN dfc USING (term) CROSS JOIN n)
SELECT doc_id, term, tf, df, score, rank
FROM scored WHERE rank <= 3 ORDER BY doc_id, rank
"""


# q76: per-domain cap — row_number window with the same deterministic
# (n_chars desc, doc_id) ranking, capped at 10 per source.
ORACLES["q76_domain_caps"] = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
           ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents)
SELECT source, doc_id, n_chars, rank
FROM ranked WHERE rank <= 10
ORDER BY source, rank
"""


# q77: Morton code — identical shift/mask/or arithmetic expanded
# term by term (generated for bits=10, k=2).
ORACLES["q77_zorder_values"] = """
WITH q AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % 1024 AS px, l_suppkey % 1024 AS sx
  FROM lineitem)
SELECT l_orderkey, l_linenumber, px, sx,
  ((((px >> 0) & 1) << 0) | (((px >> 1) & 1) << 2) | (((px >> 2) & 1) << 4) | (((px >> 3) & 1) << 6) | (((px >> 4) & 1) << 8) | (((px >> 5) & 1) << 10) | (((px >> 6) & 1) << 12) | (((px >> 7) & 1) << 14) | (((px >> 8) & 1) << 16) | (((px >> 9) & 1) << 18))
  | ((((sx >> 0) & 1) << 1) | (((sx >> 1) & 1) << 3) | (((sx >> 2) & 1) << 5) | (((sx >> 3) & 1) << 7) | (((sx >> 4) & 1) << 9) | (((sx >> 5) & 1) << 11) | (((sx >> 6) & 1) << 13) | (((sx >> 7) & 1) << 15) | (((sx >> 8) & 1) << 17) | (((sx >> 9) & 1) << 19)) AS z
FROM q
ORDER BY l_orderkey, l_linenumber
"""


# q78: LSH candidate-stage recall/precision — exact pairs (q26 logic)
# FULL OUTER JOIN banded candidates (q32's pre-verify cands CTE).
ORACLES["q78_lsh_recall_eval"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id AS id, {_SHINGLES} AS grams FROM d),
sized AS (SELECT id, grams, len(grams) AS n_sh FROM sh),
exploded AS (SELECT id, n_sh, unnest(grams) AS g FROM sized),
exact AS (
  SELECT id_a, id_b, n_common / (n_a + n_b - n_common) AS jaccard
  FROM (
    SELECT a.id AS id_a, b.id AS id_b,
           a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
    FROM exploded a JOIN exploded b
      ON a.g = b.g AND a.id < b.id
    GROUP BY 1, 2, 3, 4)
  WHERE n_common / (n_a + n_b - n_common) >= 0.6),
sigs AS (
  SELECT id, grams, CASE WHEN len(grams) > 0 THEN {_MH8} END AS sig FROM sh),
bands AS ({_BANDS32}),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, 1 AS is_cand
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
SELECT
  coalesce(exact.id_a, cands.id_a) AS id_a,
  coalesce(exact.id_b, cands.id_b) AS id_b,
  CASE WHEN jaccard IS NOT NULL AND is_cand IS NOT NULL THEN 'tp'
       WHEN jaccard IS NOT NULL THEN 'fn'
       ELSE 'fp_candidate' END AS status,
  jaccard
FROM exact FULL OUTER JOIN cands
  ON exact.id_a = cands.id_a AND exact.id_b = cands.id_b
ORDER BY id_a, id_b
"""


# q79: cohort retention — same Monday week-truncation and day/7
# offset; count(DISTINCT) mirrors count_distinct.
ORACLES["q79_cohort_retention"] = """
WITH weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id),
j AS (
  SELECT w.user_id, cohort_week,
         CAST(date_diff('day', cohort_week, week) // 7 AS INT)
           AS offset_weeks
  FROM weeks w JOIN first USING (user_id))
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week_s,
       offset_weeks, count(DISTINCT user_id) AS n_users
FROM j GROUP BY cohort_week, offset_weeks
ORDER BY cohort_week_s, offset_weeks
"""


# q80: funnel conversion — the oracle uses the quadratic inequality
# self-join (min purchase at-or-after each click) the Spark plan
# deliberately avoids; identical µs horizon arithmetic.
ORACLES["q80_funnel_conversion"] = """
WITH c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
np AS (
  SELECT c.user_id, c.event_id, c.ts, min(p.ts) AS next_p
  FROM c LEFT JOIN p
    ON p.user_id = c.user_id AND p.ts >= c.ts
  GROUP BY c.user_id, c.event_id, c.ts)
SELECT user_id, count(*) AS n_clicks,
  count(*) FILTER (
    WHERE next_p IS NOT NULL
      AND epoch_us(next_p) - epoch_us(ts) <= 3600000000
  ) AS n_converted
FROM np GROUP BY user_id ORDER BY user_id
"""


# q81: explicit-schema JSON extraction (props->>'k') + per-type agg;
# sum cast to BIGINT to match Spark's long sum.
ORACLES["q81_json_extract"] = """
WITH parsed AS (
  SELECT event_type, CAST(props->>'k' AS INTEGER) AS k FROM events)
SELECT event_type,
  count(*) AS n,
  count(k) AS n_k,
  CAST(sum(k) AS BIGINT) AS sum_k,
  min(k) AS min_k,
  max(k) AS max_k
FROM parsed GROUP BY event_type ORDER BY event_type
"""


# q82: snapshot diff — identical derived old/new variants, one full
# outer key join, null-safe per-column compares, concat_ws skipping
# non-diff columns exactly like the Spark side.
ORACLES["q82_table_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 0),
new AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
         ELSE o_totalprice END AS o_totalprice,
    o_orderstatus,
    CASE WHEN o_orderkey % 11 = 0 THEN '9-RECHECK'
         ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 7 <> 0),
j AS (
  SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
    old.o_orderkey IS NOT NULL AS in_old,
    new.o_orderkey IS NOT NULL AS in_new,
    old.o_totalprice IS DISTINCT FROM new.o_totalprice AS d1,
    old.o_orderstatus IS DISTINCT FROM new.o_orderstatus AS d2,
    old.o_orderpriority IS DISTINCT FROM new.o_orderpriority AS d3
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
SELECT o_orderkey,
  CASE WHEN NOT in_old THEN 'added'
       WHEN NOT in_new THEN 'removed'
       WHEN d1 OR d2 OR d3 THEN 'changed'
       ELSE 'same' END AS status,
  CASE WHEN in_old AND in_new AND (d1 OR d2 OR d3) THEN
    concat_ws(',', CASE WHEN d1 THEN 'o_totalprice' END,
                   CASE WHEN d2 THEN 'o_orderstatus' END,
                   CASE WHEN d3 THEN 'o_orderpriority' END)
  ELSE '' END AS changed_cols
FROM j
WHERE NOT (in_old AND in_new AND NOT (d1 OR d2 OR d3))
ORDER BY o_orderkey
"""


# q83: stream-static enrichment — the batch-equivalent SQL (inner join
# to the inline dimension + per-category agg); fixed-decimal long sum
# mirrors the Spark side so stream-vs-batch equality is bit-exact.
ORACLES["q83_stream_enrich"] = """
WITH dim(event_type, category, weight) AS (
  VALUES ('click','engage',1), ('view','engage',1),
         ('signup','convert',5), ('purchase','convert',3),
         ('error','ops',0))
SELECT category, count(*) AS n_events,
  CAST(sum(weight) AS BIGINT) AS sum_weight,
  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
    AS sum_value
FROM events JOIN dim USING (event_type)
GROUP BY category ORDER BY category
"""


# q84: portable HLL — identical md5 bucket/rank derivation, exact
# power-of-two partial sums, same fixed-order double formula.
ORACLES["q84_hll_distinct"] = """
WITH pr AS (
  SELECT event_type,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 64
      AS bucket,
    29 - length(bin(
      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 8, 7))::BIGINT))
      AS rank
  FROM events),
mx AS (
  SELECT event_type, bucket, max(rank) AS mr FROM pr GROUP BY 1, 2),
s AS (
  SELECT event_type, count(*) AS n_buckets,
         sum(1.0 / CAST(1 << mr AS DOUBLE)) AS sum_present
  FROM mx GROUP BY 1),
e AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1)
SELECT s.event_type, n_exact, n_buckets,
  2904.064 / (sum_present + CAST(64 - n_buckets AS DOUBLE)) AS hll_raw,
  (2904.064 / (sum_present + CAST(64 - n_buckets AS DOUBLE))
     - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_err
FROM s JOIN e USING (event_type) ORDER BY event_type
"""


# q85: trailing 3-row frame — identical frame spec and micro-unit
# arithmetic; ties in ts break on event_id in both engines.
ORACLES["q85_rolling_stats"] = """
SELECT event_id, user_id,
  strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
    / (100.0 * CAST(count(*) OVER w AS DOUBLE)) AS ma3,
  max(value) OVER w AS max3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def _bands_from(cte: str) -> str:
    """Band CTE body over an arbitrary signature CTE (the q32 macro
    hardcodes `sigs`; the cross-corpus query needs one per side)."""
    return " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5(CAST(sig[{2*b+1}] AS VARCHAR) || '|' ||"
        f" CAST(sig[{2*b+2}] AS VARCHAR)) AS bucket FROM {cte}"
        for b in range(4)
    )


# q86: cross-corpus decontamination — two signature chains, bucket
# join ACROSS them, candidate-only verification, per-probe accounting.
ORACLES["q86_decontaminate"] = f"""
WITH dc AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents WHERE doc_id % 2 = 0),
shc AS (SELECT doc_id AS id, {_SHINGLES} AS grams FROM dc),
sigc AS (
  SELECT id, grams, CASE WHEN len(grams) > 0 THEN {_MH8} END AS sig
  FROM shc),
bandsc AS ({_bands_from('sigc')}),
dp AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents WHERE doc_id % 2 = 1),
shp AS (SELECT doc_id AS id, {_SHINGLES} AS grams FROM dp),
sigp AS (
  SELECT id, grams, CASE WHEN len(grams) > 0 THEN {_MH8} END AS sig
  FROM shp),
bandsp AS ({_bands_from('sigp')}),
cands AS (
  SELECT DISTINCT p.id AS probe_id, c.id AS corpus_id
  FROM bandsp p JOIN bandsc c
    ON p.band = c.band AND p.bucket = c.bucket),
ver AS (
  SELECT probe_id, corpus_id,
    CAST(len(list_intersect(sp.grams, sc2.grams)) AS DOUBLE)
      / (CAST(len(sp.grams) + len(sc2.grams) AS DOUBLE)
         - CAST(len(list_intersect(sp.grams, sc2.grams)) AS DOUBLE))
      AS jaccard
  FROM cands
  JOIN sigp sp ON sp.id = probe_id
  JOIN sigc sc2 ON sc2.id = corpus_id),
m AS (
  SELECT probe_id, count(*) AS n_matches, max(jaccard) AS max_jaccard
  FROM ver WHERE jaccard >= 0.6 GROUP BY probe_id)
SELECT d.doc_id AS probe_id,
  coalesce(n_matches, 0) AS n_matches,
  max_jaccard
FROM documents d LEFT JOIN m ON d.doc_id = m.probe_id
WHERE d.doc_id % 2 = 1
ORDER BY probe_id
"""


# q87: incremental state merge must equal the direct aggregation —
# the oracle computes it directly with the identical micro-unit sum.
ORACLES["q87_incremental_agg"] = """
SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
    AS sum_v
FROM events GROUP BY event_type ORDER BY event_type
"""


# q88: audio framing — per byte: (val−128)² grouped into 256-sample
# frames via i // 256; all integer math re-derived from the hex
# expansion of the same utf-8 payload.
ORACLES["q88_audio_frames"] = """
WITH p AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx FROM documents),
b AS (
  SELECT media_id, i // 256 AS frame,
    ((strpos('0123456789ABCDEF', substr(hx, 2 * i + 1, 1)) - 1) * 16
   + (strpos('0123456789ABCDEF', substr(hx, 2 * i + 2, 1)) - 1) - 128)
    AS s
  FROM p, unnest(range(0, CAST(length(hx) // 2 AS BIGINT))) AS t(i)),
frames AS (
  SELECT media_id, frame, CAST(sum(s * s) AS BIGINT) AS fe
  FROM b GROUP BY media_id, frame),
agg AS (
  SELECT media_id, count(*) AS n_frames,
         CAST(sum(fe) AS BIGINT) AS total_energy,
         max(fe) AS max_frame_energy
  FROM frames GROUP BY media_id)
SELECT p.media_id,
  coalesce(n_frames, 0) AS n_frames,
  coalesce(total_energy, 0) AS total_energy,
  coalesce(max_frame_energy, 0) AS max_frame_energy
FROM p LEFT JOIN agg USING (media_id)
ORDER BY media_id
"""


# q89: frame sampling — Spark sequence(0, stop, step) is stop-
# INCLUSIVE; DuckDB range is exclusive, so the oracle ranges to
# duration_ms + 1.
ORACLES["q89_video_frame_sample"] = """
WITH m AS (
  SELECT doc_id AS media_id, CAST(n_chars * 10 AS BIGINT) AS duration_ms
  FROM documents)
SELECT media_id, duration_ms, CAST(ts_ms AS BIGINT) AS ts_ms
FROM m, unnest(range(0, duration_ms + 1, 1000)) AS t(ts_ms)
ORDER BY media_id, ts_ms
"""


# q90: session paths — same floored-epoch gap rule as q21 with the
# defensive (ts, event_id) ordering; string_agg(ORDER BY) mirrors the
# struct-sorted collect_list.
ORACLES["q90_session_paths"] = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events),
flagged AS (
  SELECT user_id, event_id, event_type, ts, s,
    CASE WHEN s - lag(s) OVER w > 1800 OR lag(s) OVER w IS NULL
         THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, event_id, event_type, ts,
    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS session_seq
  FROM flagged)
SELECT user_id, session_seq, count(*) AS n_events,
  string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM sessions GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


# q91: deterministic-sample quantiles — identical md5 bucket
# selection (see hash_bucket) and quantile_cont interpolation.
ORACLES["q91_sampled_quantiles"] = """
WITH s AS (
  SELECT event_type, value FROM events
  WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))::BIGINT
        % 10000 < 2000)
SELECT event_type,
  quantile_cont(value, 0.25) AS q25,
  quantile_cont(value, 0.5) AS q50,
  quantile_cont(value, 0.9) AS q90,
  count(*) AS n_sampled
FROM s GROUP BY event_type ORDER BY event_type
"""


# q92: exact-sufficient-statistic OLS — HUGEINT sums mirror the
# decimal(38,0) sums; every double op in the same order.
ORACLES["q92_grouped_linreg"] = """
WITH d AS (
  SELECT event_type,
    CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)
      - 19723 AS x,
    CAST(floor(value + 0.5) AS BIGINT) AS y
  FROM events),
s AS (
  SELECT event_type,
    CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx,
    CAST(sum(y) AS HUGEINT) AS sy,
    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM d GROUP BY event_type),
r AS (
  SELECT event_type, CAST(n AS BIGINT) AS n,
    CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) != 0 THEN
      CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
    END AS slope_u,
    sx, sy
  FROM s),
f AS (
  SELECT event_type, n, slope_u,
    (CAST(sy AS DOUBLE) - slope_u * CAST(sx AS DOUBLE))
      / CAST(n AS DOUBLE) AS intercept_u
  FROM r)
SELECT event_type, n,
  slope_u AS slope_per_day,
  intercept_u AS intercept_value
FROM f ORDER BY event_type
"""


# q93: FK orphans — same deterministic corruption; NOT EXISTS keeps
# NULL fks as violations exactly like the anti join.
ORACLES["q93_fk_violations"] = """
WITH corrupted AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 17 = 0 THEN NULL
         WHEN o_orderkey % 13 = 0 THEN o_custkey + 1000000
         ELSE o_custkey END AS o_custkey
  FROM orders)
SELECT o_orderkey, o_custkey
FROM corrupted c
WHERE NOT EXISTS (
  SELECT 1 FROM customer WHERE c_custkey = c.o_custkey)
ORDER BY o_orderkey
"""


# q94: one-pass column profile — per-column UNION ALL of the same
# row/null/distinct counts (count(DISTINCT) skips NULLs both ways).
ORACLES["q94_profile_columns"] = """
WITH src AS (
  SELECT o_custkey, o_orderstatus,
    CASE WHEN o_orderkey % 7 = 0 THEN NULL
         ELSE o_orderpriority END AS o_orderpriority
  FROM orders)
SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
  count(*) FILTER (WHERE o_custkey IS NULL) AS n_null,
  count(DISTINCT o_custkey) AS n_distinct FROM src
UNION ALL
SELECT 'o_orderstatus', count(*),
  count(*) FILTER (WHERE o_orderstatus IS NULL),
  count(DISTINCT o_orderstatus) FROM src
UNION ALL
SELECT 'o_orderpriority', count(*),
  count(*) FILTER (WHERE o_orderpriority IS NULL),
  count(DISTINCT o_orderpriority) FROM src
ORDER BY col_name
"""


# q95: fuzzy match — the oracle IS the cross product the blocking
# avoids: identical probe synthesis, identical levenshtein metric.
ORACLES["q95_fuzzy_name_match"] = """
WITH probes AS (
  SELECT s_suppkey AS p_suppkey,
         substr(s_name, 1, 2) || substr(s_name, 4) AS p_name
  FROM supplier)
SELECT p_suppkey, s_suppkey, levenshtein(p_name, s_name) AS dist
FROM probes CROSS JOIN supplier
WHERE levenshtein(p_name, s_name) <= 1
ORDER BY p_suppkey, s_suppkey
"""


# q96: interval union — identical running-max sweep; covered/island
# sums cast to BIGINT (DuckDB window/group sums are HUGEINT).
ORACLES["q96_covered_time"] = """
WITH iv AS (
  SELECT user_id, event_id,
    epoch_us(ts) - 300000000 AS s,
    epoch_us(ts) + 300000000 AS e
  FROM events WHERE event_type = 'purchase'),
flagged AS (
  SELECT user_id, s, e,
    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) IS NULL
              OR s > max(e) OVER (PARTITION BY user_id
                                  ORDER BY s, e, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS ni,
    event_id
  FROM iv),
islands AS (
  SELECT user_id, s, e,
    sum(ni) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                  ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged),
merged AS (
  SELECT user_id, island, min(s) AS s, max(e) AS e
  FROM islands GROUP BY user_id, island)
SELECT user_id,
  CAST(sum(e - s) AS BIGINT) AS covered,
  count(*) AS n_islands
FROM merged GROUP BY user_id ORDER BY user_id
"""


# q97: token-budget prefix fill — same ranking, same cumulative sum
# (BIGINT), same ≤ cut; the bpe tokenizer is the q39 mirror.
ORACLES["q97_token_budget_fill"] = """
WITH sized AS (
  SELECT source, doc_id, n_chars,
    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+'))
      AS n_tokens
  FROM documents),
cum AS (
  SELECT source, doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY source
         ORDER BY n_chars DESC, doc_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_size
  FROM sized)
SELECT source, doc_id, n_tokens, cum_size
FROM cum WHERE cum_size <= 2000
ORDER BY source, cum_size
"""


# q98: last-touch attribution — DuckDB's native ASOF LEFT JOIN is the
# oracle for the union-window as-of; identical 7-day horizon and
# micro-unit credit arithmetic.
ORACLES["q98_lasttouch_attribution"] = """
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts, max(epoch_us(ts)) AS click_us
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
j AS (
  SELECT p.user_id, p.ts, p.value, c.click_us
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.ts >= c.ts)
SELECT user_id, count(*) AS n_purchases,
  count(*) FILTER (
    WHERE click_us IS NOT NULL
      AND epoch_us(ts) - click_us <= 604800000000) AS n_touched,
  CAST(sum(CASE WHEN click_us IS NOT NULL
                 AND epoch_us(ts) - click_us <= 604800000000
            THEN CAST(floor(value*100 + 0.5) AS BIGINT)
            ELSE 0 END) AS DOUBLE) / 100.0 AS credited_value
FROM j GROUP BY user_id ORDER BY user_id
"""


# q99: ratio-to-report — aggregate once, window-sum denominators;
# exact-int counts, single rounded division.
ORACLES["q99_share_of_total"] = """
WITH cells AS (
  SELECT date_trunc('week', ts) AS week, event_type,
         count(*) AS n
  FROM events GROUP BY week, event_type)
SELECT strftime(week, '%Y-%m-%d') AS week_s, event_type, n,
  CAST(n AS DOUBLE)
    / CAST(CAST(sum(n) OVER (PARTITION BY week) AS BIGINT) AS DOUBLE)
    AS share
FROM cells ORDER BY week_s, event_type
"""


# q100: the curation capstone — each stage replayed with its proven
# oracle idiom (q30 quality, q25 fingerprint dedup, q64 mixture
# buckets, q63 packing cumsum), composed in the same order.
ORACLES["q100_curation_pipeline"] = f"""
WITH scored AS (
  SELECT doc_id, source, lang, text, {_QUALITY} AS q FROM documents),
good AS (SELECT * FROM scored WHERE q >= 0.5),
fp AS (
  SELECT *, coalesce(md5({_NORM}), 'null:' || CAST(doc_id AS VARCHAR))
    AS f
  FROM good),
survivors AS (
  SELECT * FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY f) AS rep FROM fp)
  WHERE doc_id = rep),
mixed AS (
  SELECT * FROM survivors
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        % 10000
      < CASE WHEN source IN ('src0','src1','src2','src3','src4')
             THEN 10000 ELSE 5000 END),
tok AS (
  SELECT doc_id, source, lang, q,
    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]+'))
         AS BIGINT) AS n_tok
  FROM mixed),
c AS (
  SELECT *, coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM tok)
SELECT doc_id, source, lang, q, n_tok,
  CAST(cum // 2048 AS BIGINT) AS chunk_id,
  CAST(cum % 2048 AS BIGINT) AS chunk_offset
FROM c ORDER BY doc_id
"""


# q101: triangle counts — edges are the q33 pair set; id-ordered
# closure counts each triangle once, per-node via the 3-way unnest.
ORACLES["q101_triangle_counts"] = f"""
WITH edges AS (
  SELECT id_a AS a, id_b AS b FROM ({ORACLES["q33_simhash_pairs"]})),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
nodes AS (
  SELECT unnest([x, y, z]) AS node FROM tris)
SELECT node, count(*) AS n_triangles
FROM nodes GROUP BY node ORDER BY node
"""


# q102: stream-stream join — batch inequality-join equivalent; the
# streaming job's watermark horizon covers the bounded fixture so the
# pair set equals this exactly.
ORACLES["q102_stream_stream_join"] = """
WITH c AS (
  SELECT user_id, ts AS c_ts, event_id AS c_id
  FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id
  FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT c.user_id, c_id, p_id
  FROM c JOIN p ON c.user_id = p.user_id
    AND c_ts >= p_ts - INTERVAL 1 HOUR
    AND c_ts <= p_ts)
SELECT user_id, count(*) AS n_pairs,
  count(DISTINCT c_id) AS n_clicks_matched,
  count(DISTINCT p_id) AS n_purchases_matched
FROM j GROUP BY user_id ORDER BY user_id
"""


# q103: ntile deciles — identical total order and standard SQL
# remainder-to-early-buckets division.
ORACLES["q103_decile_assignment"] = """
WITH binned AS (
  SELECT o_orderpriority, o_totalprice,
    ntile(10) OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders)
SELECT o_orderpriority, decile, count(*) AS n,
  min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM binned GROUP BY o_orderpriority, decile
ORDER BY o_orderpriority, decile
"""


# q104: percent_rank / cume_dist — identical total order; the window
# runs over ALL rows, the output sample filter applies after.
ORACLES["q104_rank_distributions"] = """
WITH ranked AS (
  SELECT o_orderkey, o_orderpriority,
    percent_rank() OVER w AS pr,
    cume_dist() OVER w AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey))
SELECT o_orderkey, o_orderpriority, pr, cd
FROM ranked WHERE o_orderkey % 25 = 0
ORDER BY o_orderkey
"""


# q105: ordered funnel — the same three chained conditional
# aggregates; to_date/date_trunc agree on UTC-naive timestamps.
ORACLES["q105_ordered_funnel"] = """
WITH ev AS (
  SELECT user_id, event_type, ts, CAST(ts AS DATE) AS day FROM events),
s1 AS (
  SELECT user_id, day,
    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM ev GROUP BY user_id, day),
s2 AS (
  SELECT ev.user_id, ev.day,
    min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
      AS t_click
  FROM ev JOIN s1 ON ev.user_id = s1.user_id AND ev.day = s1.day
  GROUP BY ev.user_id, ev.day),
s3 AS (
  SELECT ev.user_id, ev.day,
    min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
      AS t_purchase
  FROM ev JOIN s2 ON ev.user_id = s2.user_id AND ev.day = s2.day
  GROUP BY ev.user_id, ev.day)
SELECT s1.user_id, strftime(s1.day, '%Y-%m-%d') AS day_s,
  CASE WHEN t_purchase IS NOT NULL THEN 3
       WHEN t_click IS NOT NULL THEN 2
       WHEN t_view IS NOT NULL THEN 1
       ELSE 0 END AS stage
FROM s1
JOIN s2 ON s1.user_id = s2.user_id AND s1.day = s2.day
JOIN s3 ON s1.user_id = s3.user_id AND s1.day = s3.day
ORDER BY s1.user_id, day_s
"""


# q106: multi-measure pivot — conditional aggregation twin; absent
# combos land 0 like the coalesced pivot columns.
ORACLES["q106_multi_measure_pivot"] = """
SELECT o_orderpriority,
  count(*) FILTER (WHERE o_orderstatus = 'F') AS F_n,
  CAST(coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
       FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) / 100.0
    AS F_total,
  count(*) FILTER (WHERE o_orderstatus = 'O') AS O_n,
  CAST(coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
       FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) / 100.0
    AS O_total,
  count(*) FILTER (WHERE o_orderstatus = 'P') AS P_n,
  CAST(coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
       FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) / 100.0
    AS P_total
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# q107: sliding windows — every event belongs to the two hourly-
# aligned 2-hour windows covering it.
ORACLES["q107_sliding_windows"] = """
WITH m AS (
  SELECT event_type,
    date_trunc('hour', ts) - CAST(k AS INT) * INTERVAL 1 HOUR AS ws
  FROM events, unnest(range(2)) AS t(k))
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS w_start, event_type,
  count(*) AS n_events
FROM m GROUP BY ws, event_type ORDER BY w_start, event_type
"""


# q108: weighted mean — whole-quantity × price-cent integer sums
# (all < 2^53 → exact casts), one rounded division.
ORACLES["q108_weighted_mean"] = """
WITH u AS (
  SELECT l_returnflag,
    CAST(floor(l_quantity + 0.5) AS BIGINT) AS w,
    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS x
  FROM lineitem)
SELECT l_returnflag,
  CAST(CAST(sum(w * x) AS BIGINT) AS DOUBLE)
    / (100.0 * CAST(CAST(sum(w) AS BIGINT) AS DOUBLE))
    AS weighted_avg_price,
  CAST(sum(w) AS BIGINT) AS weight_units
FROM u GROUP BY l_returnflag ORDER BY l_returnflag
"""


# q109: deterministic arg-max — independent specification of the same
# winner via a ranking window (value desc, id asc).
ORACLES["q109_argmax_struct"] = """
SELECT event_type, value, event_id FROM (
  SELECT event_type, value, event_id,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS rn
  FROM events)
WHERE rn = 1 ORDER BY event_type
"""


# q110: line-level (CCNet-style) boilerplate removal — lines present
# in >=2 distinct docs stripped, docs re-assembled in line order;
# clean_md5 proves byte-exact re-assembly.
ORACLES["q110_line_dedup"] = """
WITH d AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS ls
  FROM documents WHERE text IS NOT NULL),
l AS (
  SELECT doc_id, t.i + 1 AS pos, ls[t.i + 1] AS line
  FROM d, unnest(range(len(ls))) AS t(i)),
keyed AS (
  SELECT doc_id, pos, line,
    CASE WHEN trim(line) <> '' THEN md5(lower(trim(line))) END AS k
  FROM l),
boiler AS (
  SELECT k FROM keyed WHERE k IS NOT NULL
  GROUP BY k HAVING count(DISTINCT doc_id) >= 2),
flagged AS (
  SELECT keyed.*,
    (k IS NOT NULL AND k IN (SELECT k FROM boiler)) AS dropped
  FROM keyed),
reb AS (
  SELECT doc_id, count(*) AS n_lines,
    CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
    coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
                        chr(10) ORDER BY pos), '') AS clean_text
  FROM flagged GROUP BY doc_id)
SELECT d0.doc_id,
  CAST(coalesce(r.n_lines, 0) AS BIGINT) AS n_lines,
  CAST(coalesce(r.n_dropped, 0) AS BIGINT) AS n_dropped,
  md5(coalesce(CASE WHEN d0.text IS NOT NULL
               THEN coalesce(r.clean_text, '') END, ' ')) AS clean_md5
FROM documents d0 LEFT JOIN reb r USING (doc_id)
ORDER BY doc_id
"""


# q111: brute-force unigram-Jaccard pairs — the independent (quadratic)
# specification that the AllPairs prefix index must reproduce exactly.
ORACLES["q111_prefix_filter_pairs"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, {_SHINGLES} AS grams FROM d),
sized AS (SELECT doc_id, grams, len(grams) AS n_sh FROM sh
          WHERE len(grams) >= 1),
exploded AS (SELECT doc_id, n_sh, unnest(grams) AS g FROM sized),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, n_common / (n_a + n_b - n_common) AS jaccard
FROM pairs
WHERE n_common / (n_a + n_b - n_common) >= 0.6
ORDER BY id_a, id_b
"""


# q112: the Bloom filter only prunes — the answer is the plain
# semi-join's, which this oracle computes directly.
ORACLES["q112_bloom_semi_join"] = """
SELECT l_returnflag, count(*) AS n_items,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(25,6)))
       AS DOUBLE) / 100.0 AS revenue
FROM lineitem
WHERE l_suppkey IN (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_12', 'NATION_13', 'NATION_15'))
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# q113: brute-force specification of the Misra-Gries answer — every
# item strictly above the n/(k+1) frequency threshold, exact counts
# (k = 6 → multiplier 7; integer comparison, no float threshold).
ORACLES["q113_heavy_hitters"] = """
WITH t AS (
  SELECT count(*) AS n_total FROM events WHERE event_type IS NOT NULL)
SELECT CAST(event_type AS VARCHAR) AS item,
  count(*) AS n_item, CAST(t.n_total AS BIGINT) AS n_total
FROM events, t
WHERE event_type IS NOT NULL
GROUP BY event_type, t.n_total
HAVING count(*) * 7 > t.n_total
ORDER BY item
"""


# q114: calendar gap fill — generate_series per user span (DuckDB's
# end-inclusive twin of Spark's stop-inclusive sequence()), zeros on
# gap days, IGNORE NULLS forward fill of the daily max.
ORACLES["q114_gap_fill"] = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_events, max(value) AS day_max
  FROM events GROUP BY 1, 2),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         FROM daily GROUP BY 1),
cal AS (
  SELECT user_id, CAST(t.d AS DATE) AS day
  FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(d)),
filled AS (
  SELECT c.user_id, c.day,
         coalesce(d.n_events, 0) AS n_events, d.day_max
  FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day_s,
  CAST(n_events AS BIGINT) AS n_events, day_max,
  last_value(day_max IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_value
FROM filled
ORDER BY user_id, day_s
"""


# q115: complete CUBE lattice — the GROUPING() bit vector matches
# Spark's grouping_id bit order for the same column list.
ORACLES["q115_cube_agg"] = """
SELECT l_returnflag, l_linestatus,
  count(*) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


# q116: textbook NOT-EXISTS strict-dominance skyline — the quadratic
# specification the distinct-cost decomposition must reproduce.
ORACLES["q116_skyline"] = """
WITH pts AS (
  SELECT p_partkey,
    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
    CAST(p_size AS BIGINT) AS p_size
  FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL)
SELECT p_partkey, price_c, p_size FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size))
ORDER BY p_partkey
"""


# q117: deterministic mode via ranking window (count desc, status asc).
ORACLES["q117_mode_per_group"] = """
SELECT o_orderpriority, o_orderstatus AS mode_status, n AS n_mode FROM (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY count(*) DESC, o_orderstatus ASC) AS rn
  FROM orders GROUP BY 1, 2)
WHERE rn = 1 ORDER BY o_orderpriority
"""


# q118: discrete order-statistic winsorization — integer ranks,
# integer clip, decimal-exact sum; no float interpolation anywhere.
ORACLES["q118_winsorize"] = """
WITH x AS (
  SELECT l_returnflag,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS xc
  FROM lineitem),
r AS (
  SELECT l_returnflag, xc,
    row_number() OVER (PARTITION BY l_returnflag ORDER BY xc) AS rn,
    count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM x),
b AS (
  SELECT l_returnflag,
    min(CASE WHEN rn = (n + 19) // 20 THEN xc END) AS lo,
    min(CASE WHEN rn = (19 * n + 19) // 20 THEN xc END) AS hi
  FROM r GROUP BY 1)
SELECT x.l_returnflag, count(*) AS n,
  CAST(CAST(sum(least(greatest(xc, lo), hi)) AS BIGINT)
       AS DOUBLE) / 100.0 AS winsorized_total
FROM x JOIN b USING (l_returnflag)
GROUP BY 1 ORDER BY 1
"""


# q119: chunk-with-overlap — starts 1, 49, 97, … (Spark sequence is
# stop-inclusive; range() end-exclusive gets +1), 64-token slices,
# md5 of the space-joined slice proves byte-exact chunking.
ORACLES["q119_chunk_overlap"] = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents WHERE text IS NOT NULL),
sized AS (SELECT doc_id, tk, len(tk) AS n FROM d WHERE len(tk) >= 1),
chunks AS (
  SELECT doc_id, n, tk, t.i AS chunk_idx, 1 + 48 * t.i AS start
  FROM sized, unnest(range(CAST(ceil(n / 48.0) AS BIGINT))) AS t(i)),
pieces AS (
  SELECT doc_id, chunk_idx,
    list_slice(tk, start, least(start + 63, n)) AS piece
  FROM chunks WHERE start <= n)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
  CAST(len(piece) AS INT) AS chunk_tokens,
  md5(array_to_string(piece, ' ')) AS chunk_md5
FROM pieces ORDER BY doc_id, chunk_idx
"""


# q120: conjunctive keyword search — membership in the normalized
# token set for every query term.
ORACLES["q120_keyword_search"] = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE text IS NOT NULL
  AND list_contains({_NORMTOKS}, 'spark')
  AND list_contains({_NORMTOKS}, 'join')
ORDER BY doc_id
"""


# q121: median absolute deviation — two quantile_cont passes over
# exact cent doubles.
ORACLES["q121_grouped_mad"] = """
WITH x AS (
  SELECT l_returnflag,
    CAST(floor(l_extendedprice * 100 + 0.5) AS DOUBLE) AS x
  FROM lineitem),
m AS (SELECT l_returnflag, quantile_cont(x, 0.5) AS med FROM x GROUP BY 1)
SELECT x.l_returnflag, min(med) AS median_cents,
  quantile_cont(abs(x - med), 0.5) AS mad_cents, count(*) AS n
FROM x JOIN m USING (l_returnflag)
GROUP BY 1 ORDER BY 1
"""


# q122: native session windows — islands with `>= gap` (half-open
# [ts, ts+gap) windows: an event exactly gap-after starts anew);
# window end = last event + gap.
ORACLES["q122_session_window_native"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events),
flagged AS (
  SELECT user_id, us, value,
    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                 >= 1800000000
         THEN 1 ELSE 0 END AS ns
  FROM e),
sess AS (
  SELECT user_id, us, value,
    sum(ns) OVER (PARTITION BY user_id ORDER BY us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id,
  strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
  strftime(make_timestamp(max(us) + 1800000000),
           '%Y-%m-%d %H:%M:%S.%f') AS s_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
ORDER BY user_id, s_start
"""


# q123: pure-integer equi-width bucketing — no float boundary drift.
ORACLES["q123_histogram"] = """
WITH x AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS xc
  FROM lineitem),
s AS (SELECT min(xc) AS lo, max(xc) AS hi FROM x)
SELECT CAST(((xc - lo) * 20) // (hi - lo + 1) AS INT) AS bucket,
  count(*) AS n, min(xc) AS min_c, max(xc) AS max_c
FROM x, s
GROUP BY 1 ORDER BY 1
"""


# q124: ≤2-hop distinct reach on the co-event graph, specified
# directly as SQL set algebra.
ORACLES["q124_two_hop_reach"] = """
WITH occ AS (
  SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS m
  FROM events),
e AS (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM occ a JOIN occ b
    ON a.event_type = b.event_type AND a.m = b.m
   AND a.user_id < b.user_id),
sym AS (
  SELECT src AS a, dst AS b FROM e
  UNION SELECT dst, src FROM e),
hop2 AS (
  SELECT x.a, y.b FROM sym x JOIN sym y ON x.b = y.a WHERE x.a <> y.b),
reach AS (SELECT a, b FROM sym UNION SELECT a, b FROM hop2)
SELECT a AS src, CAST(count(DISTINCT b) AS BIGINT) AS n_reach
FROM reach GROUP BY a ORDER BY src
"""


# q125: day-over-day ratio — exact cent sums, one double division.
ORACLES["q125_period_over_period"] = """
WITH daily AS (
  SELECT o_orderpriority, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
    CAST(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         AS BIGINT) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, strftime(day, '%Y-%m-%d') AS day_s, rev_c,
  lag(rev_c) OVER (PARTITION BY o_orderpriority ORDER BY day) AS prev_c,
  CAST(rev_c AS DOUBLE)
    / CAST(lag(rev_c) OVER (PARTITION BY o_orderpriority ORDER BY day)
           AS DOUBLE) AS dod_ratio
FROM daily
ORDER BY o_orderpriority, day_s
"""


# q126: interval overlap as a plain inequality join (the quadratic
# spec the bucketed join must reproduce pair-for-pair).
ORACLES["q126_interval_overlap"] = """
WITH p AS (
  SELECT user_id, event_id AS l_id, epoch_us(ts) AS l_start,
         epoch_us(ts) + 1800000000 AS l_end
  FROM events WHERE event_type = 'purchase'),
e AS (
  SELECT user_id, event_id AS r_id, epoch_us(ts) AS r_start,
         epoch_us(ts) + 900000000 AS r_end
  FROM events WHERE event_type = 'error')
SELECT p.user_id, l_id, r_id,
  greatest(l_start, r_start) AS ov_start,
  least(l_end, r_end) AS ov_end
FROM p JOIN e ON p.user_id = e.user_id
 AND l_start <= r_end AND r_start <= l_end
ORDER BY p.user_id, l_id, r_id
"""


# q127: arbitrary grouping sets; DuckDB's GROUPING() bit vector
# matches Spark's grouping_id() for the same column list.
ORACLES["q127_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
  count(*) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag, l_linestatus
"""


# q128: direct type-level sketch of the raw data — equality with the
# Spark side's day-partial merge proves the sketch is algebraic.
ORACLES["q128_hll_rollup"] = """
WITH pr AS (
  SELECT event_type,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 64
      AS bucket,
    29 - length(bin(
      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 8, 7))::BIGINT))
      AS rank
  FROM events WHERE user_id IS NOT NULL),
mx AS (
  SELECT event_type, bucket, max(rank) AS mr FROM pr GROUP BY 1, 2),
s AS (
  SELECT event_type, count(*) AS n_buckets,
         sum(1.0 / CAST(1 << mr AS DOUBLE)) AS sum_present
  FROM mx GROUP BY 1),
e AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1)
SELECT s.event_type, CAST(n_buckets AS BIGINT) AS n_buckets,
  2904.064 / (sum_present + CAST(64 - n_buckets AS DOUBLE)) AS hll_raw,
  n_exact
FROM s JOIN e USING (event_type) ORDER BY event_type
"""


# q129: the discovered pivot spine is stable ('1-URGENT'…'5-LOW'), so
# the static conditional-aggregation twin specifies the same frame.
ORACLES["q129_dynamic_pivot"] = """
SELECT o_orderstatus,
  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_n,
  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_n,
  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_n,
  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_n,
  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# q130: ExactSubstr span removal — 8-gram corpus counts, covered
# positions, anti-join, ordered re-assembly.
ORACLES["q130_span_removal"] = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents WHERE text IS NOT NULL),
tok AS (
  SELECT doc_id, t.i + 1 AS tpos, tk[t.i + 1] AS tok
  FROM d, unnest(range(len(tk))) AS t(i)),
gr AS (
  SELECT doc_id, t.i + 1 AS gpos,
    array_to_string(list_slice(tk, t.i + 1, t.i + 8), ' ') AS gram
  FROM d, unnest(range(greatest(len(tk) - 7, 0))) AS t(i)),
dup AS (SELECT gram FROM gr GROUP BY gram HAVING count(*) >= 2),
cov AS (
  SELECT DISTINCT doc_id, gpos + t.k AS tpos
  FROM (SELECT doc_id, gpos FROM gr
        WHERE gram IN (SELECT gram FROM dup)) gg,
       unnest(range(8)) AS t(k)),
kept AS (
  SELECT tok.doc_id, tok.tpos, tok.tok
  FROM tok LEFT JOIN cov
    ON tok.doc_id = cov.doc_id AND tok.tpos = cov.tpos
  WHERE cov.tpos IS NULL),
reb AS (
  SELECT doc_id, count(*) AS n_kept,
    string_agg(tok, ' ' ORDER BY tpos) AS ct
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id)
SELECT d0.doc_id,
  CAST(coalesce(tot.n_tokens, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(tot.n_tokens, 0) - coalesce(reb.n_kept, 0) AS BIGINT)
    AS n_removed,
  md5(coalesce(CASE WHEN d0.text IS NOT NULL
               THEN coalesce(reb.ct, '') END, ' ')) AS clean_md5
FROM documents d0
LEFT JOIN tot ON d0.doc_id = tot.doc_id
LEFT JOIN reb ON d0.doc_id = reb.doc_id
ORDER BY d0.doc_id
"""


# q131: the salt never changes values — plain join + agg is the spec.
ORACLES["q131_adaptive_skew_join"] = """
WITH li AS (
  SELECT CASE WHEN l_suppkey % 2 = 0 THEN 0
              ELSE l_suppkey % 23 END AS grp, l_quantity
  FROM lineitem)
SELECT n_name, count(*) AS n_items,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM li JOIN nation ON li.grp = nation.n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# q132: lead()-gap spec of the grouped-map Pandas stats; integer-µs
# gaps make the even-count median interpolation exact.
ORACLES["q132_grouped_pandas_stats"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
g AS (
  SELECT user_id,
    lead(us) OVER (PARTITION BY user_id ORDER BY us) - us AS gap
  FROM e)
SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
  quantile_cont(gap, 0.5) AS median_gap_us,
  CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id ORDER BY user_id
"""


# q133: DuckDB native ASOF (backward, inclusive) — the spec for the
# cogrouped pandas merge_asof.
ORACLES["q133_cogroup_asof"] = """
WITH p AS (
  SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click')
SELECT p.user_id, p_id, p_us, c.c_us AS click_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.p_us >= c.c_us
ORDER BY p.user_id, p_id
"""


# q134: indexed zip spec of the vectorized-UDF integer dot product.
ORACLES["q134_pandas_udf_dot"] = """
SELECT vec_id,
  CAST(list_sum(list_transform(range(1, len(embedding) + 1),
    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
         * ([-10, 6, 1, -4, -9, 7, 2, -3, -8, 8, 3, -2, -7, 9, 4, -1, -6, 10, 5, 0, -5, -10, 6, 1, -4, -9, 7, 2, -3, -8, 8, 3, -2, -7, 9, 4, -1, -6, 10, 5, 0, -5, -10, 6, 1, -4, -9, 7, 2, -3, -8, 8, 3, -2, -7, 9, 4, -1, -6, 10, 5, 0, -5, -10])[i])) AS BIGINT) AS dot_scaled
FROM embeddings ORDER BY vec_id
"""


# q135: value-range window frames, inclusive µs bounds.
ORACLES["q135_range_frame_window"] = """
WITH b AS (
  SELECT event_id, event_type, epoch_us(ts) AS us,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events)
SELECT event_id, event_type,
  count(*) OVER w AS n_prev_hour,
  CAST(coalesce(sum(vc) OVER w, 0) AS BIGINT) AS sum_prev_hour_c
FROM b
WINDOW w AS (PARTITION BY event_type ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
ORDER BY event_id
"""


# q136: IS NOT DISTINCT FROM — NULL matches NULL.
ORACLES["q136_null_safe_join"] = """
WITH li AS (
  SELECT CASE WHEN l_linestatus = 'F' THEN NULL
              ELSE l_linestatus END AS k, l_quantity
  FROM lineitem)
SELECT label, count(*) AS n,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM li JOIN (VALUES ('O', 'open'), (CAST(NULL AS VARCHAR), 'finished'))
  AS dim(k, label)
  ON li.k IS NOT DISTINCT FROM dim.k
GROUP BY label ORDER BY label
"""


# q137: UNION ALL BY NAME with NULL fill for the missing column.
ORACLES["q137_schema_evolution_union"] = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0),
new AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1),
m AS (SELECT * FROM old UNION ALL BY NAME SELECT * FROM new)
SELECT o_orderstatus, count(*) AS n,
  count(o_orderpriority) AS n_with_priority
FROM m GROUP BY 1 ORDER BY 1
"""


# q138: temperature resampling toward uniform — identical sqrt/floor
# on identical doubles; md5 buckets as in q54/q64.
ORACLES["q138_temperature_mixture"] = """
WITH d AS (
  SELECT doc_id, substr(source, 4, 1) AS domain FROM documents),
c AS (SELECT domain, count(*) AS n_i FROM d GROUP BY 1),
m AS (SELECT min(n_i) AS n_min FROM c),
t AS (
  SELECT domain, n_i,
    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_i AS DOUBLE)) * 10000)
         AS BIGINT) AS thr
  FROM c, m),
k AS (
  SELECT d.domain, t.n_i, t.thr,
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000
       < t.thr) AS keep
  FROM d JOIN t USING (domain))
SELECT domain, CAST(min(n_i) AS BIGINT) AS n_orig,
  CAST(min(thr) AS BIGINT) AS thr,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM k GROUP BY domain ORDER BY domain
"""


# q139: next-power-of-two length buckets via bit length — integer
# exact; padding waste = Σ(bucket − n).
ORACLES["q139_length_buckets"] = f"""
WITH tk AS (
  SELECT doc_id, len({_TOKS}) AS n FROM documents WHERE text IS NOT NULL),
f AS (
  SELECT doc_id, n, CAST(1 << length(bin(n - 1)) AS BIGINT) AS bucket
  FROM tk WHERE n >= 1)
SELECT bucket, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens,
  CAST(sum(bucket - n) AS BIGINT) AS padding_waste
FROM f GROUP BY bucket ORDER BY bucket
"""


# q140: |x − med| > 3·MAD — exact cent/quarter-granular operands.
ORACLES["q140_robust_outliers"] = """
WITH x AS (
  SELECT l_returnflag,
    CAST(floor(l_extendedprice * 100 + 0.5) AS DOUBLE) AS x
  FROM lineitem),
m AS (SELECT l_returnflag, quantile_cont(x, 0.5) AS med FROM x GROUP BY 1),
d AS (
  SELECT x.l_returnflag, x.x, abs(x.x - m.med) AS dv
  FROM x JOIN m USING (l_returnflag)),
md AS (SELECT l_returnflag, quantile_cont(dv, 0.5) AS mad FROM d GROUP BY 1),
f AS (
  SELECT d.l_returnflag, d.x, (d.dv > 3 * md.mad) AS is_outlier
  FROM d JOIN md USING (l_returnflag))
SELECT l_returnflag, count(*) AS n,
  CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  max(CASE WHEN is_outlier THEN x END) AS worst_x
FROM f GROUP BY 1 ORDER BY 1
"""


# q141: three unrolled integer-PageRank iterations (q45 precedent) —
# every step BIGINT // division, bit-identical by construction.
ORACLES["q141_integer_pagerank"] = """
WITH occ AS (
  SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
  FROM events),
e0 AS (
  SELECT DISTINCT a.user_id AS s, b.user_id AS d
  FROM occ a JOIN occ b
    ON a.event_type = b.event_type AND a.h = b.h
   AND a.user_id < b.user_id),
sym AS (SELECT s AS a, d AS b FROM e0 UNION SELECT d, s FROM e0),
deg AS (SELECT a, count(*) AS dg FROM sym GROUP BY 1),
p0 AS (SELECT a, CAST(1000000000000 AS BIGINT) AS p FROM deg),
c1 AS (SELECT p0.a, p0.p // deg.dg AS c FROM p0 JOIN deg USING (a)),
s1 AS (SELECT sym.b AS a, sum(c) AS s FROM sym JOIN c1 ON sym.a = c1.a
       GROUP BY 1),
p1 AS (SELECT a, CAST(150000000000 + (85 * s) // 100 AS BIGINT) AS p
       FROM s1),
c2 AS (SELECT p1.a, p1.p // deg.dg AS c FROM p1 JOIN deg USING (a)),
s2 AS (SELECT sym.b AS a, sum(c) AS s FROM sym JOIN c2 ON sym.a = c2.a
       GROUP BY 1),
p2 AS (SELECT a, CAST(150000000000 + (85 * s) // 100 AS BIGINT) AS p
       FROM s2),
c3 AS (SELECT p2.a, p2.p // deg.dg AS c FROM p2 JOIN deg USING (a)),
s3 AS (SELECT sym.b AS a, sum(c) AS s FROM sym JOIN c3 ON sym.a = c3.a
       GROUP BY 1),
p3 AS (SELECT a, CAST(150000000000 + (85 * s) // 100 AS BIGINT) AS p
       FROM s3)
SELECT a AS node, p FROM p3 ORDER BY node
"""


# q142: six-relation star join, revenue in exact 10^-4 units.
ORACLES["q142_star_join"] = """
SELECT n_name, count(*) AS n_items,
  CAST(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000
                           + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE)
    / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name ORDER BY n_name
"""


# q143: correlated scalar subqueries — exact rational average compare.
ORACLES["q143_scalar_subquery"] = """
SELECT p_partkey, p_brand,
  CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
FROM part p
WHERE CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
      * (SELECT count(*) FROM part q
         WHERE q.p_brand = p.p_brand)
      > (SELECT sum(CAST(floor(q.p_retailprice * 100 + 0.5) AS BIGINT))
         FROM part q WHERE q.p_brand = p.p_brand)
ORDER BY p_partkey
"""


# q144: LATERAL per-nation top-2 by exact cents, id tiebreak.
ORACLES["q144_lateral_topk"] = """
SELECT n.n_name, t.s_suppkey,
  CAST(floor(t.s_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
FROM nation n,
LATERAL (
  SELECT s_suppkey, s_acctbal FROM supplier s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY floor(s.s_acctbal * 100 + 0.5) DESC, s_suppkey ASC
  LIMIT 2
) AS t
ORDER BY n.n_name, bal_c DESC, t.s_suppkey
"""


# q145: typed JSON path extraction — DuckDB's JSON ->> mirrors the
# variant_get('$.k','int') path; integer aggregates are exact.
ORACLES["q145_variant_shred"] = """
WITH s AS (
  SELECT event_type, CAST(props ->> '$.k' AS INT) AS k FROM events)
SELECT event_type, count(*) AS n, count(k) AS n_k,
  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
FROM s GROUP BY event_type ORDER BY event_type
"""


# q146: Count–Min sketch re-derived counter by counter — identical
# row-salted md5 buckets, integer counts, min over rows.
ORACLES["q146_countmin_freq"] = """
WITH keyed AS (
  SELECT l_suppkey, CAST(l_suppkey AS VARCHAR) AS ks
  FROM lineitem WHERE l_suppkey IS NOT NULL),
rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
sketch AS (
  SELECT r, ('0x' || substr(md5('cm' || r || '|' || ks), 1, 7))::BIGINT
           % 256 AS bucket,
         count(*) AS cnt
  FROM keyed CROSS JOIN rows_ GROUP BY r, bucket),
exact_ AS (
  SELECT l_suppkey, ks, count(*) AS n_exact
  FROM keyed GROUP BY l_suppkey, ks),
probe AS (
  SELECT l_suppkey, n_exact, r,
         ('0x' || substr(md5('cm' || r || '|' || ks), 1, 7))::BIGINT
           % 256 AS bucket
  FROM exact_ CROSS JOIN rows_),
est AS (
  SELECT l_suppkey, min(coalesce(cnt, 0)) AS cm_est
  FROM probe LEFT JOIN sketch USING (r, bucket)
  GROUP BY l_suppkey)
SELECT e.l_suppkey, e.n_exact, s.cm_est,
       s.cm_est - e.n_exact AS overcount
FROM exact_ e JOIN est s USING (l_suppkey)
ORDER BY e.l_suppkey
"""


# q147: priority sampling — identical md5 priorities (exact int64
# numerator, one correctly-rounded division), top-51 for τ, top-50
# kept, est = max(w, τ) rounded to whole cents.
ORACLES["q147_priority_sample"] = """
WITH w AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w_c
  FROM orders),
p AS (
  SELECT o_orderkey, w_c,
         CAST(w_c * 268435456 AS DOUBLE)
           / CAST((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))
                     ::BIGINT + 1) AS DOUBLE) AS priority
  FROM w),
topk1 AS (
  SELECT * FROM p ORDER BY priority DESC, o_orderkey ASC LIMIT 51),
tau AS (
  SELECT CASE WHEN count(*) = 51 THEN min(priority) ELSE 0.0 END AS tau
  FROM topk1),
samp AS (
  SELECT * FROM topk1 ORDER BY priority DESC, o_orderkey ASC LIMIT 50)
SELECT o_orderkey, w_c,
       CAST(floor(greatest(CAST(w_c AS DOUBLE), tau) + 0.5) AS BIGINT)
         AS est_c
FROM samp CROSS JOIN tau
ORDER BY o_orderkey
"""


# q148: Simpson / inverse-Simpson — exact integer Σc², n²; one IEEE
# division each (entropy deliberately avoided: libm ln accumulation).
ORACLES["q148_token_diversity"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
tf AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct,
         CAST(sum(c * c) AS BIGINT) AS sum_c2
  FROM tf GROUP BY doc_id)
SELECT doc_id, n_tokens, n_distinct, sum_c2,
  CAST(sum_c2 AS DOUBLE) / CAST(n_tokens * n_tokens AS DOUBLE) AS simpson,
  CAST(n_tokens * n_tokens AS DOUBLE) / CAST(sum_c2 AS DOUBLE) AS eff_vocab
FROM agg ORDER BY doc_id
"""


# q149: BM25 with rational idf — every double op mirrored with the
# same parenthesization (term scores summed term0-then-term1), k1=1.2,
# b=0.75, k1+1 = 2.2 and 1-b = 0.25 as exact literals.
ORACLES["q149_bm25_search"] = f"""
WITH lens AS (
  SELECT doc_id, len({_TOKS}) AS dl FROM documents WHERE text IS NOT NULL),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens),
post AS (
  SELECT doc_id, t, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS t
        FROM documents WHERE text IS NOT NULL)
  WHERE t IN ('spark', 'join') GROUP BY doc_id, t),
dfc AS (SELECT t, count(*) AS df FROM post GROUP BY t),
per_doc AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN t = 'spark' THEN tf END) AS BIGINT) AS tf_0,
         CAST(sum(CASE WHEN t = 'join' THEN tf END) AS BIGINT) AS tf_1,
         CAST(sum(CASE WHEN t = 'spark' THEN df END) AS BIGINT) AS df_0,
         CAST(sum(CASE WHEN t = 'join' THEN df END) AS BIGINT) AS df_1,
         count(*) AS n_terms_hit
  FROM post JOIN dfc USING (t) GROUP BY doc_id),
j AS (
  SELECT per_doc.*, lens.dl, stats.n_docs,
         CAST(stats.sum_dl AS DOUBLE) / CAST(stats.n_docs AS DOUBLE)
           AS avgdl
  FROM per_doc JOIN lens USING (doc_id) CROSS JOIN stats),
scored AS (
  SELECT doc_id, n_terms_hit,
    coalesce(
      ((CAST(n_docs AS DOUBLE) - CAST(df_0 AS DOUBLE) + 0.5)
         / (CAST(df_0 AS DOUBLE) + 0.5))
      * ((CAST(tf_0 AS DOUBLE) * 2.2)
         / (CAST(tf_0 AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))),
      0.0)
    + coalesce(
      ((CAST(n_docs AS DOUBLE) - CAST(df_1 AS DOUBLE) + 0.5)
         / (CAST(df_1 AS DOUBLE) + 0.5))
      * ((CAST(tf_1 AS DOUBLE) * 2.2)
         / (CAST(tf_1 AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))),
      0.0) AS score
  FROM j),
ranked AS (
  SELECT doc_id, n_terms_hit, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored)
SELECT doc_id, n_terms_hit, score, rank
FROM ranked WHERE rank <= 10 ORDER BY rank
"""


# q150: collocation lift — distinct presence, top-30 df vocabulary,
# doc-id self-join with t1 < t2, exact-integer lift ratio.
ORACLES["q150_collocations"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
pres AS (SELECT DISTINCT doc_id, t FROM tok),
dfc AS (SELECT t, count(*) AS c FROM pres GROUP BY t),
vocab AS (SELECT t, c FROM dfc ORDER BY c DESC, t ASC LIMIT 30),
n AS (SELECT count(*) AS n_docs FROM documents),
pv AS (SELECT p.doc_id, p.t FROM pres p JOIN vocab v USING (t)),
pairs AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS c_pair
  FROM pv a JOIN pv b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t HAVING count(*) >= 2),
scored AS (
  SELECT t1, t2, c_pair, v1.c AS c1, v2.c AS c2,
         CAST(c_pair * n_docs AS DOUBLE)
           / CAST(v1.c * v2.c AS DOUBLE) AS lift
  FROM pairs
  JOIN vocab v1 ON v1.t = t1
  JOIN vocab v2 ON v2.t = t2
  CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY lift DESC, t1 ASC, t2 ASC)
              AS rank
  FROM scored)
SELECT t1, t2, c_pair, c1, c2, lift, rank
FROM ranked WHERE rank <= 50 ORDER BY rank
"""


# q151: per-group priority sampling — same md5 priorities, one rank
# window per language, τ_g = 6th priority (k=5), census degeneracy
# via coalesce(τ, 0).
ORACLES["q151_stratified_priority_sample"] = """
WITH d AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE text IS NOT NULL),
p AS (
  SELECT lang, doc_id, n_chars AS w_n,
         CAST(CAST(n_chars AS BIGINT) * 268435456 AS DOUBLE)
           / CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                     ::BIGINT + 1) AS DOUBLE) AS priority
  FROM d),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang
              ORDER BY priority DESC, doc_id ASC) AS rk
  FROM p),
tau AS (
  SELECT lang, max(CASE WHEN rk = 6 THEN priority END) AS tau
  FROM r WHERE rk <= 6 GROUP BY lang)
SELECT r.lang, r.doc_id, r.w_n,
       CAST(floor(greatest(CAST(r.w_n AS DOUBLE), coalesce(tau.tau, 0.0))
                  + 0.5) AS BIGINT) AS est_n
FROM r JOIN tau USING (lang)
WHERE r.rk <= 5
ORDER BY r.lang, r.doc_id
"""


# q152: TWAP — identical lead-window durations (whole epoch seconds),
# exact cent×second integer products, one final division; zero-span
# keys NULL (never 0/0 NaN).
ORACLES["q152_twap"] = """
WITH s AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
st AS (
  SELECT user_id, v_c,
         lead(t_s) OVER (PARTITION BY user_id ORDER BY t_s, v_c)
           - t_s AS dur_s
  FROM s),
a AS (
  SELECT user_id, count(*) AS n_obs,
         CAST(sum(v_c * dur_s) AS BIGINT) AS wsum,
         CAST(sum(dur_s) AS BIGINT) AS span0
  FROM st GROUP BY user_id)
SELECT user_id, n_obs, coalesce(span0, 0) AS span_s,
  CASE WHEN span0 > 0
       THEN CAST(wsum AS DOUBLE) / CAST(span0 AS DOUBLE) END AS twap_c
FROM a ORDER BY user_id
"""


# q153: OHLC — rf=1/rl=1 row_number rows reproduce the struct-ordered
# (t, v) argmin/argmax exactly; all values exact cents.
ORACLES["q153_ohlc_bars"] = """
WITH s AS (
  SELECT user_id AS key, CAST(date_trunc('day', ts) AS DATE) AS bar,
         CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY key, bar ORDER BY t_s, v_c) AS rf,
    row_number() OVER (PARTITION BY key, bar
                       ORDER BY t_s DESC, v_c DESC) AS rl
  FROM s)
SELECT key, strftime(bar, '%Y-%m-%d') AS bar_d, count(*) AS n,
  max(CASE WHEN rf = 1 THEN v_c END) AS open_c,
  max(v_c) AS high_c,
  min(v_c) AS low_c,
  max(CASE WHEN rl = 1 THEN v_c END) AS close_c
FROM r GROUP BY key, bar
ORDER BY key, bar_d
"""


# q154: cumulative uniques — first-seen-then-cumsum identity, exact.
ORACLES["q154_cumulative_uniques"] = """
WITH fs AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL GROUP BY user_id),
pd AS (SELECT day, count(*) AS new_keys FROM fs GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day_s, new_keys,
  CAST(sum(new_keys) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS total_keys
FROM pd ORDER BY day_s
"""


# q155: SemDeDup — the q45 Lloyd unroll gives the assignments; the
# within-cluster pair scan mirrors cosine (list_dot_product fold) and
# the greedy keep-lowest-id rule.
ORACLES["q155_semantic_dedup"] = f"""
WITH asg AS (SELECT * FROM ({_kmeans_sql()})),
ev AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
j AS (
  SELECT a.vec_id, a.cluster_id, ev.v
  FROM asg a JOIN ev ON ev.id = a.vec_id),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM j x JOIN j y
    ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
  WHERE {_IVF_COS.format(a="x.v", b="y.v")} >= 0.4),
dropped AS (SELECT DISTINCT id_b AS id FROM pairs)
SELECT j.vec_id, j.cluster_id,
       CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS kept
FROM j LEFT JOIN dropped d ON d.id = j.vec_id
ORDER BY j.vec_id
"""


# q156: BPE merge candidates — vocabulary roll-up then 1-based
# adjacent character pairs (range(1, len) is end-exclusive, matching
# Spark's 0-based sequence(1, size-1) pairs), exact integer counts.
ORACLES["q156_bpe_merges"] = f"""
WITH wrd AS (SELECT unnest({_TOKS}) AS w FROM documents),
vocab AS (SELECT w, count(*) AS freq FROM wrd GROUP BY w),
cs AS (SELECT string_split(w, '') AS cs, freq FROM vocab),
pr AS (
  SELECT unnest(list_transform(range(1, len(cs)),
                i -> struct_pack(l := cs[i], r := cs[i + 1]))) AS p,
         freq
  FROM cs),
sel AS (SELECT p.l AS lhs, p.r AS rhs, freq FROM pr),
counted AS (
  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM sel GROUP BY lhs, rhs HAVING sum(freq) >= 2),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY pair_count DESC, lhs, rhs)
              AS rank
  FROM counted)
SELECT lhs, rhs, pair_count, rank FROM ranked
WHERE rank <= 20 ORDER BY rank
"""


def _jl_signs_sql(out_dim: int = 8, dim: int = 64, seed: str = "jl") -> list[str]:
    """Re-derive jl_projection's ±1 sign rows independently (md5 of
    'seed|j|i', parity of the first hex nibble) as SQL list literals."""
    import hashlib

    rows = []
    for j in range(out_dim):
        signs = [
            "1"
            if int(
                hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else "-1"
            for i in range(dim)
        ]
        rows.append("[" + ", ".join(f"CAST({s} AS DOUBLE)" for s in signs) + "]")
    return rows


_JL_ROWS = _jl_signs_sql()

# q157: JL sign projection — identical int8 quantization (q66 idiom),
# integer dots via list_dot_product over exact-integer doubles.
ORACLES["q157_jl_projection"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
sc AS (
  SELECT vec_id, v,
    greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) / 127.0
      AS scale
  FROM e),
q AS (
  SELECT vec_id,
    list_transform(v, x -> floor(x / scale + 0.5)) AS ld
  FROM sc)
SELECT vec_id,
  {", ".join(f"CAST(list_dot_product(ld, {row}) AS BIGINT) AS p{j}" for j, row in enumerate(_JL_ROWS))},
  CAST(list_dot_product(ld, ld) AS BIGINT) AS q_self
FROM q ORDER BY vec_id
"""


# q158: HLL inclusion–exclusion — one partials pass with conditional
# slice maxima; every 2^(−M) term exact, fixed left-assoc est sums.
ORACLES["q158_hll_intersect"] = """
WITH pr AS (
  SELECT
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 64
      AS bucket,
    29 - length(bin(
      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 8, 7))::BIGINT))
      AS rank,
    event_type = 'click' AS a,
    event_type = 'view' AS b
  FROM events WHERE user_id IS NOT NULL),
mx AS (
  SELECT bucket,
         max(CASE WHEN a THEN rank END) AS ma,
         max(CASE WHEN b THEN rank END) AS mb
  FROM pr GROUP BY bucket),
s AS (
  SELECT
    count(ma) AS na,
    sum(CASE WHEN ma IS NOT NULL
             THEN 1.0 / CAST(1 << ma AS DOUBLE) END) AS sa,
    count(mb) AS nb,
    sum(CASE WHEN mb IS NOT NULL
             THEN 1.0 / CAST(1 << mb AS DOUBLE) END) AS sb,
    count(CASE WHEN ma IS NOT NULL OR mb IS NOT NULL THEN 1 END) AS nu,
    sum(CASE WHEN ma IS NOT NULL OR mb IS NOT NULL
             THEN 1.0 / CAST(1 << greatest(coalesce(ma, 0),
                                           coalesce(mb, 0)) AS DOUBLE)
        END) AS su
  FROM mx)
SELECT
  2904.064 / (coalesce(sa, 0.0) + CAST(64 - na AS DOUBLE)) AS est_a,
  2904.064 / (coalesce(sb, 0.0) + CAST(64 - nb AS DOUBLE)) AS est_b,
  2904.064 / (coalesce(su, 0.0) + CAST(64 - nu AS DOUBLE)) AS est_union,
  2904.064 / (coalesce(sa, 0.0) + CAST(64 - na AS DOUBLE))
    + 2904.064 / (coalesce(sb, 0.0) + CAST(64 - nb AS DOUBLE))
    - 2904.064 / (coalesce(su, 0.0) + CAST(64 - nu AS DOUBLE))
    AS est_intersect
FROM s
"""


# q159: suffix-chain blocklist — identical dotted synthesis, suffix
# explode at label boundaries, anti-join of matched domains.
ORACLES["q159_domain_blocklist"] = """
WITH d AS (
  SELECT doc_id,
         'd' || CAST(doc_id % 7 AS VARCHAR) || '.' || source || '.com'
           AS dom
  FROM documents),
dd AS (SELECT DISTINCT dom FROM d WHERE dom IS NOT NULL),
suf AS (
  SELECT dom,
         unnest(list_transform(range(0, len(labs)),
                i -> array_to_string(labs[i + 1:], '.'))) AS suffix
  FROM (SELECT dom, string_split(dom, '.') AS labs FROM dd)),
hits AS (
  SELECT DISTINCT dom FROM suf
  WHERE suffix IN ('src3.com', 'src7.com', 'd1.src2.com'))
SELECT doc_id, dom FROM d
WHERE dom NOT IN (SELECT dom FROM hits)
ORDER BY doc_id
"""


# q160: lower weighted median — 2·cum ≥ W on integer weights; the
# qualified-set row order differs across engines for tied values but
# min(value) is invariant (argued in grouped_weighted_median).
ORACLES["q160_weighted_median"] = """
WITH rows_ AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(floor(l_quantity) AS BIGINT) AS qty
  FROM lineitem
  WHERE floor(l_quantity) > 0),
cum AS (
  SELECT l_returnflag, price_c,
         sum(qty) OVER (PARTITION BY l_returnflag ORDER BY price_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM rows_),
tot AS (
  SELECT l_returnflag, CAST(max(c) AS BIGINT) AS w_total
  FROM cum GROUP BY l_returnflag)
SELECT c.l_returnflag,
       CAST(max(t.w_total) AS BIGINT) AS w_total,
       min(c.price_c) AS w_median
FROM cum c JOIN tot t USING (l_returnflag)
WHERE c.c * 2 >= t.w_total
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
"""


# q161: star-contraction components — the fixpoint is the identical
# per-component minimum the q46 closure computes; only the output
# shape differs (id, label).
ORACLES["q161_components_star"] = f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({ORACLES["q32_lsh_neardup_pairs"]})
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (
  SELECT a AS id, least(a, min(b)) AS label FROM reach GROUP BY a)
SELECT id, label FROM comp ORDER BY id
"""


# q162: UDTF chunker re-derived with substr arithmetic — start s is
# emitted iff s = 0 or the previous chunk (s−90, length 120) did not
# already cover the end: s + 30 < len.
ORACLES["q162_udtf_chunks"] = """
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
pos AS (
  SELECT doc_id, text,
         unnest(range(0, greatest(length(text), 1), 90)) AS s
  FROM d)
SELECT doc_id,
       CAST(s / 90 AS INT) AS chunk_id,
       CAST(s + 1 AS INT) AS start_pos,
       substr(text, CAST(s + 1 AS INT), 120) AS piece
FROM pos
WHERE s = 0 OR s + 30 < length(text)
ORDER BY doc_id, chunk_id
"""


# q163: merkle bucket reconciliation — identical md5 buckets and
# 60-bit row hashes, bit_xor fold (order-free), NULL-safe disagree.
ORACLES["q163_changed_buckets"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
         o_orderstatus AS st
  FROM orders),
newt AS (
  SELECT k,
         CASE WHEN k % 997 = 0 THEN price_c + 1 ELSE price_c END
           AS price_c,
         st
  FROM base WHERE k % 499 != 0),
fo AS (
  SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 7))::BIGINT % 64
           AS bucket,
         count(*) AS n_old,
         bit_xor(('0x' || substr(md5(CAST(k AS VARCHAR) || '|'
             || CAST(price_c AS VARCHAR) || '|' || st), 1, 15))::BIGINT)
           AS fp_old
  FROM base GROUP BY 1),
fn AS (
  SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 7))::BIGINT % 64
           AS bucket,
         count(*) AS n_new,
         bit_xor(('0x' || substr(md5(CAST(k AS VARCHAR) || '|'
             || CAST(price_c AS VARCHAR) || '|' || st), 1, 15))::BIGINT)
           AS fp_new
  FROM newt GROUP BY 1)
SELECT bucket, n_old, n_new, fp_old, fp_new
FROM fo FULL OUTER JOIN fn USING (bucket)
WHERE NOT (fp_old IS NOT DISTINCT FROM fp_new
           AND n_old IS NOT DISTINCT FROM n_new)
ORDER BY bucket
"""


# q164: Apriori 2-itemset rules — identical presence/prune/pair
# pipeline, exact-integer support/confidence/lift ratios.
ORACLES["q164_association_rules"] = """
WITH pres AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey % 500 AS i FROM lineitem),
counts AS (SELECT i, count(*) AS c FROM pres GROUP BY i),
freq AS (SELECT * FROM counts WHERE c >= 3),
pruned AS (SELECT p.b, p.i FROM pres p JOIN freq USING (i)),
nb AS (SELECT count(DISTINCT b) AS n_baskets FROM pres),
pairs AS (
  SELECT p1.i AS x, p2.i AS y, count(*) AS support
  FROM pruned p1 JOIN pruned p2 ON p1.b = p2.b AND p1.i < p2.i
  GROUP BY 1, 2 HAVING count(*) >= 3),
rules AS (
  SELECT x AS antecedent, y AS consequent, support FROM pairs
  UNION ALL
  SELECT y AS antecedent, x AS consequent, support FROM pairs),
scored AS (
  SELECT r.antecedent, r.consequent, r.support,
         fa.c AS n_ante, fc.c AS n_cons,
         CAST(r.support AS DOUBLE) / CAST(fa.c AS DOUBLE) AS confidence,
         CAST(r.support * n_baskets AS DOUBLE)
           / CAST(fa.c * fc.c AS DOUBLE) AS lift
  FROM rules r
  JOIN freq fa ON fa.i = r.antecedent
  JOIN freq fc ON fc.i = r.consequent
  CROSS JOIN nb),
ranked AS (
  SELECT *, row_number() OVER (
    ORDER BY lift DESC, antecedent, consequent) AS rank
  FROM scored)
SELECT antecedent, consequent, support, n_ante, n_cons,
       confidence, lift, rank
FROM ranked WHERE rank <= 25 ORDER BY rank
"""


# q165: RFM — quantile_cont boundaries (q59 parity precedent), same
# strict-> bucket comparisons, recency inverted.
ORACLES["q165_rfm_segments"] = """
WITH per_c AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   DATE '2001-12-31') AS r_days,
         count(*) AS f,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS m_c
  FROM orders GROUP BY o_custkey),
b AS (
  SELECT quantile_cont(r_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
         quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fb,
         quantile_cont(m_c, [0.2, 0.4, 0.6, 0.8]) AS mb
  FROM per_c),
scored AS (
  SELECT o_custkey, r_days, f, m_c,
    6 - (1 + CASE WHEN CAST(r_days AS DOUBLE) > rb[1] THEN 1 ELSE 0 END
           + CASE WHEN CAST(r_days AS DOUBLE) > rb[2] THEN 1 ELSE 0 END
           + CASE WHEN CAST(r_days AS DOUBLE) > rb[3] THEN 1 ELSE 0 END
           + CASE WHEN CAST(r_days AS DOUBLE) > rb[4] THEN 1 ELSE 0 END)
      AS r_score,
    1 + CASE WHEN CAST(f AS DOUBLE) > fb[1] THEN 1 ELSE 0 END
      + CASE WHEN CAST(f AS DOUBLE) > fb[2] THEN 1 ELSE 0 END
      + CASE WHEN CAST(f AS DOUBLE) > fb[3] THEN 1 ELSE 0 END
      + CASE WHEN CAST(f AS DOUBLE) > fb[4] THEN 1 ELSE 0 END AS f_score,
    1 + CASE WHEN CAST(m_c AS DOUBLE) > mb[1] THEN 1 ELSE 0 END
      + CASE WHEN CAST(m_c AS DOUBLE) > mb[2] THEN 1 ELSE 0 END
      + CASE WHEN CAST(m_c AS DOUBLE) > mb[3] THEN 1 ELSE 0 END
      + CASE WHEN CAST(m_c AS DOUBLE) > mb[4] THEN 1 ELSE 0 END AS m_score
  FROM per_c CROSS JOIN b)
SELECT o_custkey, r_days, f, m_c, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm
FROM scored ORDER BY o_custkey
"""


# q166: exact containment join — full intersect over all pairs above
# the threshold; the prefix filter is a no-false-negative candidate
# optimization, so the oracle can verify directly from the shingle
# sets (same _SHINGLES derivation as q26).
ORACLES["q166_containment_pairs"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS toks FROM documents
  WHERE text IS NOT NULL),
sh AS (
  SELECT doc_id, {_SHINGLES} AS grams FROM d),
sized AS (SELECT doc_id, grams, len(grams) AS n_sh FROM sh
          WHERE len(grams) >= 1),
exploded AS (SELECT doc_id, n_sh, unnest(grams) AS g FROM sized),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_sh AS n_a, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.g = b.g AND a.doc_id != b.doc_id
  GROUP BY 1, 2, 3)
SELECT id_a, id_b,
       CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
FROM pairs
WHERE CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE) >= 0.6
ORDER BY id_a, id_b
"""


# q167: rolling HLL — daily partials then trailing-window bucket max,
# same exact power-of-two fold as q84/q128.
ORACLES["q167_rolling_hll"] = """
WITH pr AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 64
      AS bucket,
    29 - length(bin(
      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 8, 7))::BIGINT))
      AS rank
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
daily AS (
  SELECT day, bucket, max(rank) AS m FROM pr GROUP BY day, bucket),
days AS (SELECT DISTINCT day FROM daily),
win AS (
  SELECT d.day AS day, p.bucket, max(p.m) AS m
  FROM days d JOIN daily p
    ON p.day <= d.day AND p.day > d.day - 7
  GROUP BY d.day, p.bucket),
s AS (
  SELECT day, count(*) AS n_buckets,
         sum(1.0 / CAST(1 << m AS DOUBLE)) AS sum_present
  FROM win GROUP BY day)
SELECT strftime(day, '%Y-%m-%d') AS day_s, n_buckets,
  2904.064 / (sum_present + CAST(64 - n_buckets AS DOUBLE)) AS hll_raw
FROM s ORDER BY day_s
"""


# q168: Markov transitions — identical (ts, event_id) ordering, exact
# count ratios.
ORACLES["q168_markov_transitions"] = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS nxt
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
steps AS (
  SELECT event_type AS state, nxt AS next FROM seq WHERE nxt IS NOT NULL),
counts AS (
  SELECT state, next, count(*) AS n_trans FROM steps GROUP BY 1, 2),
tot AS (
  SELECT state, CAST(sum(n_trans) AS BIGINT) AS n_from
  FROM counts GROUP BY state)
SELECT c.state, c.next, c.n_trans, t.n_from,
       CAST(c.n_trans AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM counts c JOIN tot t USING (state)
ORDER BY c.state, c.next
"""


# q169: shard shuffle — identical md5 shard + md5-hex rank order
# (hex strings compare identically as ASCII in both engines).
ORACLES["q169_shuffle_shards"] = """
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                ::BIGINT % 16 AS INT) AS shard
  FROM documents)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard
              ORDER BY hk, doc_id) AS BIGINT) AS shard_rank
FROM h ORDER BY shard, shard_rank
"""


# q170: URL canonicalization — identical RE2/Java-portable regexes,
# same synthesis, same default-port and www/trailing-slash rules.
ORACLES["q170_url_normalize"] = r"""
WITH urls AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END)
    || source || '.Example.COM'
    || (CASE WHEN doc_id % 3 = 0 THEN ':443'
             WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END)
    || '/Docs/' || CAST(doc_id AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || '?utm=x#frag' AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
    lower(nullif(regexp_extract(url,
      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
    regexp_replace(lower(nullif(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1), '')),
      '^www\.', '') AS host,
    nullif(regexp_extract(url,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1), '') AS port,
    CASE WHEN nullif(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1), '') IS NOT NULL
         THEN regexp_replace(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '')
    END AS path
  FROM urls),
sited AS (
  SELECT *, string_split(host, '.') AS labs FROM parts)
SELECT doc_id, url, scheme, host,
  CASE WHEN len(labs) >= 2 THEN labs[-2] || '.' || labs[-1]
       ELSE host END AS site,
  path,
  CASE WHEN scheme IS NOT NULL AND host IS NOT NULL THEN
    scheme || '://' || host
    || (CASE WHEN port IS NOT NULL
              AND NOT ((scheme = 'http' AND port = '80')
                       OR (scheme = 'https' AND port = '443'))
         THEN ':' || port ELSE '' END)
    || path
  END AS url_norm
FROM sited ORDER BY doc_id
"""


# q171: χ² independence — same exact marginals, same (O−E)²/E chain,
# same 1e-9 fixed-point order-free cross-cell sum.
ORACLES["q171_chi_square"] = """
WITH ev AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL),
obs AS (
  SELECT event_type AS a, dow AS b, count(*) AS n_obs
  FROM ev GROUP BY 1, 2),
grid AS (
  SELECT a, b FROM (SELECT DISTINCT a FROM obs)
  CROSS JOIN (SELECT DISTINCT b FROM obs)),
cells AS (
  SELECT g.a, g.b, coalesce(o.n_obs, 0) AS n_obs
  FROM grid g LEFT JOIN obs o ON g.a = o.a AND g.b = o.b),
rt AS (SELECT a, CAST(sum(n_obs) AS BIGINT) AS ra FROM cells GROUP BY a),
ct AS (SELECT b, CAST(sum(n_obs) AS BIGINT) AS cb FROM cells GROUP BY b),
tot AS (
  SELECT CAST(sum(n_obs) AS BIGINT) AS n,
         count(DISTINCT a) AS nr, count(DISTINCT b) AS nc
  FROM cells),
j AS (
  SELECT c.a, c.b, c.n_obs,
         CAST(rt.ra * ct.cb AS DOUBLE) / CAST(tot.n AS DOUBLE) AS n_exp,
         tot.n, tot.nr, tot.nc
  FROM cells c JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot),
q AS (
  SELECT a, b, n_obs, n_exp,
         (CAST(n_obs AS DOUBLE) - n_exp) * (CAST(n_obs AS DOUBLE) - n_exp)
           / n_exp AS cell_chi2,
         CAST(floor(((CAST(n_obs AS DOUBLE) - n_exp)
                     * (CAST(n_obs AS DOUBLE) - n_exp) / n_exp)
                    * 1000000000.0 + 0.5) AS BIGINT) AS qq,
         n, nr, nc
  FROM j),
total AS (
  SELECT CAST(sum(qq) AS DOUBLE) / 1000000000.0 AS chi2,
         max((nr - 1) * (nc - 1)) AS dof, max(n) AS n
  FROM q)
SELECT q.a, q.b, q.n_obs, q.n_exp, q.cell_chi2,
       total.chi2, total.dof, total.n
FROM q CROSS JOIN total
ORDER BY q.a, q.b
"""


# q172: weighted quantiles — same cum window, same D=1e6 common-
# denominator integer rule per probability.
ORACLES["q172_weighted_quantiles"] = """
WITH rows_ AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(floor(l_quantity) AS BIGINT) AS qty
  FROM lineitem WHERE floor(l_quantity) > 0),
cum AS (
  SELECT l_returnflag, price_c,
         sum(qty) OVER (PARTITION BY l_returnflag ORDER BY price_c
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM rows_),
tot AS (
  SELECT l_returnflag, CAST(max(c) AS BIGINT) AS w_total
  FROM cum GROUP BY l_returnflag)
SELECT c.l_returnflag,
  CAST(max(t.w_total) AS BIGINT) AS w_total,
  min(CASE WHEN c.c * 1000000 >= 100000 * t.w_total
           THEN c.price_c END) AS q10,
  min(CASE WHEN c.c * 1000000 >= 500000 * t.w_total
           THEN c.price_c END) AS q50,
  min(CASE WHEN c.c * 1000000 >= 900000 * t.w_total
           THEN c.price_c END) AS q90
FROM cum c JOIN tot t USING (l_returnflag)
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
"""


# q173: A/B readout — identical md5 arm salt, exact integer n/Σv/Σv²,
# Welch t re-derived with the same parenthesization.
ORACLES["q173_ab_test"] = """
WITH armed AS (
  SELECT ('0x' || substr(md5('exp1|' || CAST(user_id AS VARCHAR)), 1, 7))
           ::BIGINT % 2 AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE floor(value * 100 + 0.5) IS NOT NULL),
per_arm AS (
  SELECT arm, count(*) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v * v) AS BIGINT) AS s2
  FROM armed GROUP BY arm),
wide AS (
  SELECT
    max(CASE WHEN arm = 0 THEN n END) AS n_a,
    max(CASE WHEN arm = 0 THEN s1 END) AS s1_a,
    max(CASE WHEN arm = 0 THEN s2 END) AS s2_a,
    max(CASE WHEN arm = 1 THEN n END) AS n_b,
    max(CASE WHEN arm = 1 THEN s1 END) AS s1_b,
    max(CASE WHEN arm = 1 THEN s2 END) AS s2_b
  FROM per_arm)
SELECT n_a, n_b,
  CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
  CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
  (CAST(s2_a AS DOUBLE)
     - (CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE))
       / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
  (CAST(s2_b AS DOUBLE)
     - (CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE))
       / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b,
  CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE)
    - CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS diff,
  (CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE)
     - CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))
  / sqrt(
      ((CAST(s2_a AS DOUBLE)
          - (CAST(s1_a AS DOUBLE) * CAST(s1_a AS DOUBLE))
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        / CAST(n_a AS DOUBLE)
      + ((CAST(s2_b AS DOUBLE)
            - (CAST(s1_b AS DOUBLE) * CAST(s1_b AS DOUBLE))
              / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
          / CAST(n_b AS DOUBLE)) AS t
FROM wide
"""


# q174: Benford — identical literal probabilities (CPython log10 at
# oracle-authoring time, parsed as the same doubles), complete digit
# grid, fixed-point order-free χ² sum.
ORACLES["q174_benford"] = """
WITH v AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders),
counts AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n_obs
  FROM v WHERE c > 0 GROUP BY 1),
expected(digit, p_expected) AS (VALUES
  (1, 0.3010299956639812), (2, 0.17609125905568124),
  (3, 0.12493873660829992), (4, 0.09691001300805642),
  (5, 0.07918124604762482), (6, 0.06694678963061322),
  (7, 0.05799194697768673), (8, 0.05115252244738129),
  (9, 0.04575749056067514)),
full_ AS (
  SELECT e.digit, e.p_expected, coalesce(c.n_obs, 0) AS n_obs
  FROM expected e LEFT JOIN counts c USING (digit)),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM full_),
j AS (
  SELECT f.digit, f.n_obs, f.p_expected,
         f.p_expected * CAST(t.n AS DOUBLE) AS n_expected, t.n
  FROM full_ f CROSS JOIN tot t),
q AS (
  SELECT *,
    (CAST(n_obs AS DOUBLE) - n_expected)
      * (CAST(n_obs AS DOUBLE) - n_expected) / n_expected AS cell_chi2,
    CAST(floor(((CAST(n_obs AS DOUBLE) - n_expected)
                * (CAST(n_obs AS DOUBLE) - n_expected) / n_expected)
               * 1000000000.0 + 0.5) AS BIGINT) AS qq
  FROM j),
total AS (
  SELECT CAST(sum(qq) AS DOUBLE) / 1000000000.0 AS chi2, max(n) AS n
  FROM q)
SELECT q.digit, q.n_obs, q.p_expected, q.n_expected, q.cell_chi2,
       total.chi2, total.n
FROM q CROSS JOIN total
ORDER BY q.digit
"""


# q175: priority-sampling estimator audit — the q147 sample machinery
# re-derived, per-row cent rounding before the (order-free) sums.
ORACLES["q175_priority_sample_eval"] = """
WITH w AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w_c
  FROM orders),
p AS (
  SELECT o_orderkey, w_c,
         CAST(w_c * 268435456 AS DOUBLE)
           / CAST((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))
                     ::BIGINT + 1) AS DOUBLE) AS priority
  FROM w),
topk1 AS (
  SELECT * FROM p ORDER BY priority DESC, o_orderkey ASC LIMIT 101),
tau AS (
  SELECT CASE WHEN count(*) = 101 THEN min(priority) ELSE 0.0 END AS tau
  FROM topk1),
samp AS (
  SELECT * FROM topk1 ORDER BY priority DESC, o_orderkey ASC LIMIT 100),
est AS (
  SELECT w.o_orderpriority, count(*) AS n_sampled,
         CAST(sum(CAST(floor(greatest(CAST(s.w_c AS DOUBLE), tau.tau)
                             + 0.5) AS BIGINT)) AS BIGINT) AS est_c
  FROM samp s CROSS JOIN tau
  JOIN w ON w.o_orderkey = s.o_orderkey
  GROUP BY w.o_orderpriority),
truth AS (
  SELECT o_orderpriority, CAST(sum(w_c) AS BIGINT) AS true_c,
         count(*) AS n_rows
  FROM w GROUP BY o_orderpriority)
SELECT t.o_orderpriority, t.n_rows, t.true_c,
       coalesce(e.n_sampled, 0) AS n_sampled,
       coalesce(e.est_c, 0) AS est_c
FROM truth t LEFT JOIN est e USING (o_orderpriority)
ORDER BY t.o_orderpriority
"""


# q176: grid distance join — exact verify over ALL pairs (the grid is
# a no-false-negative candidate optimization, so the oracle checks the
# predicate directly from the md5 coordinates).
ORACLES["q176_grid_distance_join"] = """
WITH pts AS (
  SELECT c_custkey AS id,
    ('0x' || substr(md5('gx|' || CAST(c_custkey AS VARCHAR)), 1, 7))
      ::BIGINT % 10000 AS x,
    ('0x' || substr(md5('gy|' || CAST(c_custkey AS VARCHAR)), 1, 7))
      ::BIGINT % 10000 AS y
  FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500
ORDER BY id_a, id_b
"""


# q177: ingest admission — exact via the q25 fingerprint, near via the
# q86 cross-corpus machinery (reused as a subquery), exact-beats-near.
ORACLES["q177_ingest_admission"] = f"""
WITH near AS (
  SELECT probe_id FROM ({ORACLES["q86_decontaminate"]})
  WHERE n_matches > 0),
corp AS (
  SELECT DISTINCT md5({_NORM}) AS fp FROM documents
  WHERE doc_id % 2 = 0 AND text IS NOT NULL),
newd AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents WHERE doc_id % 2 = 1)
SELECT doc_id,
  CASE WHEN fp IN (SELECT fp FROM corp) THEN 'exact_dup'
       WHEN doc_id IN (SELECT probe_id FROM near) THEN 'near_dup'
       ELSE 'admitted' END AS status
FROM newd ORDER BY doc_id
"""


# q178: the SAME classification as q177 — the oracle pins that the
# persisted-state path (build_corpus_state + admit_new_documents(
# corpus_state=...)) is answer-identical to the bootstrap path.
ORACLES["q178_admission_with_state"] = ORACLES["q177_ingest_admission"]


# q179: rational unigram surprisal — same tokenization, same 1e-6
# fixed-point of the exact N/c_w division, same order-free bigint sums.
ORACLES["q179_unigram_surprisal"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
tf AS (SELECT doc_id, t, count(*) AS c_dt FROM tok GROUP BY 1, 2),
vocab AS (SELECT t, CAST(sum(c_dt) AS BIGINT) AS c_w FROM tf GROUP BY t),
tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM vocab),
contrib AS (
  SELECT doc_id, c_dt,
         c_dt * CAST(floor(CAST(n_total AS DOUBLE) / CAST(c_w AS DOUBLE)
                           * 1000000.0 + 0.5) AS BIGINT) AS micro_tot
  FROM tf JOIN vocab USING (t) CROSS JOIN tot)
SELECT doc_id,
       CAST(sum(c_dt) AS BIGINT) AS n_tokens,
       CAST(sum(micro_tot) AS BIGINT) AS sum_micro,
       CAST(sum(micro_tot) AS DOUBLE)
         / CAST(CAST(sum(c_dt) AS BIGINT) * 1000000 AS DOUBLE) AS surprisal
FROM contrib GROUP BY doc_id ORDER BY doc_id
"""


# q180: domain × top-20-token χ² — q171's exactness chain with a
# deterministically tie-broken (count desc, token asc) vocabulary.
ORACLES["q180_vocab_drift"] = f"""
WITH tok AS (SELECT source AS dom, unnest({_TOKS}) AS t FROM documents),
vc AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
vocab AS (
  SELECT t FROM (
    SELECT t, row_number() OVER (ORDER BY c DESC, t ASC) AS rk FROM vc)
  WHERE rk <= 20),
obs AS (
  SELECT dom AS a, t AS b, count(*) AS n_obs
  FROM tok JOIN vocab USING (t) GROUP BY 1, 2),
grid AS (
  SELECT a, b FROM (SELECT DISTINCT a FROM obs)
  CROSS JOIN (SELECT DISTINCT b FROM obs)),
cells AS (
  SELECT g.a, g.b, coalesce(o.n_obs, 0) AS n_obs
  FROM grid g LEFT JOIN obs o ON g.a = o.a AND g.b = o.b),
rt AS (SELECT a, CAST(sum(n_obs) AS BIGINT) AS ra FROM cells GROUP BY a),
ct AS (SELECT b, CAST(sum(n_obs) AS BIGINT) AS cb FROM cells GROUP BY b),
tot AS (
  SELECT CAST(sum(n_obs) AS BIGINT) AS n,
         count(DISTINCT a) AS nr, count(DISTINCT b) AS nc
  FROM cells),
j AS (
  SELECT c.a, c.b, c.n_obs,
         CAST(rt.ra * ct.cb AS DOUBLE) / CAST(tot.n AS DOUBLE) AS n_exp,
         tot.n, tot.nr, tot.nc
  FROM cells c JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot),
q AS (
  SELECT a, b, n_obs, n_exp,
         (CAST(n_obs AS DOUBLE) - n_exp) * (CAST(n_obs AS DOUBLE) - n_exp)
           / n_exp AS cell_chi2,
         CAST(floor(((CAST(n_obs AS DOUBLE) - n_exp)
                     * (CAST(n_obs AS DOUBLE) - n_exp) / n_exp)
                    * 1000000000.0 + 0.5) AS BIGINT) AS qq,
         n, nr, nc
  FROM j),
total AS (
  SELECT CAST(sum(qq) AS DOUBLE) / 1000000000.0 AS chi2,
         max((nr - 1) * (nc - 1)) AS dof, max(n) AS n
  FROM q)
SELECT q.a AS domain, q.b AS token, q.n_obs, q.n_exp, q.cell_chi2,
       total.chi2, total.dof, total.n
FROM q CROSS JOIN total
ORDER BY domain, token
"""


# q181: sqrt-weighted largest-remainder budget split — sqrt is IEEE
# correctly-rounded (identical across engines), everything else pure
# integer arithmetic.
ORACLES["q181_temperature_mix"] = """
WITH nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
w AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS sqrt_micro
  FROM nd),
tot AS (SELECT CAST(sum(sqrt_micro) AS BIGINT) AS t FROM w),
base AS (
  SELECT source, n_docs, sqrt_micro,
         (1000 * sqrt_micro) // t AS base_alloc,
         (1000 * sqrt_micro) % t AS remainder
  FROM w CROSS JOIN tot),
lo AS (SELECT 1000 - CAST(sum(base_alloc) AS BIGINT) AS leftover FROM base),
rk AS (
  SELECT *, row_number() OVER (ORDER BY remainder DESC, source ASC) AS r
  FROM base)
SELECT source, n_docs, sqrt_micro, base_alloc, remainder,
       base_alloc + (CASE WHEN r <= leftover THEN 1 ELSE 0 END) AS alloc
FROM rk CROSS JOIN lo ORDER BY source
"""


# q182: daily-count anomalies — n-scaled integer deviation vs one
# IEEE sqrt threshold; no variance ratio, no float accumulation.
ORACLES["q182_count_anomalies"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
stats AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY event_type)
SELECT d.event_type, d.day, d.c, s.n_days,
       d.c * s.n_days - s.s1 AS dev_n,
       3.0 * sqrt(CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE)) AS thresh,
       CAST(abs(d.c * s.n_days - s.s1) AS DOUBLE)
         > 3.0 * sqrt(CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE))
         AS is_anomaly
FROM daily d JOIN stats s USING (event_type)
ORDER BY d.event_type, d.day
"""


# q183: MAD outliers — the q160 lower-median cumulative rule applied
# twice (value, then |value − median|), then an all-integer flag.
ORACLES["q183_mad_outliers"] = """
WITH rows_ AS (
  SELECT o_orderpriority AS g,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
cum AS (
  SELECT g, v, sum(1) OVER (PARTITION BY g ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM rows_),
tot AS (SELECT g, CAST(max(cw) AS BIGINT) AS n FROM cum GROUP BY g),
med AS (
  SELECT c.g, min(c.v) AS med
  FROM cum c JOIN tot t USING (g)
  WHERE c.cw * 2 >= t.n GROUP BY c.g),
dev AS (
  SELECT r.g, r.v, abs(r.v - m.med) AS d, m.med
  FROM rows_ r JOIN med m USING (g)),
cumd AS (
  SELECT g, d, sum(1) OVER (PARTITION BY g ORDER BY d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM dev),
totd AS (SELECT g, CAST(max(cw) AS BIGINT) AS n FROM cumd GROUP BY g),
mad AS (
  SELECT c.g, min(c.d) AS mad
  FROM cumd c JOIN totd t USING (g)
  WHERE c.cw * 2 >= t.n GROUP BY c.g)
SELECT d.g AS o_orderpriority,
       count(*) AS n,
       max(d.med) AS med,
       max(m.mad) AS mad,
       CAST(sum(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m USING (g)
GROUP BY d.g ORDER BY o_orderpriority
"""


# q184: ROLLUP subtotal cube — GROUPING() bitmask built identically
# (msb = first dim), rolled-up slots coalesced to 'ALL', exact
# integer-cent sums.
ORACLES["q184_dimensional_rollup"] = """
SELECT coalesce(CAST(l_returnflag AS VARCHAR), 'ALL') AS l_returnflag,
       coalesce(CAST(l_linestatus AS VARCHAR), 'ALL') AS l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) * 2
         + CAST(GROUPING(l_linestatus) AS BIGINT) AS level,
       count(*) AS n_rows,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_c
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY level, l_returnflag, l_linestatus
"""


# q185: rolling 7-day RANGE window on a tz-free day number — exact
# integer window sums, one division.
ORACLES["q185_rolling_daily"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c,
         date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
           AS daynum
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2, 4)
SELECT event_type, day, c,
       CAST(sum(c) OVER w AS BIGINT) AS roll_sum,
       CAST(count(*) OVER w AS BIGINT) AS roll_days,
       CAST(CAST(sum(c) OVER w AS BIGINT) AS DOUBLE)
         / CAST(count(*) OVER w AS DOUBLE) AS roll_avg
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY daynum
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


# q186: CUSUM drift — prefix sum minus floored prefix min of the
# n-scaled integer deviations; one sqrt threshold (q182's).
ORACLES["q186_cusum_drift"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
stats AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY event_type),
dev AS (
  SELECT d.event_type, d.day, d.c,
         d.c * s.n_days - s.s1 AS dd, s.n_days, s.s1, s.s2
  FROM daily d JOIN stats s USING (event_type)),
pre1 AS (
  SELECT *, CAST(sum(dd) OVER w AS BIGINT) AS p
  FROM dev
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
pre AS (
  SELECT *, CAST(min(least(p, 0)) OVER w2 AS BIGINT) AS pmin
  FROM pre1
  WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, day, c,
       p - pmin AS cusum_n,
       4.0 * sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)) AS thresh,
       CAST(p - pmin AS DOUBLE)
         > 4.0 * sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)) AS drifted
FROM pre ORDER BY event_type, day
"""


# q187: exact stratified split — same md5 shuffle order, same integer
# DIV quotas.
ORACLES["q187_stratified_split"] = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents),
counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
SELECT r.doc_id, r.source,
       CASE WHEN r.rn <= (c.n * 80) // 100 THEN 'train'
            WHEN r.rn <= (c.n * 90) // 100 THEN 'val'
            ELSE 'test' END AS split
FROM ranked r JOIN counts c USING (source)
ORDER BY r.doc_id
"""


# q188: grouped Pearson r — decimal-exact sufficient statistics, the
# identical fixed-order double chain (two sqrts, one division).
ORACLES["q188_grouped_correlation"] = """
WITH li AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey),
pairs AS (
  SELECT o.o_orderpriority AS g,
         CAST(li.n_lines AS HUGEINT) AS x,
         CAST(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
              AS HUGEINT) AS y
  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey),
agg AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY g)
SELECT g AS o_orderpriority,
       CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
         THEN CAST(n * sxy - sx * sy AS DOUBLE)
              / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS r
FROM agg ORDER BY o_orderpriority
"""


# q189: per-segment Gini of order spend — row_number ranks over exact
# cents (tie-broken on orderkey; tied values make the rank-weighted
# sum order-invariant anyway), HUGEINT sufficient statistics, one
# final division mirroring Spark's decimal(38,0) path.
ORACLES["q189_gini_concentration"] = """
WITH x AS (
  SELECT c.c_mktsegment AS mktsegment,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o.o_orderkey AS k
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
r AS (
  SELECT mktsegment, cents,
         row_number() OVER (
           PARTITION BY mktsegment ORDER BY cents, k) AS i
  FROM x),
a AS (
  SELECT mktsegment, count(*) AS n,
         sum(CAST(cents AS HUGEINT)) AS s,
         sum(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS si
  FROM r GROUP BY 1)
SELECT mktsegment, n,
       CAST(2 * si - (n + 1) * s AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * s AS DOUBLE) AS gini
FROM a ORDER BY mktsegment
"""


# q190: exact self-join cardinality forecast from the per-user count
# histogram — sum/max of count products, one division for the skew
# ratio.
ORACLES["q190_join_cardinality"] = """
WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
SELECT count(*) AS n_keys,
       sum(c * c) AS est_rows,
       max(c * c) AS max_key_product,
       CAST(max(c * c) * count(*) AS DOUBLE)
         / CAST(sum(c * c) AS DOUBLE) AS skew_ratio
FROM c
"""


# q191: monthly zone maps + prune audit — epoch-day/cent min-max per
# month bucket; a bucket is prunable for `stat > lit` when max <= lit
# and for `stat >= lit` when max < lit (the parquet row-group rule).
ORACLES["q191_zone_map_pruning"] = """
SELECT strftime(o_orderdate, '%Y-%m') AS bucket,
       count(*) AS n_rows,
       min(date_diff('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE))) AS min_day,
       max(date_diff('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE))) AS max_day,
       min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS min_cents,
       max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_cents,
       max(date_diff('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE))) < 10957 AS prune_date,
       max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         <= 49000000 AS prune_price
FROM orders GROUP BY 1 ORDER BY bucket
"""


# q192: exact phrase search over normalized tokens — 1-based ordinal
# positions via the parallel-unnest zip of (token list, range list)
# (Spark's posexplode is 0-based; the self-join offset is identical
# either way).
ORACLES["q192_phrase_search"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS ts
  FROM documents WHERE text IS NOT NULL),
toks AS (
  SELECT doc_id, unnest(ts) AS tok,
         unnest(range(1, len(ts) + 1)) AS idx
  FROM d)
SELECT a.doc_id, count(*) AS n_hits
FROM toks a
JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
WHERE a.tok = 'hash' AND b.tok = 'join'
GROUP BY 1 ORDER BY a.doc_id
"""


# q193: add-one bigram LM — independent implementation: positional
# self-join on (doc, idx+1) instead of Spark's tail-zip; window sum
# for c_prev; scalar-subquery vocab; identical final division.
ORACLES["q193_bigram_lm"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS ts
  FROM documents WHERE text IS NOT NULL),
toks AS (
  SELECT doc_id, unnest(ts) AS tok,
         unnest(range(1, len(ts) + 1)) AS idx
  FROM d),
bg AS (
  SELECT a.tok AS w1, b.tok AS w2, count(*) AS c_bigram
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
  GROUP BY 1, 2),
v AS (SELECT count(DISTINCT tok) AS vocab FROM toks)
SELECT w1, w2, c_bigram,
       sum(c_bigram) OVER (PARTITION BY w1) AS c_prev,
       vocab,
       CAST(c_bigram + 1 AS DOUBLE)
         / CAST(sum(c_bigram) OVER (PARTITION BY w1) + vocab AS DOUBLE)
         AS p_smoothed
FROM bg, v ORDER BY w1, w2
"""


# q194: linear multi-touch attribution — the quadratic formulation
# (touch × later conversions, QUALIFY nearest) as the independent
# check of Spark's linear union-window carry; identical
# largest-remainder split so credited cents conserve exactly.
ORACLES["q194_linear_attribution"] = """
WITH e AS (
  SELECT event_id AS eid, user_id AS k, epoch_us(ts) AS us, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(json_extract_string(props, '$.k') AS INT) % 5 AS channel
  FROM events),
conv AS (SELECT * FROM e WHERE event_type = 'purchase'),
touch AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
assigned AS (
  SELECT t.eid AS teid, t.us AS tus, t.channel,
         c.eid AS conv_id, c.cents
  FROM touch t
  JOIN conv c ON c.k = t.k AND c.us >= t.us
             AND c.us - t.us <= 86400000000
  QUALIFY row_number() OVER (
    PARTITION BY t.eid ORDER BY c.us, c.eid) = 1),
credits AS (
  SELECT channel,
         cents // n
           + CASE WHEN rn <= abs(cents % n)
                  THEN CASE WHEN cents % n > 0 THEN 1
                            WHEN cents % n < 0 THEN -1 ELSE 0 END
                  ELSE 0 END
           AS credit
  FROM (
    SELECT channel, cents,
           count(*) OVER (PARTITION BY conv_id) AS n,
           row_number() OVER (
             PARTITION BY conv_id ORDER BY tus, teid) AS rn
    FROM assigned)),
direct AS (
  SELECT -1 AS channel, cents AS credit
  FROM conv WHERE eid NOT IN (SELECT conv_id FROM assigned)),
unioned AS (
  SELECT * FROM credits UNION ALL SELECT * FROM direct)
SELECT channel, count(*) AS n_credits, sum(credit) AS credited_cents
FROM unioned GROUP BY 1 ORDER BY channel
"""


# q195: per-user run-length encoding — the lead/lag islands SQL as the
# independent check of Spark's flag-cumsum form; identical (us,
# event_id) ordering, epoch-micro integers throughout.
ORACLES["q195_event_runs"] = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
  FROM events),
flagged AS (
  SELECT user_id, us, event_id, event_type,
    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
         THEN 1 ELSE 0 END AS nf
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
runs AS (
  SELECT user_id, us, event_type,
    sum(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS run_seq
  FROM flagged)
SELECT user_id, run_seq, min(event_type) AS state,
       count(*) AS run_len, min(us) AS start_us, max(us) AS end_us
FROM runs GROUP BY 1, 2 ORDER BY user_id, run_seq
"""


# q196: gaps in the click-id ledger — the single lead-window
# formulation as the independent check of Spark's anti-join boundary
# pairing.
ORACLES["q196_sequence_gaps"] = """
WITH ids AS (
  SELECT DISTINCT event_id AS i FROM events WHERE event_type = 'click'),
nxt AS (SELECT i, lead(i) OVER (ORDER BY i) AS nx FROM ids)
SELECT i + 1 AS gap_start, nx - 1 AS gap_end, nx - i - 1 AS missing
FROM nxt WHERE nx > i + 1 ORDER BY gap_start
"""


# q197: the streaming upsert sink's converged table — last-writer-wins
# per user by (epoch_us, event_id), batch-split-invariant, so the
# batch QUALIFY window is the exact oracle for the streamed protocol.
ORACLES["q197_streaming_upsert"] = """
SELECT user_id, epoch_us(ts) AS us, event_id, event_type
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
ORDER BY user_id
"""


# q198: deterministic Poisson bootstrap — weights re-derived from the
# same 28-bit md5-uniform and the same literal Poisson(1) CDF the
# operator freezes; 32 resamples as 64 integer aggregates, interval by
# list order statistics (no quantile interpolation).
def _q198_sql(b: int = 32, trim: int = 1) -> str:
    from db_factfinder_spark.operators.bootstrap import POISSON1_CDF

    def w(i: int) -> str:
        grp, slot = divmod(i, 4)
        u = (
            "(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' ||"
            f" '{grp}'), {1 + 7 * slot}, 7))::BIGINT / 268435456.0)"
        )
        cases = " ".join(
            f"WHEN {u} < {POISSON1_CDF[k]!r} THEN {k}"
            for k in range(len(POISSON1_CDF))
        )
        return f"(CASE {cases} ELSE 5 END)"

    aggs = ", ".join(
        f"sum({w(i)} * cents) AS wx{i}, sum({w(i)}) AS w{i}"
        for i in range(b)
    )
    means = ", ".join(
        f"CASE WHEN w{i} > 0 THEN CAST(wx{i} AS DOUBLE) / CAST(w{i} AS"
        f" DOUBLE) END"
        for i in range(b)
    )
    return f"""
WITH x AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderkey
  FROM orders),
a AS (
  SELECT o_orderpriority, count(*) AS n, sum(cents) AS sx, {aggs}
  FROM x GROUP BY 1),
m AS (
  SELECT o_orderpriority, n, sx,
         list_sort(list_filter([{means}], v -> v IS NOT NULL)) AS ms
  FROM a)
SELECT o_orderpriority, n,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
       ms[{trim + 1}] AS ci_lo, ms[-{trim + 1}] AS ci_hi
FROM m ORDER BY o_orderpriority
"""


ORACLES["q198_bootstrap_ci"] = _q198_sql()


# q199: two phrase queries over one postings index — each phrase's
# block is the q192 positional-join shape; the reuse being audited is
# a plan property, so the oracle just answers both phrases.
ORACLES["q199_phrase_index_reuse"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS ts
  FROM documents WHERE text IS NOT NULL),
toks AS (
  SELECT doc_id, unnest(ts) AS tok,
         unnest(range(1, len(ts) + 1)) AS idx
  FROM d),
hj AS (
  SELECT 'hash join' AS phrase, a.doc_id, count(*) AS n_hits
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
  WHERE a.tok = 'hash' AND b.tok = 'join' GROUP BY 2),
ts_ AS (
  SELECT 'table scan' AS phrase, a.doc_id, count(*) AS n_hits
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
  WHERE a.tok = 'table' AND b.tok = 'scan' GROUP BY 2)
SELECT * FROM hj UNION ALL SELECT * FROM ts_
ORDER BY phrase, doc_id
"""


# q200: NEAR/3 proximity — the quadratic position inequality join as
# the independent check of Spark's position-band bucketed equi-join.
ORACLES["q200_proximity_search"] = f"""
WITH d AS (
  SELECT doc_id, {_NORMTOKS} AS ts
  FROM documents WHERE text IS NOT NULL),
toks AS (
  SELECT doc_id, unnest(ts) AS tok,
         unnest(range(1, len(ts) + 1)) AS idx
  FROM d)
SELECT a.doc_id, count(*) AS n_pairs
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id AND abs(a.idx - b.idx) <= 3
WHERE a.tok = 'spark' AND b.tok = 'join'
GROUP BY 1 ORDER BY a.doc_id
"""


# q201: v1→v2 snapshot diff — v1 is last-writer-wins over the first
# half of the epoch range (integer-div midpoint), v2 over everything;
# FULL OUTER join classifies added/changed (a user active only in the
# first half is 'same' and excluded, mirroring table_diff's default).
ORACLES["q201_snapshot_diff"] = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
v1 AS (
  SELECT user_id, event_id FROM (
    SELECT user_id, event_id,
           row_number() OVER (
             PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
    FROM e, b WHERE us <= mid) WHERE rn = 1),
v2 AS (
  SELECT user_id, event_id FROM (
    SELECT user_id, event_id,
           row_number() OVER (
             PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
    FROM e) WHERE rn = 1),
j AS (
  SELECT coalesce(v1.user_id, v2.user_id) AS user_id,
         v1.event_id AS e1, v2.event_id AS e2,
         v1.user_id IS NULL AS no1, v2.user_id IS NULL AS no2
  FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id)
SELECT user_id,
       CASE WHEN no1 THEN 'added'
            WHEN no2 THEN 'removed'
            ELSE 'changed' END AS status,
       CASE WHEN NOT no1 AND NOT no2 AND e1 IS DISTINCT FROM e2
            THEN 'event_id' ELSE '' END AS changed_cols
FROM j
WHERE no1 OR no2 OR e1 IS DISTINCT FROM e2
ORDER BY user_id
"""


# q202: incremental join maintenance — the oracle recomputes the FULL
# orders x customer join from scratch; the Spark side must reproduce
# it from prev + three delta joins (row-identical, so the grouped
# exact-cent summary matches bit-for-bit).
ORACLES["q202_incremental_join"] = """
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
         AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY c.c_mktsegment
"""


# q203: quantile normalization — within-group ranks map to the global
# value at index ceil(r*N/ng) (integer arithmetic, lower-quantile
# rule); the oracle's global rank is the plain window, checking the
# distributed range-partition + offset formulation against the spec.
ORACLES["q203_quantile_normalize"] = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         o_orderkey AS id
  FROM orders),
g AS (
  SELECT grp, cents, id,
         row_number() OVER (PARTITION BY grp ORDER BY cents, id) AS r,
         count(*) OVER (PARTITION BY grp) AS ng,
         (SELECT count(*) FROM base) AS N
  FROM base),
gl AS (
  SELECT cents AS gx,
         row_number() OVER (ORDER BY cents, id) AS i
  FROM base)
SELECT g.id AS o_orderkey, g.grp AS o_orderpriority,
       g.cents, gl.gx AS norm
FROM g JOIN gl ON gl.i = (g.r * g.N + g.ng - 1) // g.ng
ORDER BY o_orderkey
"""


# q204: power-of-two histogram — bucket = length(bin(cents)) is the
# exact integer floor(log2)+1 in both engines; bounds via shifts.
ORACLES["q204_log2_histogram"] = """
WITH x AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
  WHERE floor(o_totalprice * 100 + 0.5) > 0)
SELECT o_orderpriority,
       length(bin(cents)) AS bucket,
       (CAST(1 AS BIGINT) << (length(bin(cents)) - 1)) AS lo,
       (CAST(1 AS BIGINT) << length(bin(cents))) - 1 AS hi,
       count(*) AS n,
       min(cents) AS min_v,
       max(cents) AS max_v
FROM x GROUP BY 1, 2, 3, 4
ORDER BY o_orderpriority, bucket
"""


# q205: longest-prefix-match — the oracle resolves each order by the
# CASE priority exact-date > listed-month > year (valid precisely
# because the rules derive from the data: every day-15 date and every
# listed month IS a rule), then counts per specificity level.
ORACLES["q205_longest_prefix_match"] = """
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d FROM orders),
resolved AS (
  SELECT CASE
    WHEN substr(d, 9, 2) = '15' THEN 10
    WHEN substr(d, 6, 2) IN ('03', '06', '09', '12') THEN 7
    ELSE 4 END AS rule_len
  FROM o)
SELECT rule_len, count(*) AS n_orders
FROM resolved GROUP BY 1 ORDER BY rule_len
"""


# q206: AUC — identical ×2-scaled tied-rank arithmetic over the
# distinct-score histogram; independent of the Spark plan but the
# same exact-integer formulation, so values match bit-for-bit.
ORACLES["q206_grouped_auc"] = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS score,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders),
hist AS (
  SELECT o_orderpriority, score, count(*) AS cnt, sum(pos) AS pos_cnt
  FROM o GROUP BY 1, 2),
ranked AS (
  SELECT o_orderpriority, cnt, pos_cnt,
         2 * COALESCE(sum(cnt) OVER (PARTITION BY o_orderpriority
             ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS avg_rank2
  FROM hist),
agg AS (
  SELECT o_orderpriority,
         CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
         CAST(sum(cnt) - sum(pos_cnt) AS BIGINT) AS n_neg,
         CAST(sum(pos_cnt * avg_rank2) AS BIGINT) AS ranksum2
  FROM ranked GROUP BY 1)
SELECT o_orderpriority, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         CAST(ranksum2 - n_pos * (n_pos + 1) AS DOUBLE)
           / CAST(2 * n_pos * n_neg AS DOUBLE)
       END AS auc
FROM agg ORDER BY o_orderpriority
"""


# q207: sequential pairs — brute-force position self-join (the plan
# the Spark side deliberately avoids), same (ts, event_id) order.
ORACLES["q207_sequential_pairs"] = """
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
pairs AS (
  SELECT s1.user_id, s1.event_type AS a, s2.event_type AS b
  FROM seq s1 JOIN seq s2
    ON s1.user_id = s2.user_id
   AND s2.pos BETWEEN s1.pos + 1 AND s1.pos + 3)
SELECT a, b, count(*) AS n_pairs,
       count(DISTINCT user_id) AS n_keys
FROM pairs GROUP BY 1, 2 ORDER BY a, b
"""


# q208: dyadic EWMA — day-offset self-join with the same power-of-two
# weights; integer sums so both engines agree exactly.
ORACLES["q208_ewma_smoothing"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
d2 AS (
  SELECT *, date_diff('day', DATE '1970-01-01', day) AS dn FROM daily),
sm AS (
  SELECT t.event_type, t.day, t.cents,
         CAST(sum(s.cents * (CAST(1 AS BIGINT) << (7 - (t.dn - s.dn))))
              AS BIGINT) AS ewma_num,
         CAST(sum(CAST(1 AS BIGINT) << (7 - (t.dn - s.dn)))
              AS BIGINT) AS ewma_den
  FROM d2 t JOIN d2 s
    ON s.event_type = t.event_type AND s.dn BETWEEN t.dn - 7 AND t.dn
  GROUP BY 1, 2, 3)
SELECT event_type, day, cents, ewma_num, ewma_den,
       CAST(ewma_num AS DOUBLE) / CAST(ewma_den AS DOUBLE) AS ewma
FROM sm ORDER BY event_type, day
"""


# q209: item-item cosine² — same exact-integer dot/norm arithmetic,
# plain join plan (no broadcast hints to mirror).
ORACLES["q209_item_similarity"] = """
WITH ratings AS (
  SELECT l_orderkey AS b, l_partkey AS i,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2),
norms AS (SELECT i, sum(r * r) AS norm2 FROM ratings GROUP BY 1),
pairs AS (
  SELECT x.i AS item_x, y.i AS item_y,
         count(*) AS n_co, CAST(sum(x.r * y.r) AS BIGINT) AS dot
  FROM ratings x JOIN ratings y ON x.b = y.b AND x.i < y.i
  GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT item_x, item_y, n_co, dot,
       CAST(dot * dot AS DOUBLE)
         / CAST(nx.norm2 * ny.norm2 AS DOUBLE) AS cos2
FROM pairs
JOIN norms nx ON nx.i = item_x
JOIN norms ny ON ny.i = item_y
ORDER BY cos2 DESC, item_x, item_y LIMIT 25
"""


# q210: decile gains — lone row_number window (fine in DuckDB at
# oracle scale; the Spark side must NOT plan one), same integer
# bucket cut and single-division ratios.
ORACLES["q210_decile_gains"] = """
WITH o AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS score,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
         o_orderkey
  FROM orders),
r AS (
  SELECT pos,
         row_number() OVER (ORDER BY score DESC, o_orderkey ASC) AS rk,
         count(*) OVER () AS n
  FROM o),
b AS (
  SELECT CAST(((rk - 1) * 10) // n AS BIGINT) AS bucket,
         count(*) AS n_rows, CAST(sum(pos) AS BIGINT) AS n_pos
  FROM r GROUP BY 1)
SELECT bucket, n_rows, n_pos,
       CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE) AS pos_rate,
       CAST(sum(n_pos) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE)
         / CAST(sum(n_pos) OVER () AS DOUBLE) AS cum_gain
FROM b ORDER BY bucket
"""


# q211: exact trailing distinct — brute-force window self-join with
# COUNT DISTINCT (the plan the Spark side's coverage-interval
# identity avoids).
ORACLES["q211_rolling_exact_distinct"] = """
WITH occ AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
    AND user_id IS NOT NULL),
days AS (SELECT DISTINCT event_type, day FROM occ)
SELECT d.event_type AS event_type, d.day AS day,
       count(DISTINCT o.user_id) AS u
FROM days d JOIN occ o
  ON o.event_type = d.event_type
 AND o.day BETWEEN d.day - 6 AND d.day
GROUP BY 1, 2 ORDER BY d.event_type, d.day
"""


# q212: linear interpolation — lateral range explode per gap, same
# exact numerator / one-division rule.
ORACLES["q212_linear_interpolation"] = """
WITH daily AS (
  SELECT o_orderpriority, o_orderdate AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS v
  FROM orders GROUP BY 1, 2),
d2 AS (
  SELECT *, date_diff('day', DATE '1970-01-01', day) AS dn FROM daily),
n AS (
  SELECT *,
         lead(dn) OVER (PARTITION BY o_orderpriority ORDER BY dn) AS ndn,
         lead(v)  OVER (PARTITION BY o_orderpriority ORDER BY dn) AS nv
  FROM d2),
interp AS (
  SELECT o_orderpriority, g.d AS dn,
         CAST(v * (ndn - dn) + (nv - v) * (g.d - dn) AS DOUBLE)
           / CAST(ndn - dn AS DOUBLE) AS val,
         TRUE AS is_interp
  FROM n, LATERAL (SELECT unnest(range(dn + 1, ndn)) AS d) g
  WHERE ndn IS NOT NULL AND ndn > dn + 1),
allrows AS (
  SELECT o_orderpriority, dn, CAST(v AS DOUBLE) AS val,
         FALSE AS is_interp
  FROM d2
  UNION ALL SELECT * FROM interp)
SELECT o_orderpriority, DATE '1970-01-01' + CAST(dn AS INTEGER) AS day,
       val, is_interp
FROM allrows ORDER BY o_orderpriority, day
"""


# q213: nucleus truncation — identical cross-multiplied integer keep
# rule over the same tokenizer (_TOKS).
ORACLES["q213_top_p_vocab"] = f"""
WITH tok AS (SELECT lang, unnest({_TOKS}) AS token FROM documents),
counts AS (
  SELECT lang, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
ranked AS (
  SELECT lang, token, cnt,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, token ASC) AS rank,
         CAST(sum(cnt) OVER (PARTITION BY lang
                ORDER BY cnt DESC, token ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total
  FROM counts)
SELECT lang, token, cnt, rank, cum FROM ranked
WHERE (cum - cnt) * 10 < 9 * total
ORDER BY lang, rank
"""


# q214: skip-grams — positions self-join |Δ| ∈ [1, 2] (the quadratic
# form the Spark side's lead-k windows avoid), same tokenizer.
ORACLES["q214_skipgram_counts"] = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents WHERE text IS NOT NULL),
toks AS (
  SELECT doc_id, unnest(ts) AS tok,
         unnest(range(1, len(ts) + 1)) AS idx
  FROM d),
pairs AS (
  SELECT a.tok AS center, b.tok AS context
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id
   AND abs(a.idx - b.idx) BETWEEN 1 AND 2)
SELECT center, context, count(*) AS n
FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5
ORDER BY center, context
"""


# q215: seasonal anomalies — same epoch-day mod 7 weekday, n-scaled
# integer deviation, one sqrt.
ORACLES["q215_seasonal_anomalies"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
         count(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
d2 AS (SELECT *, dn % 7 AS dow FROM daily),
stats AS (
  SELECT event_type, dow, count(*) AS n_days,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM d2 GROUP BY 1, 2)
SELECT d.event_type, DATE '1970-01-01' + CAST(d.dn AS INTEGER) AS day,
       CAST(d.dow AS BIGINT) AS dow, d.c, s.n_days,
       CAST(d.c * s.n_days - s.s1 AS BIGINT) AS dev_n,
       2.0 * sqrt(CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE))
         AS thresh,
       CAST(abs(d.c * s.n_days - s.s1) AS DOUBLE)
         > 2.0 * sqrt(CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE))
         AS is_anomaly
FROM d2 d JOIN stats s
  ON s.event_type = d.event_type AND s.dow = d.dow
ORDER BY d.event_type, day
"""


# q216: dispersion — exact-integer Fano / CV², integer flag.
ORACLES["q216_dispersion_audit"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
         count(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
stats AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(c) AS BIGINT) AS total,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM daily GROUP BY 1)
SELECT event_type, n_days, total,
       CASE WHEN total > 0 THEN
         CAST(n_days * s2 - total * total AS DOUBLE)
           / CAST(n_days * total AS DOUBLE) END AS fano,
       CASE WHEN total > 0 THEN
         CAST(n_days * s2 - total * total AS DOUBLE)
           / CAST(total * total AS DOUBLE) END AS cv2,
       (n_days * s2 - total * total) > n_days * total AS overdispersed
FROM stats ORDER BY event_type
"""


# q217: assortativity — q188's fixed-order sufficient-statistic r
# over the distinct customer–supplier edge set.
ORACLES["q217_degree_assortativity"] = """
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
dc AS (SELECT c, count(*) AS dc FROM e GROUP BY 1),
ds AS (SELECT s, count(*) AS ds FROM e GROUP BY 1),
pairs AS (
  SELECT CAST(dc.dc AS HUGEINT) AS x, CAST(ds.ds AS HUGEINT) AS y
  FROM e JOIN dc ON dc.c = e.c JOIN ds ON ds.s = e.s),
agg AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs)
SELECT 'all' AS g, CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
         THEN CAST(n * sxy - sx * sy AS DOUBLE)
              / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS r
FROM agg
"""


# q218: silhouette — exploded per-dim grain join against per-label
# (n, S) stats; same exact-integer fold, one division per pair.
ORACLES["q218_cluster_silhouette"] = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE label IS NOT NULL),
sc AS (
  SELECT vec_id, label, v,
    greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) / 127.0
      AS scale
  FROM e),
q AS (
  SELECT vec_id, label,
    list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS ld
  FROM sc),
dims AS (
  SELECT vec_id, label, unnest(ld) AS qd,
         unnest(range(1, len(ld) + 1)) AS d
  FROM q),
cent AS (
  SELECT label AS cl, d, CAST(sum(qd) AS BIGINT) AS s
  FROM dims GROUP BY 1, 2),
sizes AS (SELECT label AS cl, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
d2 AS (
  SELECT p.vec_id, p.label, c.cl,
    CAST(sum((s2.n * p.qd - c.s) * (s2.n * p.qd - c.s)) AS DOUBLE)
      / CAST(s2.n * s2.n AS DOUBLE) AS dd
  FROM dims p JOIN cent c ON c.d = p.d JOIN sizes s2 ON s2.cl = c.cl
  GROUP BY p.vec_id, p.label, c.cl, s2.n),
agg AS (
  SELECT vec_id, label,
    max(CASE WHEN cl = label THEN dd END) AS a2,
    min(CASE WHEN cl != label THEN dd END) AS b2
  FROM d2 GROUP BY 1, 2)
SELECT vec_id, label, a2, b2,
  CASE WHEN greatest(a2, b2) > 0 THEN (b2 - a2) / greatest(a2, b2)
       WHEN b2 IS NOT NULL THEN 0.0 END AS sil
FROM agg ORDER BY vec_id
"""


# q219: target encoding — identical cross-multiplied rationals.
ORACLES["q219_target_encoding"] = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
stats AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s
  FROM o GROUP BY 1),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS gn, CAST(sum(cents) AS BIGINT) AS gt
  FROM o)
SELECT o.o_orderkey, o.o_orderpriority, o.cents,
  CASE WHEN st.n > 1 THEN
    CAST(st.s - o.cents AS DOUBLE) / CAST(st.n - 1 AS DOUBLE) END
    AS enc_loo,
  CASE WHEN st.n - 1 + 10 > 0 THEN
    CAST(g.gn * (st.s - o.cents) + 10 * g.gt AS DOUBLE)
      / CAST(g.gn * (st.n - 1 + 10) AS DOUBLE) END AS enc_smooth
FROM o JOIN stats st USING (o_orderpriority) CROSS JOIN gstats g
ORDER BY o.o_orderkey
"""


# q220: feature hashing — same md5 bucket/sign bits over _TOKS.
ORACLES["q220_hashed_features"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok
  FROM documents WHERE text IS NOT NULL),
h AS (
  SELECT doc_id,
    ('0x' || substr(md5(tok), 1, 7))::BIGINT % 64 AS bucket,
    CASE WHEN ('0x' || substr(md5(tok), 8, 1))::BIGINT % 2 = 0
         THEN 1 ELSE -1 END AS s
  FROM tok)
SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS w
FROM h GROUP BY 1, 2 HAVING sum(s) != 0
ORDER BY doc_id, bucket
"""


# q221: entity resolution — q95's brute-force pair set closed by the
# q46 recursive-reach component pattern.
ORACLES["q221_entity_resolution"] = """
WITH RECURSIVE probes AS (
  SELECT s_suppkey + 1000000 AS p_id,
         substr(s_name, 1, 2) || substr(s_name, 4) AS p_name
  FROM supplier),
pairs AS (
  SELECT p.p_id AS a, s.s_suppkey AS b
  FROM probes p CROSS JOIN supplier s
  WHERE levenshtein(p.p_name, s.s_name) <= 1),
edges AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS node_id, min(b) AS rep_id FROM reach GROUP BY a),
sizes AS (SELECT rep_id, count(*) AS group_size FROM comp GROUP BY rep_id)
SELECT node_id, comp.rep_id, group_size
FROM comp JOIN sizes USING (rep_id) ORDER BY node_id
"""


# q222: mutual k-NN — full-corpus quantized scoring (q66's SQL), two
# one-sided top-k projections joined on the swapped key.
ORACLES["q222_mutual_topk"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
sc AS (
  SELECT vec_id, v,
    greatest(list_max(list_transform(v, y -> abs(y))), 1e-30) / 127.0
      AS scale
  FROM e),
q AS (
  SELECT vec_id, list_transform(v, x -> floor(x / scale + 0.5)) AS ld
  FROM sc),
selfd AS (SELECT vec_id, ld, list_dot_product(ld, ld) AS sd FROM q),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_dot_product(p.ld, c.ld) / (sqrt(p.sd) * sqrt(c.sd)) AS qcosine
  FROM selfd p, selfd c WHERE c.vec_id != p.vec_id),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                                 ORDER BY qcosine DESC, neighbor_id ASC)
              AS rank
    FROM scored)
  WHERE rank <= 10),
fwd AS (
  SELECT probe_id AS item_a, neighbor_id AS item_b,
         qcosine AS cosine, rank AS rank_ab
  FROM topk WHERE probe_id < neighbor_id),
rev AS (
  SELECT neighbor_id AS item_a, probe_id AS item_b, rank AS rank_ba
  FROM topk WHERE neighbor_id < probe_id)
SELECT item_a, item_b, cosine, rank_ab, rank_ba
FROM fwd JOIN rev USING (item_a, item_b)
ORDER BY item_a, item_b
"""


# q223: clustering coefficient — q33's edge set, id-ordered triangle
# closure (q101's CTE), exact-int 2T/d(d−1).
ORACLES["q223_clustering_coefficient"] = f"""
WITH edges AS (
  SELECT id_a AS a, id_b AS b FROM ({ORACLES["q33_simhash_pairs"]})),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b AS node FROM edges)
  GROUP BY node),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
tcount AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT unnest([x, y, z]) AS node FROM tris) GROUP BY node)
SELECT d.node, d.deg, COALESCE(t.n_triangles, 0) AS n_triangles,
  CASE WHEN d.deg >= 2 THEN
    CAST(2 * COALESCE(t.n_triangles, 0) AS DOUBLE)
      / CAST(d.deg * (d.deg - 1) AS DOUBLE) END AS cc
FROM deg d LEFT JOIN tcount t USING (node)
ORDER BY d.node
"""


# q224: survival hazard — same sweep-line deltas + cumulative window.
ORACLES["q224_survival_hazard"] = """
WITH spans AS (
  SELECT user_id,
         min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS fd,
         max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS ld
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1),
g AS (SELECT min(fd) AS mind, max(ld) AS maxd FROM spans),
days AS (SELECT unnest(range(mind, maxd + 1)) AS d FROM g),
deltas AS (
  SELECT d, CAST(sum(delta) AS BIGINT) AS net FROM (
    SELECT fd AS d, 1 AS delta FROM spans
    UNION ALL SELECT ld + 1 AS d, -1 AS delta FROM spans)
  GROUP BY 1),
deaths AS (
  SELECT ld AS d, count(*) AS d_events
  FROM spans, g WHERE g.maxd - ld > 2 GROUP BY 1),
j AS (
  SELECT days.d, COALESCE(net, 0) AS net,
         COALESCE(d_events, 0) AS d_events
  FROM days LEFT JOIN deltas USING (d) LEFT JOIN deaths USING (d)),
cum AS (
  SELECT d,
    CAST(sum(net) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS n_risk,
    CAST(d_events AS BIGINT) AS d_events
  FROM j)
SELECT DATE '1970-01-01' + CAST(d AS INTEGER) AS day, n_risk, d_events,
  CASE WHEN n_risk > 0
       THEN CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE) END
    AS hazard
FROM cum ORDER BY day
"""


# q225: cluster size spectrum — q46's recursive-reach groups, one row
# per cluster, q204's bin-length bucket.
ORACLES["q225_cluster_size_spectrum"] = f"""
WITH groups AS ({ORACLES["q46_neardup_groups"]}),
clusters AS (SELECT DISTINCT rep_id, group_size FROM groups),
x AS (SELECT CAST(group_size AS BIGINT) AS v FROM clusters
      WHERE group_size > 0)
SELECT length(bin(v)) AS bucket,
       (CAST(1 AS BIGINT) << (length(bin(v)) - 1)) AS lo,
       (CAST(1 AS BIGINT) << length(bin(v))) - 1 AS hi,
       count(*) AS n, min(v) AS min_v, max(v) AS max_v
FROM x GROUP BY 1, 2, 3 ORDER BY bucket
"""


# q226: conversion lags — quadratic inequality join + min (the plan
# the union-window avoids), whole-second + 1 bin-length buckets.
ORACLES["q226_conversion_lag_histogram"] = """
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ct
  FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, epoch_us(ts) AS pt
  FROM events WHERE event_type = 'purchase'),
nxt AS (
  SELECT c.event_id, c.ct, min(p.pt) AS pt
  FROM c JOIN p ON p.user_id = c.user_id AND p.pt >= c.ct
  GROUP BY 1, 2),
conv AS (
  SELECT ((pt - ct) // 1000000) + 1 AS v
  FROM nxt WHERE pt - ct <= 3600000000)
SELECT length(bin(v)) AS bucket,
       (CAST(1 AS BIGINT) << (length(bin(v)) - 1)) AS lo,
       (CAST(1 AS BIGINT) << length(bin(v))) - 1 AS hi,
       count(*) AS n, min(v) AS min_v, max(v) AS max_v
FROM conv GROUP BY 1, 2, 3 ORDER BY bucket
"""


# q227: top-k churn — same midpoint split, ORDER BY LIMIT top-k,
# full-outer status classification.
ORACLES["q227_topk_churn"] = """
WITH e AS (
  SELECT user_id AS key, epoch_us(ts) AS us
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
b AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
h1 AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n1 FROM e, b
  WHERE us <= mid GROUP BY 1 ORDER BY n1 DESC, key LIMIT 20),
t1 AS (SELECT *, row_number() OVER (ORDER BY n1 DESC, key) AS r1 FROM h1),
h2 AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n2 FROM e, b
  WHERE us > mid GROUP BY 1 ORDER BY n2 DESC, key LIMIT 20),
t2 AS (SELECT *, row_number() OVER (ORDER BY n2 DESC, key) AS r2 FROM h2)
SELECT key, n1, r1, n2, r2,
  CASE WHEN r1 IS NULL THEN 'added'
       WHEN r2 IS NULL THEN 'dropped'
       WHEN r1 = r2 THEN 'held'
       ELSE 'moved' END AS status
FROM t1 FULL OUTER JOIN t2 USING (key)
ORDER BY key
"""


# q228: sorted neighborhood — lone row_number sort (oracle scale),
# rank-range self-join, same verify.
ORACLES["q228_sorted_neighborhood"] = """
WITH rec AS (
  SELECT s_suppkey AS rid, s_name AS name FROM supplier
  UNION ALL
  SELECT s_suppkey + 1000000 AS rid,
         substr(s_name, 1, 2) || substr(s_name, 4) AS name
  FROM supplier),
r AS (
  SELECT rid, name, row_number() OVER (ORDER BY name, rid) AS rk
  FROM rec),
cand AS (
  SELECT a.rid AS id_a, b.rid AS id_b,
         a.name AS key_a, b.name AS key_b
  FROM r a JOIN r b ON b.rk BETWEEN a.rk + 1 AND a.rk + 3)
SELECT id_a, id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS INTEGER) AS dist
FROM cand WHERE levenshtein(key_a, key_b) <= 1
ORDER BY id_a, id_b
"""


# q229: subtree rollup — same ancestor closure via a literal divisor
# list (integer //, distinct per leaf), one grouped join.
ORACLES["q229_subtree_rollup"] = """
WITH leaves AS (
  SELECT p_partkey AS k,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part),
anc AS (
  SELECT DISTINCT k, k // d.d AS node
  FROM leaves, LATERAL (
    SELECT unnest([1, 10, 100, 1000, 10000, 100000, 1000000,
                   10000000]) AS d) d)
SELECT a.node, count(*) AS n_leaves,
       CAST(sum(l.cents) AS BIGINT) AS subtree_sum
FROM anc a JOIN leaves l USING (k)
GROUP BY 1 ORDER BY node
"""


def _ahash_sql(src_w=16, src_h=8, hw=8, hh=7, maxh=2) -> str:
    """Mirror perceptual_ahash + brute-force Hamming pairs: thumbnail
    bytes via the q51 floor index mapping, mean-threshold bits in the
    same cross-multiplied integer form, big-endian packing with
    shifts (56 bits — sign-safe)."""
    idxs = [
        ((r * src_h) // hh) * src_w + (c * src_w) // hw
        for r in range(hh)
        for c in range(hw)
    ]
    n = hw * hh
    pad = 2 * src_w * src_h
    idx_list = ", ".join(str(i) for i in idxs)
    return f"""
WITH p AS (
  SELECT doc_id AS media_id,
         substr(rpad(hex(encode(text)), {pad}, '0'), 1, {pad}) AS hx
  FROM documents WHERE text IS NOT NULL),
ex AS (
  SELECT media_id, hx,
         unnest(range(0, {n})) AS i,
         unnest([{idx_list}]) AS idx
  FROM p),
vals AS (
  SELECT media_id, i,
    ((strpos('0123456789ABCDEF', substr(hx, 2 * idx + 1, 1)) - 1) * 16
     + strpos('0123456789ABCDEF', substr(hx, 2 * idx + 2, 1)) - 1) AS v
  FROM ex),
tot AS (
  SELECT media_id, CAST(sum(v) AS BIGINT) AS total FROM vals GROUP BY 1),
sigs AS (
  SELECT v.media_id,
    CAST(sum(CASE WHEN v.v * {n} > t.total
         THEN (CAST(1 AS BIGINT) << CAST({n - 1} - v.i AS INTEGER))
         ELSE 0 END) AS BIGINT) AS sig
  FROM vals v JOIN tot t USING (media_id) GROUP BY 1)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.media_id < b.media_id
WHERE bit_count(xor(a.sig, b.sig)) <= {maxh}
ORDER BY id_a, id_b
"""


ORACLES["q230_perceptual_dedup"] = _ahash_sql()


# q231: rising trend — same two offset RANGE frames.
ORACLES["q231_rising_trend"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
         count(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type, DATE '1970-01-01' + CAST(dn AS INTEGER) AS day, c,
  CAST(sum(c) OVER wr AS BIGINT) AS c_recent,
  CAST(coalesce(sum(c) OVER wp, 0) AS BIGINT) AS c_prior,
  CAST(CAST(sum(c) OVER wr AS BIGINT) + 1 AS DOUBLE)
    / CAST(coalesce(sum(c) OVER wp, 0) + 1 AS DOUBLE) AS ratio,
  2 * CAST(sum(c) OVER wr AS BIGINT)
    > 3 * CAST(coalesce(sum(c) OVER wp, 0) AS BIGINT) AS rising
FROM daily
WINDOW wr AS (PARTITION BY event_type ORDER BY dn
              RANGE BETWEEN 2 PRECEDING AND CURRENT ROW),
       wp AS (PARTITION BY event_type ORDER BY dn
              RANGE BETWEEN 5 PRECEDING AND 3 PRECEDING)
ORDER BY event_type, day
"""


# q232: incremental components — the oracle IS the from-scratch
# recompute (q46's recursive closure over the FULL pair set): the
# operator's contract is bit-identity with it.
ORACLES["q232_incremental_components"] = f"""
WITH groups AS ({ORACLES["q46_neardup_groups"]})
SELECT doc_id AS id, rep_id AS label FROM groups ORDER BY id
"""


# q233: Cohen's kappa — q24's langid subquery, cross-multiplied
# integer kappa.
ORACLES["q233_cohens_kappa"] = f"""
WITH pred AS ({ORACLES["q24_langid"]}),
j AS (
  SELECT d.lang AS a, p.lang_guess AS b
  FROM documents d JOIN pred p USING (doc_id)
  WHERE d.lang IS NOT NULL AND p.lang_guess IS NOT NULL),
cells AS (SELECT a, b, count(*) AS c FROM j GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM cells),
ra AS (SELECT a AS k, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1),
cb AS (SELECT b AS k, CAST(sum(c) AS BIGINT) AS col FROM cells GROUP BY 1),
pe AS (
  SELECT CAST(coalesce(sum(r * col), 0) AS BIGINT) AS pe_num
  FROM ra JOIN cb USING (k))
SELECT n, n_agree, pe_num,
  CASE WHEN n * n - pe_num != 0 THEN
    CAST(n * n_agree - pe_num AS DOUBLE)
      / CAST(n * n - pe_num AS DOUBLE) END AS kappa
FROM tot, pe
"""


# q234: percent-of-parent — q229's closure totals self-joined on
# node // 10.
ORACLES["q234_hierarchy_contribution"] = """
WITH leaves AS (
  SELECT p_partkey AS k,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
  FROM part),
anc AS (
  SELECT DISTINCT k, k // d.d AS node
  FROM leaves, LATERAL (
    SELECT unnest([1, 10, 100, 1000, 10000, 100000, 1000000,
                   10000000]) AS d) d),
totals AS (
  SELECT a.node, CAST(sum(l.cents) AS BIGINT) AS subtree_sum
  FROM anc a JOIN leaves l USING (k) GROUP BY 1)
SELECT t.node, t.subtree_sum,
  CASE WHEN t.node != 0 THEN p.subtree_sum END AS parent_sum,
  CASE WHEN t.node != 0 AND p.subtree_sum > 0 THEN
    CAST(t.subtree_sum AS DOUBLE) / CAST(p.subtree_sum AS DOUBLE)
  END AS share
FROM totals t LEFT JOIN totals p ON p.node = t.node // 10
ORDER BY t.node
"""


# q235: vocabulary growth — same first-seen-day identity.
ORACLES["q235_vocab_growth"] = f"""
WITH toks AS (
  SELECT doc_id % 30 AS day, unnest({_TOKS}) AS tok
  FROM documents WHERE text IS NOT NULL),
per_day AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1),
first_seen AS (SELECT tok, min(day) AS day FROM toks GROUP BY 1),
new_types AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_new_types
  FROM first_seen GROUP BY 1)
SELECT p.day, p.n_tokens,
  CAST(coalesce(n.n_new_types, 0) AS BIGINT) AS n_new_types,
  CAST(sum(coalesce(n.n_new_types, 0)) OVER (ORDER BY p.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS vocab_size,
  CAST(coalesce(n.n_new_types, 0) AS DOUBLE)
    / CAST(p.n_tokens AS DOUBLE) AS oov_rate
FROM per_day p LEFT JOIN new_types n USING (day)
ORDER BY p.day
"""


# q236: TVD — identical cross-multiplied integers.
ORACLES["q236_tvd_drift"] = """
WITH o AS (
  SELECT o_orderpriority AS seg,
         length(bin(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)))
           AS bucket
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
counts AS (SELECT seg, bucket, count(*) AS c FROM o GROUP BY 1, 2),
a AS (SELECT bucket, c AS ca FROM counts WHERE seg = '1-URGENT'),
b AS (SELECT bucket, c AS cb FROM counts WHERE seg = '5-LOW'),
m AS (
  SELECT COALESCE(a.ca, 0) AS ca, COALESCE(b.cb, 0) AS cb
  FROM a FULL OUTER JOIN b USING (bucket)),
t AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM m)
SELECT t.n_a, t.n_b, CAST(count(*) AS BIGINT) AS n_buckets,
  CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
    CAST(sum(abs(m.ca * t.n_b - m.cb * t.n_a)) AS DOUBLE)
      / CAST(2 * t.n_a * t.n_b AS DOUBLE) END AS tvd
FROM m, t GROUP BY t.n_a, t.n_b
"""


# q237: audience overlap — same per-user pair explode in SQL.
ORACLES["q237_audience_overlap"] = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
sizes AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM ud GROUP BY 1),
inter AS (
  SELECT a.day AS day_a, b.day AS day_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM ud a JOIN ud b ON a.u = b.u AND a.day < b.day
  GROUP BY 1, 2)
SELECT i.day_a, i.day_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
       CAST(i.n_inter AS DOUBLE)
         / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.day = i.day_a
JOIN sizes sb ON sb.day = i.day_b
ORDER BY i.day_a, i.day_b
"""


# q238: autocorrelation — calendar-shifted join + q188 formula.
ORACLES["q238_autocorrelation"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn,
         count(*) AS c
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2),
p2 AS (
  SELECT event_type, lag, x, y FROM (
    SELECT a.event_type, l.lag, CAST(a.c AS HUGEINT) AS x,
           CAST(b.c AS HUGEINT) AS y
    FROM (SELECT unnest([1, 7]) AS lag) l
    CROSS JOIN daily a
    JOIN daily b ON b.event_type = a.event_type
                AND b.dn = a.dn - l.lag)),
agg AS (
  SELECT event_type, lag, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM p2 GROUP BY 1, 2)
SELECT event_type, CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
         THEN CAST(n * sxy - sx * sy AS DOUBLE)
              / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS r
FROM agg ORDER BY event_type, lag
"""


# q239/q240: product quantization — the same integer domain
# (floor(x*1e6 + 0.5)), per-label full-dim integer mean codebook,
# per-subspace argmin assignment, and exact-int ADC distances, written
# independently as relational SQL (explode positions + GROUP BY int
# sums, order-independent because every term is int64).
_PQ_CODES_CTE = """
e AS (
  SELECT vec_id, CAST(label AS INTEGER) AS label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
           AS vi
  FROM embeddings),
cent AS (
  SELECT label AS code, p.pos AS pos,
         CAST(floor(CAST(sum(e.vi[p.pos + 1]) AS DOUBLE) / count(*) + 0.5)
              AS BIGINT) AS cv
  FROM e, (SELECT unnest(range(64)) AS pos) p
  GROUP BY 1, 2),
dist AS (
  SELECT e.vec_id, CAST(floor(c.pos / 8) AS INTEGER) AS s, c.code,
         sum((e.vi[c.pos + 1] - c.cv) * (e.vi[c.pos + 1] - c.cv)) AS d2
  FROM e, cent c
  GROUP BY 1, 2, 3),
best AS (
  SELECT vec_id, s, code, d2,
         row_number() OVER (PARTITION BY vec_id, s
                            ORDER BY d2 ASC, code ASC) AS rn
  FROM dist),
codes AS (SELECT vec_id, s, code, d2 FROM best WHERE rn = 1)
"""

ORACLES["q239_pq_codes"] = f"""
WITH {_PQ_CODES_CTE}
SELECT vec_id,
  {', '.join(
    f"CAST(max(CASE WHEN s = {s} THEN code END) AS INTEGER) AS code_{s}"
    for s in range(8))},
  CAST(sum(d2) AS BIGINT) AS recon_err
FROM codes GROUP BY vec_id
"""

ORACLES["q240_pq_adc_topk"] = f"""
WITH {_PQ_CODES_CTE},
adc AS (
  SELECT p.vec_id AS probe_id, cd.vec_id AS neighbor_id,
         CAST(sum((p.vi[c.pos + 1] - c.cv) * (p.vi[c.pos + 1] - c.cv))
              AS BIGINT) AS adc_dist
  FROM (SELECT * FROM e WHERE vec_id < 10) p
  JOIN codes cd ON cd.vec_id != p.vec_id
  JOIN cent c ON c.code = cd.code
             AND CAST(floor(c.pos / 8) AS INTEGER) = cd.s
  GROUP BY 1, 2)
SELECT probe_id, neighbor_id, adc_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
      ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM adc)
WHERE rank <= 5
"""


# q241: KMV sketch — the oracle sketches the RAW rows in one pass
# (distinct 60-bit hashes, k smallest via row_number), while the Spark
# side goes partials→merge→estimate; equality proves the merge is
# algebraic.  est uses the identical fixed-order double expression.
ORACLES["q241_kmv_distinct"] = """
WITH vals AS (
  SELECT DISTINCT l_returnflag,
    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM lineitem WHERE l_partkey IS NOT NULL),
ranked AS (
  SELECT l_returnflag, hv,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
  FROM vals),
g AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
         max(CASE WHEN rn = 64 THEN hv END) AS h64,
         max(hv) AS hmax
  FROM ranked WHERE rn <= 64 GROUP BY l_returnflag)
SELECT l_returnflag, n_kept,
  CASE WHEN n_kept < 64 THEN hmax ELSE h64 END AS kth_hash,
  CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
       ELSE 63.0 * 1152921504606846976.0 / CAST(h64 AS DOUBLE)
  END AS est_distinct
FROM g
"""


# q242: time-decay attribution — inequality-join assignment (oracle
# scale) + the same dyadic weights / largest-remainder integer split.
ORACLES["q242_timedecay_attribution"] = """
WITH e AS (
  SELECT event_id AS eid, user_id AS k, epoch_us(ts) AS us, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(json_extract_string(props, '$.k') AS INT) % 5 AS channel
  FROM events),
conv AS (SELECT * FROM e WHERE event_type = 'purchase'),
touch AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
assigned AS (
  SELECT t.eid AS teid, t.us AS tus, t.channel,
         c.eid AS conv_id, c.cents,
         (c.us - t.us) // 86400000000 AS d
  FROM touch t
  JOIN conv c ON c.k = t.k AND c.us >= t.us
             AND c.us - t.us <= 7 * 86400000000
  QUALIFY row_number() OVER (
    PARTITION BY t.eid ORDER BY c.us, c.eid) = 1),
weighted AS (
  SELECT *, CAST(1 AS BIGINT) << CAST(7 - d AS INTEGER) AS wt
  FROM assigned),
split AS (
  SELECT channel, cents, tus, teid,
         cents * wt AS prod,
         sum(wt) OVER (PARTITION BY conv_id) AS W,
         conv_id
  FROM weighted),
based AS (
  SELECT channel, conv_id, cents, tus, teid,
         prod // W AS base, prod % W AS rem
  FROM split),
ranked AS (
  SELECT channel, base,
         cents - sum(base) OVER (PARTITION BY conv_id) AS R,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY abs(rem) DESC, tus, teid) AS rn
  FROM based),
credits AS (
  SELECT channel,
         base + CASE WHEN rn <= abs(R)
                     THEN CASE WHEN R > 0 THEN 1
                               WHEN R < 0 THEN -1 ELSE 0 END
                     ELSE 0 END AS credit
  FROM ranked),
direct AS (
  SELECT -1 AS channel, cents AS credit
  FROM conv WHERE eid NOT IN (SELECT conv_id FROM assigned)),
unioned AS (SELECT * FROM credits UNION ALL SELECT * FROM direct)
SELECT channel, count(*) AS n_credits,
       CAST(sum(credit) AS BIGINT) AS credited_cents
FROM unioned GROUP BY 1 ORDER BY channel
"""


# q243: calibration bins — same md5 dyadic score, HUGEINT squares.
ORACLES["q243_calibration_bins"] = """
WITH s AS (
  SELECT o_orderpriority,
    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))::BIGINT
      AS h,
    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders),
se AS (
  SELECT o_orderpriority, (h * 10) // 268435456 AS bin, h, y,
         (h - y * 268435456) * (h - y * 268435456) AS sq
  FROM s),
g AS (
  SELECT o_orderpriority, bin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(h) AS BIGINT) AS sum_h,
         CAST(sum(sq // 268435456) AS BIGINT) AS sum_q,
         CAST(sum(sq % 268435456) AS BIGINT) AS sum_r
  FROM se GROUP BY 1, 2)
SELECT o_orderpriority, bin, n, n_pos,
  CAST(sum_h AS DOUBLE) / CAST(n AS DOUBLE) / 268435456.0 AS mean_p,
  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
  CAST(sum_q AS DOUBLE) / (CAST(n AS DOUBLE) * 268435456.0)
    + CAST(sum_r AS DOUBLE) / (CAST(n AS DOUBLE) * 72057594037927936.0)
    AS brier
FROM g ORDER BY o_orderpriority, bin
"""


# q244: length-3 sequential patterns — the same stacked-lead fan in
# SQL (lead(e, g1) and lead(e, g1+g2) over one user window).
ORACLES["q244_sequential_triples"] = """
WITH seq AS (
  SELECT user_id AS k, event_type AS a,
         lead(event_type, 1) OVER w AS b1,
         lead(event_type, 2) OVER w AS b2,
         lead(event_type, 3) OVER w AS c3,
         lead(event_type, 4) OVER w AS c4
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
triples AS (
  SELECT k, a, b1 AS b, b2 AS c FROM seq     -- g1=1, g2=1
  UNION ALL
  SELECT k, a, b1, c3 FROM seq               -- g1=1, g2=2
  UNION ALL
  SELECT k, a, b2, c3 FROM seq               -- g1=2, g2=1
  UNION ALL
  SELECT k, a, b2, c4 FROM seq)              -- g1=2, g2=2
SELECT a, b, c,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT k) AS BIGINT) AS n_keys
FROM triples
WHERE b IS NOT NULL AND c IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY a, b, c
"""


# q245: bounded k-core — the same 4 peel rounds as chained CTEs;
# converged iff the final round removed nothing (the frame only
# shrinks, so equality of the last two edge counts is exactly the
# operator's break condition).
ORACLES["q245_kcore_prune"] = """
WITH und AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem),
e0 AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
deg1 AS (SELECT a, count(*) AS c FROM e0 GROUP BY a),
keep1 AS (SELECT a FROM deg1 WHERE c >= 20),
e1 AS (
  SELECT e.a, e.b FROM e0 e
  JOIN keep1 ka ON e.a = ka.a
  JOIN keep1 kb ON e.b = kb.a),
deg2 AS (SELECT a, count(*) AS c FROM e1 GROUP BY a),
keep2 AS (SELECT a FROM deg2 WHERE c >= 20),
e2 AS (
  SELECT e.a, e.b FROM e1 e
  JOIN keep2 ka ON e.a = ka.a
  JOIN keep2 kb ON e.b = kb.a),
deg3 AS (SELECT a, count(*) AS c FROM e2 GROUP BY a),
keep3 AS (SELECT a FROM deg3 WHERE c >= 20),
e3 AS (
  SELECT e.a, e.b FROM e2 e
  JOIN keep3 ka ON e.a = ka.a
  JOIN keep3 kb ON e.b = kb.a),
deg4 AS (SELECT a, count(*) AS c FROM e3 GROUP BY a),
keep4 AS (SELECT a FROM deg4 WHERE c >= 20),
e4 AS (
  SELECT e.a, e.b FROM e3 e
  JOIN keep4 ka ON e.a = ka.a
  JOIN keep4 kb ON e.b = kb.a)
SELECT a AS node, CAST(count(*) AS BIGINT) AS degree,
       (SELECT count(*) FROM e4) =
         (SELECT count(*) FROM e3) AS converged
FROM e4 GROUP BY a ORDER BY node
"""


# q246: KMV intersection — same hash domain, k-min via ORDER BY/LIMIT.
ORACLES["q246_kmv_intersect"] = """
WITH member AS (
  SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
           AS hv,
         bool_or(l_returnflag = 'R') AS a,
         bool_or(l_returnflag = 'A') AS b
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_returnflag IN ('R', 'A')
  GROUP BY 1),
u AS (SELECT * FROM member ORDER BY hv LIMIT 64),
a_k AS (SELECT hv AS hv_a FROM member WHERE a ORDER BY hv LIMIT 64),
b_k AS (SELECT hv AS hv_b FROM member WHERE b ORDER BY hv LIMIT 64),
fold AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union_kept,
         CAST(sum(CASE WHEN a_k.hv_a IS NOT NULL
                        AND b_k.hv_b IS NOT NULL
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         max(u.hv) AS hk
  FROM u
  LEFT JOIN a_k ON u.hv = a_k.hv_a
  LEFT JOIN b_k ON u.hv = b_k.hv_b),
counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a_k) AS n_a,
         (SELECT CAST(count(*) AS BIGINT) FROM b_k) AS n_b)
SELECT n_a, n_b, n_union_kept, n_common,
  CASE WHEN n_union_kept < 64 THEN CAST(n_union_kept AS DOUBLE)
       ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
  END AS est_union,
  CAST(n_common AS DOUBLE)
    * (CASE WHEN n_union_kept < 64 THEN CAST(n_union_kept AS DOUBLE)
            ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)
       END) / 64.0 AS est_intersect
FROM fold, counts
"""


# q247: RRF fusion — composes the two component oracles verbatim as
# derived tables (nested WITH is legal in a subquery), then the same
# fixed-order 1/(60+r) sum.
ORACLES["q247_rrf_fusion"] = f"""
WITH bm AS (SELECT * FROM ({ORACLES["q149_bm25_search"]})),
px0 AS (SELECT * FROM ({ORACLES["q200_proximity_search"]})),
px AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY n_pairs DESC, doc_id)
              AS INTEGER) AS rank_b
  FROM px0 ORDER BY n_pairs DESC, doc_id LIMIT 10),
fused AS (
  SELECT COALESCE(bm.doc_id, px.doc_id) AS doc_id,
         CAST(bm.rank AS INTEGER) AS rank_a, px.rank_b,
         COALESCE(1.0 / (60.0 + CAST(bm.rank AS DOUBLE)), 0.0)
           + COALESCE(1.0 / (60.0 + CAST(px.rank_b AS DOUBLE)), 0.0)
           AS rrf_score
  FROM bm FULL OUTER JOIN px ON bm.doc_id = px.doc_id)
SELECT doc_id, rank_a, rank_b, rrf_score,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused)
WHERE rank <= 10
"""


# q248: retraction IVM — the oracle is the from-scratch recompute over
# the remaining rows; parity proves subtract-and-refresh ≡ rebuild.
ORACLES["q248_retractable_agg"] = """
SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
  CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
    AS sum_v
FROM events
WHERE event_type IS NOT NULL AND event_id % 10 != 0
GROUP BY event_type ORDER BY event_type
"""


# q249: streaming HLL maintenance — oracle = the direct sketch over
# all rows (merge is algebraic, so batched-and-merged ≡ direct).
# NULL user_ids are excluded exactly as hll_partials does.
ORACLES["q249_stream_hll"] = """
WITH pr AS (
  SELECT event_type,
    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 64
      AS bucket,
    29 - length(bin(
      ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 8, 7))::BIGINT))
      AS rank
  FROM events WHERE user_id IS NOT NULL),
mx AS (
  SELECT event_type, bucket, max(rank) AS mr FROM pr GROUP BY 1, 2)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
  2904.064 / (sum(1.0 / CAST(1 << mr AS DOUBLE))
              + CAST(64 - count(*) AS DOUBLE)) AS hll_raw
FROM mx GROUP BY 1 ORDER BY event_type
"""


# q250: business-day lag — same Monday-anchored closed form in SQL.
ORACLES["q250_business_day_lag"] = """
WITH fs AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship
  FROM lineitem GROUP BY 1),
lag AS (
  SELECT o.o_orderpriority,
    ((date_diff('day', DATE '1970-01-01', f.first_ship) + 3) // 7) * 5
      + least((date_diff('day', DATE '1970-01-01', f.first_ship) + 3) % 7, 5)
    - (((date_diff('day', DATE '1970-01-01', o.o_orderdate) + 3) // 7) * 5
      + least((date_diff('day', DATE '1970-01-01', o.o_orderdate) + 3) % 7, 5))
      AS bd_lag
  FROM orders o JOIN fs f ON o.o_orderkey = f.l_orderkey),
counts AS (
  SELECT o_orderpriority, CAST(bd_lag AS BIGINT) AS bd_lag,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM lag GROUP BY 1, 2),
totals AS (
  SELECT o_orderpriority, sum(n_orders) AS n_total
  FROM counts GROUP BY 1)
SELECT c.o_orderpriority, c.bd_lag, c.n_orders,
       CAST(c.n_orders AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
FROM counts c JOIN totals t USING (o_orderpriority)
ORDER BY c.o_orderpriority, c.bd_lag
"""


# q251: top-N + OTHER — same item-list window and winner-flag rollup.
ORACLES["q251_topn_plus_other"] = """
WITH per_item AS (
  SELECT l.l_returnflag, p.p_brand AS item,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS t
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2),
ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY l_returnflag ORDER BY t DESC, item) AS INTEGER)
      AS rank
  FROM per_item)
SELECT l_returnflag,
       CASE WHEN rank <= 3 THEN item ELSE 'OTHER' END AS item,
       CAST(CASE WHEN rank <= 3 THEN rank ELSE 4 END AS INTEGER) AS rank,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(t) AS BIGINT) AS measure_total
FROM ranked GROUP BY 1, 2, 3 ORDER BY l_returnflag, rank, item
"""


# q252: frequency-of-frequencies + Good–Turing.
ORACLES["q252_count_of_counts"] = """
WITH ic AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS k
  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
hist AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_k FROM ic GROUP BY 1),
tot AS (SELECT CAST(sum(k) AS BIGINT) AS N FROM ic),
one AS (SELECT CAST(sum(n_k) AS BIGINT) AS n1 FROM hist WHERE k = 1)
SELECT h.k, h.n_k,
  CAST(h.k + 1 AS DOUBLE) * CAST(nx.n_k AS DOUBLE)
    / CAST(h.n_k AS DOUBLE) AS gt_cstar,
  CAST(COALESCE(one.n1, 0) AS DOUBLE) / CAST(tot.N AS DOUBLE)
    AS p_unseen
FROM hist h
LEFT JOIN hist nx ON nx.k = h.k + 1
CROSS JOIN tot CROSS JOIN one
ORDER BY h.k
"""


# q253: activity bitmap — mask rebuilt by bit_or in SQL; the streak
# comes from the INDEPENDENT gaps-and-islands algorithm (row_number
# difference grouping), not the AND-shift fold.
ORACLES["q253_activity_bitmap"] = """
WITH d AS (
  SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
mx AS (SELECT max(day) AS maxd FROM d),
win AS (
  SELECT k, date_diff('day', day, mx.maxd) AS idx
  FROM d, mx WHERE date_diff('day', day, mx.maxd) < 63),
mask AS (
  SELECT k, CAST(bit_or(CAST(1 AS BIGINT) << CAST(idx AS INTEGER))
                 AS BIGINT) AS mask
  FROM win GROUP BY k),
isl AS (
  SELECT k, idx - row_number() OVER (PARTITION BY k ORDER BY idx)
               AS grp
  FROM win),
streaks AS (
  SELECT k, CAST(max(run) AS INTEGER) AS longest_streak FROM (
    SELECT k, grp, count(*) AS run FROM isl GROUP BY 1, 2)
  GROUP BY k)
SELECT m.k AS user_id, m.mask,
       CAST(bit_count(m.mask) AS INTEGER) AS n_active,
       s.longest_streak
FROM mask m JOIN streaks s ON m.k = s.k
ORDER BY m.k
"""


# q254: Fellegi–Sunter over q95's candidate pairs — the oracle
# composes q95's brute-force edit-distance pair SQL and rescoring
# with the same literal milli-log-odds weights.
ORACLES["q254_fellegi_sunter"] = f"""
WITH cand AS (SELECT * FROM ({ORACLES["q95_fuzzy_name_match"]})),
probes AS (
  SELECT s_suppkey AS p_suppkey,
         substr(s_name, 1, 2) || substr(s_name, 4) AS p_name,
         s_nationkey AS p_nationkey, s_acctbal AS p_acctbal
  FROM supplier),
en AS (
  SELECT c.p_suppkey, c.s_suppkey, c.dist,
         p.p_name = s.s_name AS agr_name,
         p.p_nationkey = s.s_nationkey AS agr_nation,
         abs(CAST(floor(p.p_acctbal * 100 + 0.5) AS BIGINT)
             - CAST(floor(s.s_acctbal * 100 + 0.5) AS BIGINT)) <= 100
           AS agr_acctbal
  FROM cand c
  JOIN probes p ON c.p_suppkey = p.p_suppkey
  JOIN supplier s ON c.s_suppkey = s.s_suppkey),
sc AS (
  SELECT *,
    CAST(CASE WHEN agr_name THEN 4000 ELSE -500 END
       + CASE WHEN agr_nation THEN 1200 ELSE -2500 END
       + CASE WHEN agr_acctbal THEN 2000 ELSE -1000 END AS BIGINT)
      AS fs_score
  FROM en)
SELECT p_suppkey, s_suppkey, dist, agr_name, agr_nation, agr_acctbal,
  fs_score,
  CASE WHEN fs_score >= 2500 THEN 'match'
       WHEN fs_score >= 0 THEN 'possible'
       ELSE 'non_match' END AS decision
FROM sc ORDER BY p_suppkey, s_suppkey
"""


# q255: Spearman — same x2 tied-average integer ranks from the
# distinct-value histogram, then the q188/q238 correlation formula.
ORACLES["q255_grouped_spearman"] = """
WITH o AS (
  SELECT o_orderpriority AS g,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS y
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
cx AS (
  SELECT g, x, count(*) AS c FROM o GROUP BY 1, 2),
rx AS (
  SELECT g, x,
         2 * (sum(c) OVER (PARTITION BY g ORDER BY x) - c) + c + 1
           AS r2x
  FROM cx),
cy AS (
  SELECT g, y, count(*) AS c FROM o GROUP BY 1, 2),
ry AS (
  SELECT g, y,
         2 * (sum(c) OVER (PARTITION BY g ORDER BY y) - c) + c + 1
           AS r2y
  FROM cy),
ranked AS (
  SELECT o.g, CAST(rx.r2x AS HUGEINT) AS a, CAST(ry.r2y AS HUGEINT) AS b
  FROM o JOIN rx ON o.g = rx.g AND o.x = rx.x
         JOIN ry ON o.g = ry.g AND o.y = ry.y),
agg AS (
  SELECT g, CAST(count(*) AS HUGEINT) AS n,
         sum(a) AS sx, sum(b) AS sy,
         sum(a * b) AS sxy, sum(a * a) AS sxx, sum(b * b) AS syy
  FROM ranked GROUP BY 1)
SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
        AND CAST(n * syy - sy * sy AS DOUBLE) > 0
    THEN CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
  END AS r
FROM agg ORDER BY o_orderpriority
"""


# q256: merge_asof surface — INDEPENDENT correlated-subquery
# formulation (the Spark side is the union-window scan).
ORACLES["q256_asof_directions"] = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
buys AS (
  SELECT user_id, ts,
         max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id, c.user_id,
  (SELECT b.cents FROM buys b
   WHERE b.user_id = c.user_id AND b.ts <= c.ts
   ORDER BY b.ts DESC LIMIT 1) AS v_back,
  (SELECT b.cents FROM buys b
   WHERE b.user_id = c.user_id AND b.ts >= c.ts
     AND epoch_us(b.ts) - epoch_us(c.ts) <= 172800000000
   ORDER BY b.ts ASC LIMIT 1) AS v_fwd,
  (SELECT b.cents FROM buys b
   WHERE b.user_id = c.user_id
   ORDER BY abs(epoch_us(b.ts) - epoch_us(c.ts)) ASC,
            (b.ts > c.ts) ASC
   LIMIT 1) AS v_near
FROM clicks c ORDER BY c.event_id
"""


# q257: char-4-gram near-dup — q32's band/verify SQL over character
# shingles of the normalized string.
_CHAR_SHINGLES4 = """
list_distinct(
  CASE WHEN length(norm) - 3 >= 1 THEN
    list_transform(range(1, length(norm) - 2),
                   i -> substr(norm, CAST(i AS INT), 4))
  ELSE [] END)
"""

ORACLES["q257_char_shingle_neardup"] = f"""
WITH d AS (
  SELECT doc_id, {_NORM} AS norm FROM documents),
sh AS (
  SELECT doc_id AS id, {_CHAR_SHINGLES4} AS grams FROM d),
sigs AS (
  SELECT id, grams, CASE WHEN len(grams) > 0 THEN {_MH8} END AS sig FROM sh),
bands AS ({_BANDS32}),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
verified AS (
  SELECT id_a, id_b,
    CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
      / (CAST(len(sa.grams) + len(sb.grams) AS DOUBLE)
         - CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE))
      AS jaccard
  FROM cands
  JOIN sigs sa ON sa.id = id_a
  JOIN sigs sb ON sb.id = id_b)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.6
"""


# q258: ancestor closure — DuckDB's native WITH RECURSIVE vs Spark's
# pointer doubling.  converged is literal TRUE: the decimal hierarchy
# is ≤ 6 levels deep at every test sf, so 6 doubling rounds always
# close it (the non-converged path is pinned by unit test instead).
ORACLES["q258_ancestor_closure"] = """
WITH RECURSIVE e AS (
  SELECT p_partkey AS child, p_partkey // 10 AS parent
  FROM part WHERE p_partkey >= 10
  GROUP BY 1, 2),
anc AS (
  SELECT child AS node, parent AS ancestor, 1 AS dist FROM e
  UNION ALL
  SELECT a.node, e.parent, a.dist + 1
  FROM anc a JOIN e ON a.ancestor = e.child)
SELECT node, ancestor, CAST(dist AS INTEGER) AS dist, TRUE AS converged
FROM anc ORDER BY node, dist
"""


# q259: fixed-point IPF — the same two alternating half-rounds as
# chained CTEs (floor(w*target/margin + 0.5) requantization each).
ORACLES["q259_ipf_raking"] = """
WITH cells AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c,
         CAST(count(*) AS BIGINT) AS w
  FROM orders GROUP BY 1, 2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders),
rt AS (SELECT DISTINCT r, (SELECT t // 5 FROM tot) AS rt FROM cells),
ct AS (SELECT DISTINCT c, (SELECT t // 3 FROM tot) AS ct FROM cells),
r1 AS (
  SELECT cells.r, cells.c,
    CASE WHEN rm.m > 0 THEN CAST(floor(
      CAST(w AS DOUBLE) * CAST(rt.rt AS DOUBLE) / CAST(rm.m AS DOUBLE)
      + 0.5) AS BIGINT) ELSE w END AS w
  FROM cells
  JOIN (SELECT r, sum(w) AS m FROM cells GROUP BY 1) rm ON cells.r = rm.r
  JOIN rt ON cells.r = rt.r),
c1 AS (
  SELECT r1.r, r1.c,
    CASE WHEN cm.m > 0 THEN CAST(floor(
      CAST(w AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(cm.m AS DOUBLE)
      + 0.5) AS BIGINT) ELSE w END AS w
  FROM r1
  JOIN (SELECT c, sum(w) AS m FROM r1 GROUP BY 1) cm ON r1.c = cm.c
  JOIN ct ON r1.c = ct.c),
r2 AS (
  SELECT c1.r, c1.c,
    CASE WHEN rm.m > 0 THEN CAST(floor(
      CAST(w AS DOUBLE) * CAST(rt.rt AS DOUBLE) / CAST(rm.m AS DOUBLE)
      + 0.5) AS BIGINT) ELSE w END AS w
  FROM c1
  JOIN (SELECT r, sum(w) AS m FROM c1 GROUP BY 1) rm ON c1.r = rm.r
  JOIN rt ON c1.r = rt.r),
c2 AS (
  SELECT r2.r, r2.c,
    CASE WHEN cm.m > 0 THEN CAST(floor(
      CAST(w AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(cm.m AS DOUBLE)
      + 0.5) AS BIGINT) ELSE w END AS w
  FROM r2
  JOIN (SELECT c, sum(w) AS m FROM r2 GROUP BY 1) cm ON r2.c = cm.c
  JOIN ct ON r2.c = ct.c)
SELECT r AS o_orderpriority, c AS o_orderstatus, w
FROM c2 ORDER BY o_orderpriority, o_orderstatus
"""


# q260: peak concurrency — INDEPENDENT quadratic formulation: per
# interval, count the group's intervals covering its start (the peak
# is always attained at some start under [s, e) semantics).
ORACLES["q260_peak_concurrency"] = """
WITH iv AS (
  SELECT event_id AS eid, event_type AS k, ts AS s,
         make_timestamp(epoch_us(ts)
                        + (60 + event_id % 540) * 1000000) AS e
  FROM events WHERE event_id % 11 = 0),
conc AS (
  SELECT i.k, i.eid, i.s, CAST(count(*) AS BIGINT) AS c
  FROM iv i JOIN iv j ON j.k = i.k AND j.s <= i.s AND i.s < j.e
  GROUP BY i.k, i.eid, i.s),
peaks AS (SELECT k, max(c) AS peak FROM conc GROUP BY k)
SELECT conc.k AS event_type, peaks.peak,
       strftime(min(conc.s), '%Y-%m-%d %H:%M:%S.%f') AS at_ts
FROM conc JOIN peaks ON conc.k = peaks.k AND conc.c = peaks.peak
GROUP BY 1, 2
ORDER BY event_type
"""


# q261: semi-additive balances — row_number picks each (account,
# month)'s last observation under the same (ts, event_id) total
# order; decimal(18,2) keeps the cross-account sum exact.
ORACLES["q261_semi_additive_balance"] = """
WITH obs AS (
  SELECT user_id % 100 AS account,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         ts, event_id, CAST(value AS DECIMAL(18,2)) AS bal
  FROM events),
last AS (
  SELECT account, day, bal,
         row_number() OVER (PARTITION BY account, day
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM obs)
SELECT day, CAST(sum(bal) AS DOUBLE) AS balance_total,
       CAST(count(*) AS BIGINT) AS n_accounts
FROM last WHERE rn = 1 GROUP BY day ORDER BY day
"""


# q262: k-anonymity / l-diversity audit — equivalence classes over
# (nation, 1000-unit balance band), sensitive = market segment.
ORACLES["q262_k_anonymity_audit"] = """
WITH classes AS (
  SELECT c_nationkey, floor(c_acctbal / 1000.0) AS bal_band,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct
  FROM customer GROUP BY 1, 2)
SELECT class_size,
       (class_size < 5 OR l_distinct < 2) AS at_risk,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       min(l_distinct) AS min_l
FROM classes GROUP BY 1, 2 ORDER BY class_size, at_risk
"""


# q263: golden record — per-field winner via an INDEPENDENT
# row_number-per-field formulation (presence, recency, tiebreak).
ORACLES["q263_golden_record"] = """
WITH cust AS (SELECT * FROM customer WHERE c_custkey % 97 = 0),
recs AS (
  SELECT c_custkey AS custkey,
         CASE WHEN c_custkey % 3 <> 0 THEN c_name END AS name,
         CAST(NULL AS VARCHAR) AS segment, 1 AS ts, 1 AS src
  FROM cust
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR),
         CASE WHEN c_custkey % 5 <> 0 THEN c_mktsegment END, 2, 2
  FROM cust),
nm AS (
  SELECT custkey, name, row_number() OVER (
    PARTITION BY custkey
    ORDER BY (name IS NOT NULL) DESC, ts DESC, src DESC) AS rn
  FROM recs),
ad AS (
  SELECT custkey, segment, row_number() OVER (
    PARTITION BY custkey
    ORDER BY (segment IS NOT NULL) DESC, ts DESC, src DESC) AS rn
  FROM recs),
cnt AS (SELECT custkey, CAST(count(*) AS BIGINT) AS n_records
        FROM recs GROUP BY 1)
SELECT cnt.custkey, nm.name, ad.segment, cnt.n_records
FROM cnt
JOIN nm ON nm.custkey = cnt.custkey AND nm.rn = 1
JOIN ad ON ad.custkey = cnt.custkey AND ad.rn = 1
ORDER BY cnt.custkey
"""


# q264: interval gaps — INDEPENDENT one-pass formulation: a gap is
# start minus the running max of all prior ends, when positive.
ORACLES["q264_interval_gaps"] = """
WITH iv AS (
  SELECT event_type AS k, epoch_us(ts) AS s,
         epoch_us(ts) + (60 + event_id % 540) * 1000000 AS e
  FROM events WHERE event_id % 11 = 0),
o AS (
  SELECT k, s,
         max(e) OVER (PARTITION BY k ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv),
g AS (SELECT k, s - pm AS gap FROM o WHERE pm IS NOT NULL AND s > pm)
SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS total_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g GROUP BY k ORDER BY event_type
"""


# q265: conversation audit — INDEPENDENT explode+window formulation
# of the array-native Spark audit (1-based subscripts → i-1).
ORACLES["q265_conversation_audit"] = """
WITH conv AS (
  SELECT doc_id, source,
         list_slice(string_split(text, ' '), 1,
                    CAST(1 + doc_id % 6 AS INTEGER)) AS turns
  FROM documents),
conv2 AS (SELECT * FROM conv WHERE len(turns) >= 2),
t AS (
  SELECT doc_id, source,
         unnest(turns) AS turn,
         generate_subscripts(turns, 1) AS i
  FROM conv2),
t2 AS (
  SELECT doc_id, source, turn, i,
         CASE WHEN doc_id % 7 = 0 THEN 0
              ELSE (i - 1 + doc_id) % 2 END AS role
  FROM t),
t3 AS (
  SELECT doc_id, source, turn, i, role,
         lag(role) OVER (PARTITION BY doc_id ORDER BY i) AS prev_role
  FROM t2),
per_conv AS (
  SELECT doc_id, source,
         CAST(count(*) AS INTEGER) AS n_turns,
         CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
              AS INTEGER) AS n_violations,
         bool_or(i = 1 AND role = 0) AS starts_role0,
         CAST(sum(CASE WHEN role = 0 THEN length(turn) ELSE 0 END)
              AS BIGINT) AS chars_role0,
         CAST(sum(length(turn)) AS BIGINT) AS chars_total
  FROM t3 GROUP BY 1, 2)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_convs,
       CAST(sum(CASE WHEN n_violations > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bad,
       CAST(sum(CASE WHEN starts_role0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_role0_first,
       CAST(sum(chars_role0) AS BIGINT) AS chars_role0,
       CAST(sum(chars_total) AS BIGINT) AS chars_total,
       CAST(sum(n_turns) AS BIGINT) AS n_turns_total
FROM per_conv GROUP BY source ORDER BY source
"""


# q266: bitemporal as-of — same log construction; winner via
# row_number over (valid DESC, tx DESC) after the two as-of filters.
ORACLES["q266_bitemporal_asof"] = """
WITH base AS (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         date_diff('day', TIMESTAMP '1990-01-01', o_orderdate)
           * 10000000000 + o_orderkey AS valid,
         1 AS tx, CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_custkey % 50 = 0),
corr AS (
  SELECT custkey, orderkey, valid, 2 AS tx,
         CAST(price + 100 AS DECIMAL(18,2)) AS price
  FROM base WHERE orderkey % 4 = 0),
log AS (SELECT * FROM base UNION ALL SELECT * FROM corr),
f AS (
  SELECT * FROM log
  WHERE valid <= date_diff('day', TIMESTAMP '1990-01-01',
                           TIMESTAMP '1997-06-30')
                   * 10000000000 + 9999999999
    AND tx <= 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY custkey
                               ORDER BY valid DESC, tx DESC) AS rn
  FROM f)
SELECT custkey, orderkey, CAST(price AS DOUBLE) AS price,
       CAST(valid AS BIGINT) AS valid, tx
FROM r WHERE rn = 1 ORDER BY custkey
"""


# q267: DSIR-style selection — favored buckets by exact integer
# cross-multiply, doc affinity by integer-division decile band.
ORACLES["q267_dsir_selection"] = """
WITH tgt AS (SELECT text FROM documents WHERE source IN ('src1','src2')),
rawd AS (SELECT doc_id, text FROM documents
         WHERE source NOT IN ('src1','src2')),
ttok AS (
  SELECT ('0x' || substr(md5(t), 1, 7))::BIGINT % 4096 AS bucket
  FROM (SELECT unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
        FROM tgt)),
rtok AS (
  SELECT ('0x' || substr(md5(t), 1, 7))::BIGINT % 4096 AS bucket
  FROM (SELECT unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
        FROM rawd)),
tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM ttok GROUP BY 1),
rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM rtok GROUP BY 1),
b AS (
  SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
         coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
  FROM tc FULL JOIN rc ON tc.bucket = rc.bucket),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
               CAST(sum(cr) AS BIGINT) AS tr FROM b),
fav AS (SELECT bucket, (ct * tr > cr * tt) AS favored FROM b CROSS JOIN tot),
dtok AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 7))::BIGINT % 4096 AS bucket
  FROM (SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
        FROM rawd)),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(CASE WHEN coalesce(favored, FALSE) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_fav
  FROM dtok LEFT JOIN fav USING (bucket) GROUP BY 1)
SELECT CAST(n_fav * 10 // n_tok AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tot_tok,
       CAST(sum(n_fav) AS BIGINT) AS tot_fav
FROM sc GROUP BY 1 ORDER BY band
"""


# q268: Hamilton apportionment — integer base DIV/%, leftovers to the
# largest remainders, nationkey-ascending tie-break.
ORACLES["q268_largest_remainder"] = """
WITH pop AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS pop
             FROM customer GROUP BY 1),
tot AS (SELECT CAST(sum(pop) AS BIGINT) AS w FROM pop),
q AS (
  SELECT c_nationkey, pop,
         CAST(pop * 1000 // w AS BIGINT) AS base,
         CAST((pop * 1000) % w AS BIGINT) AS rem
  FROM pop CROSS JOIN tot),
lo AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS leftover FROM q),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, c_nationkey ASC)
        AS rk FROM q)
SELECT n_name AS nation, pop, base, rem,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM r CROSS JOIN lo JOIN nation ON c_nationkey = n_nationkey
ORDER BY nation
"""


# q269: two-round bipartite majority label propagation — INDEPENDENT
# NOT-IN/row_number formulation of the anti-join + vote windows.
ORACLES["q269_label_propagation"] = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS u, l_suppkey AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
seeds AS (SELECT c_custkey AS u, c_mktsegment AS label
          FROM customer WHERE c_custkey % 3 = 0),
vv AS (
  SELECT v, label, CAST(count(DISTINCT u) AS BIGINT) AS votes
  FROM edges JOIN seeds USING (u) GROUP BY 1, 2),
vl AS (
  SELECT v, label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY v ORDER BY votes DESC, label ASC) AS rk FROM vv)
  WHERE rk = 1),
ue AS (SELECT e.u, e.v FROM edges e
       WHERE e.u NOT IN (SELECT u FROM seeds)),
uv AS (
  SELECT u, label, CAST(count(DISTINCT v) AS BIGINT) AS votes
  FROM ue JOIN vl USING (v) GROUP BY 1, 2),
win AS (
  SELECT u, label, votes FROM (
    SELECT *, row_number() OVER (
      PARTITION BY u ORDER BY votes DESC, label ASC) AS rk FROM uv)
  WHERE rk = 1),
reach AS (
  SELECT u, CAST(count(DISTINCT v) AS BIGINT) AS n_labeled_neighbors
  FROM ue JOIN (SELECT v FROM vl) USING (v) GROUP BY 1)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN label = actual THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(sum(votes) AS BIGINT) AS tot_votes,
       CAST(sum(n_labeled_neighbors) AS BIGINT) AS tot_reach
FROM win JOIN reach USING (u)
JOIN (SELECT c_custkey AS u, c_mktsegment AS actual FROM customer)
  USING (u)
GROUP BY label ORDER BY label
"""


# q270: HITS (2 unnormalized integer iterations) — h0=1, a1=Σh0,
# h1=Σa1, a2=Σh1; top-12 authorities, suppkey-ascending tie-break.
ORACLES["q270_hits_authorities"] = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS s, l_suppkey AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
a1 AS (SELECT d, CAST(count(*) AS BIGINT) AS a FROM edges GROUP BY 1),
h1 AS (SELECT s, CAST(sum(a) AS BIGINT) AS h
       FROM edges JOIN a1 USING (d) GROUP BY 1),
a2 AS (SELECT d, CAST(sum(h) AS BIGINT) AS a
       FROM edges JOIN h1 USING (s) GROUP BY 1)
SELECT s_name, a AS authority
FROM a2 JOIN supplier ON d = s_suppkey
WHERE a > 0
ORDER BY a DESC, d ASC
LIMIT 12
"""


# q271: rendezvous resharding 10→11 — argmax md5(id|s) weight per
# row, movement audit; INDEPENDENT row_number formulation of the
# struct array_max.
ORACLES["q271_rendezvous_resharding"] = """
WITH d AS (SELECT doc_id FROM documents),
c10 AS (
  SELECT doc_id, s,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
            CAST(s AS VARCHAR)), 1, 15))::BIGINT AS w
  FROM d CROSS JOIN (SELECT unnest(range(10)) AS s)),
r10 AS (
  SELECT doc_id, s AS shard FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY w DESC, s DESC) AS rk FROM c10)
  WHERE rk = 1),
c11 AS (
  SELECT doc_id, s,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
            CAST(s AS VARCHAR)), 1, 15))::BIGINT AS w
  FROM d CROSS JOIN (SELECT unnest(range(11)) AS s)),
r11 AS (
  SELECT doc_id, s AS shard11 FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY w DESC, s DESC) AS rk FROM c11)
  WHERE rk = 1)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN shard <> shard11 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved,
       CAST(sum(CASE WHEN shard11 = 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_to_new
FROM r10 JOIN r11 USING (doc_id)
GROUP BY shard ORDER BY shard
"""


# q272: FIFO COGS — INDEPENDENT formulation of the same cumulative-
# axis overlap (the math is the spec; both engines derive it from
# their own window/join machinery).
ORACLES["q272_fifo_cogs"] = """
WITH li AS (
  SELECT l_partkey AS k,
         l_orderkey * 10 + l_linenumber AS seq,
         CAST(l_quantity AS BIGINT) AS q,
         (l_suppkey % 90) + 10 AS cost,
         l_linenumber % 2 AS par
  FROM lineitem WHERE l_partkey % 61 = 0),
lots AS (
  SELECT k, seq, q, cost,
         sum(q) OVER (PARTITION BY k ORDER BY seq) AS cb
  FROM li WHERE par = 1),
sells0 AS (
  SELECT k, seq, greatest(1, q // 2) AS q FROM li WHERE par = 0),
sells1 AS (
  SELECT k, seq, q,
         sum(q) OVER (PARTITION BY k ORDER BY seq) AS cs
  FROM sells0),
btot AS (SELECT k, CAST(sum(q) AS BIGINT) AS b FROM lots GROUP BY 1),
sells AS (
  SELECT s.k, s.seq, s.q, s.cs FROM sells1 s
  JOIN btot USING (k) WHERE s.cs <= b),
m AS (
  SELECT l.k, s.seq AS sseq, s.q AS sq,
         least(l.cb, s.cs) - greatest(l.cb - l.q, s.cs - s.q) AS mq,
         l.cost
  FROM lots l JOIN sells s
    ON l.k = s.k AND (l.cb - l.q) < s.cs AND (s.cs - s.q) < l.cb),
per_sell AS (
  SELECT k, sseq, sq,
         CAST(sum(mq) AS BIGINT) AS filled,
         CAST(sum(mq * cost) AS BIGINT) AS cogs
  FROM m GROUP BY 1, 2, 3)
SELECT k, CAST(count(*) AS BIGINT) AS n_sells,
       CAST(sum(sq) AS BIGINT) AS qty_sold,
       CAST(sum(filled) AS BIGINT) AS qty_filled,
       CAST(sum(cogs) AS BIGINT) AS cogs
FROM per_sell GROUP BY k ORDER BY k
"""


# q273: negative sampling — md5(user:slot) proposals, min-slot dedup,
# anti-join vs positives, first-5 per user; shortfall histogram.
ORACLES["q273_negative_sampling"] = """
WITH pos AS (
  SELECT DISTINCT o_custkey AS u, l_partkey % 50 AS item
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey % 7 = 0),
users AS (SELECT DISTINCT u FROM pos),
cand AS (
  SELECT u, s AS slot,
         ('0x' || substr(md5(CAST(u AS VARCHAR) || ':' ||
            CAST(s AS VARCHAR)), 1, 15))::BIGINT % 50 AS item
  FROM users CROSS JOIN (SELECT unnest(range(15)) AS s)),
first AS (
  SELECT u, item, CAST(min(slot) AS BIGINT) AS slot
  FROM cand GROUP BY 1, 2),
neg AS (
  SELECT f.* FROM first f
  WHERE NOT EXISTS (SELECT 1 FROM pos p
                    WHERE p.u = f.u AND p.item = f.item)),
kept AS (
  SELECT u, item, slot FROM (
    SELECT *, row_number() OVER (PARTITION BY u ORDER BY slot) AS rk
    FROM neg)
  WHERE rk <= 5),
per_user AS (
  SELECT u, CAST(count(*) AS BIGINT) AS n_neg,
         CAST(sum(slot) AS BIGINT) AS slot_sum,
         CAST(count(DISTINCT item) AS BIGINT) AS n_items
  FROM kept GROUP BY 1)
SELECT n_neg, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(slot_sum) AS BIGINT) AS tot_slot,
       CAST(sum(n_items) AS BIGINT) AS tot_items
FROM per_user GROUP BY 1 ORDER BY n_neg
"""


# q274: FD violation census — TPC-H data is NULL-free so DuckDB's
# count(DISTINCT) formulation is equivalent to the distinct-pair count.
ORACLES["q274_fd_audit"] = """
WITH a AS (
  SELECT 'p_partkey->p_name' AS fd, CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
         CAST(max(n) AS BIGINT) AS max_rhs_distinct
  FROM (SELECT p_partkey, count(DISTINCT p_name) AS n
        FROM part GROUP BY 1)),
b AS (
  SELECT 'p_brand->p_type', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(n) AS BIGINT)
  FROM (SELECT p_brand, count(DISTINCT p_type) AS n
        FROM part GROUP BY 1)),
c AS (
  SELECT 'p_type->p_size', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(n) AS BIGINT)
  FROM (SELECT p_type, count(DISTINCT p_size) AS n
        FROM part GROUP BY 1)),
d AS (
  SELECT 'o_custkey->o_orderpriority', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
         CAST(max(n) AS BIGINT)
  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS n
        FROM orders GROUP BY 1))
SELECT * FROM a UNION ALL SELECT * FROM b
UNION ALL SELECT * FROM c UNION ALL SELECT * FROM d
ORDER BY fd
"""


# q275: time-respecting two-hop reach — INDEPENDENT single self-join
# formulation over the parity-encoded bipartite edge list.
ORACLES["q275_temporal_reach"] = """
WITH ord_s AS (
  SELECT o_orderkey, o_custkey * 2 AS cnode,
         date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
           AS day
  FROM orders WHERE o_custkey % 11 = 0),
pairs AS (
  SELECT DISTINCT cnode, l_suppkey * 2 + 1 AS snode, day
  FROM lineitem JOIN ord_s ON l_orderkey = o_orderkey),
edges AS (
  SELECT cnode AS src, snode AS dst, day AS t FROM pairs
  UNION ALL
  SELECT snode, cnode, day FROM pairs),
reach AS (
  SELECT e1.src AS u, CAST(count(DISTINCT e2.dst) AS BIGINT)
           AS n_reachable
  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
  WHERE e1.t <= e2.t AND e2.t - e1.t <= 30 AND e2.dst <> e1.src
  GROUP BY 1)
SELECT n_reachable, CAST(count(*) AS BIGINT) AS n_customers
FROM reach WHERE u % 2 = 0 GROUP BY 1 ORDER BY n_reachable
"""


# q276: SAX words — PAA equal-count segments, per-segment mean (one
# IEEE division of exact ints), rank-equiprobable banding, digit word.
ORACLES["q276_sax_symbols"] = """
WITH daily AS (
  SELECT event_type AS k, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS v
  FROM events GROUP BY 1, 2),
c AS (
  SELECT k, d, v,
         row_number() OVER (PARTITION BY k ORDER BY d) AS rn,
         count(*) OVER (PARTITION BY k) AS n
  FROM daily),
seg AS (SELECT k, n, (rn - 1) * 8 // n AS seg, v FROM c),
m AS (
  SELECT k, n, seg, CAST(sum(v) AS BIGINT) / count(*) AS mean
  FROM seg GROUP BY 1, 2, 3),
b AS (
  SELECT k, n, seg,
         row_number() OVER (PARTITION BY k ORDER BY mean, seg) AS rk,
         count(*) OVER (PARTITION BY k) AS nseg
  FROM m),
w AS (SELECT k, n, seg, (rk - 1) * 4 // nseg AS band FROM b)
SELECT k AS event_type, CAST(n AS BIGINT) AS n_points,
       string_agg(CAST(band AS VARCHAR), '' ORDER BY seg) AS sax
FROM w GROUP BY 1, 2 ORDER BY event_type
"""


# q277: group medoids — q46's closure gives the groups; the medoid is
# the exact symmetric-difference argmin, ties by ascending doc id.
# Mirrors group_medoids' full branch structure (components.py:739):
# the max_group=1000 giant-group guard (NULL medoid / NULL sum_dist),
# the singleton branch (own medoid, sum_dist 0), and the pair join
# confined to admitted groups — so parity holds even at scale factors
# where a near-dup group exceeds the bound.
ORACLES["q277_group_medoids"] = f"""
WITH grp AS (SELECT * FROM ({ORACLES["q46_neardup_groups"]})),
d AS (SELECT doc_id, {{_NT}} AS toks FROM documents),
sh AS (SELECT doc_id, {{_SH}} AS grams FROM d),
sizes AS (
  SELECT rep_id AS group_id, count(*) AS gsz FROM (
    SELECT * FROM ({ORACLES["q46_neardup_groups"]})
  ) GROUP BY 1),
mem AS (
  SELECT g.doc_id, g.rep_id AS group_id, s.gsz AS group_size, sh.grams
  FROM grp g JOIN sizes s ON g.rep_id = s.group_id
  JOIN sh USING (doc_id)
  WHERE s.gsz <= 1000),
pd AS (
  SELECT a.group_id, a.doc_id AS ia, a.group_size,
         CAST(sum(len(a.grams) + len(b.grams)
              - 2 * len(list_intersect(a.grams, b.grams))) AS BIGINT)
           AS dsum
  FROM mem a JOIN mem b
    ON a.group_id = b.group_id AND a.doc_id <> b.doc_id
  GROUP BY 1, 2, 3),
best AS (
  SELECT group_id, ia AS medoid,
         CAST(group_size AS BIGINT) AS group_size, dsum AS sum_dist,
         row_number() OVER (PARTITION BY group_id ORDER BY dsum, ia)
           AS rk
  FROM pd),
picked AS (
  SELECT group_id, medoid, group_size, sum_dist
  FROM best WHERE rk = 1),
singles AS (
  SELECT group_id, min(doc_id) AS medoid,
         CAST(1 AS BIGINT) AS group_size, CAST(0 AS BIGINT) AS sum_dist
  FROM mem WHERE group_size = 1 GROUP BY group_id),
giants AS (
  SELECT group_id, CAST(NULL AS BIGINT) AS medoid,
         CAST(gsz AS BIGINT) AS group_size,
         CAST(NULL AS BIGINT) AS sum_dist
  FROM sizes WHERE gsz > 1000)
SELECT * FROM picked
UNION ALL SELECT * FROM singles
UNION ALL SELECT * FROM giants
ORDER BY group_id
"""
ORACLES["q277_group_medoids"] = (
    ORACLES["q277_group_medoids"]
    .replace("{_NT}", _NORMTOKS)
    .replace("{_SH}", _SHINGLES)
)


# q278: deterministic walks — 3 unrolled argmin-hash steps; dead ends
# carry forward (none occur on this bipartite graph, but the branch
# is mirrored for fidelity).
ORACLES["q278_deterministic_walks"] = """
WITH ord_s AS (
  SELECT o_orderkey, o_custkey * 2 AS cnode
  FROM orders WHERE o_custkey % 11 = 0),
pairs AS (
  SELECT DISTINCT cnode, l_suppkey * 2 + 1 AS snode
  FROM lineitem JOIN ord_s ON l_orderkey = o_orderkey),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode, cnode FROM pairs),
seeds AS (
  SELECT DISTINCT cnode AS seed FROM pairs WHERE cnode % 110 = 0),
s0 AS (
  SELECT seed, w AS walk, seed AS cur, [seed] AS path
  FROM seeds CROSS JOIN (SELECT unnest(range(2)) AS w)),
c1 AS (
  SELECT s.seed, s.walk, e.dst AS nxt, s.path,
         row_number() OVER (PARTITION BY s.seed, s.walk ORDER BY
           ('0x' || substr(md5(CAST(s.seed AS VARCHAR) || '|' ||
             CAST(s.walk AS VARCHAR) || '|1|' ||
             CAST(e.dst AS VARCHAR)), 1, 15))::BIGINT, e.dst) AS rk
  FROM s0 s JOIN edges e ON s.cur = e.src),
s1 AS (
  SELECT seed, walk, nxt AS cur, list_append(path, nxt) AS path
  FROM c1 WHERE rk = 1
  UNION ALL
  SELECT s.seed, s.walk, s.cur, s.path FROM s0 s
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = s.cur)),
c2 AS (
  SELECT s.seed, s.walk, e.dst AS nxt, s.path,
         row_number() OVER (PARTITION BY s.seed, s.walk ORDER BY
           ('0x' || substr(md5(CAST(s.seed AS VARCHAR) || '|' ||
             CAST(s.walk AS VARCHAR) || '|2|' ||
             CAST(e.dst AS VARCHAR)), 1, 15))::BIGINT, e.dst) AS rk
  FROM s1 s JOIN edges e ON s.cur = e.src),
s2 AS (
  SELECT seed, walk, nxt AS cur, list_append(path, nxt) AS path
  FROM c2 WHERE rk = 1
  UNION ALL
  SELECT s.seed, s.walk, s.cur, s.path FROM s1 s
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = s.cur)),
c3 AS (
  SELECT s.seed, s.walk, e.dst AS nxt, s.path,
         row_number() OVER (PARTITION BY s.seed, s.walk ORDER BY
           ('0x' || substr(md5(CAST(s.seed AS VARCHAR) || '|' ||
             CAST(s.walk AS VARCHAR) || '|3|' ||
             CAST(e.dst AS VARCHAR)), 1, 15))::BIGINT, e.dst) AS rk
  FROM s2 s JOIN edges e ON s.cur = e.src),
s3 AS (
  SELECT seed, walk, nxt AS cur, list_append(path, nxt) AS path
  FROM c3 WHERE rk = 1
  UNION ALL
  SELECT s.seed, s.walk, s.cur, s.path FROM s2 s
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = s.cur))
SELECT seed, CAST(walk AS BIGINT) AS walk,
       CAST(len(path) - 1 AS BIGINT) AS steps,
       path[len(path)] AS final,
       array_to_string(path, '-') AS path_str
FROM s3 ORDER BY seed, walk
"""


# q279: max-min fair allocation — closed-form sorted waterline; the
# monotone satisfied flag, residual even split, key-asc leftovers.
ORACLES["q279_maxmin_fair_quota"] = """
WITH dem AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS d
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
s AS (
  SELECT c_nationkey, d,
         row_number() OVER (ORDER BY d, c_nationkey) AS i,
         sum(d) OVER (ORDER BY d, c_nationkey
           ROWS UNBOUNDED PRECEDING) AS prefix,
         count(*) OVER () AS n
  FROM dem),
f AS (SELECT *, (d * (n - i) + prefix <= 5000) AS satisfied FROM s),
r AS (
  SELECT CAST(coalesce(sum(CASE WHEN satisfied THEN d END), 0)
           AS BIGINT) AS sat_sum,
         CAST(sum(CASE WHEN NOT satisfied THEN 1 ELSE 0 END)
           AS BIGINT) AS m
  FROM f),
u AS (
  SELECT f.*, sum(CASE WHEN NOT satisfied THEN 1 ELSE 0 END)
           OVER (ORDER BY c_nationkey ROWS UNBOUNDED PRECEDING) AS u_rk
  FROM f)
SELECT n_name AS tenant, d AS demand,
       CAST(CASE WHEN satisfied THEN d
            ELSE (5000 - sat_sum) // m
                 + CASE WHEN u_rk <= (5000 - sat_sum) % m
                        THEN 1 ELSE 0 END
            END AS BIGINT) AS alloc,
       satisfied
FROM u CROSS JOIN r JOIN nation ON c_nationkey = n_nationkey
ORDER BY tenant
"""


# q280: percentile drift probe — exact rank grid from the reference
# third, correlated-count banding for the rest.
ORACLES["q280_percentile_drift_probe"] = """
WITH ref AS (
  SELECT n_chars AS v, doc_id AS id FROM documents WHERE doc_id % 3 = 0),
rk AS (SELECT v, row_number() OVER (ORDER BY v, id) AS r FROM ref),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
pos AS (
  SELECT p, 1 + ((n - 1) * p) // 20 AS idx
  FROM n CROSS JOIN (SELECT unnest(range(21)) AS p)),
grid AS (SELECT p, v AS gv FROM pos JOIN rk ON idx = r),
probe AS (
  SELECT doc_id, n_chars AS x FROM documents WHERE doc_id % 3 <> 0),
banded AS (
  SELECT doc_id,
         (SELECT count(*) FROM grid g WHERE g.gv <= probe.x) AS band
  FROM probe)
SELECT CAST(band AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS n_docs
FROM banded GROUP BY 1 ORDER BY band
"""


# q281: per-group Hamilton reconciliation — children sum exactly to
# each parent's budget (Σpop_region DIV 3 + 7).
ORACLES["q281_topdown_reconcile"] = """
WITH w AS (
  SELECT n_regionkey, n_nationkey, CAST(count(*) AS BIGINT) AS pop
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
b AS (
  SELECT n_regionkey,
         CAST(sum(pop) // 3 + 7 AS BIGINT) AS s,
         CAST(sum(pop) AS BIGINT) AS wt
  FROM w GROUP BY 1),
q AS (
  SELECT w.n_regionkey, w.n_nationkey, w.pop,
         CAST(w.pop * b.s // b.wt AS BIGINT) AS base,
         CAST((w.pop * b.s) % b.wt AS BIGINT) AS rem,
         b.s
  FROM w JOIN b USING (n_regionkey)),
lo AS (
  SELECT n_regionkey, CAST(min(s) - sum(base) AS BIGINT) AS l
  FROM q GROUP BY 1),
r AS (
  SELECT q.*, row_number() OVER (
    PARTITION BY q.n_regionkey ORDER BY rem DESC, n_nationkey ASC)
    AS rk
  FROM q)
SELECT r_name AS region, n_name AS nation, pop, base, rem,
       CAST(base + CASE WHEN rk <= l THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM r
JOIN lo USING (n_regionkey)
JOIN region ON r.n_regionkey = r_regionkey
JOIN nation ON r.n_nationkey = nation.n_nationkey
ORDER BY region, nation
"""


# q282: retention sweep dry-run — keep last 3 per key OR version at/
# after the 1997 horizon; reclaim census by retained-count band.
ORACLES["q282_retention_sweep"] = """
WITH v AS (
  SELECT o_custkey AS custkey,
         date_diff('day', DATE '1990-01-01',
                   CAST(o_orderdate AS DATE)) * 10000000000
           + o_orderkey AS version,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS bytes
  FROM orders),
f AS (
  SELECT custkey, version, bytes,
         (row_number() OVER (PARTITION BY custkey
            ORDER BY version DESC, bytes DESC) <= 3
          OR version >= date_diff('day', DATE '1990-01-01',
                                  DATE '1997-01-01') * 10000000000)
           AS keep
  FROM v),
per_key AS (
  SELECT custkey,
         CAST(count(*) AS BIGINT) AS n_versions,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_keep,
         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
           AS n_reclaim,
         CAST(sum(CASE WHEN keep THEN 0 ELSE bytes END) AS BIGINT)
           AS bytes_reclaim
  FROM f GROUP BY 1)
SELECT n_keep, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n_versions) AS BIGINT) AS tot_versions,
       CAST(sum(n_reclaim) AS BIGINT) AS tot_reclaim,
       CAST(sum(bytes_reclaim) AS BIGINT) AS tot_bytes_reclaim
FROM per_key GROUP BY 1 ORDER BY n_keep
"""


# q283: decision stump — cumulative class counts over sorted bands,
# Gini score (A·nR + B·nL)/(nL·nR) as the one terminal division.
ORACLES["q283_decision_stump"] = """
WITH o AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) // 100000
           AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders),
agg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM o GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS p FROM agg),
cum AS (
  SELECT v,
         CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS nl,
         CAST(sum(pos) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS pl
  FROM agg),
cand AS (
  SELECT v AS threshold, nl AS n_left, n - nl AS n_right,
         pl AS pos_left, p - pl AS pos_right
  FROM cum CROSS JOIN tot WHERE nl < n),
scored AS (
  SELECT threshold, n_left, n_right, pos_left, pos_right,
         CAST(pos_left * pos_left
              + (n_left - pos_left) * (n_left - pos_left) AS BIGINT)
           * n_right
         + CAST(pos_right * pos_right
              + (n_right - pos_right) * (n_right - pos_right)
             AS BIGINT) * n_left AS num,
         n_left * n_right AS den
  FROM cand)
SELECT threshold, n_left, n_right, pos_left, pos_right,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS score,
       CAST(row_number() OVER (
         ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC,
                  threshold ASC) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 5
ORDER BY rank
"""


# q284: percolator — containment by counting over the term equi-join.
ORACLES["q284_percolate_routing"] = """
WITH q AS (
  SELECT * FROM (VALUES
    (1, ['spark', 'table']),
    (2, ['hash', 'join', 'row']),
    (3, ['zzz_nonexistent_term']),
    (4, ['the'])) AS t(query_id, terms)),
qe AS (
  SELECT query_id, unnest(list_distinct(terms)) AS t FROM q),
qn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
       FROM qe GROUP BY 1),
d AS (
  SELECT doc_id, unnest(list_distinct(list_filter(
           string_split_regex(lower(trim(text)), '\\s+'),
           x -> x != ''))) AS t
  FROM documents),
hits AS (
  SELECT doc_id, query_id, CAST(count(*) AS BIGINT) AS h
  FROM d JOIN qe USING (t) GROUP BY 1, 2),
m AS (
  SELECT doc_id, hits.query_id FROM hits
  JOIN qn USING (query_id) WHERE h = n_terms)
SELECT query_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS docid_sum
FROM m GROUP BY 1 ORDER BY query_id
"""


# q285: coordinated sampling — the oracle computes the OTHER side of
# the identity: sample AFTER the full join, same join-key bucket mask.
ORACLES["q285_coordinated_sample_join"] = """
WITH j AS (
  SELECT o_orderkey, o_orderpriority, l_extendedprice, l_discount
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
s AS (
  SELECT * FROM j
  WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))::BIGINT
          % 10000 < 1250)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_fp
FROM s GROUP BY 1 ORDER BY o_orderpriority
"""


# q286: watermark lateness audit — running max over ARRIVAL order per
# key; dropped iff (seen max − event time) > delay.
ORACLES["q286_lateness_audit"] = """
WITH ev AS (
  SELECT event_type, event_id AS arrival,
         epoch_us(ts) - (event_id % 13) * 60000000 AS ets
  FROM events),
l AS (
  SELECT max(ets) OVER (PARTITION BY event_type ORDER BY arrival
           ROWS UNBOUNDED PRECEDING) - ets AS late
  FROM ev),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS l0,
         CAST(sum(CASE WHEN late > 60000000 THEN 1 ELSE 0 END)
           AS BIGINT) AS l1,
         CAST(sum(CASE WHEN late > 300000000 THEN 1 ELSE 0 END)
           AS BIGINT) AS l5,
         CAST(sum(CASE WHEN late > 600000000 THEN 1 ELSE 0 END)
           AS BIGINT) AS l10
  FROM l)
SELECT CAST(0 AS BIGINT) AS delay, l0 AS n_late, n_events FROM agg
UNION ALL
SELECT 60000000, l1, n_events FROM agg
UNION ALL
SELECT 300000000, l5, n_events FROM agg
UNION ALL
SELECT 600000000, l10, n_events FROM agg
ORDER BY delay
"""


# q287: churn labels — lead over per-user event instants, week-end
# snapshot (last instant per epoch-week), 1-day horizon.
ORACLES["q287_churn_labels"] = """
WITH ev AS (
  SELECT DISTINCT user_id, epoch_us(ts) AS ets,
         epoch_us(ts) // 86400000000 // 7 AS wk
  FROM events),
led AS (
  SELECT user_id, ets, wk,
         lead(ets) OVER (PARTITION BY user_id ORDER BY ets) AS nxt
  FROM ev),
snap AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, wk ORDER BY ets DESC) AS rk
    FROM led)
  WHERE rk = 1),
lab AS (
  SELECT wk AS period, nxt - ets AS next_gap,
         (nxt IS NULL OR nxt - ets > 86400000000::BIGINT) AS churned
  FROM snap)
SELECT CAST(period AS BIGINT) AS period,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned,
       CAST(sum(CASE WHEN next_gap IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_no_return,
       CAST(sum(coalesce(next_gap, 0)) AS BIGINT) AS tot_gap_us
FROM lab GROUP BY 1 ORDER BY period
"""


# q288: CDC chunk dedup — content-anchored boundaries (md5 of the
# 8-gram ending at i, & 63 == 0), per-source fingerprint dedup.
ORACLES["q288_cdc_chunk_dedup"] = """
WITH d AS (
  SELECT doc_id, source, text, length(text) AS n
  FROM documents WHERE length(text) > 0),
cuts AS (
  SELECT doc_id, source, text, n,
         CASE WHEN n >= 9 THEN list_filter(
           list_transform(range(8, n), i ->
             CASE WHEN ('0x' || substr(md5(substr(text, CAST(i AS INT)
                          - 7, 8)), 1, 7))::BIGINT % 64 = 0
                  THEN i ELSE -1 END),
           x -> x >= 0)
         ELSE []::BIGINT[] END AS c
  FROM d),
b AS (
  SELECT doc_id, source, text,
         list_concat(list_concat([0::BIGINT], c), [n::BIGINT]) AS bs
  FROM cuts),
ch AS (
  SELECT doc_id, source,
         unnest(list_transform(range(2, len(bs) + 1), j ->
           substr(text, CAST(bs[CAST(j AS INT) - 1] AS INT) + 1,
                  CAST(bs[CAST(j AS INT)] - bs[CAST(j AS INT) - 1]
                       AS INT)))) AS chunk
  FROM b),
fp AS (
  SELECT source, md5(chunk) AS f, CAST(count(*) AS BIGINT) AS cnt,
         CAST(min(length(chunk)) AS BIGINT) AS l
  FROM ch GROUP BY 1, 2)
SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(cnt * l) AS BIGINT) AS bytes_total,
       CAST(sum(l) AS BIGINT) AS bytes_unique
FROM fp GROUP BY 1 ORDER BY source
"""


# q289: diversified top-N — per-group floors then best-overall fill,
# every rank (score desc, key asc)-keyed.
ORACLES["q289_diversified_topn"] = """
WITH o AS (
  SELECT o_orderpriority AS prio, o_orderkey AS okey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders),
r AS (
  SELECT prio, okey, cents,
         row_number() OVER (PARTITION BY prio
           ORDER BY cents DESC, okey ASC) AS rg
  FROM o),
fl AS (SELECT prio, okey, cents, 'floor' AS via FROM r WHERE rg <= 2),
nf AS (SELECT CAST(count(*) AS BIGINT) AS n_floor FROM fl),
fi AS (
  SELECT prio, okey, cents, 'fill' AS via FROM (
    SELECT r.*, row_number() OVER (
      ORDER BY cents DESC, okey ASC) AS rf
    FROM r WHERE rg > 2) CROSS JOIN nf
  WHERE rf <= greatest(40 - n_floor, 0)),
sel AS (SELECT * FROM fl UNION ALL SELECT * FROM fi)
SELECT prio, okey, cents, via,
       CAST(row_number() OVER (ORDER BY cents DESC, okey ASC)
         AS BIGINT) AS sel_rank
FROM sel ORDER BY sel_rank
"""


# q290: generalization sweep — floor-banded classes per candidate
# width; the full utility/privacy frontier.
ORACLES["q290_generalization_search"] = """
WITH w AS (SELECT unnest([100, 500, 1000, 2500, 5000, 20000]) AS width),
cls AS (
  SELECT w.width, c_nationkey,
         CAST(floor((c_acctbal + 1000) / w.width) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS sz
  FROM customer CROSS JOIN w
  GROUP BY 1, 2, 3)
SELECT CAST(width AS BIGINT) AS width,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(sz) AS BIGINT) AS min_class_size,
       CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_risk,
       (min(sz) >= 5) AS achieves_k
FROM cls GROUP BY width ORDER BY width
"""


# q291: vocab coverage — rank terms (freq desc, term asc), covered =
# Σ freq at rank ≤ k, single terminal division for the OOV rate.
# plain whitespace tokens (textstats.tokens: lower+trim+split)
_NT_PLAIN = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
    " x -> x != '')"
)
ORACLES["q291_vocab_coverage"] = f"""
WITH tok AS (
  SELECT unnest({_NT_PLAIN}) AS t FROM documents),
tf AS (SELECT t, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY 1),
r AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, t ASC) AS rank
  FROM tf),
tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens FROM tf),
ks AS (SELECT unnest([4, 8, 16, 32]) AS k)
SELECT CAST(k AS BIGINT) AS vocab_size,
       CAST(coalesce(sum(CASE WHEN rank <= k THEN freq END), 0)
         AS BIGINT) AS covered_tokens,
       CAST(min(total_tokens) AS BIGINT) AS total_tokens,
       CAST(min(total_tokens)
            - coalesce(sum(CASE WHEN rank <= k THEN freq END), 0)
            AS DOUBLE) / CAST(min(total_tokens) AS DOUBLE) AS oov_rate
FROM ks CROSS JOIN r CROSS JOIN tot
GROUP BY k ORDER BY vocab_size
"""


# q292: growth accounting — lag/lead over per-user period timelines,
# churn attributed to the first skipped period, right-censored.
ORACLES["q292_growth_accounting"] = """
WITH a AS (
  SELECT DISTINCT user_id AS u,
         epoch_us(ts) // 86400000000 // 7 AS p
  FROM events
  WHERE (user_id + epoch_us(ts) // 86400000000 // 7) % 3 <> 0),
t AS (
  SELECT u, p,
         lag(p) OVER (PARTITION BY u ORDER BY p) AS prev,
         lead(p) OVER (PARTITION BY u ORDER BY p) AS nxt
  FROM a),
st AS (
  SELECT p,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN prev = p - 1 THEN 'retained'
              ELSE 'resurrected' END AS state,
         CASE WHEN nxt IS NOT NULL AND nxt > p + 1 THEN p + 1 END
           AS churn_period
  FROM t),
bs AS (
  SELECT p AS period,
         CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_new,
         CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_retained,
         CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_resurrected
  FROM st GROUP BY 1),
ch AS (
  SELECT churn_period AS period, CAST(count(*) AS BIGINT)
           AS n_churned_in
  FROM st WHERE churn_period IS NOT NULL GROUP BY 1)
SELECT CAST(coalesce(bs.period, ch.period) AS BIGINT) AS period,
       coalesce(n_new, 0) AS n_new,
       coalesce(n_retained, 0) AS n_retained,
       coalesce(n_resurrected, 0) AS n_resurrected,
       coalesce(n_churned_in, 0) AS n_churned_in
FROM bs FULL JOIN ch ON bs.period = ch.period
ORDER BY period
"""


# q293: exclusion funnel — first purchase within the band per view,
# voided by an error strictly inside the matched interval.
ORACLES["q293_funnel_exclusion"] = """
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS ets, event_type FROM events),
a AS (SELECT u, ets AS a_ts FROM ev WHERE event_type = 'view'),
b AS (SELECT u, ets AS b_ts FROM ev WHERE event_type = 'purchase'),
x AS (SELECT u, ets AS e_ts FROM ev WHERE event_type = 'error'),
m AS (
  SELECT a.u, a.a_ts, min(b.b_ts) AS b_ts
  FROM a LEFT JOIN b ON a.u = b.u AND b.b_ts > a.a_ts
    AND b.b_ts - a.a_ts <= 172800000000
  GROUP BY 1, 2),
v AS (
  SELECT DISTINCT m.u, m.a_ts FROM m JOIN x ON m.u = x.u
  WHERE m.b_ts IS NOT NULL AND x.e_ts > m.a_ts AND x.e_ts < m.b_ts),
lab AS (
  SELECT m.u, m.a_ts, m.b_ts,
         (v.u IS NOT NULL) AS voided,
         (m.b_ts IS NOT NULL AND v.u IS NULL) AS converted
  FROM m LEFT JOIN v ON m.u = v.u AND m.a_ts = v.a_ts)
SELECT CAST(a_ts // 86400000000 AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(sum(CASE WHEN voided THEN 1 ELSE 0 END) AS BIGINT)
         AS n_voided
FROM lab GROUP BY 1 ORDER BY day
"""


# q294: FIFO open lots — waterline remaining = cb − max(S, cb0),
# clamped; INDEPENDENT of the q272 overlap-join formulation.
ORACLES["q294_fifo_open_lots"] = """
WITH li AS (
  SELECT l_partkey AS k,
         l_orderkey * 10 + l_linenumber AS seq,
         CAST(l_quantity AS BIGINT) AS q,
         (l_suppkey % 90) + 10 AS cost,
         l_linenumber % 2 AS par
  FROM lineitem WHERE l_partkey % 61 = 0),
lots AS (
  SELECT k, seq, q, cost,
         sum(q) OVER (PARTITION BY k ORDER BY seq) AS cb
  FROM li WHERE par = 1),
sells0 AS (
  SELECT k, seq, greatest(1, q // 2) AS q FROM li WHERE par = 0),
sells1 AS (
  SELECT k, seq, q,
         sum(q) OVER (PARTITION BY k ORDER BY seq) AS cs
  FROM sells0),
btot AS (SELECT k, CAST(sum(q) AS BIGINT) AS b FROM lots GROUP BY 1),
stot AS (
  SELECT s.k, CAST(sum(s.q) AS BIGINT) AS sold
  FROM sells1 s JOIN btot USING (k) WHERE s.cs <= b GROUP BY 1),
open_lots AS (
  SELECT l.k, l.seq, l.q AS lot_qty,
         greatest(0, l.cb - greatest(coalesce(stot.sold, 0),
                                     l.cb - l.q)) AS remaining,
         l.cost
  FROM lots l LEFT JOIN stot ON l.k = stot.k)
SELECT k, CAST(count(*) AS BIGINT) AS n_lots,
       CAST(sum(CASE WHEN remaining > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open,
       CAST(sum(remaining) AS BIGINT) AS qty_remaining,
       CAST(sum(remaining * cost) AS BIGINT) AS value_remaining
FROM open_lots GROUP BY k ORDER BY k
"""


# q295: missing partitions — expected grid = keys × literal period
# range; present cells anti-join away; per-user census histogram.
ORACLES["q295_missing_partitions"] = """
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) // 86400000000 AS d
  FROM events WHERE event_id % 7 < 2),
keys AS (SELECT DISTINCT u FROM ev),
grid AS (
  SELECT u, p FROM keys
  CROSS JOIN (SELECT unnest(range(19723, 19753)) AS p)),
present AS (SELECT DISTINCT u, d AS p FROM ev),
miss AS (
  SELECT g.u, g.p FROM grid g
  WHERE NOT EXISTS (SELECT 1 FROM present pr
                    WHERE pr.u = g.u AND pr.p = g.p)),
per_key AS (
  SELECT k.u,
         CAST(coalesce(count(m.p), 0) AS BIGINT) AS n_missing,
         min(m.p) AS first_missing, max(m.p) AS last_missing
  FROM keys k LEFT JOIN miss m ON k.u = m.u
  GROUP BY 1)
SELECT n_missing, CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(first_missing) AS BIGINT) AS earliest_gap,
       CAST(max(last_missing) AS BIGINT) AS latest_gap
FROM per_key GROUP BY 1 ORDER BY n_missing
"""


# q296: SLO burn — RANGE-frame window sums, exact cross-multiplied
# burn comparisons (err·den > factor·num·total).
ORACLES["q296_slo_burn"] = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS BIGINT) AS e,
         CAST(count(*) AS BIGINT) AS t
  FROM events GROUP BY 1),
w AS (
  SELECT day,
         CAST(sum(e) OVER (ORDER BY day RANGE BETWEEN 0 PRECEDING
           AND CURRENT ROW) AS BIGINT) AS err_short,
         CAST(sum(t) OVER (ORDER BY day RANGE BETWEEN 0 PRECEDING
           AND CURRENT ROW) AS BIGINT) AS tot_short,
         CAST(sum(e) OVER (ORDER BY day RANGE BETWEEN 5 PRECEDING
           AND CURRENT ROW) AS BIGINT) AS err_long,
         CAST(sum(t) OVER (ORDER BY day RANGE BETWEEN 5 PRECEDING
           AND CURRENT ROW) AS BIGINT) AS tot_long
  FROM daily)
SELECT day, err_short, tot_short, err_long, tot_long,
       (err_short * 5 > tot_short) AS burn_short,
       (err_long * 5 > tot_long) AS burn_long,
       (err_short * 5 > tot_short AND err_long * 5 > tot_long)
         AS alert
FROM w ORDER BY day
"""


# q297: m-estimate smoothing — exact rational (hits·N + m·H) over
# (N·(n+m)); rank on the identical division, group-asc ties.
ORACLES["q297_smoothed_rates"] = """
WITH ev AS (
  SELECT user_id % 10 AS band, event_type,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS hit
  FROM events),
agg AS (
  SELECT event_type, band, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(hit) AS BIGINT) AS hits
  FROM ev GROUP BY 1, 2),
prior AS (SELECT CAST(sum(hits) AS BIGINT) AS gh,
                 CAST(sum(n) AS BIGINT) AS gn FROM agg),
sc AS (
  SELECT event_type, band, n, hits,
         CAST(hits * gn + 50 * gh AS BIGINT) AS sm_num,
         CAST(gn * (n + 50) AS BIGINT) AS sm_den
  FROM agg CROSS JOIN prior)
SELECT event_type, CAST(band AS BIGINT) AS band, n, hits,
       sm_num, sm_den,
       CAST(sm_num AS DOUBLE) / CAST(sm_den AS DOUBLE)
         AS smoothed_rate,
       CAST(row_number() OVER (
         ORDER BY CAST(sm_num AS DOUBLE) / CAST(sm_den AS DOUBLE)
           DESC, event_type ASC, band ASC) AS BIGINT) AS rank
FROM sc ORDER BY rank
"""


# q298: truncated RBO at p=1/2 — lcm(1..10)=2520, scale 2520·1024;
# term_d = overlap_d · (2520/d) · 2^(10−d), all exact integers.
ORACLES["q298_rbo_rankings"] = """
WITH li AS (
  SELECT l_suppkey, l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0
              + 0.5) AS BIGINT) AS rev_fp
  FROM lineitem),
ra AS (
  SELECT l_suppkey AS id, row_number() OVER (
    ORDER BY sum(rev_fp) DESC, l_suppkey ASC) AS rank
  FROM li GROUP BY l_suppkey
  ORDER BY sum(rev_fp) DESC, l_suppkey ASC LIMIT 10),
rb AS (
  SELECT l_suppkey AS id, row_number() OVER (
    ORDER BY count(DISTINCT l_orderkey) DESC, l_suppkey ASC) AS rank
  FROM li GROUP BY l_suppkey
  ORDER BY count(DISTINCT l_orderkey) DESC, l_suppkey ASC LIMIT 10),
m AS (
  SELECT greatest(ra.rank, rb.rank) AS mx
  FROM ra JOIN rb USING (id)),
ds AS (SELECT unnest(range(1, 11)) AS d)
SELECT CAST(d AS BIGINT) AS depth_d,
       CAST(coalesce(sum(CASE WHEN mx <= d THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS overlap,
       CAST(coalesce(sum(CASE WHEN mx <= d THEN 1 ELSE 0 END), 0)
            * (2520 // d) * (1 << (10 - CAST(d AS INT))) AS BIGINT)
         AS term_scaled,
       CAST(2520 * 1024 AS BIGINT) AS scale
FROM ds LEFT JOIN m ON true
GROUP BY d ORDER BY depth_d
"""


# q299: streaming burn alerts — the SPEC is identical to q296 (daily
# aggregate + multiwindow sweep); only the execution path differs
# (Structured Streaming state vs batch), which is the point: the
# bounded-replay stream must land on the same answer.
ORACLES["q299_stream_burn_alerts"] = ORACLES["q296_slo_burn"]


# q300: curation v2 capstone — q277's medoids + q46's groups pick the
# survivors; q267's bucket machinery scores them; per-source report.
ORACLES["q300_curation_v2"] = f"""
WITH med AS (SELECT * FROM ({ORACLES["q277_group_medoids"]})),
grp AS (SELECT * FROM ({ORACLES["q46_neardup_groups"]})),
surv AS (
  SELECT medoid AS doc_id FROM med
  UNION
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM grp)),
tgt AS (SELECT text FROM documents WHERE source IN ('src1','src2')),
rawd AS (SELECT doc_id, text FROM documents
         WHERE source NOT IN ('src1','src2')),
ttok AS (
  SELECT ('0x' || substr(md5(t), 1, 7))::BIGINT % 4096 AS bucket
  FROM (SELECT unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
        FROM tgt)),
rtok AS (
  SELECT ('0x' || substr(md5(t), 1, 7))::BIGINT % 4096 AS bucket
  FROM (SELECT unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
        FROM rawd)),
tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM ttok GROUP BY 1),
rc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM rtok GROUP BY 1),
bb AS (
  SELECT coalesce(tc.bucket, rc.bucket) AS bucket,
         coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
  FROM tc FULL JOIN rc ON tc.bucket = rc.bucket),
tt AS (SELECT CAST(sum(ct) AS BIGINT) AS t_t,
              CAST(sum(cr) AS BIGINT) AS t_r FROM bb),
fav AS (SELECT bucket, (ct * t_r > cr * t_t) AS favored
        FROM bb CROSS JOIN tt),
sdocs AS (
  SELECT d.doc_id, d.text, d.source FROM documents d
  JOIN surv USING (doc_id)
  WHERE d.source NOT IN ('src1','src2')),
dtok AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 7))::BIGINT % 4096 AS bucket
  FROM (SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
        FROM sdocs)),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(CASE WHEN coalesce(favored, FALSE) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_fav
  FROM dtok LEFT JOIN fav USING (bucket) GROUP BY 1),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1),
kept AS (
  SELECT s.source, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(n_tok) AS BIGINT) AS tot_tok,
         CAST(sum(n_fav) AS BIGINT) AS tot_fav
  FROM sc JOIN sdocs s USING (doc_id) GROUP BY 1)
SELECT tot.source, n_docs,
       coalesce(n_kept, 0) AS n_kept,
       coalesce(tot_tok, 0) AS tot_tok,
       coalesce(tot_fav, 0) AS tot_fav
FROM tot LEFT JOIN kept ON tot.source = kept.source
WHERE tot.source NOT IN ('src1','src2')
ORDER BY tot.source
"""


# ===================================================================
# round 7: ACS catalog vintages packaged with the engine (VERDICT r6
# ask #4).  The q301 oracle is GENERATED from the same packaged
# catalog JSON the Spark query reads (data/acs/2019/median.json,
# mirroring reference data/acs/2019 + metadata.py:127-152), via a
# generic n-bin translation of the grouped-median algorithm — the
# same SQL template hand-written for 5 bins in q08, emitted
# programmatically for the catalog's 23 mdage bins.


def _grouped_median_sql(
    binned_cte: str,
    group_col: str,
    bins: list[tuple[float, float]],
    design_factor: float,
    top_coding: bool,
    bottom_coding: bool,
    out_e: str,
    out_m: str,
) -> str:
    """Emit the interpolated-grouped-median + MOE SQL for arbitrary
    catalog bins.  ``binned_cte`` must yield ``({group_col}, bin)``
    rows with bin ∈ [0, len(bins)).  Mirrors operators/median.py
    expression-for-expression (same quirks: first-bin bottom-coding,
    ``a == b & a == c`` bitwise-AND precedence, row[-1] wraparound)."""
    n = len(bins)
    lo = [b[0] for b in bins]
    hi = [b[1] for b in bins]
    nl = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE bin = {i}) AS DOUBLE) AS n{i}"
        for i in range(n)
    )
    cums = ", ".join(
        f"{' + '.join(f'n{j}' for j in range(i + 1))} AS c{i}"
        for i in range(n)
    )
    mi_case = " ".join(
        f"WHEN c{i} >= c{n-1} / 2 THEN {i}" for i in range(n)
    )
    nlist = ", ".join(f"n{i}" for i in range(n))
    clist = ", ".join(f"c{i}" for i in range(n))
    lolist = ", ".join(repr(float(x)) for x in lo)
    wlist = ", ".join(repr(float(h - l)) for l, h in zip(lo, hi))
    bot = f"WHEN mi = 0 THEN {float(hi[0])!r}" if bottom_coding else ""
    top = f"WHEN mi = {n-1} THEN {float(lo[n-1])!r}" if top_coding else ""
    lb_case = " ".join(
        f"WHEN cpl[{i+1}] > 50.0 - se THEN {i}" for i in range(n)
    )
    ub_case = " ".join(
        f"WHEN cpl[{i+1}] > 50.0 + se THEN {i}" for i in range(n)
    )
    fnz_case = " ".join(
        f"WHEN cpl[{i+1}] != 0.0 THEN {i}" for i in range(n)
    )
    return f"""
WITH binned AS ({binned_cte}),
counts AS (
  SELECT {group_col},
    {nl}
  FROM binned GROUP BY {group_col}),
cums AS (SELECT *, {cums} FROM counts),
base AS (
  SELECT *, c{n-1} AS B,
    CASE {mi_case} END AS mi
  FROM cums),
med AS (
  SELECT *,
    list_value({nlist}) AS nlst,
    list_value({clist}) AS cl,
    list_value({lolist}) AS lol,
    list_value({wlist}) AS wl,
    CASE WHEN B = 0 THEN NULL
         {bot}
         WHEN cl[mi + 1] = 0 THEN NULL
         {top}
         ELSE lol[mi + 1]
              + (B / 2 - (cl[mi + 1] - nlst[mi + 1]))
                * wl[mi + 1] / nlst[mi + 1]
    END AS {out_e}
  FROM base),
moe AS (
  SELECT *,
    CASE WHEN B != 0
         THEN {design_factor!r} * sqrt(93.0 / (7.0 * B) * 2500.0) END AS se,
    CASE WHEN B != 0 THEN list_transform(cl, c -> c / B * 100) END AS cpl
  FROM med),
binsfound AS (
  SELECT *,
    CASE {lb_case} END AS lb,
    CASE {ub_case} END AS ub,
    CASE {fnz_case} END AS fnz
  FROM moe),
bounds AS (
  SELECT *,
    CASE WHEN lb = fnz THEN 0.0 ELSE lol[lb + 1] END AS a1l,
    CASE WHEN lb = fnz THEN {float(lo[1])!r}
         WHEN lb + 1 <= {n-1} THEN lol[lb + 2] END AS a2l,
    CASE WHEN lb = 0 THEN 0.0 ELSE cpl[lb] END AS c1l,
    cpl[lb + 1] AS c2l,
    CASE WHEN (ub = (lb & ub)) AND ((lb & ub) = fnz) THEN 0.0
         WHEN ub = {n-1} THEN {float(lo[n-1])!r} ELSE lol[ub + 1] END AS a1u,
    CASE WHEN (ub = (lb & ub)) AND ((lb & ub) = fnz) THEN {float(lo[1])!r}
         WHEN ub = {n-1} THEN {float(lo[n-1])!r}
         WHEN ub + 1 <= {n-1} THEN lol[ub + 2] END AS a2u,
    cpl[((ub - 1 + {n}) % {n}) + 1] AS c1u,
    cpl[ub + 1] AS c2u
  FROM binsfound),
final AS (
  SELECT *,
    CASE WHEN ((c2l - c1l) + a1l) != 0 THEN
      CASE WHEN (c2l - c1l) = 0 THEN NULL
           ELSE ((50.0 - se) - c1l) * (a2l - a1l) / (c2l - c1l) + a1l END
    END AS lbound,
    CASE WHEN ((c2u - c1u) + a1u) != 0 THEN
      CASE WHEN (c2u - c1u) = 0 THEN NULL
           ELSE ((50.0 + se) - c1u) * (a2u - a1u) / (c2u - c1u) + a1u END
    END AS ubound
  FROM bounds)
SELECT {group_col}, {out_e},
  CASE WHEN {out_e} >= {float(lo[n-1])!r} THEN NULL
       WHEN B = 0 THEN NULL
       WHEN se >= 50 THEN NULL
       WHEN lb >= {n-1} THEN NULL
       ELSE (ubound - lbound) * 1.645 / 2 END AS {out_m}
FROM final
ORDER BY {group_col}
"""


def _acs2019_mdage_oracle() -> str:
    import json as _json
    from pathlib import Path as _Path

    med_path = (
        _Path(__file__).parent
        / "db_factfinder_spark" / "data" / "acs" / "2019" / "median.json"
    )
    spec = _json.loads(med_path.read_text())["mdage"]
    bins = [(float(v[0]), float(v[1])) for v in spec["ranges"].values()]
    n = len(bins)
    lo = [b[0] for b in bins]
    # same synthetic age + bin assignment as the Spark side: age in
    # [0, 97), bin = first i with age < next bin's lower bound
    bin_case = " ".join(
        f"WHEN age < {float(lo[i+1])!r} THEN {i}" for i in range(n - 1)
    )
    binned = f"""
  SELECT c_nationkey AS geo,
         CASE {bin_case} ELSE {n-1} END AS bin
  FROM (SELECT c_nationkey,
               CAST((c_custkey * 37) % 97 AS DOUBLE) AS age
        FROM customer)"""
    return _grouped_median_sql(
        binned_cte=binned,
        group_col="geo",
        bins=bins,
        design_factor=float(spec["design_factor"]),
        top_coding=bool(spec["top_coding"]),
        bottom_coding=bool(spec["bottom_coding"]),
        out_e="mdage",
        out_m="mdage_moe",
    )


ORACLES["q301_acs_catalog_median"] = _acs2019_mdage_oracle()


# ===================================================================
# round 7 extensions: winnowing, link prediction, curriculum layout,
# boilerplate scoring, char entropy, fragment stitching, Zipf slope.

# q302: winnowing (MOSS) fingerprints — char-5-gram md5-28 hashes,
# window-4 minima, distinct per doc; pairs sharing >= 2 fingerprints.
ORACLES["q302_winnow_pairs"] = f"""
WITH d AS (SELECT doc_id, {_NORM} AS t FROM documents
           WHERE text IS NOT NULL),
h AS (SELECT doc_id,
        CASE WHEN len(t) >= 20 THEN
          list_transform(range(1, len(t) - 20 + 2),
            i -> ('0x' || substr(md5(substr(t, CAST(i AS INT), 20)), 1, 7))
                   ::BIGINT)
        ELSE [] END AS hl
      FROM d),
f AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(hl) - 7, 1) + 1),
          j -> list_min(hl[CAST(j AS INT):CAST(j AS INT) + 7]))) AS fps
      FROM h WHERE len(hl) >= 1),
p AS (SELECT doc_id, unnest(fps) AS fp FROM f),
pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(count(*) AS BIGINT) AS n_shared
       FROM p a JOIN p b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT id_a, id_b, n_shared FROM pr WHERE n_shared >= 2
ORDER BY id_a, id_b
"""

# q303: Adamic-Adar over the q278 bipartite graph; per-wedge terms
# quantized to integer units so the sum is order-independent.
ORACLES["q303_adamic_adar"] = """
WITH ords AS (
  SELECT o_orderkey, o_custkey * 2 AS cnode
  FROM orders WHERE o_custkey % 11 = 0),
pairs AS (
  SELECT DISTINCT cnode, l_suppkey * 2 + 1 AS snode
  FROM lineitem JOIN ords ON l_orderkey = o_orderkey),
sym AS (
  SELECT cnode AS a, snode AS b FROM pairs
  UNION
  SELECT snode, cnode FROM pairs),
deg AS (SELECT a AS v, count(*) AS deg FROM sym GROUP BY 1),
adj AS (SELECT s.b AS v, s.a AS u, d.deg
        FROM sym s JOIN deg d ON s.b = d.v),
w AS (
  SELECT x.u AS id_a, y.u AS id_b,
         CAST(floor(1000000000.0 / ln(CAST(x.deg AS DOUBLE)) + 0.5)
              AS BIGINT) AS term
  FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u)
SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(term) AS BIGINT) AS aa_units
FROM w GROUP BY 1, 2 ORDER BY id_a, id_b
"""

# q304: curriculum round-robin interleave — per-bucket rank, dense
# bucket positions over the post-cap bucket set, arithmetic position.
ORACLES["q304_curriculum_interleave"] = """
WITH d AS (
  SELECT doc_id,
         CAST(least(floor(n_chars / 120), 4) AS INT) AS bucket,
         n_chars
  FROM documents),
r AS (
  SELECT doc_id, bucket,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY n_chars DESC, doc_id) AS within_rank
  FROM d),
keep AS (SELECT * FROM r WHERE within_rank <= 5),
bs AS (
  SELECT bucket, row_number() OVER (ORDER BY bucket) AS bucket_rank
  FROM (SELECT DISTINCT bucket FROM keep)),
nb AS (SELECT count(*) AS n_b FROM bs)
SELECT k.doc_id, k.bucket,
       CAST(k.within_rank AS BIGINT) AS within_rank,
       CAST(b.bucket_rank AS BIGINT) AS bucket_rank,
       CAST((k.within_rank - 1) * nb.n_b + b.bucket_rank - 1 AS BIGINT)
         AS interleave_pos
FROM keep k JOIN bs b USING (bucket) CROSS JOIN nb
ORDER BY interleave_pos, doc_id
"""

# q305: boilerplate-line density over synthesized 3-line documents
# (header slice + universal footer + body); a line is boilerplate
# when its md5(lower(trim(line))) key spans >= 5 distinct docs.
ORACLES["q305_boilerplate_density"] = """
WITH d AS (
  SELECT doc_id,
         concat_ws(chr(10), substr(text, 1, 40),
                   'standard cookie consent footer', text) AS text
  FROM documents),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts
       FROM d WHERE text IS NOT NULL),
l AS (SELECT doc_id, t.i + 1 AS pos, parts[t.i + 1] AS line
      FROM ls, unnest(range(len(parts))) AS t(i)),
k AS (SELECT doc_id, pos, md5(lower(trim(line))) AS k FROM l),
dfreq AS (
  SELECT k, count(*) AS line_df
  FROM (SELECT DISTINCT doc_id, k FROM k) GROUP BY k)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN line_df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(sum(CASE WHEN line_df >= 5 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS boiler_frac
FROM k JOIN dfreq USING (k)
GROUP BY doc_id ORDER BY doc_id
"""

# q306: per-doc Shannon entropy over the normalized char
# distribution, in integer nano-nat units — per-term quantization is
# the portable-exactness idiom (JVM vs DuckDB ln() differs by 1 ulp
# on ~5% of inputs; the integer sum is order- and libm-independent up
# to the quantization grid).
ORACLES["q306_char_entropy"] = f"""
WITH d AS (SELECT doc_id, {_NORM} AS t FROM documents
           WHERE text IS NOT NULL),
c AS (SELECT doc_id, len(t) AS n,
             list_transform(range(1, len(t) + 1),
                            i -> substr(t, CAST(i AS INT), 1)) AS chars
      FROM d WHERE len(t) >= 1),
e AS (SELECT doc_id, n,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT), list_transform(
            list_sort(list_distinct(chars)),
            u -> CAST(floor(
              (CAST(-(CAST(len(list_filter(chars, x -> x = u)) AS DOUBLE)
                      / CAST(n AS DOUBLE)) AS DOUBLE)
               * ln(CAST(len(list_filter(chars, x -> x = u)) AS DOUBLE)
                    / CAST(n AS DOUBLE)))
              * 1000000000.0 + 0.5) AS BIGINT))),
          (acc, x) -> acc + x) AS entropy_nanonats
      FROM c)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_norm, entropy_nanonats
FROM e ORDER BY doc_id
"""

# q307: fragment stitching — overlapping halves of each doc; pairs
# where A's trailing 30 normalized chars equal B's leading 30.
ORACLES["q307_stitch_candidates"] = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
frags AS (
  SELECT doc_id * 2 AS doc_id, substr(text, 1, 120) AS text FROM docs
  UNION ALL
  SELECT doc_id * 2 + 1, substr(text, 91) FROM docs),
base AS (
  SELECT doc_id AS id,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ',
                                       'g'), '\\s+', ' ', 'g')) AS t
  FROM frags WHERE text IS NOT NULL),
b2 AS (SELECT id, t FROM base WHERE len(t) >= 30),
heads AS (SELECT id AS id_next, substr(t, 1, 30) AS head FROM b2),
tails AS (SELECT id AS id_prev, substr(t, len(t) - 29, 30) AS tail
          FROM b2)
SELECT id_prev, id_next, md5(tail) AS boundary_md5
FROM tails JOIN heads ON tail = head AND id_prev != id_next
ORDER BY id_prev, id_next
"""

# q308: Zipf rank-frequency slope per source — grouped_linreg's
# integer-quantized-log coding + HUGEINT exact sums (q92 idiom).
from db_factfinder_spark.functions.portable_math import portable_ln_sql  # noqa: E402

ORACLES["q308_zipf_slope"] = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS}) AS t
  FROM documents WHERE text IS NOT NULL),
counts AS (SELECT source, t, count(*) AS freq FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT source, freq,
         row_number() OVER (PARTITION BY source
                            ORDER BY freq DESC, t ASC) AS rank
  FROM counts),
coded AS (
  SELECT source,
    CAST(floor({portable_ln_sql("rank")} * 1000000.0 + 0.5) AS BIGINT) AS x,
    CAST(floor({portable_ln_sql("freq")} * 1000000.0 + 0.5) AS BIGINT) AS y
  FROM ranked WHERE rank <= 100),
s AS (
  SELECT source,
    CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx,
    CAST(sum(y) AS HUGEINT) AS sy,
    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM coded GROUP BY source),
r AS (
  SELECT source, CAST(n AS BIGINT) AS n,
    CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) != 0 THEN
      CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
    END AS slope,
    sx, sy, n AS nh
  FROM s)
SELECT source, n, slope,
  ((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
   / CAST(nh AS DOUBLE)) / 1000000.0 AS intercept_nats
FROM r ORDER BY source
"""


# q309: interpolated Kneser-Ney bigram — continuation-count backoff;
# D = 0.75 exactly representable, op order mirrors textstats.py.
ORACLES["q309_kneser_ney_bigram"] = f"""
WITH t AS (SELECT {_NORMTOKS} AS ts FROM documents WHERE text IS NOT NULL),
t2 AS (SELECT ts FROM t WHERE len(ts) >= 2),
bg AS (SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT) + 1] AS w2
       FROM t2, unnest(range(1, len(ts))) AS u(i)),
counts AS (SELECT w1, w2, count(*) AS c_bigram FROM bg GROUP BY 1, 2),
cp AS (SELECT *,
         sum(c_bigram) OVER (PARTITION BY w1) AS c_prev,
         count(*) OVER (PARTITION BY w1) AS n1_fw
       FROM counts),
nb AS (SELECT w2, count(*) AS n1_bw FROM counts GROUP BY 1),
na AS (SELECT count(*) AS n1_all FROM counts)
SELECT w1, w2,
  CAST(c_bigram AS BIGINT) AS c_bigram,
  CAST(c_prev AS BIGINT) AS c_prev,
  CAST(n1_fw AS BIGINT) AS n1_fw,
  CAST(n1_bw AS BIGINT) AS n1_bw,
  greatest(CAST(c_bigram AS DOUBLE) - 0.75, 0.0) / CAST(c_prev AS DOUBLE)
    + 0.75 * CAST(n1_fw AS DOUBLE) / CAST(c_prev AS DOUBLE)
      * (CAST(n1_bw AS DOUBLE) / CAST(n1_all AS DOUBLE)) AS p_kn
FROM cp JOIN nb USING (w2) CROSS JOIN na
ORDER BY w1, w2
"""

# q310: Heaps'-law fit — first-occurrence bucketing to 8 prefix
# checkpoints derived from max(doc_id) by identical integer floor
# division on both engines; portable-ln-coded OLS (q308 machinery).
ORACLES["q310_heaps_law"] = f"""
WITH mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
cps AS (SELECT DISTINCT greatest(n // (2 ** k) - 1, 0) AS cp
        FROM mx, unnest(range(0, 8)) AS u(k)),
pd AS (SELECT doc_id, len({_NORMTOKS}) AS n_toks
       FROM documents WHERE text IS NOT NULL),
pdb AS (SELECT (SELECT min(cp) FROM cps WHERE cp >= doc_id) AS cp,
               n_toks FROM pd),
tb AS (SELECT cp, CAST(sum(n_toks) AS BIGINT) AS b_toks
       FROM pdb WHERE cp IS NOT NULL GROUP BY 1),
fd AS (SELECT t, min(doc_id) AS first_id
       FROM (SELECT doc_id, unnest({_NORMTOKS}) AS t
             FROM documents WHERE text IS NOT NULL) GROUP BY 1),
fdb AS (SELECT (SELECT min(cp) FROM cps WHERE cp >= first_id) AS cp
        FROM fd),
ty AS (SELECT cp, CAST(count(*) AS BIGINT) AS b_types
       FROM fdb WHERE cp IS NOT NULL GROUP BY 1),
pts AS (SELECT coalesce(tb.cp, ty.cp) AS cp,
               coalesce(b_toks, 0) AS b_toks,
               coalesce(b_types, 0) AS b_types
        FROM tb FULL JOIN ty ON tb.cp = ty.cp),
cum AS (SELECT cp,
          CAST(sum(b_toks) OVER (ORDER BY cp ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_toks,
          CAST(sum(b_types) OVER (ORDER BY cp ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum_types
        FROM pts),
coded AS (SELECT
    CAST(floor({portable_ln_sql("cum_toks")} * 1000000.0 + 0.5) AS BIGINT)
      AS x,
    CAST(floor({portable_ln_sql("cum_types")} * 1000000.0 + 0.5) AS BIGINT)
      AS y
  FROM cum WHERE cum_toks >= 1 AND cum_types >= 1),
s AS (SELECT
    CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx,
    CAST(sum(y) AS HUGEINT) AS sy,
    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM coded),
r AS (SELECT CAST(n AS BIGINT) AS n_points,
    CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) != 0 THEN
      CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
    END AS slope_u,
    sx, sy, n AS nh
  FROM s)
SELECT n_points, slope_u,
  (CAST(sy AS DOUBLE) - slope_u * CAST(sx AS DOUBLE))
    / CAST(nh AS DOUBLE) AS intercept_u
FROM r
"""

# q311: ROUGE-2 on consecutive doc pairs — clipped bigram multiset
# overlap; gram extraction keeps multiplicity (no distinct).
ORACLES["q311_rouge_pairs"] = f"""
WITH cand AS (SELECT doc_id AS pid, text FROM documents
              WHERE doc_id % 2 = 0),
refs AS (SELECT doc_id - 1 AS pid, text FROM documents
         WHERE doc_id % 2 = 1),
cg0 AS (SELECT pid, {_NORMTOKS} AS ts FROM cand),
rg0 AS (SELECT pid, {_NORMTOKS} AS ts FROM refs),
cg AS (SELECT pid, CASE WHEN len(ts) >= 2 THEN
         list_transform(range(1, len(ts)),
           i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1])
       ELSE [] END AS grams FROM cg0),
rg AS (SELECT pid, CASE WHEN len(ts) >= 2 THEN
         list_transform(range(1, len(ts)),
           i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1])
       ELSE [] END AS grams FROM rg0),
p AS (SELECT cg.pid, cg.grams AS cgr, rg.grams AS rgr
      FROM cg JOIN rg ON cg.pid = rg.pid),
sizes AS (SELECT pid, len(cgr) AS n_cand, len(rgr) AS n_ref FROM p),
cc AS (SELECT pid, g, count(*) AS nc
       FROM (SELECT pid, unnest(cgr) AS g FROM p) GROUP BY 1, 2),
rc AS (SELECT pid, g, count(*) AS nr
       FROM (SELECT pid, unnest(rgr) AS g FROM p) GROUP BY 1, 2),
mt AS (SELECT pid, CAST(sum(least(nc, nr)) AS BIGINT) AS n_match
       FROM cc JOIN rc USING (pid, g) GROUP BY 1),
j AS (SELECT s.pid, s.n_cand, s.n_ref, coalesce(mt.n_match, 0) AS n_match
      FROM sizes s LEFT JOIN mt USING (pid))
SELECT pid AS pair_id,
  CAST(n_cand AS INT) AS n_cand,
  CAST(n_ref AS INT) AS n_ref,
  CAST(n_match AS BIGINT) AS n_match,
  CASE WHEN n_cand > 0 THEN
    CAST(n_match AS DOUBLE) / CAST(n_cand AS DOUBLE) END AS precision,
  CASE WHEN n_ref > 0 THEN
    CAST(n_match AS DOUBLE) / CAST(n_ref AS DOUBLE) END AS recall,
  CASE WHEN n_cand > 0 AND n_ref > 0 THEN
    CASE WHEN (CAST(n_match AS DOUBLE) / CAST(n_cand AS DOUBLE)
               + CAST(n_match AS DOUBLE) / CAST(n_ref AS DOUBLE)) > 0.0
    THEN 2.0 * (CAST(n_match AS DOUBLE) / CAST(n_cand AS DOUBLE))
             * (CAST(n_match AS DOUBLE) / CAST(n_ref AS DOUBLE))
             / (CAST(n_match AS DOUBLE) / CAST(n_cand AS DOUBLE)
                + CAST(n_match AS DOUBLE) / CAST(n_ref AS DOUBLE))
    ELSE 0.0 END
  END AS f1
FROM j ORDER BY pair_id
"""

# q312: per-source data card capstone — doc counts, exact-dup rate
# (distinct md5-of-normalized-text fingerprints), mean char entropy
# in nano-nats (integer sums / count), Zipf slope (q308 machinery).
ORACLES["q312_data_card"] = f"""
WITH dn AS (SELECT source, doc_id, {_NORM} AS t FROM documents),
ch AS (SELECT source, doc_id, len(t) AS n,
         list_transform(range(1, len(t) + 1),
                        i -> substr(t, CAST(i AS INT), 1)) AS chars
       FROM dn WHERE t IS NOT NULL AND len(t) >= 1),
ent AS (SELECT source, doc_id,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT), list_transform(
              list_sort(list_distinct(chars)),
              u -> CAST(floor(
                (CAST(-(CAST(len(list_filter(chars, x -> x = u)) AS DOUBLE)
                        / CAST(n AS DOUBLE)) AS DOUBLE)
                 * ln(CAST(len(list_filter(chars, x -> x = u)) AS DOUBLE)
                      / CAST(n AS DOUBLE)))
                * 1000000000.0 + 0.5) AS BIGINT))),
            (acc, x) -> acc + x) AS e
        FROM ch),
per AS (SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(DISTINCT md5({_NORM})) AS BIGINT) AS n_distinct
        FROM documents GROUP BY 1),
es AS (SELECT source, CAST(sum(e) AS BIGINT) AS entropy_sum,
              CAST(count(e) AS BIGINT) AS n_scored
       FROM ent GROUP BY 1),
toks AS (SELECT source, unnest({_TOKS}) AS t
         FROM documents WHERE text IS NOT NULL),
cnts AS (SELECT source, t, count(*) AS freq FROM toks GROUP BY 1, 2),
rkd AS (SELECT source, freq,
          row_number() OVER (PARTITION BY source
                             ORDER BY freq DESC, t ASC) AS rank
        FROM cnts),
coded AS (SELECT source,
    CAST(floor({portable_ln_sql("rank")} * 1000000.0 + 0.5) AS BIGINT)
      AS x,
    CAST(floor({portable_ln_sql("freq")} * 1000000.0 + 0.5) AS BIGINT)
      AS y
  FROM rkd WHERE rank <= 100),
s AS (SELECT source,
    CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS sx,
    CAST(sum(y) AS HUGEINT) AS sy,
    sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM coded GROUP BY source),
z AS (SELECT source,
    CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) != 0 THEN
      CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
    END AS zipf_slope
  FROM s)
SELECT per.source, n_docs, n_distinct,
  CAST(n_docs - n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE)
    AS dup_rate,
  CAST(entropy_sum AS DOUBLE) / CAST(n_scored AS DOUBLE)
    AS mean_entropy_nanonats,
  zipf_slope
FROM per JOIN es USING (source) LEFT JOIN z USING (source)
ORDER BY per.source
"""


# q313: WOE encoding — portable-ln integer logs, add-one smoothing.
ORACLES["q313_woe_encode"] = f"""
WITH agg AS (
  SELECT o_orderpriority AS priority,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_pos
  FROM orders GROUP BY 1),
a2 AS (SELECT *, n - n_pos AS n_neg FROM agg),
tot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS t_pos,
               CAST(sum(n_neg) AS BIGINT) AS t_neg FROM a2),
j AS (SELECT priority, n, n_pos, n_neg, t_pos, t_neg,
        n_pos + 1 AS la, t_neg + 2 AS lb,
        n_neg + 1 AS lc, t_pos + 2 AS ld
      FROM a2 CROSS JOIN tot)
SELECT priority, n, n_pos, n_neg,
  (({portable_ln_sql("la")} + {portable_ln_sql("lb")})
   - ({portable_ln_sql("lc")} + {portable_ln_sql("ld")})) AS woe,
  ((CAST(n_pos + 1 AS DOUBLE) / CAST(t_pos + 2 AS DOUBLE)
    - CAST(n_neg + 1 AS DOUBLE) / CAST(t_neg + 2 AS DOUBLE))
   * (({portable_ln_sql("la")} + {portable_ln_sql("lb")})
      - ({portable_ln_sql("lc")} + {portable_ln_sql("ld")})))
    AS iv_contrib
FROM j ORDER BY priority
"""

# q314: two-sample KS per event type — exact integer cross-multiplied
# CDF comparison (max over integers), one terminal division.
ORACLES["q314_ks_drift"] = """
WITH base AS (
  SELECT event_type, value AS v,
         CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS s
  FROM events),
per_v AS (
  SELECT event_type, v,
    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a2
  FROM base GROUP BY 1, 2),
cum AS (
  SELECT event_type,
    CAST(sum(a1) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
    CAST(sum(a2) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
  FROM per_v),
tot AS (
  SELECT event_type,
    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM base GROUP BY 1),
d AS (
  SELECT c.event_type, t.n1, t.n2,
         max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS d_num
  FROM cum c JOIN tot t USING (event_type)
  GROUP BY 1, 2, 3)
SELECT event_type, n1, n2,
  CAST(d_num AS DOUBLE) AS d_num,
  CAST(n1 * n2 AS DOUBLE) AS d_den,
  CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks
FROM d ORDER BY event_type
"""

# q315: Fellegi-Sunter linkage — weights are driver-side math.log
# literals shared with the Spark plan via the same FieldSpec objects.
from db_factfinder_spark.operators.linkage import FieldSpec  # noqa: E402

_FS_NAT = FieldSpec("nat", 0.95, 0.04)
_FS_SEG = FieldSpec("seg", 0.90, 0.20)
_FS_BAL = FieldSpec("bal", 0.98, 0.01)
ORACLES["q315_record_linkage"] = f"""
WITH bal AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer),
a AS (SELECT c_custkey * 2 AS rid, c_name AS name,
             c_nationkey AS nat, c_mktsegment AS seg, bal_cents
      FROM bal),
b AS (SELECT c_custkey * 2 + 1 AS rid, c_name AS name,
        CASE WHEN c_custkey % 97 = 0 THEN (c_nationkey + 1) % 25
             ELSE c_nationkey END AS nat,
        c_mktsegment AS seg,
        CASE WHEN c_custkey % 5 = 0 THEN bal_cents + 7
             ELSE bal_cents END AS bal_cents
      FROM bal),
recs AS (SELECT *, substr(name, length(name) - 2, 3) AS blk
         FROM (SELECT * FROM a UNION ALL SELECT * FROM b)),
p AS (SELECT x.rid AS id_a, y.rid AS id_b,
        x.nat AS nat_a, y.nat AS nat_b,
        x.seg AS seg_a, y.seg AS seg_b,
        x.bal_cents AS bc_a, y.bal_cents AS bc_b
      FROM recs x JOIN recs y ON x.blk = y.blk AND x.rid < y.rid),
sc AS (SELECT id_a, id_b,
        nat_a = nat_b AS agree_nat,
        seg_a = seg_b AS agree_seg,
        abs(bc_a - bc_b) <= 10 AS agree_bal,
        0.0
        + (CASE WHEN nat_a = nat_b THEN {_FS_NAT.w_agree!r}
                ELSE {_FS_NAT.w_disagree!r} END)
        + (CASE WHEN seg_a = seg_b THEN {_FS_SEG.w_agree!r}
                ELSE {_FS_SEG.w_disagree!r} END)
        + (CASE WHEN abs(bc_a - bc_b) <= 10 THEN {_FS_BAL.w_agree!r}
                ELSE {_FS_BAL.w_disagree!r} END) AS fs_score
       FROM p)
SELECT id_a, id_b, agree_nat, agree_seg, agree_bal, fs_score
FROM sc WHERE fs_score >= 3.0 ORDER BY id_a, id_b
"""

# q316: PSI drift — portable-ln smoothed buckets, integer-unit
# contributions so the sum is order-independent.
ORACLES["q316_psi_drift"] = f"""
WITH df AS (
  SELECT CAST(least(floor(value / 50), 9) AS INT) AS bucket,
         month(ts) % 2 AS snap
  FROM events),
per AS (
  SELECT bucket,
    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM df GROUP BY 1),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2,
               CAST(count(*) AS BIGINT) AS nb FROM per),
j AS (SELECT c1, c2, n1, n2, nb,
        c1 + 1 AS la, n2 + nb AS lb, c2 + 1 AS lc, n1 + nb AS ld
      FROM per CROSS JOIN tot),
u AS (SELECT CAST(floor(
        (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)
         - CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))
        * (({portable_ln_sql("la")} + {portable_ln_sql("lb")})
           - ({portable_ln_sql("lc")} + {portable_ln_sql("ld")}))
        * 1000000000000.0 + 0.5) AS BIGINT) AS u
      FROM j)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(u) AS BIGINT) AS psi_units,
       CAST(sum(u) AS DOUBLE) / 1000000000000.0 AS psi
FROM u
"""


# q317: UCB1 — portable-ln bonus, IEEE sqrt (correctly rounded in
# every engine), reward cents exact.
ORACLES["q317_ucb1_arms"] = f"""
WITH per AS (
  SELECT event_type AS arm,
    CAST(count(*) AS BIGINT) AS n_pulls,
    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS reward_units
  FROM events GROUP BY 1),
tot AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS total_n FROM per),
j AS (SELECT arm, n_pulls, total_n, reward_units,
        CAST(reward_units AS DOUBLE) / CAST(n_pulls AS DOUBLE) / 100.0
          AS mean_reward,
        sqrt(2.0 * {portable_ln_sql("total_n")}
             / CAST(n_pulls AS DOUBLE)) AS bonus
      FROM per CROSS JOIN tot)
SELECT arm, n_pulls, total_n, reward_units, mean_reward, bonus,
  mean_reward + bonus AS ucb,
  CAST(row_number() OVER (ORDER BY mean_reward + bonus DESC, arm ASC)
       AS BIGINT) AS rank
FROM j ORDER BY arm
"""

# q318: split-conformal thresholds — exact smallest-integer rank
# bound (the min_count_for_ratio probe) on n+1, k-th order statistic.
_CONF_T = 1.0 - 0.1
ORACLES["q318_conformal_threshold"] = f"""
WITH n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
  GROUP BY 1),
k AS (
  SELECT event_type, n,
    CAST(CASE
      WHEN CAST(CAST(ceil({_CONF_T!r} * (n + 1)) AS INT) - 1 AS DOUBLE)
             / CAST(n + 1 AS DOUBLE) >= {_CONF_T!r}
        THEN CAST(ceil({_CONF_T!r} * (n + 1)) AS INT) - 1
      WHEN CAST(CAST(ceil({_CONF_T!r} * (n + 1)) AS INT) AS DOUBLE)
             / CAST(n + 1 AS DOUBLE) >= {_CONF_T!r}
        THEN CAST(ceil({_CONF_T!r} * (n + 1)) AS INT)
      ELSE CAST(ceil({_CONF_T!r} * (n + 1)) AS INT) + 1
    END AS BIGINT) AS k
  FROM n),
ranked AS (
  SELECT event_type, value AS s,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC)
           AS r
  FROM events),
picked AS (
  SELECT r.event_type, r.s AS threshold
  FROM ranked r JOIN k ON r.event_type = k.event_type AND r.r = k.k)
SELECT k.event_type, k.n, k.k,
  CAST(k.k AS DOUBLE) / CAST(k.n + 1 AS DOUBLE) AS coverage_target,
  picked.threshold
FROM k LEFT JOIN picked ON k.event_type = picked.event_type
ORDER BY k.event_type
"""

# q319: 10% symmetric trimmed mean — exact largest-integer trim bound
# probe, decimal sums, one terminal division.
ORACLES["q319_trimmed_mean"] = """
WITH base AS (
  SELECT o_orderpriority AS priority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
ranked AS (
  SELECT priority, v,
    row_number() OVER (PARTITION BY priority ORDER BY v ASC) AS r,
    count(*) OVER (PARTITION BY priority) AS n
  FROM base),
kd AS (
  SELECT *,
    CAST(CASE
      WHEN CAST(CAST(floor(0.1 * n) AS INT) + 1 AS DOUBLE)
             / CAST(n AS DOUBLE) <= 0.1
        THEN CAST(floor(0.1 * n) AS INT) + 1
      WHEN CAST(CAST(floor(0.1 * n) AS INT) AS DOUBLE)
             / CAST(n AS DOUBLE) <= 0.1
        THEN CAST(floor(0.1 * n) AS INT)
      ELSE CAST(floor(0.1 * n) AS INT) - 1
    END AS BIGINT) AS k
  FROM ranked),
kept AS (SELECT * FROM kd WHERE r > k AND r <= n - k)
SELECT priority,
  CAST(max(n) AS BIGINT) AS n,
  CAST(max(k) AS BIGINT) AS n_trimmed_each,
  CAST(count(*) AS BIGINT) AS n_kept,
  CAST(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
       / CAST(count(*) AS DOUBLE) AS DOUBLE) AS mean_units
FROM kept GROUP BY priority ORDER BY priority
"""

# q320: drift dashboard capstone — per-type KS + grouped PSI + volume.
ORACLES["q320_drift_dashboard"] = f"""
WITH base AS (
  SELECT event_type, value AS v,
         CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS s
  FROM events),
per_v AS (
  SELECT event_type, v,
    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a2
  FROM base GROUP BY 1, 2),
cum AS (
  SELECT event_type,
    CAST(sum(a1) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
    CAST(sum(a2) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
  FROM per_v),
tot AS (
  SELECT event_type,
    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM base GROUP BY 1),
ksq AS (
  SELECT c.event_type,
    CAST(max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS DOUBLE)
      / CAST(t.n1 * t.n2 AS DOUBLE) AS ks
  FROM cum c JOIN tot t USING (event_type)
  GROUP BY c.event_type, t.n1, t.n2),
pdf AS (
  SELECT event_type,
         CAST(least(floor(value / 50), 9) AS INT) AS bucket,
         month(ts) % 2 AS snap
  FROM events),
pper AS (
  SELECT event_type, bucket,
    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM pdf GROUP BY 1, 2),
ptot AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
                CAST(sum(c2) AS BIGINT) AS n2,
                CAST(count(*) AS BIGINT) AS nb
         FROM pper GROUP BY 1),
pj AS (SELECT p.event_type, c1, c2, n1, n2, nb,
         c1 + 1 AS la, n2 + nb AS lb, c2 + 1 AS lc, n1 + nb AS ld
       FROM pper p JOIN ptot USING (event_type)),
pu AS (SELECT event_type, CAST(floor(
         (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)
          - CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))
         * (({portable_ln_sql("la")} + {portable_ln_sql("lb")})
            - ({portable_ln_sql("lc")} + {portable_ln_sql("ld")}))
         * 1000000000000.0 + 0.5) AS BIGINT) AS u
       FROM pj),
psiq AS (SELECT event_type,
           CAST(sum(u) AS DOUBLE) / 1000000000000.0 AS psi
         FROM pu GROUP BY 1),
vol AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1)
SELECT vol.event_type, n_events, ks, psi,
  (ks > 0.05 OR psi > 0.2) AS drift_flag
FROM vol JOIN ksq USING (event_type) JOIN psiq USING (event_type)
ORDER BY vol.event_type
"""


# q321: fuzzy FS linkage — levenshtein is the same DP integer in both
# engines; weights are shared FieldSpec literals.
_FS_FNAME = FieldSpec("name", 0.97, 0.02)
_FS_FNAT = FieldSpec("nat", 0.95, 0.04)
ORACLES["q321_fuzzy_linkage"] = f"""
WITH a AS (SELECT c_custkey * 2 AS rid, c_name AS name,
                  c_nationkey AS nat, c_custkey % 500 AS blk
           FROM customer),
b AS (SELECT c_custkey * 2 + 1 AS rid,
        CASE WHEN c_custkey % 13 = 0
             THEN substr(c_name, 1, 5) || substr(c_name, 7)
             ELSE c_name END AS name,
        c_nationkey AS nat, c_custkey % 500 AS blk
      FROM customer),
recs AS (SELECT * FROM a UNION ALL SELECT * FROM b),
p AS (SELECT x.rid AS id_a, y.rid AS id_b,
        x.name AS name_a, y.name AS name_b,
        x.nat AS nat_a, y.nat AS nat_b
      FROM recs x JOIN recs y ON x.blk = y.blk AND x.rid < y.rid),
sc AS (SELECT id_a, id_b,
        levenshtein(name_a, name_b) <= 1 AS agree_name,
        nat_a = nat_b AS agree_nat,
        0.0
        + (CASE WHEN levenshtein(name_a, name_b) <= 1
                THEN {_FS_FNAME.w_agree!r}
                ELSE {_FS_FNAME.w_disagree!r} END)
        + (CASE WHEN nat_a = nat_b THEN {_FS_FNAT.w_agree!r}
                ELSE {_FS_FNAT.w_disagree!r} END) AS fs_score
       FROM p)
SELECT id_a, id_b, agree_name, agree_nat, fs_score
FROM sc WHERE fs_score >= 4.0 ORDER BY id_a, id_b
"""

# q322: deterministic-seed Laplace counts — difference of keyed
# exponentials through portable_ln; 28-bit md5 uniform source.
ORACLES["q322_dp_noisy_counts"] = f"""
WITH per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
h AS (SELECT event_type, n,
    ('0x' || substr(md5('round7' || '|' || event_type || ':1'), 1, 7))
      ::BIGINT + 1 AS h1,
    ('0x' || substr(md5('round7' || '|' || event_type || ':2'), 1, 7))
      ::BIGINT + 1 AS h2
  FROM per),
u AS (SELECT event_type, n,
    CAST(floor(
      (1.0 * ({portable_ln_sql("h2")} - {portable_ln_sql("h1")}))
      * 1000000.0 + 0.5) AS BIGINT) AS noise_units
  FROM h)
SELECT event_type, n, noise_units,
  CAST(n AS DOUBLE) + CAST(noise_units AS DOUBLE) / 1000000.0
    AS noisy_count
FROM u ORDER BY event_type
"""

# q323: streaming drift monitor — availableNow over the full file
# equals the batch aggregate, so the oracle is the batch PSI from the
# same (type, bucket, snapshot) counts.
ORACLES["q323_stream_drift_monitor"] = f"""
WITH pdf AS (
  SELECT event_type,
         CAST(least(floor(value / 50), 9) AS INT) AS bucket,
         month(ts) % 2 AS snap
  FROM events),
pper AS (
  SELECT event_type, bucket,
    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM pdf GROUP BY 1, 2),
ptot AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS n1,
                CAST(sum(c2) AS BIGINT) AS n2,
                CAST(count(*) AS BIGINT) AS nb
         FROM pper GROUP BY 1),
pj AS (SELECT p.event_type, c1, c2, n1, n2, nb,
         c1 + 1 AS la, n2 + nb AS lb, c2 + 1 AS lc, n1 + nb AS ld
       FROM pper p JOIN ptot USING (event_type)),
pu AS (SELECT event_type, CAST(floor(
         (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)
          - CAST(c2 + 1 AS DOUBLE) / CAST(n2 + nb AS DOUBLE))
         * (({portable_ln_sql("la")} + {portable_ln_sql("lb")})
            - ({portable_ln_sql("lc")} + {portable_ln_sql("ld")}))
         * 1000000000000.0 + 0.5) AS BIGINT) AS u
       FROM pj)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(u) AS BIGINT) AS psi_units,
  CAST(sum(u) AS DOUBLE) / 1000000000000.0 AS psi
FROM pu GROUP BY event_type ORDER BY event_type
"""


# q324: per-doc cross-entropy under the corpus add-one bigram LM —
# portable-ln integer logs, integer-unit sums.
ORACLES["q324_bigram_perplexity"] = f"""
WITH t AS (SELECT doc_id, {_NORMTOKS} AS ts FROM documents
           WHERE text IS NOT NULL),
t2 AS (SELECT doc_id, ts FROM t WHERE len(ts) >= 2),
bg AS (SELECT doc_id, ts[CAST(i AS INT)] AS w1,
              ts[CAST(i AS INT) + 1] AS w2
       FROM t2, unnest(range(1, len(ts))) AS u(i)),
counts AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
           FROM bg GROUP BY 1, 2),
cp AS (SELECT *, CAST(sum(c_bigram) OVER (PARTITION BY w1) AS BIGINT)
                   AS c_prev
       FROM counts),
voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM (SELECT unnest(ts) AS tok FROM t)),
ctx AS (SELECT w1, CAST(max(c_prev) AS BIGINT) AS ctx_prev
        FROM cp GROUP BY 1),
j AS (SELECT b.doc_id,
        coalesce(cp.c_prev + voc.v, ctx.ctx_prev + voc.v, voc.v) AS den,
        coalesce(cp.c_bigram, 0) + 1 AS num
      FROM bg b
      LEFT JOIN cp ON b.w1 = cp.w1 AND b.w2 = cp.w2
      LEFT JOIN ctx ON b.w1 = ctx.w1
      CROSS JOIN voc),
u AS (SELECT doc_id,
        CAST(floor(({portable_ln_sql("den")} - {portable_ln_sql("num")})
                   * 1000000.0 + 0.5) AS BIGINT) AS uu
      FROM j)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_bigrams,
  CAST(sum(uu) AS BIGINT) AS nll_units,
  CAST(sum(uu) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0
    AS nats_per_bigram
FROM u GROUP BY doc_id ORDER BY doc_id
"""

# q325: Newman modularity of the q32/q46 near-dup clustering —
# exact integer L_c/d_c/m, per-cluster quantized terms.
ORACLES["q325_modularity"] = f"""
WITH e AS (
  SELECT DISTINCT id_a AS a, id_b AS b
  FROM ({ORACLES["q32_lsh_neardup_pairs"]}) WHERE id_a != id_b),
grp AS (SELECT doc_id AS v, CAST(rep_id AS VARCHAR) AS g
        FROM ({ORACLES["q46_neardup_groups"]})),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT a AS v FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1),
dv AS (SELECT d.v, d.deg,
         coalesce(g.g, 'solo:' || CAST(d.v AS VARCHAR)) AS gc
       FROM deg d LEFT JOIN grp g ON d.v = g.v),
d_c AS (SELECT gc, CAST(sum(deg) AS BIGINT) AS d_sum
        FROM dv GROUP BY 1),
intra AS (
  SELECT ga.g AS gc, CAST(count(*) AS BIGINT) AS l_c
  FROM e LEFT JOIN grp ga ON e.a = ga.v
         LEFT JOIN grp gb ON e.b = gb.v
  WHERE ga.g IS NOT NULL AND ga.g = gb.g
  GROUP BY 1),
mt AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
per AS (SELECT d_c.gc, d_c.d_sum, coalesce(intra.l_c, 0) AS l_c, mt.m
        FROM d_c LEFT JOIN intra USING (gc) CROSS JOIN mt),
uq AS (SELECT m, CAST(floor(
         (CAST(l_c AS DOUBLE) / CAST(m AS DOUBLE)
          - (CAST(d_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
            * (CAST(d_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))
         * 1000000000000.0 + 0.5) AS BIGINT) AS u
       FROM per)
SELECT CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(m AS BIGINT) AS m_edges,
       CAST(sum(u) AS BIGINT) AS q_units,
       CAST(sum(u) AS DOUBLE) / 1000000000000.0 AS modularity
FROM uq GROUP BY m
"""

# q326: curation v3 — winnow pair-drop + per-source conformal
# entropy gate; composes the q302/q306/q318 machinery.
ORACLES["q326_curation_v3"] = f"""
WITH d AS (SELECT doc_id, source, {_NORM} AS t FROM documents
           WHERE text IS NOT NULL),
h AS (SELECT doc_id,
        CASE WHEN len(t) >= 20 THEN
          list_transform(range(1, len(t) - 20 + 2),
            i -> ('0x' || substr(md5(substr(t, CAST(i AS INT), 20)), 1, 7))
                   ::BIGINT)
        ELSE [] END AS hl
      FROM d),
f AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(hl) - 7, 1) + 1),
          j -> list_min(hl[CAST(j AS INT):CAST(j AS INT) + 7]))) AS fps
      FROM h WHERE len(hl) >= 1),
pfp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
wp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM pfp a JOIN pfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING count(*) >= 2),
dupb AS (SELECT DISTINCT id_b AS doc_id FROM wp),
ch AS (SELECT doc_id, source, len(t) AS n,
         list_transform(range(1, len(t) + 1),
                        i -> substr(t, CAST(i AS INT), 1)) AS chars
       FROM d WHERE len(t) >= 1),
ent AS (SELECT doc_id, source,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT), list_transform(
              list_sort(list_distinct(chars)),
              uu -> CAST(floor(
                (CAST(-(CAST(len(list_filter(chars, x -> x = uu)) AS DOUBLE)
                        / CAST(n AS DOUBLE)) AS DOUBLE)
                 * ln(CAST(len(list_filter(chars, x -> x = uu)) AS DOUBLE)
                      / CAST(n AS DOUBLE)))
                * 1000000000.0 + 0.5) AS BIGINT))),
            (acc, x) -> acc + x) AS e
        FROM ch),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ent GROUP BY 1),
kk AS (SELECT source, n,
    CAST(CASE
      WHEN CAST(CAST(ceil(0.9 * (n + 1)) AS INT) - 1 AS DOUBLE)
             / CAST(n + 1 AS DOUBLE) >= 0.9
        THEN CAST(ceil(0.9 * (n + 1)) AS INT) - 1
      WHEN CAST(CAST(ceil(0.9 * (n + 1)) AS INT) AS DOUBLE)
             / CAST(n + 1 AS DOUBLE) >= 0.9
        THEN CAST(ceil(0.9 * (n + 1)) AS INT)
      ELSE CAST(ceil(0.9 * (n + 1)) AS INT) + 1
    END AS BIGINT) AS k
  FROM ns),
rk AS (SELECT source, e,
         row_number() OVER (PARTITION BY source ORDER BY e ASC) AS r
       FROM ent),
thr AS (SELECT rk.source, rk.e AS threshold
        FROM rk JOIN kk ON rk.source = kk.source AND rk.r = kk.k),
flagged AS (
  SELECT ent.doc_id, ent.source,
         CASE WHEN dupb.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
         CASE WHEN ent.e <= thr.threshold THEN 0 ELSE 1 END AS is_high
  FROM ent LEFT JOIN dupb ON ent.doc_id = dupb.doc_id
           LEFT JOIN thr ON ent.source = thr.source)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(is_dup) AS BIGINT) AS n_dup,
  CAST(sum(CASE WHEN is_dup = 0 THEN is_high ELSE 0 END) AS BIGINT)
    AS n_high_entropy,
  CAST(sum(CASE WHEN is_dup = 0 AND is_high = 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_kept
FROM flagged GROUP BY source ORDER BY source
"""


# q327: real ACS variable (lgoenlep1, 12 E/M pairs) vs its real base
# (pop5pl1) through the packaged 2019 catalog — the q37 spine with
# catalog-driven columns; oracle GENERATED from the same catalog JSON.
def _he1(x: str) -> str:
    """Half-even rounding to 1 digit (the q37 idiom: DuckDB round()
    is half-away-from-zero, so exact dyadic ties get an explicit
    even-selection branch)."""
    return (
        f"CASE WHEN ({x}) * 10 - floor(({x}) * 10) = 0.5 THEN "
        f"(CASE WHEN CAST(floor(({x}) * 10) AS BIGINT) % 2 = 0 "
        f"THEN floor(({x}) * 10) ELSE floor(({x}) * 10) + 1 END) / 10 "
        f"ELSE round(({x}), 1) END"
    )


def _acs_lgoenlep1_oracle() -> str:
    import json as _json
    from pathlib import Path as _Path

    meta = _json.loads(
        (
            _Path(__file__).parent
            / "db_factfinder_spark" / "data" / "acs" / "2019"
            / "metadata.json"
        ).read_text()
    )
    d = {m["pff_variable"]: m for m in meta}
    cols = d["lgoenlep1"]["census_variable"]          # 12 C16001_* codes
    base_col = d["pop5pl1"]["census_variable"][0]
    e_defs, m_defs, e_sum, m_sq = [], [], [], []
    for i, c in enumerate(cols):
        e_defs.append(
            f"CASE WHEN c_custkey % {11 + i} = 0 THEN NULL "
            f"ELSE CAST(floor(c_acctbal / {i + 1}) AS DOUBLE) END"
            f" AS {c}E"
        )
        m_defs.append(
            f"CAST(floor(c_acctbal / {10 + i}) AS DOUBLE) AS {c}M"
        )
        e_sum.append(f"coalesce({c}E, 0.0)")
        m_sq.append(f"coalesce({c}M * {c}M, 0.0)")
    return f"""
WITH wide AS (
  SELECT
    '36047' || lpad(CAST(CAST(c_custkey % 200 AS INT) AS VARCHAR), 6, '0')
      AS census_geoid,
    {", ".join(e_defs)},
    {", ".join(m_defs)},
    CAST(floor(c_acctbal) * 2 AS DOUBLE) AS {base_col}E,
    CAST(floor(c_acctbal / 8) AS DOUBLE) AS {base_col}M
  FROM customer),
horizontal AS (
  SELECT census_geoid,
    0.0 + {" + ".join(e_sum)} AS e,
    sqrt(0.0 + {" + ".join(m_sq)}) AS m,
    0.0 + coalesce({base_col}E, 0.0) AS be,
    sqrt(0.0 + coalesce({base_col}M * {base_col}M, 0.0)) AS bm
  FROM wide),
child AS (
  SELECT census_geoid,
    coalesce(sum(e), 0.0) AS e,
    sqrt(coalesce(sum(m * m), 0.0)) AS m
  FROM horizontal GROUP BY census_geoid),
base AS (
  SELECT census_geoid,
    coalesce(sum(be), 0.0) AS agg_e,
    sqrt(coalesce(sum(bm * bm), 0.0)) AS agg_m
  FROM horizontal GROUP BY census_geoid),
j AS (SELECT child.*, agg_e, agg_m
      FROM child LEFT JOIN base USING (census_geoid)),
withp AS (
  SELECT *, CASE WHEN agg_e = 0 THEN NULL ELSE e / agg_e * 100 END AS p
  FROM j),
stats AS (
  SELECT census_geoid, e, m, p,
    CASE WHEN p = 0 THEN NULL
         WHEN p = 100 THEN NULL
         WHEN agg_e = 0 THEN NULL
         WHEN m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e) < 0
           THEN sqrt(m * m + (e * agg_m / agg_e) * (e * agg_m / agg_e))
                / agg_e * 100
         ELSE sqrt(m * m - (e * agg_m / agg_e) * (e * agg_m / agg_e))
              / agg_e * 100
    END AS z,
    CASE WHEN e = 0 THEN NULL ELSE m / 1.645 / e * 100 END AS c
  FROM withp),
rounded AS (
  SELECT census_geoid, 'lgoenlep1' AS pff_variable, 'tract' AS geotype,
    {_he1("c")} AS c, round(e, 0) AS e, round(m, 0) AS m,
    {_he1("p")} AS p, {_he1("z")} AS z
  FROM stats),
t1 AS (
  SELECT census_geoid, pff_variable, geotype,
    CASE WHEN c < 0 THEN NULL ELSE c END AS c,
    CASE WHEN e < 0 THEN NULL ELSE e END AS e,
    CASE WHEN m < 0 THEN NULL ELSE m END AS m,
    CASE WHEN p < 0 THEN NULL ELSE p END AS p,
    CASE WHEN z < 0 THEN NULL ELSE z END AS z
  FROM rounded),
t2 AS (SELECT census_geoid, pff_variable, geotype, c, e, m,
         CASE WHEN p > 100 THEN NULL ELSE p END AS p, z FROM t1),
t3 AS (SELECT census_geoid, pff_variable, geotype, c, e, m, p,
         CASE WHEN p IS NULL THEN NULL ELSE z END AS z FROM t2),
t4 AS (SELECT census_geoid, pff_variable, geotype, c, e, m, p,
         CASE WHEN p = 100 THEN 0.0 ELSE z END AS z FROM t3)
SELECT census_geoid, pff_variable, geotype,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE c END AS c,
  e,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE m END AS m,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE p END AS p,
  CASE WHEN e = 0 OR e IS NULL THEN NULL ELSE z END AS z
FROM t4 ORDER BY census_geoid
"""


ORACLES["q327_acs_variable_e2e"] = _acs_lgoenlep1_oracle()


# q331/q332: the WHOLE packaged catalog through the set-based batch
# planner — the oracle is GENERATED from the same catalog JSON + the
# shared synthetic value spec (synth_catalog.py): it rebuilds the wide
# values from `customer` in SQL and replays scrub → melt → horizontal
# fold → base/twin/profile assembly → rounding → the full cleaning
# cascade → labs formatting, set-based like the engine plan.
from synth_catalog import full_catalog_oracle_sql as _fc_sql  # noqa: E402

ORACLES["q331_acs_full_catalog_batch"] = _fc_sql(
    "acs", 2019, ["tract", "borough", "city"]
)
ORACLES["q332_decennial_full_catalog_batch"] = _fc_sql(
    "decennial", 2020, ["tract", "borough", "city"]
)


# q333: the PACKAGED REAL ratio.csv inlined as VALUES (ratio strings
# CAST to DOUBLE — a bare 18-decimal literal would parse as DECIMAL and
# change the arithmetic); pipeline mirrors q07's quantize-before-fold
# idiom around the real convert_moe power law.
def _real_ratio_oracle() -> str:
    import csv as _csv
    from pathlib import Path as _Path

    p = (
        _Path(__file__).parent / "db_factfinder_spark" / "data"
        / "lookup_geo" / "2010_to_2020" / "ratio.csv"
    )
    with open(p) as f:
        rows = list(_csv.DictReader(f))
    n = len({r["boroct2010"] for r in rows})
    vals = ",\n  ".join(
        f"('{r['boroct2010']}', '{r['boroct2020']}', '{r['ratio']}')"
        for r in rows
    )
    mq = "CAST(floor(m2 * 100 + 0.5) AS DOUBLE) / 100"
    return f"""
WITH rv(boroct2010, boroct2020, rs) AS (VALUES
  {vals}),
codes AS (
  SELECT boroct2010, row_number() OVER (ORDER BY boroct2010) - 1 AS idx
  FROM (SELECT DISTINCT boroct2010 FROM rv)),
facts0 AS (
  SELECT c_custkey % {n} AS idx,
    CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS DOUBLE) AS e,
    CAST(sum(CAST(floor(c_acctbal / 7 + 1000) AS BIGINT)) AS DOUBLE) AS m
  FROM customer GROUP BY 1),
facts AS (
  SELECT '360' || lpad(c.boroct2010, 8, '0') AS geoid_ct2010, e, m
  FROM facts0 f JOIN codes c USING (idx)),
r AS (
  SELECT '360' || lpad(boroct2010, 8, '0') AS geoid_ct2010,
         '360' || lpad(boroct2020, 8, '0') AS geoid_ct2020,
         CAST(rs AS DOUBLE) AS ratio
  FROM rv),
j AS (SELECT r.geoid_ct2020, f.e, f.m, r.ratio
      FROM r LEFT JOIN facts f USING (geoid_ct2010)),
s AS (
  SELECT geoid_ct2020, e * ratio AS e2,
    CASE WHEN ratio = 1 THEN m
         WHEN e * ratio = 0 THEN NULL
         WHEN pow(ratio * 100, 0.56901) * 7.96309 >= 100 THEN m
         ELSE pow(ratio * 100, 0.56901) * 7.96309 / 100 * m END AS m2
  FROM j),
q AS (
  SELECT geoid_ct2020,
    CAST(floor(e2 * 1000000.0 + 0.5) AS BIGINT) AS e_fx,
    CAST(floor(({mq}) * ({mq}) * 10000.0 + 0.5) AS BIGINT) AS m_sq_fx
  FROM s)
SELECT geoid_ct2020 AS census_geoid,
  CAST(coalesce(sum(e_fx), 0) AS DOUBLE) / 1000000.0 AS e,
  sqrt(CAST(coalesce(sum(m_sq_fx), 0) AS DOUBLE) / 10000.0) AS m,
  count(*) AS n_splits
FROM q GROUP BY 1 ORDER BY census_geoid
"""


ORACLES["q333_real_crosswalk_weights"] = _real_ratio_oracle()


# q334: the PACKAGED REAL community-profiles mapping inlined — the
# oracle reads the same JSON, regenerates the deterministic
# measure-letter values per (variable index, letter ordinal), and
# assembles the 105 real output columns with MAX-CASE pivoting (the
# engine's grouped first(ignorenulls) over one-row-per-geoid frames).
def _real_profile_mapping_oracle() -> str:
    import json as _json
    from pathlib import Path as _Path

    p = (
        _Path(__file__).parent / "db_factfinder_spark" / "data"
        / "pipelines" / "acs_community_profiles_variable_mapping.json"
    )
    with open(p) as f:
        mappings = _json.load(f)
    vi = {
        v: i
        for i, v in enumerate(sorted({m["pff_variable"] for m in mappings}))
    }
    letters = ["c", "e", "m", "p", "z"]
    mv_rows, out_cols = [], []
    for m in mappings:
        for letter, oc in m["column_mapping"].items():
            mv_rows.append(
                f"('{m['geotype']}', {letters.index(letter)},"
                f" {vi[m['pff_variable']]}, '{oc}')"
            )
            out_cols.append(oc)
    pivots = ",\n  ".join(
        f"max(CASE WHEN oc = '{oc}' THEN v END) AS {oc}" for oc in out_cols
    )
    return f"""
WITH base15 AS (
  SELECT c_custkey % 15 AS key,
    CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1
  FROM customer GROUP BY 1),
base5 AS (
  SELECT c_custkey % 5 AS key,
    CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1
  FROM customer GROUP BY 1),
base1 AS (
  SELECT CAST(sum(CAST(floor(c_acctbal) AS BIGINT)) AS BIGINT) AS s1
  FROM customer),
gf AS (
  SELECT 'CDTA' AS geo,
         'CD' || lpad(CAST(key AS VARCHAR), 2, '0') AS census_geoid, s1
  FROM base15
  UNION ALL
  SELECT 'cdta_fp_100', 'CD' || lpad(CAST(key AS VARCHAR), 2, '0'), s1
  FROM base15 WHERE key % 3 = 0
  UNION ALL
  SELECT 'cdta_fp_500', 'CD' || lpad(CAST(key AS VARCHAR), 2, '0'), s1
  FROM base15 WHERE key % 2 = 0
  UNION ALL
  SELECT 'borough', 'B' || lpad(CAST(key AS VARCHAR), 2, '0'), s1
  FROM base5
  UNION ALL
  SELECT 'city', 'Z00', s1 FROM base1),
mv(geo, l, i, oc) AS (VALUES
  {",  ".join(mv_rows)}),
long AS (
  SELECT g.census_geoid, mv.oc,
    CAST(g.s1 * (mv.i + 1) + mv.l * 7919 + mv.i AS DOUBLE) AS v
  FROM gf g JOIN mv ON mv.geo = g.geo)
SELECT census_geoid,
  {pivots}
FROM long GROUP BY 1 ORDER BY census_geoid
"""


ORACLES["q334_real_profile_mapping"] = _real_profile_mapping_oracle()


# q337: the full catalog at AGGREGATED geotypes (CT20 + NTA) — oracle
# generated from the same catalog JSON: identity-ratio crosswalk fold,
# grouped medians from the rolled-up bins, special formulas, base and
# median-base p/z, and the shared rounding/cleaning/labs tail.
from synth_catalog import nta_catalog_oracle_sql as _nta_sql  # noqa: E402

ORACLES["q337_acs_catalog_batch_nta"] = _nta_sql(2019)


# q335: q302's winnow pairs with the max_df=4 flood-fingerprint cap —
# postings whose fingerprint has df > 4 drop before the self-join
# (cap_hot_buckets subset contract).
ORACLES["q335_winnow_pairs_capped"] = f"""
WITH d AS (SELECT doc_id, {_NORM} AS t FROM documents
           WHERE text IS NOT NULL),
h AS (SELECT doc_id,
        CASE WHEN len(t) >= 20 THEN
          list_transform(range(1, len(t) - 20 + 2),
            i -> ('0x' || substr(md5(substr(t, CAST(i AS INT), 20)), 1, 7))
                   ::BIGINT)
        ELSE [] END AS hl
      FROM d),
f AS (SELECT doc_id,
        list_distinct(list_transform(
          range(1, greatest(len(hl) - 7, 1) + 1),
          j -> list_min(hl[CAST(j AS INT):CAST(j AS INT) + 7]))) AS fps
      FROM h WHERE len(hl) >= 1),
p AS (SELECT doc_id, unnest(fps) AS fp FROM f),
keep AS (SELECT fp FROM p GROUP BY fp HAVING count(*) <= 4),
p2 AS (SELECT p.doc_id, p.fp FROM p JOIN keep USING (fp)),
pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(count(*) AS BIGINT) AS n_shared
       FROM p2 a JOIN p2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT id_a, id_b, n_shared FROM pr WHERE n_shared >= 2
ORDER BY id_a, id_b
"""

# q336: q303's Adamic-Adar with the max_degree=25 hub-middle cap —
# middles above the cap leave the adjacency before the wedge join.
ORACLES["q336_adamic_adar_capped"] = """
WITH ords AS (
  SELECT o_orderkey, o_custkey * 2 AS cnode
  FROM orders WHERE o_custkey % 11 = 0),
pairs AS (
  SELECT DISTINCT cnode, l_suppkey * 2 + 1 AS snode
  FROM lineitem JOIN ords ON l_orderkey = o_orderkey),
sym AS (
  SELECT cnode AS a, snode AS b FROM pairs
  UNION
  SELECT snode, cnode FROM pairs),
deg AS (SELECT a AS v, count(*) AS deg FROM sym GROUP BY 1
        HAVING count(*) <= 25),
adj AS (SELECT s.b AS v, s.a AS u, d.deg
        FROM sym s JOIN deg d ON s.b = d.v),
w AS (
  SELECT x.u AS id_a, y.u AS id_b,
         CAST(floor(1000000000.0 / ln(CAST(x.deg AS DOUBLE)) + 0.5)
              AS BIGINT) AS term
  FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u)
SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(term) AS BIGINT) AS aa_units
FROM w GROUP BY 1, 2 ORDER BY id_a, id_b
"""


# q328: sorted-neighborhood blocking — global rank, floor-bucketed
# neighbor equi-join (floor() is the portable bucket rule: Spark's
# double->long cast truncates but DuckDB's CAST rounds).
ORACLES["q328_sorted_neighborhood"] = """
WITH a AS (SELECT c_custkey * 2 AS rid, c_name AS name FROM customer),
b AS (SELECT c_custkey * 2 + 1 AS rid,
        CASE WHEN c_custkey % 13 = 0
             THEN substr(c_name, 1, 5) || substr(c_name, 7)
             ELSE c_name END AS name
      FROM customer),
recs AS (SELECT * FROM a UNION ALL SELECT * FROM b),
ranked AS (
  SELECT rid, row_number() OVER (ORDER BY name ASC, rid ASC) AS r
  FROM recs),
bk AS (SELECT rid, r, CAST(floor(r / 3) AS BIGINT) AS bkt FROM ranked),
probes AS (
  SELECT rid AS id_b, r AS rank_b, unnest([bkt - 1, bkt]) AS bkt
  FROM bk)
SELECT l.rid AS id_a, p.id_b,
  CAST(l.r AS BIGINT) AS rank_a, CAST(p.rank_b AS BIGINT) AS rank_b
FROM bk l JOIN probes p ON l.bkt = p.bkt
WHERE p.rank_b > l.r AND p.rank_b - l.r <= 3
ORDER BY rank_a, rank_b
"""

# q329: l-diversity audit of (nation, segment) quasi-groups.
ORACLES["q329_l_diversity"] = """
SELECT c_nationkey AS nation, c_mktsegment AS segment,
  CAST(count(*) AS BIGINT) AS group_size,
  CAST(count(DISTINCT CAST(floor(c_acctbal * 10) AS BIGINT) % 10)
       AS BIGINT) AS n_sensitive_values,
  count(DISTINCT CAST(floor(c_acctbal * 10) AS BIGINT) % 10) >= 3
    AS is_diverse
FROM customer GROUP BY 1, 2 ORDER BY nation, segment
"""

# q330: percolator with must-not terms — containment-count positives
# minus one exclude anti-join.
ORACLES["q330_percolate_negation"] = f"""
WITH q(query_id, terms, exclude_terms) AS (VALUES
  ('q_the', ['the'], CAST([] AS VARCHAR[])),
  ('q_the_not_and', ['the'], ['and']),
  ('q_data', ['data'], CAST(NULL AS VARCHAR[])),
  ('q_empty', CAST([] AS VARCHAR[]), ['the'])),
qt AS (SELECT query_id, unnest(list_distinct(terms)) AS t FROM q
       WHERE terms IS NOT NULL AND len(terms) >= 1),
qn AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY 1),
d AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS t
      FROM documents WHERE text IS NOT NULL),
hits AS (SELECT d.doc_id, qt.query_id, count(*) AS h
         FROM d JOIN qt USING (t) GROUP BY 1, 2),
pos AS (SELECT doc_id, query_id FROM hits JOIN qn USING (query_id)
        WHERE h = n_terms),
ex AS (SELECT query_id, unnest(list_distinct(exclude_terms)) AS t
       FROM q WHERE exclude_terms IS NOT NULL
              AND len(exclude_terms) >= 1),
hit_ex AS (SELECT DISTINCT d.doc_id, ex.query_id
           FROM d JOIN ex USING (t))
SELECT pos.doc_id, pos.query_id
FROM pos LEFT JOIN hit_ex
  ON pos.doc_id = hit_ex.doc_id AND pos.query_id = hit_ex.query_id
WHERE hit_ex.doc_id IS NULL
ORDER BY pos.doc_id, pos.query_id
"""


# q338: MaxSim late-interaction — doc tokens (identity/reversed/
# 32-rotated embedding), query tokens (identity/reversed, vec_id<6);
# per-token max cosine quantized to integer nano-units, long sum.
ORACLES["q338_maxsim_late_interaction"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
dt AS (
  SELECT vec_id AS d_id, v FROM e
  UNION ALL SELECT vec_id, list_reverse(v) FROM e
  UNION ALL SELECT vec_id, v[33:64] || v[1:32] FROM e),
qt AS (
  SELECT vec_id AS q_id, 0 AS q_tok, v FROM e WHERE vec_id < 6
  UNION ALL SELECT vec_id, 1, list_reverse(v) FROM e WHERE vec_id < 6),
pair AS (
  SELECT dt.d_id, qt.q_id, qt.q_tok,
    CASE WHEN sqrt(list_dot_product(qt.v, qt.v))
              * sqrt(list_dot_product(dt.v, dt.v)) = 0 THEN NULL
         ELSE list_dot_product(qt.v, dt.v)
              / (sqrt(list_dot_product(qt.v, qt.v))
                 * sqrt(list_dot_product(dt.v, dt.v)))
    END AS cos
  FROM dt CROSS JOIN qt),
per_tok AS (
  SELECT d_id, q_id, q_tok, max(cos) AS max_cos
  FROM pair GROUP BY 1, 2, 3),
scored AS (
  SELECT q_id, d_id,
    sum(coalesce(CAST(floor(max_cos * 1000000000.0 + 0.5) AS BIGINT),
                 0)) AS score_q
  FROM per_tok GROUP BY 1, 2),
ranked AS (
  SELECT q_id AS query_id, d_id AS doc_id,
    CAST(score_q AS DOUBLE) / 1000000000.0 AS score,
    row_number() OVER (PARTITION BY q_id
                       ORDER BY score_q DESC, d_id ASC) AS rank
  FROM scored)
SELECT query_id, doc_id, score, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


# q339: RRF fusion of BM25 (q149's exact chain, top-50) and cosine
# (q29's chain, probe vec_id=0, top-50): 1/(60+r) terms added in the
# fixed bm25-then-cos order, top-10 by (score desc, doc asc).
ORACLES["q339_rrf_fusion"] = f"""
WITH lens AS (
  SELECT doc_id, len({_TOKS}) AS dl FROM documents WHERE text IS NOT NULL),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens),
post AS (
  SELECT doc_id, t, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS t
        FROM documents WHERE text IS NOT NULL)
  WHERE t IN ('spark', 'join') GROUP BY doc_id, t),
dfc AS (SELECT t, count(*) AS df FROM post GROUP BY t),
per_doc AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN t = 'spark' THEN tf END) AS BIGINT) AS tf_0,
         CAST(sum(CASE WHEN t = 'join' THEN tf END) AS BIGINT) AS tf_1,
         CAST(sum(CASE WHEN t = 'spark' THEN df END) AS BIGINT) AS df_0,
         CAST(sum(CASE WHEN t = 'join' THEN df END) AS BIGINT) AS df_1
  FROM post JOIN dfc USING (t) GROUP BY doc_id),
j AS (
  SELECT per_doc.*, lens.dl, stats.n_docs,
         CAST(stats.sum_dl AS DOUBLE) / CAST(stats.n_docs AS DOUBLE)
           AS avgdl
  FROM per_doc JOIN lens USING (doc_id) CROSS JOIN stats),
bscored AS (
  SELECT doc_id,
    coalesce(
      ((CAST(n_docs AS DOUBLE) - CAST(df_0 AS DOUBLE) + 0.5)
         / (CAST(df_0 AS DOUBLE) + 0.5))
      * ((CAST(tf_0 AS DOUBLE) * 2.2)
         / (CAST(tf_0 AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))),
      0.0)
    + coalesce(
      ((CAST(n_docs AS DOUBLE) - CAST(df_1 AS DOUBLE) + 0.5)
         / (CAST(df_1 AS DOUBLE) + 0.5))
      * ((CAST(tf_1 AS DOUBLE) * 2.2)
         / (CAST(tf_1 AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))),
      0.0) AS score
  FROM j),
bm25r AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
    FROM bscored) WHERE rank <= 50),
ev AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
p0 AS (SELECT * FROM ev WHERE vec_id = 0),
cscored AS (
  SELECT c.vec_id AS doc_id,
    list_dot_product(p0.v, c.v)
      / (sqrt(list_dot_product(p0.v, p0.v))
         * sqrt(list_dot_product(c.v, c.v))) AS cosine
  FROM p0 JOIN ev c ON p0.vec_id != c.vec_id),
cosr AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
    FROM cscored) WHERE rank <= 50),
fused AS (
  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
    coalesce(1.0 / (60.0 + CAST(b.rank AS DOUBLE)), 0.0)
    + coalesce(1.0 / (60.0 + CAST(c.rank AS DOUBLE)), 0.0) AS rrf_score
  FROM bm25r b FULL OUTER JOIN cosr c USING (doc_id))
SELECT 0 AS query_id, doc_id, rrf_score, rank FROM (
  SELECT doc_id, rrf_score,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused)
WHERE rank <= 10 ORDER BY rank
"""


# q340: hashed linear classifier — md5 bucket mod 2^20, sparse weights
# from the doc_id%7==0 training slice's vocab, exact long feature sums.
ORACLES["q340_hashed_quality_logit"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
train_vocab AS (
  SELECT DISTINCT tok
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        WHERE doc_id % 7 = 0)),
buckets AS (
  SELECT DISTINCT
    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1048576 AS bucket
  FROM train_vocab),
weights AS (
  SELECT bucket, (bucket * 2654435761) % 4001 - 2000 AS w FROM buckets),
hashed AS (
  SELECT doc_id,
    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1048576 AS bucket
  FROM toks),
scores AS (
  SELECT h.doc_id, count(*) AS n_toks,
         CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS feat_sum
  FROM hashed h LEFT JOIN weights w USING (bucket) GROUP BY h.doc_id)
SELECT d.doc_id,
  coalesce(s.n_toks, 0) AS n_toks,
  coalesce(s.feat_sum, 0) AS feat_sum,
  CASE WHEN coalesce(s.n_toks, 0) > 0
       THEN CAST(s.feat_sum AS DOUBLE) / CAST(s.n_toks AS DOUBLE)
  END AS logit
FROM documents d LEFT JOIN scores s USING (doc_id) ORDER BY d.doc_id
"""


# q341: n-gram novelty — a gram is novel in the doc holding its
# min(doc_id); fraction of the doc's distinct 3-gram shingles.
ORACLES["q341_ngram_novelty"] = f"""
WITH d AS (SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
g AS (SELECT doc_id, unnest({_SHINGLES}) AS gram FROM d),
fst AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram),
per AS (
  SELECT g.doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM g JOIN fst f USING (gram) GROUP BY g.doc_id)
SELECT d2.doc_id,
  coalesce(p.n_grams, 0) AS n_grams,
  coalesce(p.n_novel, 0) AS n_novel,
  CASE WHEN p.n_grams > 0
       THEN CAST(p.n_novel AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
  END AS novelty
FROM documents d2 LEFT JOIN per p USING (doc_id) ORDER BY d2.doc_id
"""


# q342: crawl-frontier politeness scheduling — per-host rank window,
# sticky md5 host→worker, slot × delay fetch offsets.
ORACLES["q342_crawl_schedule"] = """
WITH f AS (
  SELECT source AS host, doc_id AS url, n_chars AS priority
  FROM documents),
ranked AS (
  SELECT host, url, priority,
    row_number() OVER (PARTITION BY host
                       ORDER BY priority DESC, url ASC) - 1 AS slot
  FROM f)
SELECT host, url, priority, slot,
  CAST(slot AS BIGINT) * 10 AS fetch_offset_s,
  ('0x' || substr(md5(host), 1, 15))::BIGINT % 8 AS worker
FROM ranked ORDER BY host, slot
"""


# q343: incremental novelty — state = distinct 3-grams of doc_id%3==0;
# batch grams anti-join the state, then the q341 min-id rule.
ORACLES["q343_novelty_with_state"] = f"""
WITH d AS (SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
state AS (
  SELECT DISTINCT unnest({_SHINGLES}) AS gram FROM d
  WHERE doc_id % 3 = 0),
batch AS (SELECT * FROM d WHERE doc_id % 3 != 0),
g AS (SELECT doc_id, unnest({_SHINGLES}) AS gram FROM batch),
fresh AS (
  SELECT g.* FROM g LEFT JOIN state USING (gram)
  WHERE state.gram IS NULL),
fst AS (SELECT gram, min(doc_id) AS first_id FROM fresh GROUP BY gram),
novel AS (
  SELECT f.doc_id, count(*) AS n_novel
  FROM fresh f JOIN fst USING (gram)
  WHERE fst.first_id = f.doc_id GROUP BY f.doc_id),
totals AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
SELECT b.doc_id,
  coalesce(t.n_grams, 0) AS n_grams,
  coalesce(nv.n_novel, 0) AS n_novel,
  CASE WHEN t.n_grams > 0
       THEN CAST(coalesce(nv.n_novel, 0) AS DOUBLE)
            / CAST(t.n_grams AS DOUBLE)
  END AS novelty
FROM batch b
LEFT JOIN totals t USING (doc_id)
LEFT JOIN novel nv USING (doc_id)
ORDER BY b.doc_id
"""


# q344: hard negatives — q29's cosine chain with the label-inequality
# predicate in the join.
ORACLES["q344_hard_negative_mining"] = """
WITH e AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
p AS (SELECT * FROM e WHERE vec_id < 8),
scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    c.label AS neighbor_label,
    list_dot_product(p.v, c.v)
      / (sqrt(list_dot_product(p.v, p.v))
         * sqrt(list_dot_product(c.v, c.v))) AS cosine
  FROM p JOIN e c
    ON p.vec_id != c.vec_id AND p.label != c.label)
SELECT probe_id, neighbor_id, neighbor_label, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, neighbor_id ASC)
              AS rank
  FROM scored)
WHERE rank <= 5 ORDER BY probe_id, rank
"""


# shared rule-word lists for the web-cleaning oracles (mirror
# llmdata/webclean.py C4_STOPWORDS / C4_BADWORDS)
_C4_STOP = (
    "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for']"
)
_C4_BAD = "['javascript', 'lorem', 'cookie']"


# q345: C4-style sentence cleaning — 10-token pseudo-sentences, the
# three sentence rules, the two document rules, md5 of the
# reassembled kept text.  Mirrors webclean.c4_clean op-for-op.
ORACLES["q345_c4_cleaning"] = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
    CASE WHEN len(toks) > 0 THEN
      list_transform(
        range(0, CAST(floor((len(toks) - 1) / 10) AS BIGINT) + 1),
        i -> toks[(i * 10 + 1):(i * 10 + 10)])
    ELSE CAST([] AS VARCHAR[][]) END AS sents
  FROM d),
k AS (
  SELECT doc_id, sents,
    list_filter(sents, s -> len(s) >= 5
      AND len(list_filter(s, t -> list_contains({_C4_STOP}, t))) > 0
      AND len(list_filter(s, t -> list_contains({_C4_BAD}, t))) = 0)
      AS keptsents
  FROM s)
SELECT doc_id,
  len(sents) AS n_sentences,
  len(keptsents) AS n_kept,
  len(flatten(keptsents)) AS n_tokens_kept,
  md5(coalesce(array_to_string(flatten(keptsents), ' '), ''))
    AS cleaned_md5,
  (len(keptsents) >= 3 AND len(flatten(keptsents)) >= 50
   AND len(flatten(keptsents)) <= 50000) AS kept
FROM k ORDER BY doc_id
"""


# q346: Gopher rule vector — map-side token stats + (doc, token)
# partial count -> per-doc max for the top-unigram share; ratios are
# single IEEE divisions of exact integer counts.
ORACLES["q346_gopher_rules"] = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
stats AS (
  SELECT doc_id,
    len(toks) AS n_tok,
    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
      AS char_sum,
    CAST(len(list_filter(toks, t -> list_contains({_C4_STOP}, t)))
         AS BIGINT) AS stop_count,
    CAST(len(list_filter(toks, t -> regexp_matches(t, '^[a-z]+$')))
         AS BIGINT) AS alpha_count
  FROM d),
g AS (SELECT doc_id, unnest(toks) AS tok FROM d),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM g GROUP BY doc_id, tok),
top AS (SELECT doc_id, max(c) AS top_count FROM cnt GROUP BY doc_id),
j AS (
  SELECT s.doc_id, s.n_tok, s.stop_count,
    CASE WHEN s.n_tok > 0 THEN
      CAST(s.char_sum AS DOUBLE) / CAST(s.n_tok AS DOUBLE)
    END AS mean_word_len,
    CASE WHEN s.n_tok > 0 THEN
      CAST(s.alpha_count AS DOUBLE) / CAST(s.n_tok AS DOUBLE)
    END AS alpha_frac,
    CASE WHEN s.n_tok > 0 THEN
      CAST(coalesce(t.top_count, 0) AS DOUBLE)
        / CAST(s.n_tok AS DOUBLE)
    END AS top_unigram_frac
  FROM stats s LEFT JOIN top t USING (doc_id))
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, stop_count,
  mean_word_len, alpha_frac, top_unigram_frac,
  (n_tok >= 50 AND n_tok <= 100000) AS r_len,
  CASE WHEN n_tok > 0
       THEN (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       ELSE false END AS r_mwl,
  (stop_count >= 2) AS r_stop,
  CASE WHEN n_tok > 0 THEN (alpha_frac >= 0.8)
       ELSE false END AS r_alpha,
  CASE WHEN n_tok > 0 THEN (top_unigram_frac <= 0.12)
       ELSE false END AS r_top,
  ((n_tok >= 50 AND n_tok <= 100000)
   AND CASE WHEN n_tok > 0
            THEN (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
            ELSE false END
   AND (stop_count >= 2)
   AND CASE WHEN n_tok > 0 THEN (alpha_frac >= 0.8)
            ELSE false END
   AND CASE WHEN n_tok > 0 THEN (top_unigram_frac <= 0.12)
            ELSE false END) AS kept
FROM j ORDER BY doc_id
"""


# q347: redirect resolution — the recursive walk the pointer-doubling
# joins compute in log rounds; final hop per url, terminal check for
# the resolved flag.
ORACLES["q347_redirect_resolution"] = """
WITH RECURSIVE e AS (
  SELECT doc_id AS src, doc_id - 1 AS dst FROM documents
  WHERE doc_id % 5 != 0),
nodes AS (
  SELECT DISTINCT u FROM (
    SELECT src AS u FROM e UNION ALL SELECT dst FROM e)),
walk(u, v, h) AS (
  SELECT u, u, 0 FROM nodes
  UNION ALL
  SELECT w.u, e.dst, w.h + 1
  FROM walk w JOIN e ON w.v = e.src
  WHERE w.h < 16),
fin AS (
  SELECT u, v, h,
    row_number() OVER (PARTITION BY u ORDER BY h DESC) AS rn
  FROM walk)
SELECT f.u AS url, f.v AS final_url, CAST(f.h AS BIGINT) AS hops,
  (s.src IS NULL) AS resolved
FROM fin f LEFT JOIN (SELECT DISTINCT src FROM e) s ON f.v = s.src
WHERE f.rn = 1 ORDER BY url
"""


# q348: isotonic calibration — PAV by the minimax closed form over 20
# score bins; every candidate mean is one IEEE division of exact
# integer sums (equal rationals round identically, so pooling ties
# cross-engine).
ORACLES["q348_isotonic_calibration"] = """
WITH sc AS (
  SELECT doc_id, (doc_id * 2654435761) % 1000 AS s FROM documents),
l AS (
  SELECT s // 50 AS bin,
    CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < s
         THEN 1 ELSE 0 END AS y
  FROM sc),
b AS (
  SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS sum_y
  FROM l GROUP BY bin),
cum AS (
  SELECT bin, n, sum_y,
    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n,
    CAST(sum(sum_y) OVER (ORDER BY bin) AS BIGINT) AS cum_y
  FROM b),
cp AS (
  SELECT bin, n, sum_y, cum_n, cum_y,
    cum_n - n AS prev_n, cum_y - sum_y AS prev_y
  FROM cum),
spans AS (
  SELECT i.bin AS i, j.bin AS j,
    CAST(j.cum_y - i.prev_y AS DOUBLE)
      / CAST(j.cum_n - i.prev_n AS DOUBLE) AS mu
  FROM cp i JOIN cp j ON i.bin <= j.bin),
pooled AS (
  SELECT k.bin AS k, s.i, min(s.mu) AS m
  FROM spans s JOIN cp k ON s.i <= k.bin AND k.bin <= s.j
  GROUP BY k.bin, s.i),
fit AS (SELECT k, max(m) AS fitted FROM pooled GROUP BY k)
SELECT b.bin, b.n, b.sum_y,
  CAST(b.sum_y AS DOUBLE) / CAST(b.n AS DOUBLE) AS rate, f.fitted
FROM b JOIN fit f ON b.bin = f.k ORDER BY b.bin
"""


# q349: matryoshka recall — the q29/q344 cosine chain twice (full 64d
# and the first-16-dims truncation), then the bounded recall join.
ORACLES["q349_matryoshka_recall"] = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
p AS (SELECT * FROM e WHERE vec_id < 10),
fs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_dot_product(p.v, c.v)
      / (sqrt(list_dot_product(p.v, p.v))
         * sqrt(list_dot_product(c.v, c.v))) AS cosine
  FROM p JOIN e c ON p.vec_id != c.vec_id),
fr AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM fs) WHERE rank <= 10),
e16 AS (SELECT vec_id, v[1:16] AS v FROM e),
p16 AS (SELECT * FROM e16 WHERE vec_id < 10),
ts AS (
  SELECT p16.vec_id AS probe_id, c.vec_id AS neighbor_id,
    list_dot_product(p16.v, c.v)
      / (sqrt(list_dot_product(p16.v, p16.v))
         * sqrt(list_dot_product(c.v, c.v))) AS cosine
  FROM p16 JOIN e16 c ON p16.vec_id != c.vec_id),
tr AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM ts) WHERE rank <= 10)
SELECT fr.probe_id,
  CAST(count(tr.neighbor_id) AS BIGINT) AS n_overlap,
  CAST(count(tr.neighbor_id) AS DOUBLE) / 10.0 AS recall
FROM fr LEFT JOIN tr
  ON fr.probe_id = tr.probe_id AND fr.neighbor_id = tr.neighbor_id
GROUP BY fr.probe_id ORDER BY fr.probe_id
"""



# q350: Wald SPRT — integer nano-nat increments/bounds from
# portable_ln differences of positive integers; exact integer LLR
# cumsum per arm, decision at the first bound crossing.
ORACLES["q350_sprt_monitor"] = """
WITH ev AS (
  SELECT user_id % 3 AS arm, event_id,
    (event_type = 'purchase') AS success
  FROM events),
c AS (SELECT
  CAST(floor(((CAST((length(format('{:b}', 5)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(5 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 5)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0)) - (CAST((length(format('{:b}', 4)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(4 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 4)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0))) * 1000000000.0 + 0.5) AS BIGINT) AS c1,
  CAST(floor(((CAST((length(format('{:b}', 15)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(15 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 15)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0)) - (CAST((length(format('{:b}', 16)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(16 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 16)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0))) * 1000000000.0 + 0.5) AS BIGINT) AS c0,
  CAST(floor(((CAST((length(format('{:b}', 180)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(180 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 180)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0)) - (CAST((length(format('{:b}', 10)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(10 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 10)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0))) * 1000000000.0 + 0.5) AS BIGINT) AS a_bound,
  CAST(floor(((CAST((length(format('{:b}', 20)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(20 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 20)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0)) - (CAST((length(format('{:b}', 190)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(190 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', 190)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0))) * 1000000000.0 + 0.5) AS BIGINT) AS b_bound),
s AS (
  SELECT arm, event_id,
    CAST(sum(CASE WHEN success THEN c.c1 ELSE c.c0 END)
         OVER (PARTITION BY arm ORDER BY event_id) AS BIGINT) AS llr
  FROM ev, c),
m AS (
  SELECT s.arm, s.event_id, s.llr,
    CASE WHEN s.llr >= c.a_bound THEN 'h1'
         WHEN s.llr <= c.b_bound THEN 'h0' END AS crossv
  FROM s, c),
dec AS (
  SELECT arm, min(event_id) AS decided_at
  FROM m WHERE crossv IS NOT NULL GROUP BY arm),
tot AS (
  SELECT arm, count(*) AS n_events,
    CAST(arg_max(llr, event_id) AS BIGINT) AS final_llr_nano
  FROM m GROUP BY arm)
SELECT t.arm, t.n_events, t.final_llr_nano,
  coalesce(md.crossv, 'continue') AS decision,
  d.decided_at,
  CAST(md.llr AS BIGINT) AS llr_at_decision
FROM tot t
LEFT JOIN dec d USING (arm)
LEFT JOIN m md ON md.arm = d.arm AND md.event_id = d.decided_at
ORDER BY t.arm
"""


# q351: t-closeness — ordered EMD in exact integers (rational
# numerators against the common denominator n_g*N), one division per
# group; the t decision is integer cross-multiplication.
ORACLES["q351_t_closeness"] = """
WITH d AS (
  SELECT c_nationkey,
    (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 99999) // 110000
      AS bal_bucket
  FROM customer),
cats AS (
  SELECT bal_bucket AS cat, count(*) AS nc FROM d GROUP BY 1),
catsc AS (
  SELECT cat,
    CAST(sum(nc) OVER (ORDER BY cat) AS BIGINT) AS cum_all,
    CAST(sum(nc) OVER () AS BIGINT) AS n_all
  FROM cats),
grp AS (
  SELECT c_nationkey, bal_bucket AS cat, count(*) AS c
  FROM d GROUP BY 1, 2),
spine AS (
  SELECT q.c_nationkey, s.cat, s.cum_all, s.n_all
  FROM (SELECT DISTINCT c_nationkey FROM d) q CROSS JOIN catsc s),
cells AS (
  SELECT sp.c_nationkey, sp.cat, sp.cum_all, sp.n_all,
    CAST(coalesce(g.c, 0) AS BIGINT) AS c
  FROM spine sp LEFT JOIN grp g
    ON sp.c_nationkey = g.c_nationkey AND sp.cat = g.cat),
cum AS (
  SELECT *,
    CAST(sum(c) OVER (PARTITION BY c_nationkey ORDER BY cat)
         AS BIGINT) AS cum_g,
    CAST(sum(c) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_g
  FROM cells),
a AS (
  SELECT c_nationkey, max(n_g) AS n_g, max(n_all) AS n_all,
    count(*) AS m,
    CAST(sum(abs(cum_g * n_all - cum_all * n_g)) AS BIGINT) AS s
  FROM cum GROUP BY c_nationkey)
SELECT c_nationkey, CAST(n_g AS BIGINT) AS group_size,
  CASE WHEN m > 1
       THEN CAST(s AS DOUBLE) / CAST(n_g * n_all * (m - 1) AS DOUBLE)
       ELSE 0.0 END AS emd,
  (s * 5 <= n_g * n_all * (m - 1) * 1) AS is_close
FROM a ORDER BY c_nationkey
"""


# q352: leave-one-group-out OLS influence — per-group sufficient
# stats, totals re-summed from the groups, slope closed form in fixed
# IEEE order; the 1%-order sample keeps every product below 2^53.
ORACLES["q352_loo_influence"] = """
WITH d AS (
  SELECT l_suppkey % 50 AS grp,
    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
    CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
  FROM lineitem WHERE l_orderkey % 100 = 0),
per AS (
  SELECT grp, CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
    CAST(sum(x * y) AS HUGEINT) AS sxy,
    CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM d GROUP BY grp),
tot AS (
  SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
    sum(sxy) AS tsxy, sum(sxx) AS tsxx
  FROM per),
sl AS (
  SELECT p.grp, p.n,
    CASE WHEN CAST(t.tn * t.tsxx - t.tsx * t.tsx AS DOUBLE) != 0
         THEN CAST(t.tn * t.tsxy - t.tsx * t.tsy AS DOUBLE)
              / CAST(t.tn * t.tsxx - t.tsx * t.tsx AS DOUBLE)
    END AS slope_full,
    CASE WHEN CAST((t.tn - p.n) * (t.tsxx - p.sxx)
                   - (t.tsx - p.sx) * (t.tsx - p.sx) AS DOUBLE) != 0
         THEN CAST((t.tn - p.n) * (t.tsxy - p.sxy)
                   - (t.tsx - p.sx) * (t.tsy - p.sy) AS DOUBLE)
              / CAST((t.tn - p.n) * (t.tsxx - p.sxx)
                     - (t.tsx - p.sx) * (t.tsx - p.sx) AS DOUBLE)
    END AS slope_without
  FROM per p, tot t)
SELECT grp, CAST(n AS BIGINT) AS n, slope_full, slope_without,
  slope_without - slope_full AS influence
FROM sl ORDER BY grp
"""


# q353: typeahead index — vocab count, prefix explode off the vocab,
# per-prefix top-3 by (count desc, token asc).
ORACLES["q353_typeahead_completions"] = f"""
WITH v AS (
  SELECT tok AS token, count(*) AS cnt FROM (
    SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok),
p AS (
  SELECT token, cnt,
    unnest(list_transform(
      range(1, least(length(token), 3) + 1),
      i -> substr(token, 1, CAST(i AS INT)))) AS prefix
  FROM v)
SELECT prefix, rank, token, cnt FROM (
  SELECT prefix, token, cnt,
    row_number() OVER (PARTITION BY prefix
                       ORDER BY cnt DESC, token ASC) AS rank
  FROM p) WHERE rank <= 3 ORDER BY prefix, rank
"""



# q354: LSH banding planner — pure squaring chains mirrored
# structurally from lsh_parameter_plan (generated by the same
# exponent-halving loop), integer nano masses, integer threshold
# cross-multiplication.
ORACLES["q354_lsh_parameter_plan"] = """
SELECT bands, rows_per_band, fp_nano, fn_nano,
  fp_nano + fn_nano AS total_nano
FROM (SELECT 64 AS bands, 2 AS rows_per_band,
  CAST(sum(CASE WHEN kk * 5 < 400 THEN CAST(floor(((1.0 - (((((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * ((((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS fp_nano,
  CAST(sum(CASE WHEN NOT (kk * 5 < 400) THEN CAST(floor(((1.0 - (1.0 - (((((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * ((((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (1.0 - ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS fn_nano
FROM (SELECT range AS kk FROM range(1, 100))
UNION ALL
SELECT 32 AS bands, 4 AS rows_per_band,
  CAST(sum(CASE WHEN kk * 5 < 400 THEN CAST(floor(((1.0 - ((((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * (((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS fp_nano,
  CAST(sum(CASE WHEN NOT (kk * 5 < 400) THEN CAST(floor(((1.0 - (1.0 - ((((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * (((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * ((1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * (1.0 - (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS fn_nano
FROM (SELECT range AS kk FROM range(1, 100))
UNION ALL
SELECT 16 AS bands, 8 AS rows_per_band,
  CAST(sum(CASE WHEN kk * 5 < 400 THEN CAST(floor(((1.0 - (((((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * ((((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS fp_nano,
  CAST(sum(CASE WHEN NOT (kk * 5 < 400) THEN CAST(floor(((1.0 - (1.0 - (((((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * ((((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (1.0 - ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS fn_nano
FROM (SELECT range AS kk FROM range(1, 100))
UNION ALL
SELECT 8 AS bands, 16 AS rows_per_band,
  CAST(sum(CASE WHEN kk * 5 < 400 THEN CAST(floor(((1.0 - ((((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * (((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS fp_nano,
  CAST(sum(CASE WHEN NOT (kk * 5 < 400) THEN CAST(floor(((1.0 - (1.0 - ((((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * (((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * ((1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * (1.0 - (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS fn_nano
FROM (SELECT range AS kk FROM range(1, 100))
UNION ALL
SELECT 4 AS bands, 32 AS rows_per_band,
  CAST(sum(CASE WHEN kk * 5 < 400 THEN CAST(floor(((1.0 - (((1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * ((1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS fp_nano,
  CAST(sum(CASE WHEN NOT (kk * 5 < 400) THEN CAST(floor(((1.0 - (1.0 - (((1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * ((1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))) * (1.0 - ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS fn_nano
FROM (SELECT range AS kk FROM range(1, 100))
UNION ALL
SELECT 2 AS bands, 64 AS rows_per_band,
  CAST(sum(CASE WHEN kk * 5 < 400 THEN CAST(floor(((1.0 - ((1.0 - (((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * (1.0 - (((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS fp_nano,
  CAST(sum(CASE WHEN NOT (kk * 5 < 400) THEN CAST(floor(((1.0 - (1.0 - ((1.0 - (((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))))) * (1.0 - (((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))))) * ((((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))) * (((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)))) * ((((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))) * (((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0)) * ((CAST(kk AS DOUBLE) / 100.0) * (CAST(kk AS DOUBLE) / 100.0))))))))))) * 1000000000.0) + 0.5) AS BIGINT) ELSE 0 END)
       AS BIGINT) AS fn_nano
FROM (SELECT range AS kk FROM range(1, 100))) ORDER BY total_nano, bands
"""


# q355: Copeland fusion — three deterministic top-20 rankers, pairwise
# win counts over the candidate spine with missing-rank = +inf, 2/1/0
# points, top-10.
ORACLES["q355_copeland_fusion"] = """
WITH r1 AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (
      ORDER BY n_chars DESC, doc_id ASC) AS rank FROM documents)
  WHERE rank <= 20),
r2 AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (
      ORDER BY (doc_id * 2654435761) % 100000 ASC, doc_id ASC) AS rank
    FROM documents)
  WHERE rank <= 20),
r3 AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, row_number() OVER (
      ORDER BY (doc_id * 1103515245 + 12345) % 100000 ASC, doc_id ASC)
      AS rank
    FROM documents)
  WHERE rank <= 20),
cand AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id FROM r1 UNION ALL SELECT doc_id FROM r2
    UNION ALL SELECT doc_id FROM r3)),
piv AS (
  SELECT c.doc_id,
    coalesce(CAST(r1.rank AS BIGINT), 1099511627776) AS rl,
    coalesce(CAST(r2.rank AS BIGINT), 1099511627776) AS rh1,
    coalesce(CAST(r3.rank AS BIGINT), 1099511627776) AS rh2
  FROM cand c
  LEFT JOIN r1 ON c.doc_id = r1.doc_id
  LEFT JOIN r2 ON c.doc_id = r2.doc_id
  LEFT JOIN r3 ON c.doc_id = r3.doc_id),
pairs AS (
  SELECT a.doc_id AS d_a,
    (CASE WHEN a.rl < b.rl THEN 1 ELSE 0 END
     + CASE WHEN a.rh1 < b.rh1 THEN 1 ELSE 0 END
     + CASE WHEN a.rh2 < b.rh2 THEN 1 ELSE 0 END) AS wab,
    (CASE WHEN b.rl < a.rl THEN 1 ELSE 0 END
     + CASE WHEN b.rh1 < a.rh1 THEN 1 ELSE 0 END
     + CASE WHEN b.rh2 < a.rh2 THEN 1 ELSE 0 END) AS wba
  FROM piv a JOIN piv b ON a.doc_id != b.doc_id),
scored AS (
  SELECT d_a AS doc_id,
    CAST(sum(CASE WHEN wab > wba THEN 2
                  WHEN wab = wba THEN 1 ELSE 0 END) AS BIGINT)
      AS copeland_x2
  FROM pairs GROUP BY d_a)
SELECT 0 AS query_id, doc_id, copeland_x2, rank FROM (
  SELECT doc_id, copeland_x2,
    row_number() OVER (ORDER BY copeland_x2 DESC, doc_id ASC) AS rank
  FROM scored)
WHERE rank <= 10 ORDER BY rank
"""



# q356: recrawl change-rate — lambda = ln(n) - ln(n-X) via portable_ln
# on exact integer interval counts, nano-quantized; saturated
# histories flagged with NULL lambda.
ORACLES["q356_recrawl_priority"] = """
WITH v AS (
  SELECT user_id AS url, event_id AS ord, event_type AS st,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
      AS prev
  FROM events),
a AS (
  SELECT url, count(*) AS n_intervals,
    CAST(sum(CASE WHEN NOT (st IS NOT DISTINCT FROM prev)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
  FROM v WHERE prev IS NOT NULL GROUP BY url),
a2 AS (SELECT *, n_intervals - n_changed AS nmx FROM a)
SELECT url, n_intervals, n_changed,
  (n_changed = n_intervals) AS saturated,
  CASE WHEN n_changed < n_intervals AND n_intervals > 0 THEN
    CAST(floor((((CAST((length(format('{:b}', n_intervals)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(n_intervals AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', n_intervals)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0)) - (CAST((length(format('{:b}', nmx)) - 1) AS DOUBLE) * 0.6931471805599453 + 2.0 * ((((((((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) + ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 3.0) + (((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 5.0) + ((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 7.0) + (((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 9.0) + ((((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 11.0) + (((((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 13.0) + ((((((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 15.0) + (((((((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 17.0) + ((((((((((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) * ((((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)) * (((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) - 1.0) / ((CAST(nmx AS DOUBLE) / CAST((CAST(1 AS BIGINT) << (length(format('{:b}', nmx)) - 1)) AS DOUBLE)) + 1.0)))) / 19.0))) * 1000000000.0) + 0.5) AS BIGINT)
  END AS lambda_nano
FROM a2 ORDER BY url
"""


# q357: bloom sizing planner — the SAME generated template as the
# Spark side (operators/bloom.py:bloom_parameter_plan_sql), DuckDB
# dialect: only the array literal and fold wrapper differ, the
# multiply sequence is identical.
from db_factfinder_spark.operators.bloom import bloom_parameter_plan_sql  # noqa: E402

ORACLES["q357_bloom_parameter_plan"] = (
    bloom_parameter_plan_sql("duckdb")
    + " ORDER BY bits_per_key, k_hashes"
)


# q358: U-shaped attribution — q194's assignment CTE with the
# position-based split: first/last integer buckets, middle bucket =
# exact leftover, div/first-k-extra inside the middles.
ORACLES["q358_position_attribution"] = """
WITH e AS (
  SELECT event_id AS eid, user_id AS k, epoch_us(ts) AS us, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(json_extract_string(props, '$.k') AS INT) % 5 AS channel
  FROM events),
conv AS (SELECT * FROM e WHERE event_type = 'purchase'),
touch AS (SELECT * FROM e WHERE event_type IN ('click', 'view')),
assigned AS (
  SELECT t.eid AS teid, t.us AS tus, t.channel,
         c.eid AS conv_id, c.cents
  FROM touch t
  JOIN conv c ON c.k = t.k AND c.us >= t.us
             AND c.us - t.us <= 86400000000
  QUALIFY row_number() OVER (
    PARTITION BY t.eid ORDER BY c.us, c.eid) = 1),
pos AS (
  SELECT channel, cents,
         count(*) OVER (PARTITION BY conv_id) AS n,
         row_number() OVER (
           PARTITION BY conv_id ORDER BY tus, teid) AS rn,
         (cents * 4000) // 10000 AS first_c,
         (cents * 4000) // 10000 AS last_c
  FROM assigned),
pos2 AS (
  SELECT *, cents - first_c - last_c AS mid_total FROM pos),
credits AS (
  SELECT channel,
    CASE WHEN n = 1 THEN cents
         WHEN n = 2 THEN cents // 2
           + CASE WHEN rn <= abs(cents % 2)
                  THEN CASE WHEN cents % 2 > 0 THEN 1
                            WHEN cents % 2 < 0 THEN -1 ELSE 0 END
                  ELSE 0 END
         ELSE CASE WHEN rn = 1 THEN first_c
                   WHEN rn = n THEN last_c
                   ELSE mid_total // (n - 2)
                     + CASE WHEN rn - 1 <= abs(mid_total % (n - 2))
                            THEN CASE WHEN mid_total % (n - 2) > 0
                                      THEN 1
                                      WHEN mid_total % (n - 2) < 0
                                      THEN -1 ELSE 0 END
                            ELSE 0 END
              END
    END AS credit
  FROM pos2),
direct AS (
  SELECT -1 AS channel, cents AS credit
  FROM conv WHERE eid NOT IN (SELECT conv_id FROM assigned)),
unioned AS (
  SELECT * FROM credits UNION ALL SELECT * FROM direct)
SELECT channel, count(*) AS n_credits,
  CAST(sum(credit) AS BIGINT) AS credited_cents
FROM unioned GROUP BY 1 ORDER BY channel
"""


# q359: Markov removal-effect attribution — journey windows ->
# transition counts -> the same 80-round integer-nano absorption fold
# (list_reduce over a dummy-element list; DuckDB folds need
# homogeneous lists, so the round counter is a list of empty BIGINT[]
# with v0 prepended).  States: 0..4 channels, 5 START, 6 CONV, 7 NULL.
ORACLES["q359_markov_attribution"] = """
WITH e AS (
  SELECT event_id AS eid, user_id AS k, epoch_us(ts) AS us, event_type,
         CAST(json_extract_string(props, '$.k') AS INT) % 5 AS ch
  FROM events),
conv1 AS (
  SELECT k, min(us) AS p_us FROM e
  WHERE event_type = 'purchase' GROUP BY k),
touches AS (
  SELECT t.k, t.us, t.eid, t.ch, c.p_us
  FROM e t LEFT JOIN conv1 c USING (k)
  WHERE t.event_type IN ('click', 'view')
    AND (c.p_us IS NULL OR t.us < c.p_us)),
seq AS (
  SELECT *,
    row_number() OVER (PARTITION BY k ORDER BY us, eid) AS rn,
    lead(ch) OVER (PARTITION BY k ORDER BY us, eid) AS nxt
  FROM touches),
trans AS (
  SELECT 5 AS fi, ch AS ti FROM seq WHERE rn = 1
  UNION ALL SELECT ch, nxt FROM seq WHERE nxt IS NOT NULL
  UNION ALL SELECT ch, CASE WHEN p_us IS NOT NULL THEN 6 ELSE 7 END
    FROM seq WHERE nxt IS NULL
  UNION ALL SELECT 5, 6 FROM conv1 c
    WHERE NOT EXISTS (SELECT 1 FROM touches t WHERE t.k = c.k)),
cnt AS (
  SELECT fi, ti, CAST(count(*) AS BIGINT) AS c
  FROM trans GROUP BY fi, ti),
one AS (
  SELECT list(struct_pack(fi := fi, ti := ti, c := c)) AS ent
  FROM cnt),
m0 AS (
  SELECT list_transform(range(0, 8), i ->
    list_transform(range(0, 8), j ->
      CAST(coalesce(list_sum(list_transform(
        list_filter(ent, x -> x.fi = i AND x.ti = j), x -> x.c)), 0)
        AS BIGINT))) AS M
  FROM one),
rem AS (
  SELECT M, unnest([-1, 0, 1, 2, 3, 4]) AS r FROM m0),
mr AS (
  SELECT r, list_transform(M, row ->
    list_transform(range(0, 8), j ->
      CASE WHEN j = 7 THEN row[8]
             + CASE WHEN r >= 0 THEN row[r + 1]
                    ELSE CAST(0 AS BIGINT) END
           WHEN j = r THEN CAST(0 AS BIGINT)
           ELSE row[j + 1] END)) AS MR
  FROM rem),
tt AS (
  SELECT r, MR,
    list_transform(MR, row -> CAST(list_sum(row) AS BIGINT)) AS T
  FROM mr),
it AS (
  SELECT r,
    list_reduce(
      list_prepend(
        list_transform(range(0, 8), i ->
          CASE WHEN i = 6 THEN CAST(1000000000 AS BIGINT)
               ELSE CAST(0 AS BIGINT) END),
        list_transform(range(1, 81), z -> CAST([] AS BIGINT[]))),
      (v, z) -> list_transform(range(0, 8), i ->
        CASE WHEN i = 6 THEN CAST(1000000000 AS BIGINT)
             WHEN T[i + 1] = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(floor(
               CAST(list_sum(list_transform(range(0, 8), j ->
                 MR[i + 1][j + 1] * v[j + 1])) AS BIGINT)
               / T[i + 1]) AS BIGINT) END)) AS vk
  FROM tt),
res AS (SELECT r, vk[6] AS p FROM it),
basep AS (SELECT p AS base_p FROM res WHERE r = -1),
eff AS (
  SELECT CAST(sum(CASE WHEN r >= 0 THEN base_p - p ELSE 0 END)
              AS BIGINT) AS sum_eff
  FROM res, basep)
SELECT r AS removed, p AS p_conv_nano, base_p AS base_nano,
  CASE WHEN r >= 0 THEN base_p - p END AS effect_nano,
  CASE WHEN r >= 0 AND sum_eff > 0
       THEN CAST(base_p - p AS DOUBLE) / CAST(sum_eff AS DOUBLE)
  END AS share
FROM res, basep, eff ORDER BY removed
"""


# q360: anti-entropy corpus checksums — per-shard XOR of md5 halves +
# counts; root row merged from the shard rows.
ORACLES["q360_corpus_checksums"] = """
WITH d AS (
  SELECT
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) % 16 AS shard,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                         1, 15)) AS BIGINT) AS hi,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                         16, 15)) AS BIGINT) AS lo
  FROM documents),
s AS (
  SELECT shard, count(*) AS n_docs,
    CAST(bit_xor(hi) AS BIGINT) AS xor_hi,
    CAST(bit_xor(lo) AS BIGINT) AS xor_lo
  FROM d GROUP BY shard),
r AS (
  SELECT CAST(-1 AS BIGINT) AS shard,
    CAST(sum(n_docs) AS BIGINT) AS n_docs,
    CAST(bit_xor(xor_hi) AS BIGINT) AS xor_hi,
    CAST(bit_xor(xor_lo) AS BIGINT) AS xor_lo
  FROM s)
SELECT * FROM s UNION ALL SELECT * FROM r ORDER BY shard
"""



# q361: truncation plan — 5-token turns, latest-suffix fit with the
# pinned first turn; list_min over the integer-feasible suffix starts.
ORACLES["q361_truncation_plan"] = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c AS (
  SELECT doc_id,
    list_transform(
      range(0, CAST(floor((len(toks) - 1) / 5) AS BIGINT) + 1),
      i -> array_to_string(toks[(i * 5 + 1):(i * 5 + 5)], ' '))
      AS turns
  FROM d WHERE len(toks) >= 1),
tk AS (
  SELECT doc_id,
    list_transform(turns, t ->
      CAST(len(list_filter(string_split_regex(lower(trim(t)), '\\s+'),
                           x -> x != '')) AS BIGINT)) AS tk
  FROM c),
plan AS (
  SELECT doc_id,
    len(tk) AS n_turns,
    CAST(coalesce(list_sum(tk), 0) AS BIGINT) AS total_tokens,
    list_min(list_filter(range(1, len(tk) + 1),
      j -> tk[1] + coalesce(list_sum(tk[(j + 1):len(tk)]), 0) <= 12))
      AS kept_from,
    tk
  FROM tk)
SELECT doc_id, n_turns, total_tokens,
  CASE WHEN kept_from IS NOT NULL AND kept_from < n_turns
       THEN kept_from END AS kept_from,
  CASE WHEN kept_from IS NOT NULL THEN (n_turns - kept_from) + 1
       ELSE 0 END AS n_kept,
  CASE WHEN kept_from IS NOT NULL THEN
    CAST(tk[1] + coalesce(list_sum(tk[(kept_from + 1):n_turns]), 0)
         AS BIGINT)
  ELSE 0 END AS kept_tokens
FROM plan ORDER BY doc_id
"""


# q362: dedup yield curve — the q26 exact pair CTE once, then the
# integer cross-multiplied threshold grid; per-threshold doc counts
# via DISTINCT (t, doc).
ORACLES["q362_dedup_yield_curve"] = f"""
WITH d AS (SELECT doc_id, {_NORMTOKS} AS toks FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS grams FROM d),
sized AS (SELECT doc_id, grams, len(grams) AS n_sh FROM sh),
exploded AS (SELECT doc_id, n_sh, unnest(grams) AS g FROM sized),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
grid AS (SELECT unnest([10, 12, 14, 16, 18, 19]) AS t_num),
fired AS (
  SELECT g.t_num, p.id_a, p.id_b
  FROM pairs p CROSS JOIN grid g
  WHERE 20 * p.n_common >= g.t_num * (p.n_a + p.n_b - p.n_common)),
np AS (
  SELECT t_num, CAST(count(*) AS BIGINT) AS n_pairs_ge
  FROM fired GROUP BY 1),
nd AS (
  SELECT t_num, CAST(count(*) AS BIGINT) AS n_docs_ge FROM (
    SELECT DISTINCT t_num, id FROM (
      SELECT t_num, unnest([id_a, id_b]) AS id FROM fired))
  GROUP BY 1)
SELECT g.t_num, CAST(g.t_num AS DOUBLE) / 20.0 AS threshold,
  coalesce(np.n_pairs_ge, 0) AS n_pairs_ge,
  coalesce(nd.n_docs_ge, 0) AS n_docs_ge
FROM grid g
LEFT JOIN np USING (t_num)
LEFT JOIN nd USING (t_num)
ORDER BY g.t_num
"""


# q363: curation v4 capstone — the q345 C4 gate + q346 Gopher gate +
# q26 exact-Jaccard near-dup removal on the survivors + q360 XOR
# fingerprints of each source's final slice, one funnel report.
ORACLES["q363_curation_v4"] = f"""
WITH d AS (SELECT doc_id, source, text FROM documents),
t1 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c4s AS (
  SELECT doc_id,
    CASE WHEN len(toks) > 0 THEN
      list_transform(
        range(0, CAST(floor((len(toks) - 1) / 10) AS BIGINT) + 1),
        i -> toks[(i * 10 + 1):(i * 10 + 10)])
    ELSE CAST([] AS VARCHAR[][]) END AS sents
  FROM t1),
c4k AS (
  SELECT doc_id,
    list_filter(sents, s -> len(s) >= 5
      AND len(list_filter(s, t -> list_contains({_C4_STOP}, t))) > 0
      AND len(list_filter(s, t -> list_contains({_C4_BAD}, t))) = 0)
      AS ks
  FROM c4s),
c4 AS (
  SELECT doc_id,
    (len(ks) >= 3 AND len(flatten(ks)) >= 50
     AND len(flatten(ks)) <= 50000) AS c4_kept
  FROM c4k),
gst AS (
  SELECT doc_id, len(toks) AS n_tok,
    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
      AS char_sum,
    CAST(len(list_filter(toks, t -> list_contains({_C4_STOP}, t)))
         AS BIGINT) AS stop_count,
    CAST(len(list_filter(toks, t -> regexp_matches(t, '^[a-z]+$')))
         AS BIGINT) AS alpha_count
  FROM t1),
gg AS (SELECT doc_id, unnest(toks) AS tok FROM t1),
gc AS (SELECT doc_id, tok, count(*) AS c FROM gg GROUP BY 1, 2),
gt AS (SELECT doc_id, max(c) AS top_count FROM gc GROUP BY 1),
go AS (
  SELECT s.doc_id,
    ((s.n_tok >= 50 AND s.n_tok <= 100000)
     AND CASE WHEN s.n_tok > 0 THEN
           (CAST(s.char_sum AS DOUBLE) / CAST(s.n_tok AS DOUBLE) >= 3.0
            AND CAST(s.char_sum AS DOUBLE) / CAST(s.n_tok AS DOUBLE)
                <= 10.0)
         ELSE false END
     AND (s.stop_count >= 2)
     AND CASE WHEN s.n_tok > 0 THEN
           (CAST(s.alpha_count AS DOUBLE) / CAST(s.n_tok AS DOUBLE)
            >= 0.8)
         ELSE false END
     AND CASE WHEN s.n_tok > 0 THEN
           (CAST(coalesce(t.top_count, 0) AS DOUBLE)
            / CAST(s.n_tok AS DOUBLE) <= 0.12)
         ELSE false END) AS go_kept
  FROM gst s LEFT JOIN gt t USING (doc_id)),
base AS (
  SELECT d.doc_id, d.source, d.text, c4.c4_kept, go.go_kept
  FROM d JOIN c4 USING (doc_id) JOIN go USING (doc_id)),
surv AS (SELECT doc_id, text FROM base WHERE c4_kept AND go_kept),
sv AS (SELECT doc_id, {_NORMTOKS} AS toks FROM surv),
sh AS (SELECT doc_id, {_SHINGLES} AS grams FROM sv),
sized AS (SELECT doc_id, grams, len(grams) AS n_sh FROM sh),
exploded AS (SELECT doc_id, n_sh, unnest(grams) AS g FROM sized),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_common
  FROM exploded a JOIN exploded b
    ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
dupb AS (
  SELECT DISTINCT id_b AS doc_id FROM pairs
  WHERE n_common / (n_a + n_b - n_common) >= 0.6),
fl AS (
  SELECT b.source,
    CASE WHEN NOT b.c4_kept THEN 1 ELSE 0 END AS c4_drop,
    CASE WHEN b.c4_kept AND NOT b.go_kept THEN 1 ELSE 0 END AS go_drop,
    CASE WHEN b.c4_kept AND b.go_kept AND dp.doc_id IS NOT NULL
         THEN 1 ELSE 0 END AS dup_drop,
    (b.c4_kept AND b.go_kept AND dp.doc_id IS NULL) AS final_keep,
    CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR) || ':'
                             || b.text), 1, 15)) AS BIGINT) AS hi,
    CAST(('0x' || substr(md5(CAST(b.doc_id AS VARCHAR) || ':'
                             || b.text), 16, 15)) AS BIGINT) AS lo
  FROM base b LEFT JOIN dupb dp USING (doc_id))
SELECT source, count(*) AS n_docs,
  CAST(sum(c4_drop) AS BIGINT) AS n_c4_dropped,
  CAST(sum(go_drop) AS BIGINT) AS n_gopher_dropped,
  CAST(sum(dup_drop) AS BIGINT) AS n_dup_dropped,
  CAST(sum(CASE WHEN final_keep THEN 1 ELSE 0 END) AS BIGINT)
    AS n_final,
  CAST(coalesce(bit_xor(CASE WHEN final_keep THEN hi END), 0)
       AS BIGINT) AS xor_hi,
  CAST(coalesce(bit_xor(CASE WHEN final_keep THEN lo END), 0)
       AS BIGINT) AS xor_lo
FROM fl GROUP BY source ORDER BY source
"""


# q364: full IVF-PQ — q40's coarse-quantizer CTEs bound the candidate
# lists, q240's PQ CTEs encode the corpus, and the ADC join is
# constrained to the probed lists.
ORACLES["q364_ivf_pq_topk"] = """
WITH e AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
      AS vi
  FROM embeddings),
cent0 AS (
  SELECT label, pos,
    round(CAST(sum(CAST(v[pos + 1] AS DECIMAL(20,9))) AS DOUBLE)
          / count(*), 6) AS cv
  FROM e, (SELECT unnest(range(64)) AS pos) p
  GROUP BY label, pos),
cent AS (
  SELECT label AS cluster_id, list(cv ORDER BY pos) AS centroid
  FROM cent0 GROUP BY label),
assign_c AS (
  SELECT vec_id AS neighbor_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.centroid)
          / (sqrt(list_dot_product(e.v, e.v))
             * sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
        c.cluster_id ASC) AS rn
    FROM e, cent c)
  WHERE rn <= 1),
assign_p AS (
  SELECT vec_id AS probe_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.centroid)
          / (sqrt(list_dot_product(e.v, e.v))
             * sqrt(list_dot_product(c.centroid, c.centroid))) DESC,
        c.cluster_id ASC) AS rn
    FROM e, cent c WHERE e.vec_id < 10)
  WHERE rn <= 3),
pcent AS (
  SELECT label AS code, p.pos AS pos,
    CAST(floor(CAST(sum(e.vi[p.pos + 1]) AS DOUBLE) / count(*) + 0.5)
         AS BIGINT) AS cv
  FROM e, (SELECT unnest(range(64)) AS pos) p
  GROUP BY 1, 2),
dist AS (
  SELECT e.vec_id, CAST(floor(c.pos / 8) AS INTEGER) AS s, c.code,
    sum((e.vi[c.pos + 1] - c.cv) * (e.vi[c.pos + 1] - c.cv)) AS d2
  FROM e, pcent c
  GROUP BY 1, 2, 3),
best AS (
  SELECT vec_id, s, code,
    row_number() OVER (PARTITION BY vec_id, s
                       ORDER BY d2 ASC, code ASC) AS rn
  FROM dist),
codes AS (SELECT vec_id, s, code FROM best WHERE rn = 1),
adc AS (
  SELECT p.vec_id AS probe_id, ac.neighbor_id,
    CAST(sum((p.vi[c.pos + 1] - c.cv) * (p.vi[c.pos + 1] - c.cv))
         AS BIGINT) AS adc_dist
  FROM (SELECT * FROM e WHERE vec_id < 10) p
  JOIN assign_p ap ON ap.probe_id = p.vec_id
  JOIN assign_c ac ON ac.cluster_id = ap.cluster_id
                  AND ac.neighbor_id != p.vec_id
  JOIN codes cd ON cd.vec_id = ac.neighbor_id
  JOIN pcent c ON c.code = cd.code
              AND CAST(floor(c.pos / 8) AS INTEGER) = cd.s
  GROUP BY 1, 2)
SELECT probe_id, neighbor_id, adc_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
      ORDER BY adc_dist ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM adc)
WHERE rank <= 5 ORDER BY probe_id, rank
"""


# q365: the SHIPPED production artifact — full published-domain catalog
# over the whole grid (native tract/borough/city + aggregated
# CT20/NTA/CDTA), create_acs.sql column order; the Spark side also
# roundtrips the frame through the CSV sink before comparing.
from synth_catalog import production_oracle_sql as _prod_sql  # noqa: E402

ORACLES["q365_acs_production_run"] = _prod_sql(2019)


# q366: the full catalog at the block-group ZONE geotypes — oracle
# generated from the same catalog JSON: block-group melt/fold,
# flag-gated zone dimension folds with a (zone × variable) spine, then
# the shared median/special/p-z/cleaning/labs tail.
ORACLES["q366_acs_catalog_batch_zones"] = _nta_sql(
    2019, ("cdta_fp_100", "cdta_fp_500", "cdta_park_access")
)


# q367: incremental vintage maintenance — the oracle is the FULL
# recompute over the MUTATED value spec (three shifted census
# columns); matching it proves the engine's dependency-closure slice
# recompute + stored-artifact splice equals a from-scratch run.
from synth_catalog import incremental_mutation_cvs as _mut_cvs  # noqa: E402

ORACLES["q367_acs_incremental_vintage"] = _fc_sql(
    "acs", 2019, ["tract", "borough", "city"], mutate_cvs=_mut_cvs()
)


# q368: PII redaction — planted deterministic spans; counts are
# independent per-pattern scans of the raw text, redaction applies in
# precedence order (email → ssn → phone → ipv4).
_PII_EM = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_SSN = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
_PII_PH = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

ORACLES["q368_pii_redaction"] = f"""
WITH planted AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@mail.example.com'
      || CASE WHEN doc_id % 3 = 0
              THEN ' call 212-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END
      || CASE WHEN doc_id % 7 = 0
              THEN ' host 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
              ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    text, '{_PII_EM}', '[EMAIL]', 'g'),
    '{_PII_SSN}', '[SSN]', 'g'),
    '{_PII_PH}', '[PHONE]', 'g'),
    '{_PII_IP}', '[IP]', 'g') AS clean_text,
  CAST(len(regexp_extract_all(text, '{_PII_EM}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '{_PII_SSN}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(text, '{_PII_PH}')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{_PII_EM}'))
     + len(regexp_extract_all(text, '{_PII_SSN}'))
     + len(regexp_extract_all(text, '{_PII_PH}'))
     + len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_pii
FROM planted ORDER BY doc_id
"""


from db_factfinder_spark.functions.portable_math import (  # noqa: E402
    portable_ln_sql as _pln,
)

# q369: DSIR importance weights — hashed char-trigram log-ratio vs the
# doc_id%17 target slice; per-bucket log-ratios via portable_ln,
# quantized to integer units before the per-doc weighted sum.
ORACLES["q369_dsir_importance_weights"] = f"""
WITH norm AS (
  SELECT doc_id, {_NORM} AS t FROM documents),
grams AS (
  SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS gram
  FROM norm, UNNEST(range(1, greatest(length(t) - 2, 0) + 1)) AS u(i)
  WHERE length(t) >= 3),
bucketed AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(gram), 1, 7))::BIGINT % 256 AS BIGINT)
      AS bucket
  FROM grams),
tgt AS (SELECT bucket, count(*) AS c_t FROM bucketed
        WHERE doc_id % 17 = 0 GROUP BY 1),
src AS (SELECT bucket, count(*) AS c_s FROM bucketed GROUP BY 1),
binputs AS (
  SELECT b.bucket,
    CAST(coalesce(t.c_t, 0) + 1 AS BIGINT) AS ct1,
    CAST(coalesce(s.c_s, 0) + 1 AS BIGINT) AS cs1,
    CAST((SELECT sum(c_t) FROM tgt) + 256 AS BIGINT) AS ttotb,
    CAST((SELECT sum(c_s) FROM src) + 256 AS BIGINT) AS stotb
  FROM (SELECT unnest(range(256)) AS bucket) b
  LEFT JOIN src s USING (bucket) LEFT JOIN tgt t USING (bucket)),
lr AS (
  SELECT bucket,
    CAST(floor((
      {_pln('ct1')} - {_pln('ttotb')} - {_pln('cs1')} + {_pln('stotb')}
    ) * 1000000.0 + 0.5) AS BIGINT) AS lr_units
  FROM binputs),
perdoc AS (
  SELECT doc_id, bucket, count(*) AS c FROM bucketed GROUP BY 1, 2)
SELECT doc_id,
  CAST(sum(c) AS BIGINT) AS n_grams,
  CAST(sum(c * lr_units) AS BIGINT) AS weight_units
FROM perdoc JOIN lr USING (bucket)
GROUP BY 1 ORDER BY doc_id
"""


# q370: BPE merge table — 8 rounds unrolled; each round counts
# freq-weighted adjacent pairs, picks argmax (cnt desc, lexicographic),
# and applies the merge with a recursive leftmost-splice.
def _bpe_oracle(k: int = 8, encode: bool = False) -> str:
    zip_pairs = (
        "list_zip(syms[1:greatest(len(syms)-1, 0)], syms[2:], true)"
    )
    ctes = [f"""
w0 AS MATERIALIZED (
  SELECT word,
         list_transform(range(1, length(word) + 1),
                        i -> word[CAST(i AS INTEGER)]) AS syms,
         CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split({_NORM}, ' ')) AS word
        FROM documents)
  WHERE word != '' GROUP BY word)"""]
    for r in range(1, k + 1):
        p = r - 1
        ctes.append(f"""
b{r} AS MATERIALIZED (
  SELECT p[1] AS l, p[2] AS r,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT unnest({zip_pairs}) AS p, freq
        FROM w{p} WHERE len(syms) >= 2)
  GROUP BY 1, 2
  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
a{r} AS (
  SELECT word, syms, freq FROM w{p}
  UNION ALL
  SELECT word,
         syms[1:pos-1] || [(SELECT l || r FROM b{r})] || syms[pos+2:],
         freq
  FROM (SELECT word, syms, freq,
          coalesce(list_position({zip_pairs},
            (SELECT (l, r) FROM b{r})), 0) AS pos
        FROM a{r})
  WHERE pos > 0),
w{r} AS MATERIALIZED (
  SELECT word, syms, freq FROM a{r}
  WHERE coalesce(list_position({zip_pairs},
          (SELECT (l, r) FROM b{r})), 0) = 0)""")
    if encode:
        final = f"""
, docw AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
        FROM documents)
  WHERE word != '' GROUP BY 1, 2)
SELECT doc_id,
  CAST(sum(c) AS BIGINT) AS n_words,
  CAST(sum(c * len(syms)) AS BIGINT) AS n_tokens
FROM docw JOIN w{k} USING (word)
GROUP BY 1 ORDER BY doc_id"""
        return "WITH RECURSIVE " + ",".join(ctes) + final
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS step, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH RECURSIVE " + ",".join(ctes) + "\n" + unions
        + "\nORDER BY step"
    )


ORACLES["q370_bpe_merge_table"] = _bpe_oracle(8)


# q371: tokenizer inference — the q370 merge chain replayed, then
# per-doc word counts joined to the segmented vocab.
ORACLES["q371_bpe_encode"] = _bpe_oracle(8, encode=True)


# q372: corpus snapshot diff by normalized-content fingerprint.
ORACLES["q372_corpus_diff"] = f"""
WITH oldc AS (
  SELECT doc_id, md5({_NORM}) AS old_fp FROM documents),
newc AS (
  SELECT doc_id,
    md5(trim(regexp_replace(regexp_replace(lower(
      CASE WHEN doc_id % 7 = 0 THEN text || ' v2 extra' ELSE text END),
      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS new_fp
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 1000000,
    md5(trim(regexp_replace(regexp_replace(lower('fresh ' || text),
      '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')))
  FROM documents WHERE doc_id % 9 = 0)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
  CASE WHEN o.doc_id IS NULL THEN 'added'
       WHEN n.doc_id IS NULL THEN 'removed'
       WHEN o.old_fp IS NOT DISTINCT FROM n.new_fp THEN 'unchanged'
       ELSE 'changed' END AS status,
  o.old_fp, n.new_fp
FROM oldc o FULL OUTER JOIN newc n USING (doc_id)
ORDER BY doc_id
"""


# q373: tokenize→pack capstone — per-source packing report over the
# q371 encode chain: per-stream cumsum at seq_len=512, docs spanning a
# chunk boundary, ceil-chunk counts; all integer-exact.
def _token_pipeline_oracle(k: int = 8, seq_len: int = 512) -> str:
    enc = _bpe_oracle(k, encode=True)
    assert enc.rstrip().endswith("ORDER BY doc_id")
    enc_body = enc.rstrip()[: -len("ORDER BY doc_id")]
    return f"""
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(ceil(CAST(sum(n_tokens) AS DOUBLE) / {seq_len}) AS BIGINT)
    AS n_chunks,
  CAST(sum(CASE WHEN (cb % {seq_len} + n_tokens - 1) // {seq_len} > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
FROM (
  SELECT e.doc_id, s.source, e.n_tokens,
    coalesce(sum(e.n_tokens) OVER (
      PARTITION BY s.source ORDER BY e.doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM ({enc_body}) e
  JOIN (SELECT doc_id, source FROM documents) s USING (doc_id))
GROUP BY source ORDER BY source
"""


ORACLES["q373_token_pipeline_capstone"] = _token_pipeline_oracle()


# q374: the streaming twin of q367 — the published table after the
# availableNow maintenance run must equal the FULL mutated recompute.
ORACLES["q374_acs_vintage_stream"] = ORACLES["q367_acs_incremental_vintage"]


# q375: MMR diversified rerank — 5 unrolled greedy rounds; integer
# rel − max_sim scores (quantized dots, floor-div to sim units).
def _mmr_oracle(k: int = 5) -> str:
    dotsim = (
        "CAST(floor(list_dot_product(c.v, s.v) / 1000000.0) AS BIGINT)"
    )
    ctes = ["""
cand AS MATERIALIZED (
  SELECT q.query_id AS q, e.vec_id AS d,
    CAST((e.vec_id * 7919 + q.query_id * 104729) % 1000 * 100000
         AS BIGINT) AS rel,
    list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                             AS BIGINT)) AS v
  FROM embeddings e
  JOIN (SELECT unnest(range(5)) AS query_id) q
    ON e.vec_id % 40 = q.query_id),
sel1 AS MATERIALIZED (
  SELECT q, d, v, 1 AS rank, rel AS mmr_units FROM (
    SELECT *, row_number() OVER (PARTITION BY q
      ORDER BY rel DESC, d ASC) AS rn FROM cand)
  WHERE rn = 1),
all1 AS (SELECT * FROM sel1)"""]
    for r in range(2, k + 1):
        p = r - 1
        ctes.append(f"""
scored{r} AS MATERIALIZED (
  SELECT c.q, c.d,
    c.rel - max({dotsim}) AS score
  FROM cand c JOIN all{p} s ON c.q = s.q
  WHERE NOT EXISTS (SELECT 1 FROM all{p} a
                    WHERE a.q = c.q AND a.d = c.d)
  GROUP BY c.q, c.d, c.rel),
sel{r} AS MATERIALIZED (
  SELECT s.q, s.d, c.v, {r} AS rank,
    CAST(s.score AS BIGINT) AS mmr_units
  FROM (SELECT *, row_number() OVER (PARTITION BY q
          ORDER BY score DESC, d ASC) AS rn FROM scored{r}) s
  JOIN cand c ON c.q = s.q AND c.d = s.d
  WHERE s.rn = 1),
all{r} AS (SELECT * FROM all{p} UNION ALL SELECT * FROM sel{r})""")
    return (
        "WITH " + ",".join(ctes)
        + f"""
SELECT q AS query_id, d AS doc_id, rank, mmr_units
FROM all{k} ORDER BY query_id, rank"""
    )


ORACLES["q375_mmr_rerank"] = _mmr_oracle(5)


# q376: within-document line dedup — first occurrence per normalized
# line key, empty layout lines preserved, reassembled in order.
ORACLES["q376_within_doc_line_dedup"] = """
WITH pages AS (
  SELECT doc_id,
    'PAGE BANNER' || chr(10) || substr(text, 1, 40) || chr(10) || ''
      || chr(10) || 'page banner' || chr(10) || text || chr(10) || ''
      || chr(10) || substr(text, 1, 40) AS page
  FROM documents),
lines AS (
  SELECT doc_id,
    string_split(page, chr(10))[CAST(i AS INTEGER)] AS line,
    CAST(i AS BIGINT) AS idx
  FROM pages,
       UNNEST(range(1, len(string_split(page, chr(10))) + 1)) AS u(i)),
keyed AS (
  SELECT doc_id, line, idx,
    md5(lower(trim(line))) AS k,
    trim(line) = '' AS is_blank
  FROM lines),
kept AS (
  SELECT doc_id, line, idx,
    (is_blank OR
     row_number() OVER (PARTITION BY doc_id, k ORDER BY idx) = 1)
      AS keep
  FROM keyed)
SELECT doc_id,
  string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY idx)
    AS clean_text,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


# q377/q378: vintage generality — the 2018 catalog (different column
# map / medians / specials) and the 2020 quirk vintage (EMPTY median
# and special sidecars) through the same generated oracle.
ORACLES["q377_acs2018_catalog_batch"] = _fc_sql(
    "acs", 2018, ["borough", "city"]
)
ORACLES["q378_acs2020_catalog_batch"] = _fc_sql(
    "acs", 2020, ["borough", "city"]
)


# q380: decennial through the set-based batch — the full 25-variable
# 2010 decennial catalog over native tract/borough/city (2010 labs
# labels) plus every aggregated geotype the 2010 registry registers
# for decennial (NTA / cd direct tract rollups, block-grain cd zones).
from synth_catalog import (  # noqa: E402
    decennial_2010_full_oracle_sql as _dec10_sql,
)

ORACLES["q380_decennial2010_full_grid"] = _dec10_sql()

# q381: the 2010 ACS vintage (full sidecars, oldest column map,
# year-gated poverty rule) through the same generated oracle.
ORACLES["q381_acs2010_catalog_batch"] = _fc_sql(
    "acs", 2010, ["borough", "city"]
)


# q382: the 2021 vintage's real production role — its metadata carries
# NO census columns (manual-update-only in the reference), so the
# oracle replays the 2021 manual-update run: four 1721-suffix sheets
# melted, null-geotype rows dropped, semi-joined against the PACKAGED
# 2021 catalog's full 1,015-name list.
def _manual_2021_sql() -> str:
    from synth_catalog import load_meta as _lm

    known = ",\n  ".join(
        "('" + m["pff_variable"].replace("'", "''") + "')"
        for m in _lm("acs", 2021)
    )
    var_rows = []
    for domain, src, vars_ in (
        ("demographic", "nation", ["pop_1", "mdage"]),
        ("social", "nation", ["hsp1", "lep1"]),
        ("economic", "region", ["ea_bchdh", "mysteryvar"]),
        ("housing", "nation", ["mdhhinc"]),
    ):
        key = "n_nationkey" if src == "nation" else "r_regionkey"
        for j, v in enumerate(vars_):
            var_rows.append(f"""
  SELECT '{domain}' AS domain, '{v}' AS pff_variable,
    CASE WHEN {key} % 7 = 0 THEN NULL ELSE 'NTA2020' END
      AS labs_geotype,
    'N' || CAST({key} AS VARCHAR) AS labs_geoid,
    CAST({key} * {10 + j} AS DOUBLE) AS e,
    CAST({key} + {j + 1} AS DOUBLE) AS m
  FROM {src}""")
    return f"""
WITH known(pff_variable) AS (VALUES
  {known}),
melted AS ({" UNION ALL ".join(var_rows)})
SELECT CAST(NULL AS VARCHAR) AS census_geoid,
  labs_geoid,
  CAST(NULL AS VARCHAR) AS geotype,
  labs_geotype,
  m.pff_variable,
  CAST(NULL AS DOUBLE) AS c, e, m.m,
  CAST(NULL AS DOUBLE) AS p, CAST(NULL AS DOUBLE) AS z,
  domain
FROM melted m JOIN known k USING (pff_variable)
WHERE labs_geotype IS NOT NULL
ORDER BY domain, m.pff_variable, labs_geoid
"""


ORACLES["q382_acs2021_manual_update"] = _manual_2021_sql()


# q383: cross-vintage change table — the 2019 and 2018 full-catalog
# oracles inner-joined on the published grain; delta_e = e19 - e18,
# delta_m = sqrt(m19² + m18²) (IEEE-exact quadrature, no rounding).
def _change_table_sql() -> str:
    new = _fc_sql("acs", 2019, ["borough", "city"])
    old = _fc_sql("acs", 2018, ["borough", "city"])
    tail = "ORDER BY geotype, pff_variable, census_geoid"
    assert new.rstrip().endswith(tail) and old.rstrip().endswith(tail)
    strip = lambda q: q.rstrip()[: -len(tail)]  # noqa: E731
    return f"""
SELECT n.census_geoid, n.geotype, n.pff_variable,
  n.labs_geoid, n.labs_geotype,
  n.e AS e_new, o.e AS e_old,
  (n.e - o.e) + 0.0 AS delta_e,
  n.m AS m_new, o.m AS m_old,
  sqrt(n.m * n.m + o.m * o.m) AS delta_m
FROM ({strip(new)}) n
JOIN ({strip(old)}) o
  ON n.census_geoid = o.census_geoid AND n.geotype = o.geotype
  AND n.pff_variable = o.pff_variable
ORDER BY n.geotype, n.pff_variable, n.census_geoid
"""


ORACLES["q383_cross_vintage_change_table"] = _change_table_sql()


# q384: the ACS catalog through the 2010-geography aggregated chain —
# direct tract->NTA/cd rollups (no crosswalk hop) with the full
# median/special assembly and 2010 labs formatting.
from synth_catalog import acs_2010geo_oracle_sql as _acs10_sql  # noqa: E402

ORACLES["q384_acs_2010geo_catalog_batch"] = _acs10_sql(2019, ("NTA", "cd"))


# q385: two-round splice composability — the oracle is the full
# from-scratch recompute with BOTH vintage mutations applied; hash
# equality proves splice-of-splice == full.
from synth_catalog import (  # noqa: E402
    incremental_mutation_cvs as _mut1_cvs,
    second_mutation_cvs as _mut2_cvs,
)

ORACLES["q385_two_round_vintage_splice"] = _fc_sql(
    "acs",
    2019,
    ["tract", "borough", "city"],
    mutate_cvs=sorted([*_mut1_cvs("acs", 2019), *_mut2_cvs("acs", 2019)]),
)


# q386: cross-geography change table — the 2019 native-tract full
# catalog delta-joined against the 2018 catalog apportioned onto 2020
# tracts through the SPLIT crosswalk (ratio right-join + convert_moe
# power law, synth_catalog.SPLIT_RATIOS rules).  Inner join on the
# shared 11-char geoid space; split-target geoids drop (q387 is the
# outer/status variant).
def _cross_geo_change_sql() -> str:
    new = _fc_sql("acs", 2019, ["tract"])
    old = _nta_sql(2018, ("CT20",), crosswalk="split")
    tail = "ORDER BY geotype, pff_variable, census_geoid"
    assert new.rstrip().endswith(tail) and old.rstrip().endswith(tail)
    strip = lambda q: q.rstrip()[: -len(tail)]  # noqa: E731
    return f"""
SELECT n.census_geoid, n.pff_variable,
  n.geotype AS geotype_new, o.geotype AS geotype_old,
  n.labs_geoid,
  n.e AS e_new, o.e AS e_old,
  (n.e - o.e) + 0.0 AS delta_e,
  n.m AS m_new, o.m AS m_old,
  sqrt(n.m * n.m + o.m * o.m) AS delta_m
FROM ({strip(new)}) n
JOIN ({strip(old)}) o
  ON n.census_geoid = o.census_geoid
  AND n.pff_variable = o.pff_variable
ORDER BY n.pff_variable, n.census_geoid
"""


ORACLES["q386_cross_geography_change_table"] = _cross_geo_change_sql()


# q387: outer-mode change table with added/retired/changed/unchanged
# status — the 2018/2019 catalogs differ (970 vs 1,047 variables) so
# real one-sided rows exist; suppressed (NULL) estimates classify as
# unchanged via IS NOT DISTINCT FROM; delta columns NULL when either
# side is missing.
def _outer_change_sql() -> str:
    new = _fc_sql("acs", 2019, ["borough", "city"])
    old = _fc_sql("acs", 2018, ["borough", "city"])
    tail = "ORDER BY geotype, pff_variable, census_geoid"
    assert new.rstrip().endswith(tail) and old.rstrip().endswith(tail)
    strip = lambda q: q.rstrip()[: -len(tail)]  # noqa: E731
    return f"""
SELECT coalesce(n.census_geoid, o.census_geoid) AS census_geoid,
  coalesce(n.geotype, o.geotype) AS geotype,
  coalesce(n.pff_variable, o.pff_variable) AS pff_variable,
  coalesce(n.labs_geoid, o.labs_geoid) AS labs_geoid,
  coalesce(n.labs_geotype, o.labs_geotype) AS labs_geotype,
  CASE WHEN o.pff_variable IS NULL THEN 'added'
       WHEN n.pff_variable IS NULL THEN 'retired'
       WHEN n.e IS NOT DISTINCT FROM o.e THEN 'unchanged'
       ELSE 'changed' END AS status,
  n.e AS e_new, o.e AS e_old,
  CASE WHEN n.pff_variable IS NOT NULL AND o.pff_variable IS NOT NULL
       THEN (n.e - o.e) + 0.0 END AS delta_e,
  n.m AS m_new, o.m AS m_old,
  CASE WHEN n.pff_variable IS NOT NULL AND o.pff_variable IS NOT NULL
       THEN sqrt(n.m * n.m + o.m * o.m) END AS delta_m
FROM ({strip(new)}) n
FULL OUTER JOIN ({strip(old)}) o
  ON n.census_geoid = o.census_geoid AND n.geotype = o.geotype
  AND n.pff_variable = o.pff_variable
ORDER BY coalesce(n.geotype, o.geotype),
  coalesce(n.pff_variable, o.pff_variable),
  coalesce(n.census_geoid, o.census_geoid)
"""


ORACLES["q387_outer_change_table_status"] = _outer_change_sql()


# q388: geography-revision incremental maintenance — the oracle is the
# full from-scratch recompute with the REVISED crosswalk (tract gid 3
# moved BX03 -> BX09); hash equality proves the dimension-axis splice
# (native tract + CT20 passed through, only NTA recomputed) is
# value-identical to the full run.
def _georev_sql() -> str:
    nat = _fc_sql("acs", 2019, ["tract"])
    agg = _nta_sql(2019, ("CT20", "NTA"), nta_move=(3, "BX09"))
    tail = "ORDER BY geotype, pff_variable, census_geoid"
    assert nat.rstrip().endswith(tail) and agg.rstrip().endswith(tail)
    strip = lambda q: q.rstrip()[: -len(tail)]  # noqa: E731
    return (
        f"SELECT * FROM ({strip(nat)})\nUNION ALL\n"
        f"SELECT * FROM ({strip(agg)})\n{tail}"
    )


ORACLES["q388_geography_revision_splice"] = _georev_sql()


# q389: combined-axes maintenance — census-column correction (q367's
# trio) + NTA boundary fix in ONE update; oracle = the full recompute
# with BOTH mutations; hash equality proves the variable closure and
# the dimension closure compose without under-invalidation.
def _combined_maint_sql() -> str:
    mut = sorted(_mut1_cvs("acs", 2019))
    nat = _fc_sql("acs", 2019, ["tract"], mutate_cvs=mut)
    agg = _nta_sql(
        2019, ("CT20", "NTA"), nta_move=(3, "BX09"), mutate_cvs=mut
    )
    tail = "ORDER BY geotype, pff_variable, census_geoid"
    assert nat.rstrip().endswith(tail) and agg.rstrip().endswith(tail)
    strip = lambda q: q.rstrip()[: -len(tail)]  # noqa: E731
    return (
        f"SELECT * FROM ({strip(nat)})\nUNION ALL\n"
        f"SELECT * FROM ({strip(agg)})\n{tail}"
    )


ORACLES["q389_combined_maintenance_splice"] = _combined_maint_sql()


# q390: significance-tested change report — q383's delta frame plus
# pct_change and the ACS 90%-level test |delta_e| > delta_m (the
# handbook's 1.645-scaled quadrature simplifies exactly at matched
# confidence levels).
def _sig_change_sql() -> str:
    new = _fc_sql("acs", 2019, ["borough", "city"])
    old = _fc_sql("acs", 2018, ["borough", "city"])
    tail = "ORDER BY geotype, pff_variable, census_geoid"
    assert new.rstrip().endswith(tail) and old.rstrip().endswith(tail)
    strip = lambda q: q.rstrip()[: -len(tail)]  # noqa: E731
    return f"""
SELECT *,
  CASE WHEN e_old != 0 THEN delta_e / e_old * 100 + 0.0 END
    AS pct_change,
  CASE WHEN delta_e IS NOT NULL AND delta_m IS NOT NULL
       THEN CAST(abs(delta_e) > delta_m AS DOUBLE) END AS significant
FROM (
  SELECT n.census_geoid, n.geotype, n.pff_variable,
    n.labs_geoid, n.labs_geotype,
    n.e AS e_new, o.e AS e_old,
    (n.e - o.e) + 0.0 AS delta_e,
    n.m AS m_new, o.m AS m_old,
    sqrt(n.m * n.m + o.m * o.m) AS delta_m
  FROM ({strip(new)}) n
  JOIN ({strip(old)}) o
    ON n.census_geoid = o.census_geoid AND n.geotype = o.geotype
    AND n.pff_variable = o.pff_variable)
ORDER BY geotype, pff_variable, census_geoid
"""


ORACLES["q390_significant_change_report"] = _sig_change_sql()
