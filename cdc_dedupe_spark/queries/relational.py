"""Group 2 — relational surface (SURVEY.md §2B) over the TPC-H-ish tables.

Every query is declarative DataFrame/SQL: Catalyst does predicate pushdown,
column pruning and join-strategy selection; explicit ``broadcast()`` hints
mark dimension sides that must never shuffle at scale. Scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import spread_scan, table
from ._determinism import davg, dsum, round_pos, sql_davg, sql_dsum
from .registry import register


@register(
    "scan_project_filter",
    group="relational",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1.0 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_quantity < 24.0 AND l_discount BETWEEN 0.02 AND 0.06
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with predicate + projection — both must reach the scan
    (PushedFilters / pruned ReadSchema in explain)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24.0) & F.col("l_discount").between(0.02, 0.06)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("disc_price"),
    )


@register(
    "agg_groupby",
    group="relational",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price')},
           {sql_davg('l_quantity', 'avg_qty')},
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Partial (map-side) aggregation means
    only |groups| rows shuffle — constant-size at any data scale."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), "sum_disc_price"),
        davg("l_quantity", "avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_distinct",
    group="relational",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — Spark expands to a two-phase aggregate; exact."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup",
    group="relational",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


@register(
    "agg_cube",
    group="relational",
    oracle="""
    SELECT event_type, CAST(year(ts) AS INTEGER) AS yr, COUNT(*) AS n_events
    FROM events
    GROUP BY CUBE (event_type, CAST(year(ts) AS INTEGER))
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.year("ts").alias("yr"))
        .cube("event_type", "yr")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "agg_grouping_sets",
    group="relational",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via Spark SQL."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gsets_v")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders_gsets_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


_AAD_RSD = 0.05  # declared rsd of the engine-native HLL++ sketch
_AAD_BOUND = 3 * _AAD_RSD  # audit bound: |est - exact| <= 3*rsd*exact

def _aad_oracle() -> str:
    from .sketch import _HLL_M, _HLL_NUM, _HLL_VBITS

    return f"""
    WITH li AS (SELECT l_returnflag, l_partkey FROM lineitem),
    h AS (
      SELECT l_returnflag,
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM li
    ), rho AS (
      SELECT l_returnflag, hv % {_HLL_M} AS reg,
             CASE WHEN (hv >> 8) = 0 THEN {_HLL_VBITS}
                  ELSE {_HLL_VBITS + 1} - length(bin(hv >> 8)) END AS r
      FROM h
    ), g AS (
      SELECT f.l_returnflag, gs.reg
      FROM (SELECT DISTINCT l_returnflag FROM li) f,
           (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS reg) gs
    ), regs AS (
      SELECT g.l_returnflag, g.reg, COALESCE(MAX(rho.r), 0) AS m
      FROM g LEFT JOIN rho
        ON rho.reg = g.reg AND rho.l_returnflag = g.l_returnflag
      GROUP BY g.l_returnflag, g.reg
    ), s AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_VBITS} - m)) AS BIGINT)
               AS s_scaled
      FROM regs GROUP BY l_returnflag
    ), ex AS (
      SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
               AS exact_parts
      FROM li GROUP BY l_returnflag
    )
    SELECT s.l_returnflag,
           (round({_HLL_NUM} / s.s_scaled, 1) + 0.0) AS hll_estimate,
           ex.exact_parts,
           CAST(1 AS BIGINT) AS engine_within_3rsd
    FROM s JOIN ex USING (l_returnflag)
    """


@register("agg_approx_distinct", group="relational", oracle=_aad_oracle())
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct parts per return flag, driver-checkable
    (VERDICT r12 next-step #3 — formerly rows-only). Three columns, all
    engine-deterministic:

    - ``hll_estimate`` — a REAL estimate from the repo's portable
      256-register md5-prefix HLL ([[agg_hll_registers]] machinery, here
      grouped per key), bit-reproducible in DuckDB, so the oracle checks
      the estimate itself exactly;
    - ``exact_parts`` — the exact distinct count (the audit column);
    - ``engine_within_3rsd`` — 1 iff Spark's native
      ``approx_count_distinct(rsd={rsd})`` (HLL++, the true 100 TB scale
      path — engine-internal hashing, NOT reproducible in DuckDB) lands
      within 3·rsd of exact. The oracle asserts the literal 1: if the
      engine sketch ever drifts outside its declared bound, the driver
      row goes red instead of the drift passing unchecked.

    At 100 TB you keep only the sketches: both HLLs fold map-side into
    <=256 (register,max-rho) pairs / one HLL++ buffer per task — the
    shuffle moves sketches, never values. exact_parts (the only exact-
    distinct shuffle here) exists BECAUSE this is the audit query; the
    production form drops it."""
    from .sketch import _HLL_M, _HLL_NUM, _HLL_VBITS, _hll_rho

    # spread_scan (r14, probe sightings #13-14, SKEW_LOCAL.json): the
    # md5-HLL audit kernel inherited the single-row-group lineitem scan's
    # one effective task. Round-robin (no key: the 3-value groupBy key
    # would collapse to 3 partitions); no-op on wide scans.
    li = spread_scan(
        table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    )
    base = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=_AAD_RSD).alias("est"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    hashed = li.select(
        "l_returnflag",
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string").cast("binary")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("hv"),
    ).select("l_returnflag", "hv", F.shiftright(F.col("hv"), 8).alias("v"))
    rho = hashed.select(
        "l_returnflag",
        (F.col("hv") % _HLL_M).alias("reg"),
        _hll_rho(F.col("v")).alias("r"),
    )
    spine = (
        li.select("l_returnflag")
        .distinct()
        .crossJoin(spark.range(_HLL_M).select(F.col("id").alias("reg")))
    )
    regs = (
        spine.join(
            rho.groupBy("l_returnflag", "reg").agg(F.max("r").alias("mx")),
            ["l_returnflag", "reg"],
            "left",
        )
        .select("l_returnflag", F.coalesce("mx", F.lit(0)).alias("m"))
    )
    s = regs.groupBy("l_returnflag").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_VBITS} - m AS INT))")
        ).alias("s_scaled")
    )
    return (
        base.join(s, "l_returnflag")
        .select(
            "l_returnflag",
            round_pos(F.lit(float(_HLL_NUM)) / F.col("s_scaled"), 1).alias(
                "hll_estimate"
            ),
            F.col("exact_parts").cast("long").alias("exact_parts"),
            (
                F.abs(F.col("est") - F.col("exact_parts")).cast("double")
                <= F.lit(_AAD_BOUND) * F.col("exact_parts").cast("double")
            )
            .cast("long")
            .alias("engine_within_3rsd"),
        )
    )


agg_approx_distinct.__doc__ = agg_approx_distinct.__doc__.format(rsd=_AAD_RSD)


@register(
    "join_inner",
    group="relational",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 'total_price')}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer equi-join. customer is the smaller side → Spark
    picks broadcast under AQE at this scale; at 100 TB both sides are large
    and it becomes a sort-merge join on the shuffled key — correct either
    way, Catalyst decides from stats."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


@register(
    "join_left",
    group="relational",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving left join: customers with no orders count 0."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    group="relational",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi — no row multiplication, no payload columns
    shuffled from the probe side."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    group="relational",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value (>400k) order — the filter on the right
    side keeps the result non-degenerate at every SF."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    c = table(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_broadcast",
    group="relational",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_quantity', 'sum_qty')}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the explicit hint pins the strategy — at any
    fact-side scale the dimension ships to executors and the 100 TB
    lineitem never shuffles for this join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "sum_qty"))
    )


@register(
    "join_range",
    group="relational",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_late_ship
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    GROUP BY o.o_orderpriority
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range predicate: the equi part drives the shuffle/hash join;
    the range predicate evaluates as a post-join filter (no nested-loop)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_ship"))
    )


@register(
    "join_multiway",
    group="relational",
    oracle=f"""
    SELECT r.r_name,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 'total_price')}
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way chain region→nation→customer→orders. The two tiny dims are
    broadcast; Catalyst reorders/collapses the chain."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
    )


@register(
    "window_rank",
    group="relational",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice, rnk, drnk
    FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
             dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
      FROM orders
    ) WHERE rnk <= 5
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank within o_orderpriority — ties produce identical rank
    values in both engines, so the rnk<=5 cut is deterministic."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "window_lag_lead",
    group="relational",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_ts_us,
           lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS next_ts_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event timestamps (as-of style ordering,
    tie-broken by event_id)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        F.lag(ts_us).over(w).alias("prev_ts_us"),
        F.lead(ts_us).over(w).alias("next_ts_us"),
    )


@register(
    "window_running_sum",
    group="relational",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer; exact DECIMAL accumulation inside the
    frame, final DOUBLE cast (order-independent hash parity)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_total"),
    )


@register(
    "sort_limit_topk",
    group="relational",
    oracle=f"""
    SELECT o_custkey, {sql_dsum('o_totalprice', 'total_spend')}
    FROM orders GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by total order value, ties broken by key. Spark
    executes orderBy().limit() as TakeOrderedAndProject — per-partition
    top-K then a tiny driver merge, no global sort at scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spend"))
        .orderBy(F.col("total_spend").desc(), "o_custkey")
        .limit(10)
    )


def _typed_users(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    """(user_id, day) pairs for one event type — fine-grained enough that
    the set differences stay non-empty at every SF."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == etype).select(
        "user_id", F.col("ts").cast("date").cast("string").alias("day")
    )


@register(
    "set_union_all",
    group="relational",
    oracle="""
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events WHERE event_type = 'purchase'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _typed_users(spark, sf_dir, "click").unionAll(_typed_users(spark, sf_dir, "purchase"))


@register(
    "set_intersect",
    group="relational",
    oracle="""
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events WHERE event_type = 'purchase'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _typed_users(spark, sf_dir, "click").intersect(_typed_users(spark, sf_dir, "purchase"))


@register(
    "set_except",
    group="relational",
    oracle="""
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events WHERE event_type = 'purchase'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _typed_users(spark, sf_dir, "click").subtract(_typed_users(spark, sf_dir, "purchase"))


@register(
    "join_skew_salted",
    group="relational",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_items,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted fact⋈dim join (operators/skew.py): hot l_partkey
    values spread over 16 shuffle partitions; the oracle is the PLAIN join
    — salting must never change the logical result. This is the manual
    fallback for skew AQE can't fix (streaming joins, pre-bucketed
    shuffles); see SCALING.md."""
    from ..operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"), p, on="p_partkey", salt=16
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", "sum_qty")
    )


@register(
    "sort_shipping_priority",
    group="relational",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cbp,
           epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000 AS order_epoch_day,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, order_epoch_day, o.o_orderpriority
    ORDER BY revenue_cbp DESC, order_epoch_day, l.l_orderkey
    LIMIT 10
    """,
)
def sort_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) re-expressed on the synthetic star
    schema: the top-10 highest-revenue orders from BUILDING-segment
    customers that were placed before the cutoff but have line items
    still shipping after it — the classic three-table
    filter→join→agg→top-k whose PLAN is the point: both date predicates
    and the segment filter push into the parquet scans (PushedFilters),
    the customer side broadcasts after its filter, and the top-10 is
    TakeOrderedAndProject — no global sort. Revenue is exact
    cent·basis-point integers (Σ cents·(100−disc_bp)), so the hash needs
    no float discipline at all; ties break by (order date, key).

    At 100 TB: the lineitem scan is the only big input and it arrives
    pre-pruned by the shipdate predicate; the orders⋈lineitem join is
    the one real shuffle."""
    cutoff = "1998-06-01"
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = F.sum(
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (100 - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").alias(
                "order_epoch_day"
            ),
            "o_orderpriority",
        )
        .agg(rev.alias("revenue_cbp"))
        .select("l_orderkey", "revenue_cbp", "order_epoch_day", "o_orderpriority")
        .orderBy(F.col("revenue_cbp").desc(), "order_epoch_day", "l_orderkey")
        .limit(10)
    )
