"""Group 2 extensions — relational operators a reference user would reach
for next (beyond the declared SURVEY.md §2B inventory): full outer join,
exact percentiles, filtered aggregation, ordered string aggregation,
distribution window functions, pivot. Same determinism discipline as
queries/relational.py; all exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import padded_order_key
from ..tables import spread_scan, table
from ._determinism import dsum, round_pos, sql_dsum
from .registry import register


@register(
    "join_full_outer",
    group="relational-ext",
    oracle="""
    WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0),
         o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
               WHERE o_custkey % 5 = 0 GROUP BY o_custkey)
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_mktsegment AS mktsegment,
           o.n_orders AS n_orders
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving both sides: disjoint modular filters guarantee rows
    that exist on only one side. At scale a full outer join is the one
    join shape that can never broadcast (both sides must co-shuffle) —
    declared here to pin that plan too."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_mktsegment")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 5 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("n_orders"),
    )


@register(
    "agg_percentile",
    group="relational-ext",
    oracle="""
    SELECT l_returnflag,
           (round(quantile_cont(l_quantity, 0.25), 4) + 0.0) AS p25,
           (round(quantile_cont(l_quantity, 0.50), 4) + 0.0) AS p50,
           (round(quantile_cont(l_quantity, 0.75), 4) + 0.0) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same linear
    interpolation). The exact form buffers each group's values in one
    aggregation buffer; the declared 100 TB paths are approx_percentile
    (Greenwald-Khanna sketch, one pass, mergeable, declared tolerance)
    and — when the answer must stay EXACT — the grouped two-pass
    selection `_grouped_percentiles_2pass` below (bucket histogram +
    matched-bucket re-scan, O(buckets) state; agg_approx_percentile's
    audit columns run it, [[agg_quantile_2pass]] is the global form)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_pos(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        round_pos(F.expr("percentile(l_quantity, 0.50)"), 4).alias("p50"),
        round_pos(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
    )


@register(
    "agg_filtered",
    group="relational-ext",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 'finished_value')}
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation — one scan computes every branch
    (no per-predicate re-reads): the FILTER clause lowers to the same
    conditional partial aggregate as sum(CASE WHEN ...)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        dsum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(F.lit(0.0)),
            "finished_value",
        ),
    )


@register(
    "fn_string_agg",
    group="relational-ext",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           COUNT(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def fn_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered across
    partitions, so determinism comes from array_sort before the join —
    the portable ORDER BY equivalent."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "window_percent_rank",
    group="relational-ext",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           (round(percent_rank() OVER w, 6) + 0.0) AS pct_rank,
           (round(cume_dist() OVER w, 6) + 0.0) AS cum_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions; the (o_totalprice, o_orderkey) order
    key is unique, so ranks are tie-free and both engines agree bitwise
    (one double division each)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        round_pos(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_pos(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "pivot_counts",
    group="relational-ext",
    oracle="""
    SELECT year(CAST(ts AS TIMESTAMP)) AS yr,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY yr
    """,
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit category list — never the inferred-values
    form, which needs an extra distinct pass over 100 TB and makes the
    output schema data-dependent."""
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.year(F.col("ts").cast("timestamp")).alias("yr"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot leaves absent combinations null; the oracle's FILTER yields 0
    return out.select(
        "yr", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@register(
    "unpivot_measures",
    group="relational-ext",
    oracle="""
    WITH m AS (
      SELECT 'quantity_c' AS metric, CAST(round(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
      UNION ALL
      SELECT 'extendedprice_c', CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'discount_c', CAST(round(l_discount * 100) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'tax_c', CAST(round(l_tax * 100) AS BIGINT) FROM lineitem
    )
    SELECT metric, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM m GROUP BY metric
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of lineitem's four money/measure columns
    into (metric, cents) rows, then a per-metric exact aggregate — the
    inverse of pivot_counts. At scale: unpivot is a map-side row generator
    (no shuffle; the 4x row expansion happens inside the scan stage and
    partial aggregation collapses it before the 4-group exchange); all
    measures go through integer cents so the sums are bit-identical."""
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("quantity_c"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("extendedprice_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("discount_c"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_c"),
    )
    m = li.unpivot(
        [],
        ["quantity_c", "extendedprice_c", "discount_c", "tax_c"],
        "metric",
        "cents",
    )
    return m.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("total_cents")
    )


@register(
    "window_range_frame",
    group="relational-ext",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame — trailing 30-day revenue per
    customer. Semantically distinct from the ROWS frames elsewhere: the
    frame is bounded by the *day value*, so all same-day orders enter
    every same-day row's frame identically in both engines (no tie-break
    needed — the frame is a deterministic set). One shuffle on o_custkey;
    money through exact integer cents."""
    o = table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        day.alias("day"),
        F.sum(cents).over(w).alias("cents_30d"),
    )


@register(
    "join_asof",
    group="relational-ext",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_us,
           c.event_id AS click_id,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for every purchase, the same user's most recent click
    at or before it (the operator the reference family lacks and DuckDB
    ships natively; the oracle uses DuckDB's ASOF JOIN as an independent
    implementation).

    Spark-first shape: NOT a range join (which explodes to candidate
    pairs) — the two sides union into one stream tagged (click=0,
    purchase=1), ONE shuffle on user_id sorts by (ts, tag), and a running
    `last(ignorenulls)` carries the latest click forward; purchases then
    filter out. Cost = one shuffle + one window pass regardless of how
    many clicks precede each purchase; at 100 TB this is the merge-join
    shape an as-of needs, with the (ts, tag) order making same-timestamp
    click/purchase pairs match inclusively, exactly like ASOF's `>=`."""
    from ..tables import table as _t

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "user_id",
        "ts",
        "tag",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.when(F.last("click_id", ignorenulls=True).over(w).isNotNull(),
               F.last(F.when(F.col("click_id").isNotNull(), F.col("ts")), ignorenulls=True).over(w))
        .alias("click_ts"),
    )
    return carried.filter(F.col("tag") == 1).select(
        F.col("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "click_id",
        F.unix_micros("click_ts").alias("click_us"),
    )


@register(
    "funnel_conversion",
    group="relational-ext",
    oracle="""
    WITH m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_signup,
             min(CASE WHEN event_type = 'click'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_click,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM m
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users whose FIRST signup precedes their
    first click precedes their first purchase — the sequence-matching
    aggregate every product-analytics engine ships. One shuffle (the
    per-user conditional-min agg, map-side partial) then a single-row
    rollup; NULL time comparisons are three-valued in both engines so the
    strict `>` chain needs no explicit null guards."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )

    def first_of(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts_us")))

    m = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s1.cast("long")).alias("n_signup"),
        F.sum(s2.cast("long")).alias("n_signup_click"),
        F.sum(s3.cast("long")).alias("n_full_funnel"),
    )


@register(
    "cohort_retention",
    group="relational-ext",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS BIGINT) AS week
      FROM events
    ), first_wk AS (
      SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(w.week - f.cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM wk w JOIN first_wk f ON w.user_id = f.user_id
    GROUP BY f.cohort_week, w.week - f.cohort_week
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted per week-offset of later activity — the other canonical
    product-analytics aggregate next to funnel_conversion. Weeks are
    integer epoch-week indices (floor division of non-negative micros —
    identical both engines).

    Scale shape: (user, week) distinct and the per-user min co-key on
    user_id, so the join is between two outputs of the SAME shuffle key
    (Catalyst reuses the exchange); the final (cohort, offset) agg is
    tiny. No row ever carries more than (id, week)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        # integer `div`, not `/`+cast: double division can round up across
        # an integer boundary where DuckDB's exact BIGINT // cannot
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
    )
    wk = ev.distinct()
    first_wk = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = wk.join(first_wk, "user_id")
    return (
        j.groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct(F.col("user_id")).alias("n_active"))
    )


_APX_ACC = 10000  # approx_percentile accuracy => declared rank error 1/ACC
# Audit slack: GK guarantees rank error <= n/ACC; the flag allows 2x that
# plus one absolute row so boundary rounding can never flap the bit.
_APX_EPS = 2.0 / _APX_ACC

_APX_ORACLE = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (round(quantile_cont(cents, 0.50), 4) + 0.0) AS p50_exact,
           (round(quantile_cont(cents, 0.95), 4) + 0.0) AS p95_exact,
           CAST(1 AS BIGINT) AS p50_rank_ok,
           CAST(1 AS BIGINT) AS p95_rank_ok
    FROM li GROUP BY l_returnflag
    """


_G2P_W = 65536  # histogram bucket width in cents (same knob as agg_quantile_2pass)


def _grouped_percentiles_2pass(li: DataFrame, pcts) -> DataFrame:
    """Exact linearly-interpolated percentiles per l_returnflag with NO
    per-group value buffering: Spark's ``percentile()`` collects every
    group value into one aggregation buffer (OOM at 100× group size);
    this is the distributed alternative — pass 1 histograms cents into
    fixed-width buckets per group (one partial-agg shuffle of O(groups ×
    buckets) rows), the interpolation ranks k_lo/k_hi = floor(p·(n−1))+1
    and its successor are located in the tiny cumulative table, pass 2
    re-scans ONLY the matched buckets and row_numbers to the residual
    offset. The interpolation v_lo + frac·(v_hi − v_lo) with
    frac = p·(n−1) − floor(p·(n−1)) is the same formula percentile()
    and DuckDB's quantile_cont apply, so values are unchanged.

    Returns one row per group: (l_returnflag, p50_exact, p95_exact,
    rounded to 4)."""
    n = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("nn"))
    pos = F.col("p") * (F.col("nn") - 1).cast("double")
    tgt = (
        n.select(
            "l_returnflag",
            "nn",
            F.explode(F.array(*[F.lit(p) for p in pcts])).alias("p"),
        )
        .select(
            "l_returnflag",
            "nn",
            "p",
            (F.floor(pos) + 1).cast("long").alias("k_lo"),
            (pos - F.floor(pos)).alias("frac"),
        )
        .select(
            "l_returnflag",
            "p",
            "frac",
            "k_lo",
            F.least(F.col("k_lo") + 1, F.col("nn")).alias("k_hi"),
        )
    )
    ranks = tgt.select(
        "l_returnflag",
        "p",
        "frac",
        F.explode(
            F.array(
                F.struct(F.lit("lo").alias("which"), F.col("k_lo").alias("k")),
                F.struct(F.lit("hi").alias("which"), F.col("k_hi").alias("k")),
            )
        ).alias("r"),
    ).select("l_returnflag", "p", "frac", "r.which", "r.k")

    # floor division, NOT truncation: cast('long') on the quotient rounds
    # toward zero, which folds small negatives into bucket 0 and orders
    # negative buckets wrongly relative to their contents — wrong
    # percentiles on any frame containing negative values (ADVICE r14 #5;
    # lineitem prices are positive, but this helper is general machinery)
    bucket = F.floor(F.col("cents") / _G2P_W).cast("long")
    bc = li.groupBy("l_returnflag", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bc.select(
        "l_returnflag",
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
    )
    loc = (
        ranks.join(F.broadcast(cum), "l_returnflag")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("l_returnflag", "p", "frac", "which", "k")
        .agg(F.min(F.struct("bucket", "cum_prev")).alias("m"))
        .select(
            "l_returnflag",
            "p",
            "frac",
            "which",
            F.col("m.bucket").alias("bucket"),
            (F.col("k") - F.col("m.cum_prev")).alias("off"),
        )
    )
    hit = li.withColumn("bucket", bucket).join(
        F.broadcast(loc), ["l_returnflag", "bucket"]
    )
    rn = F.row_number().over(
        Window.partitionBy("l_returnflag", "p", "which").orderBy("cents")
    )
    vals = (
        hit.withColumn("rn", rn)
        .filter(F.col("rn") == F.col("off"))
        .select("l_returnflag", "p", "frac", "which", "cents")
    )
    interp = (
        vals.groupBy("l_returnflag", "p", "frac")
        .agg(
            F.min(F.when(F.col("which") == "lo", F.col("cents"))).alias("v_lo"),
            F.min(F.when(F.col("which") == "hi", F.col("cents"))).alias("v_hi"),
        )
        .select(
            "l_returnflag",
            "p",
            round_pos(
                F.col("v_lo")
                + F.col("frac") * (F.col("v_hi") - F.col("v_lo")).cast("double"),
                4,
            ).alias("v"),
        )
    )
    return interp.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("p") == 0.50, F.col("v"))).alias("p50_exact"),
        F.min(F.when(F.col("p") == 0.95, F.col("v"))).alias("p95_exact"),
    )


@register("agg_approx_percentile", group="relational-ext", oracle=_APX_ORACLE)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-friendly quantile sketch, driver-checkable (VERDICT r12
    next-step #3 — formerly rows-only): approx_percentile (Greenwald-
    Khanna, accuracy {acc}) over lineitem price cents — the sketch family
    of PAPERS.md's EDBT 2023 quantile-sketch study. The GK value itself is
    merge-order-dependent across engines, so the contract is its declared
    RANK guarantee, not its bits: the query probes each sketch value's
    rank interval [count(<v), count(<=v)] against the target rank with
    2/accuracy + 1 row slack and emits ``p50_rank_ok``/``p95_rank_ok`` —
    the oracle asserts the literal 1, so a sketch drifting outside its
    declared bound turns the driver row red. ``p50_exact``/``p95_exact``
    (both engines' identical linear interpolation, the [[agg_percentile]]
    pairing) are the deterministic value columns.

    At scale: the sketch is a constant-size partial aggregate merged
    map-side — no sort, no full shuffle of values. The exact audit
    columns use the grouped TWO-PASS selection (r14, the
    [[agg_quantile_2pass]] machinery per group): ``percentile()`` buffers
    every group value in one aggregation buffer — an executor OOM at
    100× rows (and measured 17.8 s at sf1-local vs 3.4 s two-pass) —
    where the two-pass histograms cents into O(range/width) buckets per
    group, locates each interpolation rank's bucket from the tiny
    cumulative table, and re-scans only the matched buckets."""
    # spread_scan (r14, probe sightings #13-14): the GK sketch + rank
    # probe kernels inherited the serial lineitem scan; round-robin (the
    # 3-value group key would collapse parallelism), no-op at scale.
    # Lazy localCheckpoint: four subtrees read this frame (GK sketch,
    # rank histogram, bucket re-scan, rank probe) and exchange reuse does
    # not unify them — materialize the 2-column projection once (the
    # minhash-band discipline; reliable checkpoint() on a real cluster).
    li = spread_scan(
        table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    ).localCheckpoint(eager=False)
    ap = li.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(cents, array(0.5, 0.95), {_APX_ACC})").alias("ap"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    ).join(
        # Explicit broadcast: both sides are O(groups) aggregates, but
        # Catalyst's size estimate over the two-pass subtree is too large
        # to auto-broadcast and it would pick a SortMergeJoin.
        F.broadcast(_grouped_percentiles_2pass(li, (0.50, 0.95))),
        "l_returnflag",
    )
    probe = li.join(
        F.broadcast(
            ap.select(
                "l_returnflag",
                F.col("ap")[0].alias("v50"),
                F.col("ap")[1].alias("v95"),
            )
        ),
        "l_returnflag",
    )
    cnt = probe.groupBy("l_returnflag").agg(
        F.sum((F.col("cents") < F.col("v50")).cast("long")).alias("lt50"),
        F.sum((F.col("cents") <= F.col("v50")).cast("long")).alias("le50"),
        F.sum((F.col("cents") < F.col("v95")).cast("long")).alias("lt95"),
        F.sum((F.col("cents") <= F.col("v95")).cast("long")).alias("le95"),
    )

    def rank_ok(lt, le, p):  # value's rank interval intersects the bound
        n = F.col("n_rows").cast("double")
        lo = F.floor((p - _APX_EPS) * n) - 1
        hi = F.ceil((p + _APX_EPS) * n) + 1
        return ((F.col(lt) <= hi) & (F.col(le) >= lo)).cast("long")

    return (
        # cnt is an O(groups) aggregate too — hint it for the same reason
        # as the interp side (subtree size estimates defeat auto-broadcast).
        ap.join(F.broadcast(cnt), "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            "p50_exact",
            "p95_exact",
            rank_ok("lt50", "le50", 0.50).alias("p50_rank_ok"),
            rank_ok("lt95", "le95", 0.95).alias("p95_rank_ok"),
        )
    )


agg_approx_percentile.__doc__ = agg_approx_percentile.__doc__.format(acc=_APX_ACC)




_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")


@register(
    "profile_stats",
    group="relational-ext",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_non_null,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(l_shipdate),
           CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) FROM lineitem
    """,
)
def profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling / stats collection (the ANALYZE-TABLE shape a
    query optimizer and a data-quality gate both need): per-column row,
    non-null and exact distinct counts, integer-only so the check is
    exact. One scan computes ALL columns' counts (expand-style multi-
    distinct aggregate) — never one pass per column; at 100 TB the scale
    path swaps COUNT(DISTINCT) for approx_count_distinct (HLL, one pass,
    mergeable) with the same output shape."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
        ]
    one = li.agg(*aggs)
    stacked = one.unpivot(
        [],
        [f"{c}__{s}" for c in _PROFILE_COLS for s in ("n", "nn", "ndv")],
        "key",
        "val",
    )
    parts = F.split("key", "__")
    return (
        stacked.select(parts.getItem(0).alias("col"), parts.getItem(1).alias("stat"), "val")
        .groupBy("col")
        .pivot("stat", ["n", "nn", "ndv"])
        .sum("val")
        .select(
            "col",
            F.col("n").alias("n_rows"),
            F.col("nn").alias("n_non_null"),
            F.col("ndv").alias("ndv"),
        )
    )


@register(
    "window_ntile",
    group="relational-ext",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rn
    FROM orders
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (quartiles per order priority) — the remaining
    ranking window function the surface lacked. (o_totalprice, o_orderkey)
    is a unique order key, so bucket boundaries are deterministic and both
    engines agree exactly (pure integer output, no float at all). Same
    one-shuffle window shape as window_rank."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.row_number().over(w).alias("rn"),
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "sessionize_events",
    group="relational-ext",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ), g AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER w > {_SESSION_GAP_US}
                       OR lag(ts_us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), t AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS session_idx
      FROM g
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us,
           MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM t GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions split on >30-minute
    inactivity gaps (lag + running sum of session starts), rolled up to
    one row per session — the batch twin of stream_session_counts'
    session_window. All integer epoch-micros arithmetic, so the oracle is
    exact; (ts, event_id) is a unique order key.

    Scale shape: both windows and the final groupBy share the user_id
    hash partitioning, so the whole query is ONE shuffle on user_id plus
    per-partition sorts — the canonical sessionization plan at any
    scale. Per-user state is a sort buffer, not O(history) memory."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_session = F.when(
        F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US, 1
    ).otherwise(F.when(F.lag("ts_us").over(w).isNull(), 1).otherwise(0))
    t = ev.withColumn("session_idx", F.sum(new_session).over(w))
    return t.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register(
    "agg_histogram",
    group="relational-ext",
    oracle="""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    )
    SELECT cents // 5000000 AS bucket,
           COUNT(*) AS n_orders,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents
    FROM c GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value ($50k buckets) — the
    profiling/visualization aggregate. Prices go through integer cents
    before the truncating bucket division, so bucket edges are exact in
    both engines (Spark `div` == DuckDB `//` toward zero on BIGINT).
    One partial-aggregated shuffle of O(buckets) rows at any scale."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(cents.alias("cents"))
        .groupBy(F.expr("cents div 5000000").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@register(
    "subquery_correlated",
    group="relational-ext",
    oracle="""
    WITH t AS (
      SELECT c_custkey, c_nationkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey, c_nationkey
    )
    SELECT c_custkey, c_nationkey, total_cents FROM t
    WHERE total_cents * (SELECT COUNT(*) FROM t AS t2
                         WHERE t2.c_nationkey = t.c_nationkey)
        > (SELECT CAST(SUM(total_cents) AS BIGINT) FROM t AS t2
           WHERE t2.c_nationkey = t.c_nationkey)
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: customers (with >= 1 order) whose
    lifetime spend exceeds their nation's average. Written as the
    correlated SQL a reference user would write; Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates both subqueries into
    aggregate-then-join — the textbook unnesting (Neumann & Kemper,
    "Unnesting Arbitrary Queries") — never a per-row re-execution; the
    CTE instances the rewrite duplicates collapse via ReusedExchange
    (the per-customer aggregate shuffles once, both subquery branches
    read that shuffle output — pinned in tests/test_plans.py), leaving
    custkey-agg + nationkey-agg shuffles plus a broadcast join back.
    The above-average compare is the exact
    integer form total*count > sum (no division, no float average), so
    it is bit-identical cross-engine."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer_v")
    table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders_v")
    return spark.sql(
        """
        WITH t AS (
          SELECT c_custkey, c_nationkey,
                 SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
          FROM sq_customer_v JOIN sq_orders_v ON o_custkey = c_custkey
          GROUP BY c_custkey, c_nationkey
        )
        SELECT c_custkey, c_nationkey, total_cents FROM t
        WHERE total_cents * (SELECT COUNT(*) FROM t AS t2
                             WHERE t2.c_nationkey = t.c_nationkey)
            > (SELECT SUM(total_cents) FROM t AS t2
               WHERE t2.c_nationkey = t.c_nationkey)
        """
    )


@register(
    "ts_downsample_ohlc",
    group="relational-ext",
    oracle="""
    WITH e AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ), r AS (
      SELECT event_type, bucket_us, cents,
             row_number() OVER (PARTITION BY event_type, bucket_us
                                ORDER BY ts_us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket_us
                                ORDER BY ts_us DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
           MAX(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
           MAX(cents) AS high_cents,
           MIN(cents) AS low_cents
    FROM r GROUP BY event_type, bucket_us
    """,
)
def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: per (event_type, 1-hour
    bucket) OHLC candle — open/close are the values at the first/last
    event in the bucket (order (ts, event_id): the unique tie-break),
    high/low/sum/count the usual. Buckets via integer epoch-us division
    (no date_trunc dialect drift); values via integer cents.

    Shape at scale: both row_number windows AND the final groupBy share
    the one (event_type, bucket_us) hash partitioning — one Exchange
    total (the descending window re-sorts within partitions, no second
    shuffle), state per group is O(1). This is the continuous-aggregate
    downsample a TSDB materializes; emitted here as a batch operator."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wa = Window.partitionBy("event_type", "bucket_us").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("event_type", "bucket_us").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open_cents"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
        )
    )


@register(
    "events_gap_fill",
    group="relational-ext",
    oracle="""
    WITH base AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events GROUP BY 1, 2
    ), rng AS (
      SELECT event_type, MIN(bucket_us) AS mn, MAX(bucket_us) AS mx
      FROM base GROUP BY event_type
    ), grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, 3600000000)) AS bucket_us
      FROM rng
    )
    SELECT g.event_type, g.bucket_us,
           COALESCE(b.n_events, 0) AS n_events,
           b.sum_cents AS sum_cents,
           last_value(b.sum_cents IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket_us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents,
           (b.n_events IS NULL) AS is_gap
    FROM grid g LEFT JOIN base b
      ON b.event_type = g.event_type AND b.bucket_us = g.bucket_us
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSDB-style gap fill + LOCF (last-observation-carried-forward):
    densify the per-(event_type, 1-hour bucket) rollup over each type's
    own [min, max] bucket range — missing hours appear with n_events=0,
    NULL sum, the carried-forward last observed sum, and an is_gap flag.
    The dashboard/feature-engineering companion to ts_downsample_ohlc.

    Shape at scale: the grid is generated from the O(|types|) range
    aggregate (sequence + explode — rows ∝ types x hours, never a join
    against a calendar table scan); the left join back to the rollup is
    an equi hash join on (type, bucket); LOCF is one window on the same
    partitioning. The raw events shuffle once (the rollup partial agg) —
    everything downstream is bucket-table-sized."""
    e = table(spark, sf_dir, "events")
    base = (
        e.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("sum_cents"))
    )
    grid = (
        base.groupBy("event_type")
        .agg(F.min("bucket_us").alias("mn"), F.max("bucket_us").alias("mx"))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.lit(3600000000).cast("long"))).alias("bucket_us"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(base, ["event_type", "bucket_us"], "left")
        .select(
            "event_type",
            "bucket_us",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "sum_cents",
            F.last("sum_cents", ignorenulls=True).over(w).alias("locf_cents"),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


@register(
    "events_anomaly_mad",
    group="relational-ext",
    oracle="""
    WITH c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, median(n_events) AS med FROM c GROUP BY 1
    ), mad AS (
      SELECT c.event_type, median(abs(c.n_events - m.med)) AS mad
      FROM c JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT c.event_type, c.bucket_us, c.n_events,
           (m.med + 0.0) AS med, (d.mad + 0.0) AS mad,
           CAST(CASE WHEN d.mad > 0 AND abs(c.n_events - m.med) > 3 * d.mad
                     THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM c JOIN med m USING (event_type) JOIN mad d ON d.event_type = c.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series anomaly flags: per (event_type, 1-hour bucket)
    event counts scored against the per-type median and median absolute
    deviation — |c - med| > 3*MAD marks the bucket anomalous (MAD = 0
    disables flagging for that type rather than flagging everything,
    the standard robust-scores convention). Median/MAD beat mean/stddev
    here because the anomalies being hunted are exactly the points that
    would poison a mean-based threshold.

    Determinism: counts are integers; exact-median interpolation is
    (a+b)/2 of integers (exact binary halves) in both engines, so med,
    MAD, and every comparison are bit-identical cross-engine (+ 0.0
    normalizes DuckDB's -0.0, the repo-wide rule).

    Shape at scale: ONE shuffle of the raw events (the (type, bucket)
    partial-agg rollup — same exchange ts_downsample_ohlc uses); both
    median aggregates run over the O(types x buckets) rollup, and the
    per-type med/MAD tables (O(types) rows) broadcast back onto it. The
    raw stream is never shuffled twice, never windowed per row."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    med = c.groupBy("event_type").agg(F.median("n_events").alias("med"))
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("n_events") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.median("dev").alias("mad"))
    return (
        c.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "bucket_us",
            "n_events",
            (F.col("med") + F.lit(0.0)).alias("med"),
            (F.col("mad") + F.lit(0.0)).alias("mad"),
            (
                (F.col("mad") > 0)
                & (F.abs(F.col("n_events") - F.col("med")) > 3 * F.col("mad"))
            )
            .cast("int")
            .alias("is_anomaly"),
        )
    )


# --- bloom-prefiltered join (explicit runtime-filter pattern) ---------------

_BLOOM_M_MIN = 1024  # bits floor (r9's fixed size; now also the minimum)
_BLOOM_M_MAX = 1 << 22  # 512 KiB of bits — broadcast stays a few MB worst case
_BLOOM_P = 2147483647
_BLOOM_A = [1103515245, 69069, 1664525]  # k = 3 hash rows
_BLOOM_B = [12345, 362437, 1013904223]


def _bloom_m_for(n_keys: int) -> int:
    """Bits for the bloom, sized from the BUILD-SIDE key count: next power
    of two >= 16 bits/key (k=3 hashes -> fp rate ~(1-e^(-3/16))^3 ≈ 0.4%),
    clamped to [2^10, 2^22]. A fixed m saturates: with n ≈ m/k keys the
    filter is nearly all-ones and map-side pruning silently degrades to a
    pass-through (ADVICE r9) — at sf1's ~400 suppliers/nation a 1024-bit
    filter was already past that bound."""
    m = _BLOOM_M_MIN
    while m < min(16 * max(n_keys, 1), _BLOOM_M_MAX):
        m <<= 1
    return m


def _bloom_pos(key, j: int, m: int = _BLOOM_M_MIN):
    return ((key % _BLOOM_P * _BLOOM_A[j] + _BLOOM_B[j]) % _BLOOM_P) % m


@register(
    "join_bloom_prefilter",
    group="relational-ext",
    oracle="""
    SELECT l.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_nationkey = 9
    GROUP BY l.l_suppkey
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered dimension join: build an m-bit, 3-hash bloom
    over the selected suppliers' keys (one broadcast row holding the
    sorted set-bit positions — at most 3·|keys| entries), drop fact rows
    MAP-SIDE when any probe bit is missing, then run the exact broadcast
    join on the survivors. m is SIZED FROM THE BUILD SIDE — a one-row
    count AGGREGATE inside the plan (construction stays lazy; no driver
    action) picks the next power of two >= 16 bits/key, the same
    corpus-adaptive discipline as the LSH plane count — because a fixed m
    saturates to all-ones at ~m/k keys and the advertised pruning
    silently becomes a pass-through (ADVICE r9; tests pin both the
    sizing rule and the saturation bound). The bloom admits false
    positives but never false negatives (same integer hash family on
    both sides), so the final result is EXACTLY the plain join — which
    is precisely what the oracle checks, while a unit test pins that the
    prefilter really discards non-matching rows before the join
    (tests/test_round9_ops.py).

    This is the explicit, oracle-checkable form of the engine's own
    runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.*): at
    100 TB the win is that rows failing the bloom never reach the join's
    hash probe or, in the shuffled-join case, the wire — the filter is a
    few hundred KB broadcast at worst regardless of fact size."""
    sup = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 9).select(
        "s_suppkey"
    )
    # m is computed INSIDE the plan as a one-row broadcast column (ADVICE
    # r10: the former driver-side sup.count() made query CONSTRUCTION run a
    # job, unlike every other registry entry). Same rule as _bloom_m_for —
    # next power of two >= 16 bits/key, clamped to [2^10, 2^22] — expressed
    # with the integer bit-smear next-pow2 (no float log2, so no boundary
    # slip at exact powers); tests pin SQL-vs-Python agreement.
    target = (
        F.least(
            F.greatest(F.lit(16) * F.greatest(F.col("n"), F.lit(1)), F.lit(_BLOOM_M_MIN)),
            F.lit(_BLOOM_M_MAX),
        ).cast("long")
        - F.lit(1)
    )
    v = target
    for s in (1, 2, 4, 8, 16):
        v = v.bitwiseOR(F.shiftright(v, s))
    m_row = F.broadcast(
        sup.agg(F.count(F.lit(1)).alias("n")).select((v + F.lit(1)).alias("m"))
    )
    bloom = F.broadcast(
        sup.crossJoin(m_row)
        .select(
            "m",
            F.explode(
                F.array(
                    *[
                        _bloom_pos(F.col("s_suppkey"), j, F.col("m"))
                        for j in range(len(_BLOOM_A))
                    ]
                )
            ).alias("p"),
        )
        .groupBy("m")
        .agg(F.array_sort(F.collect_set("p")).alias("bits"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    probe_ok = None
    for j in range(len(_BLOOM_A)):
        hit = F.array_contains(
            F.col("bits"), _bloom_pos(F.col("l_suppkey"), j, F.col("m"))
        )
        probe_ok = hit if probe_ok is None else (probe_ok & hit)
    cand = li.crossJoin(bloom).filter(probe_ok)
    return (
        cand.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


@register(
    "window_cume_dist",
    group="relational-ext",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           (round(cume_dist() OVER (PARTITION BY o_orderpriority
                                    ORDER BY round(o_totalprice * 100)), 6) + 0.0)
             AS cd
    FROM orders
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per order priority over integer-cents order totals —
    the value-based cumulative-distribution window (ties share a value
    so no tie-break is needed; the cents cast keeps the ORDER key and
    the tie classes identical in both engines). One shuffle on the
    partition key, cumulative frame, no re-scan per row — the
    window-function discipline the rest of the window family pins."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.round(F.col("o_totalprice") * 100).cast("long")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
        round_pos(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "ts_ewma_hourly",
    group="relational-ext",
    oracle="""
    WITH c AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600000000 AS bucket_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type,
             list_transform(list(n_events ORDER BY bucket_us), x -> x::DOUBLE) AS xs
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(len(xs) AS BIGINT) AS n_buckets,
           (round(list_reduce(xs, (a, b) -> (b + a) / 2), 6) + 0.0) AS ewma
    FROM s
    """,
)
def ts_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2) of the hourly
    event rate per type — the classic IIR smoother, an inherently
    ORDER-DEPENDENT fold that plain SQL aggregates cannot express. Run
    scalably: the raw stream pays only the (type, hour) rollup shuffle;
    the sequential fold happens per TYPE over the O(buckets) rollup via
    one sorted-collect + aggregate() — never over raw rows. alpha = 1/2
    keeps every intermediate a dyadic rational, and both engines fold in
    the same bucket order with IEEE doubles, so the result is
    bit-identical (the fold seeds with the first element, matching
    DuckDB's list_reduce).

    At 100 TB: group count (types) bounds parallelism of the fold stage,
    but its input is the tiny rollup; for high-cardinality keys this is
    the state shape stream_stateful_agg maintains incrementally."""
    c = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 * 3600000000").alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    xs = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_us", "n_events"))),
        lambda s: s["n_events"].cast("double"),
    )
    s = c.groupBy("event_type").agg(xs.alias("xs"))
    ewma = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.element_at(F.col("xs"), 1),
        lambda a, b: (b + a) / 2,
    )
    return s.select(
        "event_type",
        F.size("xs").cast("long").alias("n_buckets"),
        round_pos(ewma, 6).alias("ewma"),
    )


@register(
    "stats_two_sample",
    group="relational-ext",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events WHERE event_type IN ('click', 'purchase') GROUP BY event_type
    ), v AS (
      -- NULL var_c for a single-row group (twin of the Spark when());
      -- the chk tripwire is the loud failure for that corpus.
      SELECT event_type, n, s1,
             CASE WHEN n >= 2 THEN
               (n * s2 - s1 * s1)::DOUBLE / (n::DOUBLE * (n - 1))
             END AS var_c
      FROM m
    ), chk AS (
      -- degenerate-corpus tripwire (twin of the Spark assert_true): a
      -- single-row group makes var_c divide by zero and an absent group
      -- silently yields an empty result; fail loudly instead. chk is
      -- the one-row JOIN ROOT below — left-joining a/b onto it keeps a
      -- surviving row even when a group is missing — and ok (0 on
      -- success) is ADDED INTO the n1 output column: an unused ok would
      -- be pruned by the optimizer and the CASE (with its error) never
      -- evaluated, exactly the column-pruning hazard the Spark twin
      -- dodges by gating n1 through assert_true.
      SELECT CASE WHEN COUNT(*) = 2 AND MIN(n) >= 2 THEN 0
                  ELSE CAST(error('stats_two_sample needs both click and purchase groups with n >= 2') AS INT)
             END AS ok
      FROM m
    ), w AS (
      SELECT a.n + chk.ok AS n1, b.n AS n2,
             a.s1::DOUBLE / a.n AS m1, b.s1::DOUBLE / b.n AS m2,
             a.var_c AS v1, b.var_c AS v2
      FROM chk
      LEFT JOIN (SELECT * FROM v WHERE event_type = 'click') a ON TRUE
      LEFT JOIN (SELECT * FROM v WHERE event_type = 'purchase') b ON TRUE
    )
    SELECT n1, n2,
           (round(m1, 4) + 0.0) AS mean1_cents, (round(m2, 4) + 0.0) AS mean2_cents,
           (round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) + 0.0) AS t_welch,
           (round(pow(v1 / n1 + v2 / n2, 2)
                  / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 2) + 0.0)
             AS df_welch
    FROM w
    """,
)
def stats_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic comparing click vs purchase event
    values — the A/B-test primitive. Moments are EXACT integers (n, Σx,
    Σx² over cents: Σx² tops out ~5·10¹³, far under 2⁶³), so sample
    variance ((nΣx² − (Σx)²)/(n(n−1))) is one exact-integer expression
    per group and the t/df doubles are single deterministic IEEE
    pipelines — bit-identical cross-engine, the agg_groupby discipline
    extended to second moments.

    Shape at scale: one partial-agg shuffle carrying 2 groups × 3
    scalars; the statistic is a 2-row broadcast join. This is the whole
    point of moment sketches — an A/B readout over 100 TB moves six
    numbers."""
    cents = F.round(F.col("value") * 100).cast("long")
    m = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .withColumn(
            # NULL (not an ANSI DIVIDE_BY_ZERO) for a single-row group, so
            # the tripwire below is the loud failure, with its actionable
            # message, instead of a bare arithmetic error from inside var_c.
            "var_c",
            F.when(
                F.col("n") >= 2,
                (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1)),
            ),
        )
    )
    a = m.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n1"), F.col("s1").alias("s1a"), F.col("var_c").alias("v1")
    )
    b = m.filter(F.col("event_type") == "purchase").select(
        F.col("n").alias("n2"), F.col("s1").alias("s1b"), F.col("var_c").alias("v2")
    )
    # Degenerate-corpus tripwire (the _KM_DIM discipline, ADVICE r9): a
    # single-row group would divide by zero in var_c and an absent group
    # would silently produce an EMPTY result instead of failing — assert
    # both groups exist with n >= 2 on a one-row broadcast aggregate
    # (zero extra jobs; the crossJoin row carries no output columns).
    chk = m.agg(F.count(F.lit(1)).alias("ng"), F.min("n").alias("mn"))
    # The ALWAYS-ONE-ROW chk aggregate is the join root and a/b hang off
    # it via left joins: if either group were absent, an inner/cross join
    # would produce zero rows and the guard would never evaluate — rooted
    # here, the single surviving row forces the assert to fire instead.
    # The assert gates the n1 OUTPUT column (not a dropped helper column,
    # which column pruning would silently eliminate along with the check).
    w = chk.join(F.broadcast(a), F.lit(True), "left").join(
        F.broadcast(b), F.lit(True), "left"
    )
    guard = F.assert_true(
        (F.col("ng") == 2) & (F.col("mn") >= 2),
        F.lit("stats_two_sample needs both click and purchase groups with n >= 2"),
    )
    m1 = F.col("s1a").cast("double") / F.col("n1")
    m2 = F.col("s1b").cast("double") / F.col("n2")
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    return w.select(
        F.when(guard.isNull(), F.col("n1")).alias("n1"),
        "n2",
        round_pos(m1, 4).alias("mean1_cents"),
        round_pos(m2, 4).alias("mean2_cents"),
        round_pos((m1 - m2) / F.sqrt(se2_1 + se2_2), 6).alias("t_welch"),
        round_pos(
            F.pow(se2_1 + se2_2, 2)
            / (F.pow(se2_1, 2) / (F.col("n1") - 1) + F.pow(se2_2, 2) / (F.col("n2") - 1)),
            2,
        ).alias("df_welch"),
    )


@register(
    "join_fuzzy_band",
    group="relational-ext",
    oracle="""
    WITH c AS (
      -- band length clamped at 0: DuckDB's substr RAISES on a negative
      -- length (sub-2-char names), where Spark's substring returns ''.
      SELECT c_custkey, c_name,
             substr(c_name, 1, greatest(length(c_name) - 2, 0)) AS band
      FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM c a JOIN c b ON a.band = b.band AND b.c_custkey > a.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def join_fuzzy_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded fuzzy self-join (entity resolution): customer-name pairs
    within edit distance 1, candidates generated by a prefix band (all
    but the last 2 characters) so the expensive Levenshtein kernel runs
    on O(band²) pairs per band — never all-pairs. The gate (dist <= 1)
    is strictly tighter than what the band admits (band-mates differ in
    <= 2 trailing characters), so the filter genuinely discriminates —
    the dedup_minhash_cluster gate lesson. Levenshtein with unit costs
    is definition-identical in both engines, so the oracle is exact.

    The production shape for user-record dedupe / catalog matching:
    band by a blocking key (prefix, phonetic code, length bucket), pay
    the quadratic kernel only inside blocks, and at 100 TB the band key
    is exactly the LSH-bucket role — the equi-join shuffles on it and
    block size bounds the kernel invocations. Recall is banding-bounded
    (a typo inside the blocking prefix escapes the block) — the same
    recall/cost dial every banded near-dup query here documents.

    The probe side is spread by band BEFORE the join (r13): the 15k-row
    dimension auto-broadcasts, so without the exchange the O(band²)
    Levenshtein kernel inherits the ONE-file scan's single partition —
    the scan-parallelism-inheritance disease, fourth sighting (measured
    4.7 s → 0.7 s at sf0.1). At 100 TB the multi-file scan spreads on
    its own and the one O(|customer|) exchange is noise."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        # greatest(..., 0) keeps both engines total on sub-2-char names:
        # Spark would return '' for a negative length but DuckDB raises.
        F.expr("substr(c_name, 1, greatest(length(c_name) - 2, 0))").alias("band"),
    )
    a, b = spread_scan(c, "band").alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("b.c_custkey") > F.col("a.c_custkey")))
        .filter(dist <= 1)
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
            dist.cast("long").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# events_path_transitions — first-order Markov transition table over sessions


_PATH_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 19, '0')) AS next_type
      FROM events
    ), t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n_trans
      FROM s WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_trans,
           CAST(floor(1000000.0 * n_trans
                      / SUM(n_trans) OVER (PARTITION BY from_type)) AS BIGINT)
             AS prob_ppm
    FROM t
    """


@register("events_path_transitions", group="relational-ext", oracle=_PATH_ORACLE)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table over per-user event paths
    (round 10): for each user, order events by (ts, event_id) and pair
    each with its successor; the output is the (from_type, to_type)
    transition count plus the empirical transition probability in ppm —
    the model behind funnel drop-off analysis, next-action prediction
    features, and bot detection (uniform rows betray synthetic traffic).

    Shape at scale: one shuffle by user_id for the lead() — per-user
    state is one row, so skew is bounded by the hottest user's event
    count (the same bound sessionize_events lives with) — then a partial
    aggregate down to |event_types|² rows, over which the normalizing
    window is O(types²) no matter the corpus. Probability is
    floor(1e6·n/total): one IEEE division of exact integers, identical
    cross-engine (the registry's integer-scaled-fraction rule).

    Reference parity: beyond the reference surface (WatchStream.java has
    no analytics operators); declared in SURVEY §2B."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        padded_order_key(F.unix_micros("ts"), F.col("event_id"))
    )
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    w_tot = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        F.floor(
            F.lit(1000000.0) * F.col("n_trans") / F.sum("n_trans").over(w_tot)
        )
        .cast("long")
        .alias("prob_ppm"),
    )


# ---------------------------------------------------------------------------
# market_basket_pairs — association-rule co-occurrence mining over orders


_BASKET_K = 20

_BASKET_ORACLE = f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li
    ), po AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_ord FROM li GROUP BY 1
    ), pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS n_both
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), topk AS (
      SELECT * FROM pairs ORDER BY n_both DESC, p1, p2 LIMIT {_BASKET_K}
    )
    SELECT t.p1, t.p2, t.n_both, pa.n_ord AS n_ord1, pb.n_ord AS n_ord2,
           CAST(floor(((1000000.0 * t.n_both) / pa.n_ord) / pb.n_ord * n.n_orders)
                AS BIGINT) AS lift_ppm
    FROM topk t
    JOIN po pa ON pa.l_partkey = t.p1
    JOIN po pb ON pb.l_partkey = t.p2, n
    """


@register("market_basket_pairs", group="relational-ext", oracle=_BASKET_ORACLE)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining, pair stage (round 10): the top-{_BASKET_K}
    part pairs most often bought in the same order, with their lift —
    P(p1,p2) / (P(p1)·P(p2)) in ppm — the Apriori/FP-growth first
    iteration every recommender pipeline starts from.

    Shape at scale: the pair generator is a self-equi-join on l_orderkey
    of the DISTINCT (order, part) projection, so fan-out per order is
    bounded by its basket size squared (TPC-H baskets are ≤ 7 lines;
    real carts are tens) — never an all-pairs part join. Pair counts
    partially aggregate map-side; the top-k compiles to
    TakeOrderedAndProject; the per-part support table then joins against
    the {_BASKET_K}-row winners BROADCAST — at 100 TB the parts side is a
    20-billion-row dimension you must not broadcast, the 20-row side you
    do. Lift keeps the shared fixed IEEE op order over exact integers.

    Reference parity: beyond the reference surface; declared in SURVEY
    §2B."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)  # pair join sides + support + N share it
    )
    n_orders = li.agg(F.count_distinct("l_orderkey").cast("long").alias("n_orders"))
    po = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("n_ord"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    topk = pairs.orderBy(F.col("n_both").desc(), "p1", "p2").limit(_BASKET_K)
    with_n1 = (
        po.join(F.broadcast(topk), po.l_partkey == F.col("p1"))
        .select("p1", "p2", "n_both", F.col("n_ord").alias("n_ord1"))
    )
    po2 = po.withColumnRenamed("n_ord", "n_ord2").withColumnRenamed("l_partkey", "pk2")
    return (
        po2.join(F.broadcast(with_n1), F.col("pk2") == F.col("p2"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "n_both",
            "n_ord1",
            "n_ord2",
            F.floor(
                F.lit(1000000.0) * F.col("n_both") / F.col("n_ord1") / F.col("n_ord2")
                * F.col("n_orders")
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )


market_basket_pairs.__doc__ = market_basket_pairs.__doc__.format(_BASKET_K=_BASKET_K)


# ---------------------------------------------------------------------------
# join_asof_nearest — nearest-in-time join, either direction (round 11)


@register(
    "join_asof_nearest",
    group="relational-ext",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    b AS (
      SELECT p.event_id AS pid, p.user_id AS user_id, p.ts AS pts,
             c.event_id AS bid, c.ts AS bts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ), f AS (
      SELECT p.event_id AS pid, c.event_id AS fid, c.ts AS fts
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts < c.ts
    ), j AS (
      SELECT b.pid, b.user_id,
             epoch_us(CAST(b.pts AS TIMESTAMP)) AS purchase_us,
             b.bid, epoch_us(CAST(b.bts AS TIMESTAMP)) AS bus,
             f.fid, epoch_us(CAST(f.fts AS TIMESTAMP)) AS fus
      FROM b JOIN f ON b.pid = f.pid
    )
    SELECT pid AS purchase_id, user_id, purchase_us,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL
                      OR purchase_us - bus <= fus - purchase_us)
                THEN bid ELSE fid END AS click_id,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL
                      OR purchase_us - bus <= fus - purchase_us)
                THEN bus ELSE fus END AS click_us,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL
                      OR purchase_us - bus <= fus - purchase_us)
                THEN purchase_us - bus ELSE fus - purchase_us END AS dt_us
    FROM j
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time join: for every purchase, the same user's click
    closest in EITHER direction (ties -> the earlier click) — the
    sensor-fusion / feature-alignment variant of [[join_asof]]'s
    backward-only match. Same Spark-first shape, run twice over ONE
    shuffle: the tagged click/purchase union carries the latest click
    forward in (ts, tag) order AND the next click backward in the
    reversed order (where equal-ts purchases precede clicks, making the
    forward match strictly later — no double count of an exact-tie
    click, which the backward pass already owns). The nearest pick is a
    null-safe integer comparison of the two gaps. Cost: one user_id
    exchange + two window passes, independent of click density; the
    oracle composes DuckDB's native ASOF twice (>= and <)."""
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases).withColumn("ts_us", F.unix_micros("ts"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.desc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("click_id").isNotNull(), F.col("ts_us"))
    carried = merged.select(
        "user_id", "ts_us", "tag", "purchase_id",
        F.last("click_id", ignorenulls=True).over(wb).alias("bid"),
        F.last(click_ts, ignorenulls=True).over(wb).alias("bus"),
        F.last("click_id", ignorenulls=True).over(wf).alias("fid"),
        F.last(click_ts, ignorenulls=True).over(wf).alias("fus"),
    ).filter(F.col("tag") == 1)
    prev_wins = F.col("bid").isNotNull() & (
        F.col("fid").isNull()
        | (F.col("ts_us") - F.col("bus") <= F.col("fus") - F.col("ts_us"))
    )
    return carried.select(
        F.col("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_us"),
        F.when(prev_wins, F.col("bid")).otherwise(F.col("fid")).alias("click_id"),
        F.when(prev_wins, F.col("bus")).otherwise(F.col("fus")).alias("click_us"),
        F.when(prev_wins, F.col("ts_us") - F.col("bus"))
        .otherwise(F.col("fus") - F.col("ts_us"))
        .alias("dt_us"),
    )


# ---------------------------------------------------------------------------
# window_running_distinct — running COUNT(DISTINCT) via first-occurrence


@register(
    "window_running_distinct",
    group="relational-ext",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN LAG(event_type) OVER (
                    PARTITION BY user_id
                    ORDER BY event_type, ts, event_id) IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id, ts_us,
           CAST(SUM(first_seen) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT)
             AS distinct_types_so_far
    FROM f
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user over event time — the
    cumulative-breadth window SQL cannot express directly (DISTINCT is
    not a window aggregate): the FIRST-OCCURRENCE trick rewrites it as
    two plain windows — flag each (user, type)'s first event via
    row_number, then a running SUM of flags in event order. Both
    windows co-partition on user_id, so the whole query is ONE shuffle
    (the type sub-key sorts within the same exchange). Contrast a
    collect_set-over-window: that carries O(types) state per ROW and
    materializes a set per output row; the flag rewrite is O(1) per row
    at any breadth."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    # BOTH windows partition by user_id alone (the flag window sorts by
    # type first, so a type's first (ts, id) row is the type boundary
    # where lag(type) changes) — same distribution, different sort =>
    # Catalyst plans ONE exchange with two in-partition sorts. A
    # (user, type)-partitioned row_number would force a second shuffle.
    w_first = Window.partitionBy("user_id").orderBy("event_type", "ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first = (
        ~F.lag("event_type").over(w_first).eqNullSafe(F.col("event_type"))
    ).cast("long")
    return ev.withColumn("first_seen", first).select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
    )


# ---------------------------------------------------------------------------
# cohort_ltv_curve — cumulative revenue per user by signup cohort (round 12)


@register(
    "cohort_ltv_curve",
    group="relational-ext",
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT) AS day,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
      FROM events
    ), fd AS (
      SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
    ), sz AS (
      SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM fd GROUP BY cohort_day
    ), r AS (
      SELECT f.cohort_day, d.day - f.cohort_day AS age_days,
             CAST(SUM(d.cents) AS BIGINT) AS cents
      FROM d JOIN fd f ON d.user_id = f.user_id
      GROUP BY f.cohort_day, d.day - f.cohort_day
    ), c AS (
      SELECT cohort_day, age_days,
             CAST(SUM(cents) OVER (PARTITION BY cohort_day ORDER BY age_days)
                  AS BIGINT) AS cum_cents
      FROM r
    )
    SELECT c.cohort_day, c.age_days, sz.cohort_users, c.cum_cents,
           c.cum_cents // sz.cohort_users AS ltv_cents_per_user
    FROM c JOIN sz ON sz.cohort_day = c.cohort_day
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV curve by signup cohort — the revenue companion of
    [[cohort_retention]]: users cohorted by their first-activity day,
    purchase cents rolled up to (cohort, age-in-days), then a running
    sum per cohort gives cumulative revenue at each age, divided by
    cohort size for per-user LTV (truncating integer cents — exact both
    engines). Shape at scale: ONE user_id shuffle builds first-day +
    joins it back (the events table never joins itself), the (cohort,
    age) rollup collapses raw events before the window, and the
    cumulative runs over the tiny |cohorts|x|ages| table (<= days^2
    rows). Cohort sizes re-aggregate the small first-day table, not
    raw events."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    fd = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .localCheckpoint(eager=False)  # join-back + cohort sizes share it
    )
    sz = fd.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_users"))
    r = (
        ev.join(fd, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("age_days"))
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = r.select(
        "cohort_day", "age_days", F.sum("cents").over(w).alias("cum_cents")
    )
    return c.join(F.broadcast(sz), "cohort_day").select(
        "cohort_day",
        "age_days",
        "cohort_users",
        "cum_cents",
        F.expr("cum_cents div cohort_users").alias("ltv_cents_per_user"),
    )


_FUNNEL_W_US = 7 * 24 * 3600 * 1_000_000  # 7-day attribution window


@register(
    "events_funnel_windowed",
    group="relational-ext",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ), u AS (
      SELECT user_id,
             MIN(ts_us) FILTER (WHERE event_type = 'signup') AS s_us
      FROM e GROUP BY user_id
    ), c AS (
      SELECT u.user_id, u.s_us, MIN(e.ts_us) AS c_us
      FROM u JOIN e ON e.user_id = u.user_id
       AND e.event_type = 'click'
       AND e.ts_us > u.s_us AND e.ts_us <= u.s_us + {_FUNNEL_W_US}
      GROUP BY u.user_id, u.s_us
    ), p AS (
      SELECT c.user_id, MIN(e.ts_us) AS p_us
      FROM c JOIN e ON e.user_id = c.user_id
       AND e.event_type = 'purchase'
       AND e.ts_us > c.c_us AND e.ts_us <= c.c_us + {_FUNNEL_W_US}
      GROUP BY c.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(u.s_us) AS BIGINT) AS n_signup,
           CAST(COUNT(c.c_us) AS BIGINT) AS n_click_7d,
           CAST(COUNT(p.p_us) AS BIGINT) AS n_purchase_7d,
           CAST(COALESCE(COUNT(p.p_us) * 10000 // NULLIF(COUNT(u.s_us), 0), 0) AS BIGINT)
             AS conv_bp
    FROM u
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel with a BOUNDED attribution window — the
    production form of [[funnel_conversion]]: a click only counts if it
    lands within 7 days of the user's first signup, a purchase only
    within 7 days of that FIRST qualifying click (strictly after each
    anchor, matching the funnel_conversion `>` chain). Unbounded funnels
    overcount conversions on long-lived users; every growth stack bounds
    the window.

    The per-step "earliest event after an anchor derived from the
    previous step" is three CHAINED conditional-min window functions
    over the SAME user_id partitioning — each step's predicate consumes
    the previous window's column, Catalyst stacks the Window nodes on
    one exchange, and nothing ever self-joins the event log (the oracle
    does it the join way; the Spark plan shuffles events exactly once).
    Final funnel counts are a single-row rollup of the per-user step
    flags. At 100 TB: one hash exchange on user_id, then O(users) rows
    into a 5-number summary; window depth is funnel length, not data."""
    w = Window.partitionBy("user_id")
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    s_us = F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w)
    staged = e.withColumn("s_us", s_us)
    c_us = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts_us") > F.col("s_us"))
            & (F.col("ts_us") <= F.col("s_us") + _FUNNEL_W_US),
            F.col("ts_us"),
        )
    ).over(w)
    staged = staged.withColumn("c_us", c_us)
    p_us = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("c_us"))
            & (F.col("ts_us") <= F.col("c_us") + _FUNNEL_W_US),
            F.col("ts_us"),
        )
    ).over(w)
    staged = staged.withColumn("p_us", p_us)
    per_user = staged.groupBy("user_id").agg(
        F.max("s_us").alias("s_us"),
        F.max("c_us").alias("c_us"),
        F.max("p_us").alias("p_us"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("s_us").isNotNull().cast("long")).alias("n_signup"),
        F.sum(F.col("c_us").isNotNull().cast("long")).alias("n_click_7d"),
        F.sum(F.col("p_us").isNotNull().cast("long")).alias("n_purchase_7d"),
    ).select(
        "n_users",
        "n_signup",
        "n_click_7d",
        "n_purchase_7d",
        F.expr(
            "coalesce(n_purchase_7d * 10000 div nullif(n_signup, 0), 0)"
        ).cast("long").alias("conv_bp"),
    )


@register(
    "events_sequence_match",
    group="relational-ext",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id
      FROM events
    ), l AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS l1,
             LEAD(event_type, 2) OVER w AS l2,
             LEAD(event_type, 3) OVER w AS l3
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click'
                 AND (l1 = 'purchase' OR l2 = 'purchase' OR l3 = 'purchase'))
                AS BIGINT) AS n_matched,
           CAST(COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'
                 AND (l1 = 'purchase' OR l2 = 'purchase' OR l3 = 'purchase'))
                 * 10000 // NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0), 0)
                AS BIGINT) AS match_bp
    FROM l GROUP BY user_id
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (CEP-lite): per user, how many
    clicks are followed by a purchase within the next THREE events of
    any kind — the MATCH_RECOGNIZE/funnel-with-distraction-budget shape
    ([[events_funnel_windowed]] bounds by TIME; this bounds by
    intervening EVENTS, which is what distinguishes an intent path from
    a wandering one). Fixed lookahead compiles to three lead() columns
    on ONE user_id exchange — no self-join, no UDF state machine; a
    longer pattern is more lead columns, and an unbounded pattern is
    the [[stream_sessionize_state]] applyInPandasWithState shape.

    O(users) output; exact integer match rate in bp."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    l = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("l1"),
        F.lead("event_type", 2).over(w).alias("l2"),
        F.lead("event_type", 3).over(w).alias("l3"),
    )
    is_click = F.col("event_type") == "click"
    hit = is_click & (
        (F.col("l1") == "purchase")
        | (F.col("l2") == "purchase")
        | (F.col("l3") == "purchase")
    )
    return (
        l.groupBy("user_id")
        .agg(
            F.sum(is_click.cast("long")).alias("n_clicks"),
            F.sum(hit.cast("long")).alias("n_matched"),
        )
        .select(
            "user_id",
            "n_clicks",
            "n_matched",
            F.expr("coalesce(n_matched * 10000 div nullif(n_clicks, 0), 0)")
            .cast("long")
            .alias("match_bp"),
        )
    )


@register(
    "window_first_last_value",
    group="relational-ext",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority, cents,
           CAST(first_value(cents) OVER w AS BIGINT) AS min_cents_in_prio,
           CAST(last_value(cents) OVER w AS BIGINT) AS max_cents_in_prio,
           CAST(nth_value(cents, 2) OVER w AS BIGINT) AS second_cents_in_prio
    FROM o
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an UNBOUNDED frame —
    the positional window-function surface the declared inventory had
    not yet exercised (rank/lag/cume families are covered; these pull
    VALUES from frame endpoints — the "compare every row to its group's
    extremes" idiom). Frame is explicitly unbounded-both-ways: the
    default last_value frame (ends at CURRENT ROW) is the classic
    silent-wrong-answer; order ties break on the unique key so the
    second element is deterministic.

    One exchange on the partition key; integer cents, no float surface
    at all."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.first("cents").over(w).cast("long").alias("min_cents_in_prio"),
        F.last("cents").over(w).cast("long").alias("max_cents_in_prio"),
        F.nth_value("cents", 2).over(w).cast("long").alias("second_cents_in_prio"),
    )


@register(
    "agg_weighted_median",
    group="relational-ext",
    oracle="""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ), c AS (
      SELECT cents, w,
             CAST(SUM(w) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(SUM(w) OVER () AS BIGINT) AS tot
      FROM v
    )
    SELECT CAST(MAX(tot) AS BIGINT) AS total_weight,
           MIN(CASE WHEN 4 * cum >= tot THEN cents END) AS w_p25_cents,
           MIN(CASE WHEN 2 * cum >= tot THEN cents END) AS w_median_cents,
           MIN(CASE WHEN 4 * cum >= 3 * tot THEN cents END) AS w_p75_cents
    FROM c
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED quartiles of the price distribution, weight = quantity —
    "the median unit SOLD", not the median line item (a line with 50
    units counts 50×): the inventory/revenue planning number plain
    percentiles get wrong. Lower weighted quantile by the exact integer
    rule 4·cum >= j·W (j = 1, 2, 3) — no global sort, no interpolation,
    no float anywhere.

    TWO-PASS since r18 (the [[agg_quantile_2pass]] selection with
    weights instead of counts): the r17-era single cumulative window
    over the per-cents rollup was a serial stage over O(distinct cents)
    rows, and prices are NEAR-UNIQUE — at sf1 the domain barely
    compresses (6M rows → 4.4M distinct cents, flagged by the sf1 skew
    probe). Pass 1 buckets the cents into ~160 fixed-width ranges (one
    partial-agg shuffle of O(buckets) rows; the only serial window is
    over that tiny table) and locates each quartile's bucket from the
    cumulative WEIGHT; pass 2 re-scans only the ≤3 matched buckets,
    rolls up per-cents within them (≤ bucket-width distinct values per
    quartile partition), and picks the first cents whose offset
    cumulative crosses the rule. Identical integers to the oracle's
    full-domain cumulative — the plan changed, the contract didn't."""
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round("l_quantity").cast("long").alias("qty"),
    )
    width = 65536
    tot = li.agg(F.sum("qty").alias("tot"))
    # pass 1: bucket weight histogram + cumulative (O(buckets) rows)
    bw = (
        li.groupBy(F.expr(f"cents div {width}").alias("bucket"))
        .agg(F.sum("qty").alias("w"))
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = bw.select(
        "bucket",
        F.sum("w").over(wb).alias("cum"),
        (F.sum("w").over(wb) - F.col("w")).alias("cum_prev"),
    )
    js = tot.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"), "tot"
    )
    # locate each quartile's bucket: FIRST bucket with 4*cum >= j*tot
    t = (
        js.join(F.broadcast(cum), 4 * F.col("cum") >= F.col("j") * F.col("tot"))
        .groupBy("j", "tot")
        .agg(F.min(F.struct("bucket", "cum_prev")).alias("m"))
        .select(
            "j",
            "tot",
            F.col("m.bucket").alias("bucket"),
            F.col("m.cum_prev").alias("base"),
        )
    )
    # pass 2: per-cents rollup within ONLY the matched buckets, offset
    # cumulative, first crossing wins
    hit = (
        li.withColumn("bucket", F.expr(f"cents div {width}"))
        .join(F.broadcast(t), "bucket")
        .groupBy("j", "tot", "base", "cents")
        .agg(F.sum("qty").alias("w"))
    )
    wj = Window.partitionBy("j").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    picks = (
        hit.withColumn("cum", F.col("base") + F.sum("w").over(wj))
        .filter(4 * F.col("cum") >= F.col("j") * F.col("tot"))
        .groupBy("j")
        .agg(F.min("cents").alias("q"), F.max("tot").alias("tot"))
    )
    return picks.agg(
        F.max("tot").cast("long").alias("total_weight"),
        F.min(F.when(F.col("j") == 1, F.col("q"))).alias("w_p25_cents"),
        F.min(F.when(F.col("j") == 2, F.col("q"))).alias("w_median_cents"),
        F.min(F.when(F.col("j") == 3, F.col("q"))).alias("w_p75_cents"),
    )


# ---------------------------------------------------------------------------
# engine-native optimizer features (round 17, VERDICT r16 asks #3/#4): the
# built-in twins of the hand-rolled mitigations above — the knobs a 100 TB
# run actually flips instead of rewriting queries.


@register(
    "join_skew_aqe",
    group="relational-ext",
    oracle=f"""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem JOIN part
      ON (CASE WHEN l_partkey % 10 < 3 THEN 0 ELSE l_partkey END) = p_partkey
    GROUP BY p_brand
    """,
)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-NATIVE skew-join handling — the AQE twin of the manual
    [[join_skew_salted]] (operators/skew.py): a deliberately planted
    power-law key (30% of all lineitem rows collapse onto partkey 0; the
    rest stay uniform) makes one shuffle partition a straggler, and
    instead of salting we let `OptimizeSkewedJoin` split the oversized
    partition at runtime — the split is pinned in
    tests/test_round17_ops.py via `skew=true` on the executed
    SortMergeJoin node. The oracle is the PLAIN join on the same derived
    key: splitting must never change the logical result.

    The join EXECUTES inside a temp-conf block (broadcast disabled so
    the shuffle join exists at local scale; split thresholds lowered
    from their 256 MB/64 MB cluster defaults in the same proportion as
    the corpus is smaller than a cluster workload) and is materialized
    with an eager localCheckpoint before the confs are restored, so the
    shared session's knobs are untouched for every other registry entry.

    At 100 TB this — not manual salting — is the first lever: zero query
    rewrite, split sizes chosen from runtime MapOutputStatistics, and
    the dim side replicated only for the split partitions. Salting
    (operators/skew.py) remains the declared fallback for paths AQE
    cannot touch (streaming joins, pre-bucketed shuffles)."""
    from ..session import temp_sql_confs

    # spread_scan matters here beyond the usual parallelism-inheritance
    # fix: AQE can only split a skewed reduce partition at MAP-OUTPUT
    # boundaries, and the local single-row-group corpus gives the fact
    # scan ONE map task — an unsplittable hot partition. The round-robin
    # spread puts 32 map outputs behind the join shuffle, restoring the
    # multi-file map-side granularity a real cluster scan has (where
    # spread_scan is an identity no-op).
    li = spread_scan(
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    ).select(
        F.when(F.col("l_partkey") % 10 < 3, F.lit(0))
        .otherwise(F.col("l_partkey"))
        .alias("sk"),
        "l_quantity",
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(p, F.col("sk") == F.col("p_partkey")).select(
        "p_brand", "l_quantity"
    )
    with temp_sql_confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        },
    ):
        mat = joined.localCheckpoint(eager=True)
    return mat.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        dsum("l_quantity", "sum_qty"),
    )


@register(
    "join_bloom_runtime",
    group="relational-ext",
    oracle="""
    SELECT l.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_nationkey = 9
    GROUP BY l.l_suppkey
    """,
)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-NATIVE runtime bloom filter — the built-in twin of the
    hand-rolled [[join_bloom_prefilter]] (same query contract, same
    oracle, deliberately): Spark's `InjectRuntimeFilter` rule builds a
    bloom over the SELECTIVE side's join keys (suppliers from one
    nation) and plants a `bloom_filter_might_contain` predicate on the
    fact side's scan, so non-matching lineitem rows die MAP-SIDE before
    the join shuffle — exactly what the manual variant constructs by
    hand. Pinned in tests/test_round17_ops.py: the executed plan carries
    the injected bloom probe AND the result is row-identical to the
    plain join (false positives only ever pass extra rows to the exact
    join; never drop).

    Executes inside a temp-conf block: broadcast disabled (the engine
    does not bother injecting a bloom under a broadcast join — the hash
    probe already prunes) and the application-side scan-size floor
    lowered from its 10 GB cluster default so the rule fires at local
    corpus scale; eager localCheckpoint materializes under those knobs,
    then the session is restored.

    At 100 TB the flags are on by default and the thresholds are
    already right: any dim-filtered fact join whose dim side fits the
    creation threshold gets the bloom for free — no rewrite, and the
    wire sees only surviving fact rows."""
    from ..session import temp_sql_confs

    sup = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 9)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    joined = li.join(sup, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_suppkey", "l_extendedprice"
    )
    with temp_sql_confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        mat = joined.localCheckpoint(eager=True)
    return mat.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
    )


# Columns ANALYZEd per catalog twin: the join keys, the filter columns
# (selectivity estimates drive the reorder), and the agg input.
_CBO_STATS_COLS = {
    "lineitem": "l_orderkey, l_extendedprice",
    "orders": "o_orderkey, o_custkey, o_orderpriority",
    "customer": "c_custkey, c_nationkey, c_mktsegment",
    "nation": "n_nationkey, n_name",
}


def cbo_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Catalog twins of the star-schema parquet files with COLUMN
    STATISTICS — the prerequisite CBO shares with every real warehouse:
    cost-based reordering only sees relations the catalog has row counts,
    NDVs, and min/max for, and path-based reads carry none of that. Each
    table is EXTERNAL (``LOCATION`` points at the driver corpus — no data
    copy) and named per sf_dir digest so scales never collide; the
    ``ANALYZE TABLE .. COMPUTE STATISTICS FOR COLUMNS`` pass runs once
    per (session, sf_dir) and is skipped only when the catalog already
    holds COLUMN stats for the table — a bare tableExists gate would
    let a run that died between CREATE and ANALYZE (or a warehouse
    carried over from an earlier process) pin a stats-less table
    forever, and CBO then silently never reorders (ADVICE r18 #1).

    At 100 TB this is the nightly `ANALYZE` every lakehouse schedules —
    stats collection is one scan amortized over every query that plans
    against the table, not a per-query cost."""
    import hashlib

    dig = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names: dict[str, str] = {}
    for t, cols in _CBO_STATS_COLS.items():
        tn = f"cbo_{t}_{dig}"
        names[t] = tn
        if spark.catalog.tableExists(tn) and _has_column_stats(
            spark, tn, cols.split(",")[0].strip()
        ):
            continue
        spark.sql(f"DROP TABLE IF EXISTS {tn}")
        spark.sql(
            f"CREATE TABLE {tn} USING parquet LOCATION '{sf_dir}/{t}.parquet'"
        )
        spark.sql(f"ANALYZE TABLE {tn} COMPUTE STATISTICS FOR COLUMNS {cols}")
    return names


def _has_column_stats(spark: SparkSession, table_name: str, col: str) -> bool:
    """True when the catalog holds COLUMN statistics (a distinct_count)
    for ``col`` — the signal ANALYZE actually completed. DESCRIBE
    EXTENDED <table> <col> is a catalog-metadata lookup (~10 fixed rows,
    no data scan), so collecting it driver-side is O(1) and not a
    distributed-plan collect."""
    try:
        rows = spark.sql(f"DESCRIBE EXTENDED {table_name} {col}").collect()
    except Exception:
        return False
    info = {r[0]: r[1] for r in rows}
    return info.get("distinct_count") not in (None, "NULL")


@register(
    "join_cbo_reorder",
    group="relational-ext",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderpriority = '1-URGENT' AND c.c_mktsegment = 'BUILDING'
    GROUP BY n.n_name
    """,
)
def join_cbo_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COST-BASED join reordering — the last engine-native optimizer
    feature in the family ([[join_skew_aqe]], [[join_bloom_runtime]],
    DPP): a 4-way star join ([[join_multiway]]'s shape, plus selective
    dim filters) written in the deliberately COST-BLIND order
    fact-first (lineitem ⋈ orders ⋈ customer ⋈ nation). With column
    statistics on the catalog twins ([[cbo_tables]] ANALYZE pass) and
    `spark.sql.cbo.enabled` + `cbo.joinReorder.enabled`, Catalyst's
    DP reorderer rewrites the tree to dims-first —
    ((customer ⋈ nation) ⋈ orders) ⋈ lineitem, verified live: the
    filtered 1/5-segment customer set joins the 25-row nation first,
    the 1/5-priority orders next, and the fact table LAST, so every
    intermediate is the small side. Pinned in tests/test_round18_ops.py:
    the optimized plan under CBO differs from the syntactic-order plan
    (lineitem demoted from first to last leaf) and the result is
    row-identical either way — reordering must never change semantics.
    The oracle is the plain 4-way SQL join.

    Executes inside a temp-conf block with an eager localCheckpoint
    (CBO confs are read at optimization time), restoring the shared
    session after; the stats pass itself is once-per-session via
    [[cbo_tables]].

    At 100 TB this is the zero-rewrite lever for ad-hoc star queries:
    syntactic join order stops mattering once ANALYZE stats exist, and
    a fact-first phrasing costs the same as the hand-optimized one —
    the optimizer, not the author, owns join order."""
    from ..session import temp_sql_confs

    t = cbo_tables(spark, sf_dir)
    li = spark.table(t["lineitem"]).select("l_orderkey", "l_extendedprice")
    o = (
        spark.table(t["orders"])
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    c = (
        spark.table(t["customer"])
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )
    n = spark.table(t["nation"]).select("n_nationkey", "n_name")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_extendedprice")
    )
    with temp_sql_confs(
        spark,
        {
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        },
    ):
        mat = joined.localCheckpoint(eager=True)
    return mat.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
    )
