"""Group 3 — scalar function surface (SURVEY.md §2B).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd). The two UDF entries exist to declare the UDF
surface itself: a row Python UDF checked against its closed-form SQL, and
an Arrow-batched pandas grouped aggregate checked against exact SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..tables import spread_scan, table
from ._determinism import round_pos
from .registry import register


@register(
    "fn_string",
    group="scalar",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_type, 1, 5) AS type5,
           concat(p_brand, '#', p_type) AS brand_type,
           length(p_name) AS name_len,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           split_part(p_type, ' ', 1) AS type_head
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface. spread_scan (r14): the regexp kernel over
    the one-file part scan ran serial — sighting #12 of the
    scan-parallelism defect class, and the FIRST one caught automatically
    by the new bench skew probe (diag.py; SKEW_LOCAL.json flagged a
    1.8 s serial stage) rather than by hand. No-op on wide scans."""
    p = spread_scan(table(spark, sf_dir, "part"), "p_partkey")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
    )


@register(
    "fn_date",
    group="scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_1998,
           epoch_us(o_orderdate + INTERVAL 3 DAY) AS plus3d_us
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.unix_micros(F.date_trunc("month", "o_orderdate")).alias("month_start_us"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_1998"),
        # o_orderdate is TIMESTAMP_NTZ in parquet; cast to TIMESTAMP (session
        # tz is UTC, so identity) for unix_micros.
        F.unix_micros(
            F.col("o_orderdate").cast("timestamp") + F.expr("INTERVAL 3 DAY")
        ).alias("plus3d_us"),
    )


@register(
    "fn_math",
    group="scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.04) AS abs_disc,
           (round(sqrt(l_quantity), 4) + 0.0) AS sqrt_qty,
           (round(ln(l_extendedprice), 4) + 0.0) AS ln_price,
           (round(pow(1.0 + l_discount, 2.0), 4) + 0.0) AS pow_disc,
           ((l_orderkey % 7) + 7) % 7 AS mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendentals (ln/pow) can differ by 1 ulp between libm
    implementations — ROUND(.,4) absorbs that (SURVEY §2B determinism)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.04).alias("abs_disc"),
        round_pos(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        round_pos(F.log(F.col("l_extendedprice")), 4).alias("ln_price"),
        round_pos(F.pow(F.lit(1.0) + F.col("l_discount"), 2.0), 4).alias("pow_disc"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("mod7"),
    )


@register(
    "fn_array",
    group="scalar",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           list_sort(string_split(text, ' '))[1] AS first_tok,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.sort_array(toks).getItem(0).alias("first_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


@register(
    "fn_map",
    group="scalar",
    # DuckDB's MAP syntax differs; the oracle computes the same VALUES
    # directly (SURVEY §2B: "DuckDB MAP syntax differs; same values").
    oracle="""
    SELECT doc_id,
           lang AS lang_val,
           source AS source_val,
           2 AS n_keys
    FROM documents
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "fn_json",
    group="scalar",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "fn_case_nullif",
    group="scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'final'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_class,
           coalesce(nullif(o_orderstatus, 'P'), 'pending-masked') AS masked_status,
           CASE WHEN o_totalprice < 50000.0 THEN 'low'
                WHEN o_totalprice < 150000.0 THEN 'mid'
                ELSE 'high' END AS price_bucket
    FROM orders
    """,
)
def fn_case_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending-masked")).alias(
            "masked_status"
        ),
        F.when(F.col("o_totalprice") < 50000.0, "low")
        .when(F.col("o_totalprice") < 150000.0, "mid")
        .otherwise("high")
        .alias("price_bucket"),
    )


@register(
    "udf_python",
    group="scalar",
    oracle="""
    SELECT c_custkey,
           (c_custkey * 2654435761) % 4294967296 + c_custkey % 97 AS checksum
    FROM customer
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row Python UDF (declared surface) vs its closed-form SQL oracle.
    Integer math only — exact in arbitrary-precision Python and in BIGINT
    SQL. UDFs are the slow path; this exists to declare the capability."""

    @F.udf(returnType=LongType())
    def checksum(key: int) -> int:
        return (key * 2654435761) % 4294967296 + key % 97

    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", checksum("c_custkey").alias("checksum"))


@register(
    "udaf_pandas",
    group="scalar",
    oracle="""
    SELECT c_nationkey,
           CAST(SUM(CAST(ROUND(c_acctbal * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_acctbal,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched grouped aggregate (applyInPandas) vs exact SQL avg.
    The python side mirrors the oracle's integer-scaled exact sum so both
    engines perform identical IEEE divisions."""

    def grp_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["c_acctbal"].mul(10000).round().astype("int64").sum())
        n = len(pdf)
        return pd.DataFrame(
            {
                "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
                "avg_acctbal": [float(s) / 10000.0 / n],
                "n_customers": [n],
            }
        )

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        grp_mean, schema="c_nationkey int, avg_acctbal double, n_customers long"
    )


@register(
    "fn_bitwise",
    group="scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS lo_byte,
           CAST(l_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS BIGINT) AS mixed,
           CAST(l_orderkey >> 4 AS BIGINT) AS shifted_down,
           CAST((CAST(l_linenumber AS BIGINT) << 8) AS BIGINT) AS shifted_up,
           CAST(bit_count(l_orderkey) AS BIGINT) AS popcount
    FROM lineitem WHERE l_orderkey < 64
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR masking, shifts and popcount —
    the operators the engine's own sketch family leans on (register
    packing, simhash votes, HLL rho), declared as a user-facing scalar
    capability. Map-side, pushdown-filtered scan, zero shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 64)
    ok = F.col("l_orderkey")
    ln = F.col("l_linenumber").cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ok.bitwiseAND(F.lit(255)).alias("lo_byte"),
        ok.bitwiseOR(F.lit(4096)).alias("with_flag"),
        ok.bitwiseXOR(ln).alias("mixed"),
        F.shiftright(ok, 4).cast("long").alias("shifted_down"),
        F.shiftleft(ln, 8).cast("long").alias("shifted_up"),
        F.bit_count(ok).cast("long").alias("popcount"),
    )


# ---------------------------------------------------------------------------
# Arrow-batched scalar pandas UDF + python UDTF (round 16) — completing the
# declared Python-extension surface: row UDF (udf_python) -> vectorized
# scalar (here) -> grouped aggregate (udaf_pandas) -> table function (here).


@register(
    "udf_pandas_vectorized",
    group="scalar",
    oracle="""
    SELECT c_custkey,
           (c_custkey * c_custkey) % 1000003
             + CAST(length(c_name) AS BIGINT) AS vhash
    FROM customer
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched SCALAR pandas UDF (declared surface) vs its
    closed-form SQL oracle — the vectorized middle rung of the Python
    ladder: ~10-100x the row UDF's throughput because whole Arrow
    batches cross the boundary and the math runs as numpy kernels, yet
    still off the JVM fast path (the docstring contract: reach for
    built-ins first, this only when expression trees can't say it).
    Integer math only, exact in both engines; int64 is safe because
    c_custkey^2 stays far below 2^63 at any TPC-H scale that fits keys
    in int64's square root (~3e9 keys)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def vhash(key: pd.Series, name: pd.Series) -> pd.Series:
        return (key * key) % 1000003 + name.str.len().astype("int64")

    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", vhash("c_custkey", "c_name").alias("vhash"))


@register(
    "udtf_python",
    group="scalar",
    oracle="""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (  -- fan-out bound derived from the data, not a silent cap
      SELECT CAST(CEIL(MAX(n_tok) / 16.0) AS BIGINT) AS max_chunks FROM d
    )
    SELECT d.doc_id,
           CAST(g.chunk_idx AS BIGINT) AS chunk_idx,
           CAST(LEAST(16, d.n_tok - g.chunk_idx * 16) AS BIGINT) AS n_tokens
    FROM d,
         (SELECT unnest(generate_series(0, (SELECT max_chunks FROM b)))
            AS chunk_idx) g
    WHERE g.chunk_idx * 16 < d.n_tok
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, declared surface): one input doc row
    fans out to N output rows — the 16-token chunk plan per document,
    the lateral-join shape (`FROM docs, LATERAL chunker(...)`) that
    row- and batch-UDFs cannot express because their cardinality is
    fixed at 1:1. The oracle reproduces the fan-out with
    generate_series. Deliberately the slow path (row-python, like
    [[udf_python]]): the set-based twin is doc_chunk_tokens /
    text_bpe_tokenize's budget arithmetic; this exists to declare the
    UDTF capability with exact parity. Map-side only — the fan-out
    happens inside the scan task, no shuffle at any scale."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx long, n_tokens long")
    class Chunker:
        def eval(self, text: str):
            if text is None:  # NULL text fans out to zero rows
                return
            n = len(text.split(" "))
            for i in range(0, (n + 15) // 16):
                yield i, min(16, n - i * 16)

    spark.udtf.register("doc_chunker_udtf", Chunker)
    table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens
        FROM udtf_docs d, LATERAL doc_chunker_udtf(d.text) c
        """
    )


# ---------------------------------------------------------------------------
# VARIANT JSON path + SQL-defined functions (round 19) — the declarative
# top rungs of the extension ladder: binary-encoded semi-structured access
# (parse once, typed extraction) and CREATE FUNCTION SQL UDF/UDTF (pure
# Catalyst expressions, no Python boundary at all).


@register(
    "fn_json_variant",
    group="scalar",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
)
def fn_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT JSON path (VERDICT r18 ask #3): `parse_json` decodes the
    props string ONCE into Spark's binary VARIANT encoding, then every
    extraction (`try_variant_get`) is a typed offset lookup instead of a
    re-parse — the 100 TB answer to [[fn_json]]'s per-path
    `get_json_object`, which tokenizes the same string once PER PATH.
    Three typed projections of the same field (bigint/string/double)
    plus a missing path (NULL, never an error under the try_ form) pin
    the cast matrix; the unit pin (tests/test_round19_ops.py) asserts
    result identity against the [[fn_json]] string form, so the encoding
    switch is proven semantics-preserving.

    At 100 TB the VARIANT column is the storage answer too: shredded
    binary beats JSON strings for scan width, and a single decode
    amortizes across every downstream extraction. Map-side only — no
    shuffle at any scale."""
    ev = table(spark, sf_dir, "events")
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.k", "bigint").alias("k_int"),
        F.try_variant_get("v", "$.k", "string").alias("k_str"),
        F.try_variant_get("v", "$.k", "double").alias("k_dbl"),
        F.try_variant_get("v", "$.missing", "string").alias("missing"),
    )


@register(
    "fn_sql_udf_scalar",
    group="scalar",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS disc_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def fn_sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined SCALAR function (CREATE FUNCTION ... RETURN expr,
    Spark 4.x) — the declarative rung ABOVE every Python UDF on the
    extension ladder ([[udf_python]] row → [[udf_pandas_vectorized]]
    Arrow → this): the body is inlined into the Catalyst plan at
    resolution time, so the "UDF" costs exactly what the hand-written
    expression costs — whole-stage codegen, pushdown, no serialization
    boundary. The classic discounted-price kernel as a reusable named
    abstraction; the oracle inlines the same arithmetic (identical
    IEEE-double product order, exact integer cents after round).

    At 100 TB this is how a platform team ships business logic: named,
    catalog-registered, and free — versus the Python rungs, each of
    which pays a per-batch (or per-row) interpreter boundary."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE)
        RETURNS BIGINT
        RETURN CAST(round(p * (1.0 - d) * 100) AS BIGINT)
        """
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(disc_cents(l_extendedprice, l_discount)) AS BIGINT)
                 AS disc_cents
        FROM sqludf_lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "fn_sql_udtf_table",
    group="scalar",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), x AS (
      SELECT o.o_orderkey, g.i,
             o.cents // 4
               + (CASE WHEN g.i <= o.cents % 4 THEN 1 ELSE 0 END)
               AS amount_cents
      FROM o, (SELECT UNNEST(generate_series(1, 4)) AS i) g
    )
    SELECT CAST(i AS BIGINT) AS installment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(amount_cents) AS BIGINT) AS total_cents
    FROM x GROUP BY i
    """,
)
def fn_sql_udtf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (CREATE FUNCTION ... RETURNS TABLE,
    Spark 4.x) — the declarative twin of [[udtf_python]]: a 1→N fan-out
    (order total split into 4 exact installments, remainder cents spread
    over the leading installments) expressed as a pure SQL body that
    Catalyst inlines as a LATERAL correlated subquery — codegen'd
    sequence+explode inside the scan task, zero Python, zero shuffle
    for the fan-out itself. The conservation property is built into the
    arithmetic (div + spread remainder sums back to cents exactly);
    the rollup checks it across every order. Oracle: the same fan-out
    via generate_series UNNEST.

    At 100 TB: the fan-out rides the scan (map-side lateral), and the
    single rollup shuffle carries 4 groups — the named-table-function
    abstraction costs nothing over the inlined form."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION order_installments(
            cents BIGINT, n INT)
        RETURNS TABLE(i BIGINT, amount_cents BIGINT)
        RETURN SELECT CAST(x AS BIGINT) AS i,
                      cents div n
                        + (CASE WHEN x <= cents % n THEN 1 ELSE 0 END)
                        AS amount_cents
               FROM (SELECT explode(sequence(1, n)) AS x)
        """
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("sqludtf_orders")
    return spark.sql(
        """
        SELECT b.i AS installment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(b.amount_cents) AS BIGINT) AS total_cents
        FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM sqludtf_orders) o,
             LATERAL order_installments(o.cents, 4) b
        GROUP BY b.i
        """
    )
