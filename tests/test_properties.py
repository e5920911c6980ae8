"""Property-based tests (SURVEY.md §5.2 item 4): dedupe idempotence,
fan-out conservation, batch-pack bounds — over hypothesis-generated event
lists run through the real operators."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_dedupe_spark.operators.cdc import (
    DEFAULT_ROUTING,
    batch_pack,
    dedupe_first,
    fanout,
    routing_df,
)

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # entity id (collision-heavy)
        st.integers(min_value=0, max_value=10_000),  # arrival order key
        st.sampled_from(sorted(DEFAULT_ROUTING)),
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: t[1],
)

_SETTINGS = settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _df(spark, events):
    return spark.createDataFrame(
        events or [(0, 0, "click")], "entity_id int, arrival long, event_type string"
    ).filter(F.lit(bool(events)))


@given(events=EVENTS)
@_SETTINGS
def test_dedupe_idempotent_and_first_wins(spark, events):
    df = _df(spark, events)
    once = dedupe_first(df, ["entity_id"], ["arrival"])
    twice = dedupe_first(once, ["entity_id"], ["arrival"])
    got = {(r.entity_id, r.arrival) for r in once.collect()}
    # dedupe ∘ dedupe = dedupe
    assert {(r.entity_id, r.arrival) for r in twice.collect()} == got
    # first arrival wins per key
    expected = {}
    for eid, arr, _ in sorted(events, key=lambda t: t[1]):
        expected.setdefault(eid, arr)
    assert got == set(expected.items())


@given(events=EVENTS)
@_SETTINGS
def test_fanout_conservation(spark, events):
    """Σ target inputs = Σ source rows × fan-out width of their type."""
    df = _df(spark, events)
    routed = fanout(df, routing_df(df.sparkSession))
    expected = sum(len(DEFAULT_ROUTING[t]) for _, _, t in events)
    assert routed.count() == expected


@given(events=EVENTS, size=st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_batch_pack_bounds_and_conservation(spark, events, size):
    df = _df(spark, events)
    packed = batch_pack(df, "entity_id", ["arrival"], batch_size=size).collect()
    ids = [i for r in packed for i in json.loads(r.ids_json)]
    # conservation: every id appears exactly as often as in the input
    assert sorted(ids) == sorted(e for e, _, _ in events)
    # bound: every bucket <= size; all but the last bucket full
    sizes = {r.bucket: r.n_ids for r in packed}
    assert all(n <= size for n in sizes.values())
    if sizes:
        full = [b for b, n in sizes.items() if n == size]
        assert len(full) >= len(sizes) - 1


# --- functions library properties (vector math + text sketching) ---

TOKENS = st.lists(
    st.text(alphabet="abcdefghij ", min_size=1, max_size=12).filter(str.strip),
    min_size=1,
    max_size=20,
)
VECS = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False).map(lambda x: round(x, 3)),
    min_size=2,
    max_size=8,
)


@given(tokens=TOKENS)
@_SETTINGS
def test_simhash_is_token_order_independent(spark, tokens):
    """SimHash is a per-bit majority vote over token hashes — permuting
    the tokens must not change the signature (near-dup docs with shuffled
    sentences still collide)."""
    from cdc_dedupe_spark.functions import simhash

    a = " ".join(tokens)
    b = " ".join(reversed(tokens))
    df = spark.createDataFrame([(a, b)], "ta string, tb string")
    r = df.select(
        simhash(F.col("ta")).alias("ha"), simhash(F.col("tb")).alias("hb")
    ).first()
    assert r.ha == r.hb


@given(v=VECS)
@_SETTINGS
def test_cosine_self_similarity_is_one(spark, v):
    from cdc_dedupe_spark.functions import cosine

    if all(abs(x) < 1e-9 for x in v):
        return  # zero vector: cosine undefined
    df = spark.createDataFrame([(v,)], "v array<double>")
    r = df.select(cosine(F.col("v"), F.col("v"), round_digits=6).alias("c")).first()
    assert r.c == 1.0


@given(v=VECS)
@_SETTINGS
def test_dot_scales_linearly(spark, v):
    """dot(2a, b) == 2 * dot(a, b) — exactness of the double fold."""
    from cdc_dedupe_spark.functions import dot

    df = spark.createDataFrame([(v, [2.0 * x for x in v])], "a array<double>, a2 array<double>")
    r = df.select(
        dot(F.col("a"), F.col("a")).alias("d1"), dot(F.col("a2"), F.col("a")).alias("d2")
    ).first()
    assert abs(r.d2 - 2.0 * r.d1) < 1e-9 * max(1.0, abs(r.d1))


@given(text=st.text(alphabet="abcde", min_size=0, max_size=30), n=st.integers(2, 6))
@_SETTINGS
def test_char_shingles_cover_and_bound(spark, text, n):
    """Every shingle is a real substring; count <= max(len - n + 1, 1);
    distinctness holds."""
    from cdc_dedupe_spark.functions import char_shingles

    df = spark.createDataFrame([(text,)], "text string")
    [r] = df.select(char_shingles(F.col("text"), n=n, prefix_len=None).alias("sh")).collect()
    assert len(r.sh) == len(set(r.sh))
    assert len(r.sh) <= max(len(text) - n + 1, 1)
    for sh in r.sh:
        assert sh in text or len(text) < n


def test_approx_distinct_hll_error_bounded(spark, sf_dir):
    """agg_approx_distinct now emits its own audit columns (r13): verify
    them against an INDEPENDENT recomputation — exact_parts must equal
    the recomputed distinct, the engine bound flag must be 1, and the
    portable md5-HLL estimate must equal a pure-Python reimplementation
    of the sketch bit-for-bit (plus, outside the linear-counting regime
    exact > 2.5m where raw HLL is unbiased, a 5-sd statistical bound)."""
    import hashlib

    from cdc_dedupe_spark.queries import REGISTRY
    from cdc_dedupe_spark.queries.sketch import _HLL_M, _HLL_NUM, _HLL_VBITS

    rows = {
        r.l_returnflag: r
        for r in REGISTRY["agg_approx_distinct"].spark(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    groups = {
        r.l_returnflag: (r.n, r.parts)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n"),
            F.collect_set("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(rows) == set(groups)
    for flag, r in rows.items():
        e, parts = groups[flag]
        assert r.exact_parts == e, (flag, r.exact_parts, e)
        assert r.engine_within_3rsd == 1, (flag, r)
        # independent sketch: same hash family, pure Python
        regs = [0] * _HLL_M
        for pk in parts:
            hv = int(hashlib.md5(str(int(pk)).encode()).hexdigest()[:15], 16)
            v = hv >> 8
            rho = _HLL_VBITS if v == 0 else (_HLL_VBITS + 1) - v.bit_length()
            reg = hv % _HLL_M
            if rho > regs[reg]:
                regs[reg] = rho
        s_scaled = sum(1 << (_HLL_VBITS - m) for m in regs)
        expect = round(float(_HLL_NUM) / s_scaled, 1)
        assert abs(r.hll_estimate - expect) < 1e-9, (flag, r.hll_estimate, expect)
        if e > 2.5 * _HLL_M:
            assert abs(r.hll_estimate - e) <= 5 * (1.04 / 16) * e, (flag, r, e)


def test_approx_percentile_rank_error_bounded(spark, sf_dir):
    """agg_approx_percentile now emits its own rank-error audit flags
    (r13): verify them plus the exact value columns against an
    INDEPENDENT recomputation of the interpolated cents percentiles."""
    from cdc_dedupe_spark.queries import REGISTRY

    rows = {
        r.l_returnflag: r
        for r in REGISTRY["agg_approx_percentile"].spark(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    exact = {
        r.l_returnflag: (r.n, r.p50, r.p95)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(cents, 0.5)").alias("p50"),
            F.expr("percentile(cents, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        n, e50, e95 = exact[flag]
        assert r.n_rows == n, (flag, r.n_rows, n)
        assert abs(r.p50_exact - round(e50, 4)) < 1e-6, (flag, r.p50_exact, e50)
        assert abs(r.p95_exact - round(e95, 4)) < 1e-6, (flag, r.p95_exact, e95)
        assert r.p50_rank_ok == 1 and r.p95_rank_ok == 1, (flag, r)


@given(events=EVENTS, size=st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_batch_pack_keyed_bounds_and_conservation(spark, events, size):
    """The declared scalable pack (batch_pack_keyed) must conserve ids and
    honor the <= batch_size bound per bucket — and, per key group, leave at
    most one partial bucket (the reference's only contract is batch SIZE)."""
    from cdc_dedupe_spark.operators.cdc import batch_pack_keyed

    df = _df(spark, events)
    packed = batch_pack_keyed(
        df, "entity_id", F.col("entity_id") % 3, ["arrival"], batch_size=size
    ).collect()
    ids = [i for r in packed for i in json.loads(r.ids_json)]
    assert sorted(ids) == sorted(e for e, _, _ in events)
    assert all(r.n_ids <= size for r in packed)
    by_group: dict[int, list[int]] = {}
    for r in packed:
        by_group.setdefault(r.bucket >> 32, []).append(r.n_ids)
    for sizes in by_group.values():
        assert sum(1 for n in sizes if n < size) <= 1


@given(x=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@_SETTINGS
def test_round_pos_never_emits_negative_zero(spark, x):
    """The signed-zero normalization rule (r4): round_pos output is never
    -0.0 and otherwise bit-equals a plain round."""
    import math

    from cdc_dedupe_spark.queries._determinism import round_pos

    got = (
        spark.range(1)
        .select(round_pos(F.lit(x).cast("double"), 4).alias("r"))
        .first()
        .r
    )
    assert not (got == 0.0 and math.copysign(1.0, got) < 0)
    assert got == round(x, 4) or abs(got - round(x, 4)) < 1e-9


# The alphabet MUST contain every letter of the tokens the canonicalizer
# strips (https, www, utm_) or the property is vacuous — ADVICE r14 found
# the original alphabet could not even spell 'www', so repeated-prefix
# and utm-seam bugs passed unseen. Upper case included: lowercasing is
# part of the chain under test.
_URLISH = st.text(
    alphabet="abchwtpsumWZ0123./?&#=_-:", min_size=0, max_size=60
).map(lambda s: "https://www." + s if len(s) % 3 == 0 else s)

# Every historical counterexample, pinned so the property no longer
# depends on the hypothesis seed:
#   '??', 'a?/'      — r14 tail-strip two-step non-idempotence
#   '//?0'           — r14 one-slash consumption before '?' (VERDICT r14 #1)
#   'https://www.www.x', 'www.https://x' — one-at-a-time prefix anchors
#   '?a=1&ututm_c=2&m_d=3' — unanchored utm removal splicing a new token
#   'utm_a=b&www.x'  — utm removal exposing a would-be-leading 'www.'
#   'x?utm_a=1&utm_b=2&c=3', '?utm_a=1' — consecutive / lone utm params
#   'a&&b', '&&a', 'x/&page=2' — '&'-promotion seams
_CANON_PINNED = [
    "??", "a?/", "//?0", "https://www.www.x", "www.https://x",
    "?a=1&ututm_c=2&m_d=3", "utm_a=b&www.x", "x?utm_a=1&utm_b=2&c=3",
    "?utm_a=1", "a&&b", "&&a", "x/&page=2",
]


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@example(urls=_CANON_PINNED)
@given(urls=st.lists(_URLISH, min_size=1, max_size=24, unique=True))
def test_url_canonicalizer_is_idempotent(spark, urls):
    """canon(canon(x)) == canon(x) for arbitrary URL-ish strings — the
    property that makes the canonical key a stable join/dedup key across
    pipeline stages (a non-idempotent normalizer silently double-strips
    on re-ingest and splits dedupe groups). Exercised over adversarial
    strings (stray separators, empty, fragment-only), not just
    well-formed URLs.

    Why the chain is idempotent, step by step (each later step's output
    is a fixed point of every earlier step):
      1. lower: all steps preserve lowercase.
      2. '#.*$' strip: no later step introduces '#'.
      3. '^((https?://)|(www\\.))+': one alternation pass removes ALL
         leading repetitions; later steps can only change the string
         start to a surviving '?'/'&' (utm removal), '?' (slash
         collapse), or truncate it (tail strip) — never to a scheme.
      4. '[?&]utm_[a-z]+=[^&]*' global: every match consumes from a
         separator to the next '&' or end, so the text following any
         SURVIVING separator (up to the next separator) is untouched —
         no splice can manufacture a new '[?&]utm_' match.
      5. '^([^?&]*)&' -> '\\1?': fires at most once; afterwards a '?'
         precedes every remaining '&', so it can never fire again, and
         the promoted '&' is not followed by 'utm_' (step 4 ran first).
      6. '/+\\?' global: consumes the WHOLE slash run; tail-strip only
         deletes a suffix so it cannot re-adjoin a '/' to a '?'.
      7. '[?&/]+$': one character-class pass strips the entire mixed
         tail, so stripping cannot expose a different tail kind."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.queries.web_dedup import _canon_col

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        _canon_col(F.col("url")).alias("once")
    ).select("once", _canon_col(F.col("once")).alias("twice"))
    rows = out.collect()
    bad = [(r.once, r.twice) for r in rows if r.once != r.twice]
    assert not bad, bad


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@example(urls=_CANON_PINNED)
@given(urls=st.lists(_URLISH, min_size=1, max_size=24, unique=True))
def test_url_canonicalizer_twins_agree_cross_engine(spark, urls):
    """The OTHER canonicalizer property (r15): the Spark column chain and
    the DuckDB oracle SQL must produce byte-identical canonical keys on
    ADVERSARIAL strings, not just the well-formed corpus-derived URLs the
    parity sweep exercises — the regex dialects (Java vs RE2) and the
    backreference escapes ('$1' vs '\\1') differ, so cross-engine drift
    would silently split dedup groups while every committed artifact
    stays green."""
    import duckdb

    from pyspark.sql import functions as F

    from cdc_dedupe_spark.queries.web_dedup import _CANON_SQL, _canon_col

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = {
        r.url: r.c for r in df.select("url", _canon_col(F.col("url")).alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    got_duck = dict(
        con.execute("SELECT url, " + _CANON_SQL.format(url="url") + " FROM t").fetchall()
    )
    assert got_spark == got_duck


# ---------------------------------------------------------------------------
# cdc_merge_apply's merge algebra (round 16)

_MERGE_BASE = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # user_id (collision-heavy)
        st.integers(min_value=1, max_value=5),  # n_versions
        st.integers(min_value=0, max_value=1000),  # last_ts_us
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)
_MERGE_CHG = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=1001, max_value=2000),
        st.sampled_from(["u", "d"]),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(base=_MERGE_BASE, chg=_MERGE_CHG)
@_SETTINGS
def test_merge_into_frame_algebra(spark, base, chg):
    """Property twin of the MERGE rules on arbitrary key-disjoint-per-side
    frames: change-wins resolution, tombstones drop present keys and
    no-op on absent ones, untouched base rows pass through as 'keep',
    and the output key set is exactly (base ∪ upserts) − tombstones."""
    from cdc_dedupe_spark.queries.cdc import merge_into_frame

    cols = "user_id long, n_versions long, last_ts_us long, last_event_id long, last_cents long"
    bdf = spark.createDataFrame(
        [(u, n, t, u * 10, u * 100) for u, n, t in base] or [(0, 1, 0, 0, 0)], cols
    ).filter(F.lit(bool(base)))
    cdf = spark.createDataFrame(
        [(u, n, t, u * 10 + 1, u * 100 + 1, op) for u, n, t, op in chg]
        or [(0, 1, 1001, 1, 1, "u")],
        cols + ", op string",
    ).filter(F.lit(bool(chg)))

    got = {
        r.user_id: (r.n_versions, r.last_ts_us, r.action)
        for r in merge_into_frame(bdf, cdf).collect()
    }
    bm = {u: (n, t) for u, n, t in base}
    expected = {}
    for u, (n, t) in bm.items():
        expected[u] = (n, t, "keep")
    for u, n, t, op in chg:
        if op == "d":
            expected.pop(u, None)
        elif u in bm:
            expected[u] = (bm[u][0] + n, t, "update")
        else:
            expected[u] = (n, t, "insert")
    assert got == expected
