"""Round-9 operator hardening tests: the in-plan kmeans dim tripwire
(construction must launch zero Spark jobs; a wrong-dim corpus must still
fail loudly) and the corpus-adaptive LSH plane count (sizing rule +
backward-compatible bucketing at the verified scale factors).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_dedupe_spark.queries import REGISTRY


def _write_embeddings(tmp_path, dim: int, n: int = 16) -> str:
    vecs = [[((i * 31 + j * 7) % 13 - 6) / 7.0 for j in range(dim)] for i in range(n)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_kmeans_construction_launches_no_jobs(spark, sf_dir):
    """Building the ml_kmeans_train plan must be fully lazy: the r8 dim
    tripwire ran a driver-side .collect() during construction — one whole
    extra Spark job per run, a corpus-scan at 100 TB (VERDICT r8 item 2).
    The guard is now an in-plan assert on the broadcast seed row."""
    from cdc_dedupe_spark.tables import table

    sc = spark.sparkContext
    # Baseline: a bare parquet read costs one driver-side schema job.
    sc.setJobGroup("km-probe-read", "plain read baseline")
    try:
        table(spark, sf_dir, "embeddings")
    finally:
        sc.setJobGroup(None, None)
    baseline = len(sc.statusTracker().getJobIdsForGroup("km-probe-read"))
    sc.setJobGroup("km-probe-build", "kmeans lazy-construction pin")
    try:
        df = REGISTRY["ml_kmeans_train"].spark(spark, sf_dir)
    finally:
        sc.setJobGroup(None, None)
    built = len(sc.statusTracker().getJobIdsForGroup("km-probe-build"))
    # construction adds ZERO jobs beyond the unavoidable schema read
    # (r8's .collect() tripwire made this baseline + 1)
    assert built == baseline
    # and the guarded plan still computes the same 8 clusters
    assert df.count() == 8


def test_kmeans_wrong_dim_fails_loudly(spark, tmp_path):
    """A generator dim change must raise with the _KM_DIM message, not
    silently NULL the centroids (the tripwire's whole point) — now from
    inside the plan instead of a pre-flight job."""
    sf = _write_embeddings(tmp_path, dim=3)
    df = REGISTRY["ml_kmeans_train"].spark(spark, sf)
    with pytest.raises(Exception, match="expects embedding dim"):
        df.collect()


# --- corpus-adaptive LSH plane count (VERDICT r8 "What's wrong" #1) --------


def test_lsh_shift_sizing_rule_matches_sql_twin(spark):
    """P = clamp(ceil(log2(n/8)), 6, 18) via integer CASE chains — pinned
    against hand-computed values AND against the DuckDB twin, across the
    clamp floor, interior powers of two, and the ceiling."""
    import duckdb

    from pyspark.sql import functions as F

    from cdc_dedupe_spark.functions.vector import lsh_shift, sql_lsh_shift

    cases = {  # n -> expected P
        1: 6, 100: 6, 512: 6, 513: 7, 1024: 7, 2000: 8, 4096: 9,
        5000: 10, 8192: 10, 100_000: 14, 2_000_000: 18, 10**9: 18,
    }
    df = spark.createDataFrame([(n,) for n in cases], "n long")
    got = {r.n: 18 - r.sh for r in df.select("n", lsh_shift(F.col("n")).alias("sh")).collect()}
    assert got == cases
    con = duckdb.connect()
    for n, p in cases.items():
        (sh,) = con.execute(f"SELECT {sql_lsh_shift(str(n))}").fetchone()
        assert 18 - sh == p, f"sql twin disagrees at n={n}"


def test_lsh_buckets_backward_compatible_at_clamp_floor(spark, sf_dir):
    """At the n=500 parity corpora P clamps to 6 and the adaptive bucket
    (top 6 bits of the 18-plane signature) must be BIT-IDENTICAL to the
    historical fixed-6-plane bucket — the nesting property that keeps
    every committed parity artifact valid."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.functions.vector import iscale, lsh_bucket
    from cdc_dedupe_spark.queries.llm_ext import _lsh_projection
    from cdc_dedupe_spark.tables import table

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    adaptive = _lsh_projection(e, with_norm=False)
    legacy = e.select(
        "vec_id", lsh_bucket(iscale(F.col("embedding")), 6).alias("legacy_bucket")
    )
    diff = (
        adaptive.join(legacy, "vec_id")
        .filter(F.col("bucket") != F.col("legacy_bucket"))
        .count()
    )
    assert diff == 0


def test_plane_sign_python_matches_sql_formula():
    """The Spark side bakes plane signs from plane_sign_value into literal
    tables while the DuckDB twin spells the arithmetic out — this pins the
    two routes to identical values over every (plane, position) the
    oracles can touch."""
    import duckdb

    from cdc_dedupe_spark.functions.vector import plane_sign_value, sql_lsh_bucket

    con = duckdb.connect()
    # recover plane p's per-position sign from the (p+1)-plane bucket of a
    # one-hot vector: plane p is the bucket's LSB, set iff sign >= 0
    for p in range(18):
        expr = sql_lsh_bucket("__v__", planes=p + 1)
        for i in [0, 1, 7, 15, 63, 255, 511]:
            vec = "[" + ",".join("1" if j == i else "0" for j in range(i + 1)) + "]"
            (b,) = con.execute(f"SELECT {expr.replace('__v__', vec)}").fetchone()
            sql_sign = 1 if (b & 1) == 1 else -1
            assert sql_sign == plane_sign_value(p, i), f"plane {p} pos {i}"


def test_planes_are_decorrelated():
    """The r8 linear plane mix produced near-duplicate planes (pairwise
    |corr| up to 1.0 at dim 16, 0.94 at dim 64), collapsing the effective
    plane count; the xor-shift mixer keeps every pair of the 18 planes
    below |corr| 0.5 at dim 64."""
    import itertools

    from cdc_dedupe_spark.functions.vector import plane_sign_value

    dim = 64
    planes = [[plane_sign_value(p, i) for i in range(dim)] for p in range(18)]
    worst = max(
        abs(sum(x * y for x, y in zip(a, b))) / dim
        for a, b in itertools.combinations(planes, 2)
    )
    assert worst < 0.5, f"max pairwise |corr| {worst}"


def test_lsh_occupancy_tracks_target_on_spread_corpus(spark, tmp_path):
    """On a corpus with well-spread sign patterns, the sizing rule holds
    expected occupancy near the target (8): n=4096 -> P=9 -> 512 buckets.
    Real data can still concentrate (true near-dups SHOULD share a
    bucket), so this pins the rule's behavior where occupancy is
    controllable — the random-collision component of the self-join."""
    import math

    from pyspark.sql import functions as F

    from cdc_dedupe_spark.queries.llm_ext import _lsh_projection
    from cdc_dedupe_spark.tables import table

    import numpy as np

    n, dim = 4096, 16
    # Seeded Gaussian vectors: isotropic, so hyperplane sign patterns are
    # ~uniform (an integer-mix generator here resonates with the plane
    # constants and collapses onto a handful of sign patterns).
    vecs = np.random.default_rng(7).normal(size=(n, dim)).astype("float32")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    bk = _lsh_projection(
        table(spark, str(tmp_path), "embeddings").select("vec_id", "embedding"),
        with_norm=False,
    )
    occ = bk.groupBy("bucket").count()
    stats = occ.agg(
        F.count("*").alias("n_buckets"),
        F.max("bucket").alias("max_bucket"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
    ).collect()[0]
    assert stats.max_bucket < 512  # P=9 at n=4096
    # a healthy fraction of the 512 buckets populated, and the candidate
    # self-join stays near n * occupancy/2 — not n²/buckets-at-fixed-P
    assert stats.n_buckets > 128
    assert stats.pairs < 40 * n  # vs C(4096,2)/64 ≈ 131k pairs at fixed P=6
    assert math.isfinite(stats.pairs)


# --- round-9 operator semantics (hand-computed / independent-impl) ---------


def test_cms_estimates_are_one_sided(spark, sf_dir):
    """The CMS guarantee is one-sided: an estimate can only OVERcount
    (every row's counter is incremented by every colliding token). A
    negative overcount anywhere means the sketch or the probe hashes
    diverged — the invariant neither the query nor its oracle can satisfy
    by accident if either drifts."""
    rows = REGISTRY["agg_cms_heavy_hitters"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.cms_est == r.n_true + r.overcount for r in rows)


def test_hll_estimate_within_theory(spark, sf_dir):
    """HLL raw estimate vs the exact distinct count: m=256 gives a
    1.04/sqrt(m) = 6.5% theoretical sd; pin a 3-sigma-ish 15% band. This
    is what caught the avalanche-free token_hash_wide (6.9x off) during
    round 9."""
    (row,) = REGISTRY["agg_hll_registers"].spark(spark, sf_dir).collect()
    assert row.true_distinct > 2.5 * row.m, "corpus too small for the raw-HLL regime"
    rel = abs(row.hll_raw_estimate - row.true_distinct) / row.true_distinct
    assert rel < 0.15, f"HLL rel err {rel:.3f} (est {row.hll_raw_estimate} vs {row.true_distinct})"


def test_minhash_cluster_hand_case(spark, tmp_path):
    """Two byte-identical docs must cluster together under the min-id
    keeper; a distinct doc stays a singleton."""
    from tests.test_round8_ops import _write_documents

    same = "spark batch stream filter merge group column order value quick"
    other = "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo nnn mmm lll"
    _write_documents(
        tmp_path,
        [(0, same, "en", "src0"), (1, same, "en", "src1"), (2, other, "en", "src2")],
    )
    rows = {r.doc_id: r for r in REGISTRY["dedup_minhash_cluster"].spark(spark, str(tmp_path)).collect()}
    assert rows[0].cluster_id == 0 and rows[0].is_keeper == 1
    assert rows[1].cluster_id == 0 and rows[1].is_keeper == 0
    assert rows[2].cluster_id == 2 and rows[2].is_keeper == 1


def test_pq_encode_code_range_and_err_nonnegative(spark, sf_dir):
    """Round 10 trains the codebook (one Lloyd update), so the r9
    invariant "seed vectors 0..15 reconstruct with zero error" no longer
    holds — a seed vector's subvector is generally NOT its cluster's
    integer mean. The surviving structural invariants: packed codes fit
    in 8 nibbles, reconstruction error is non-negative everywhere, and
    the TRAINED codebook's total error strictly beats the seed rule
    (tests/test_round10_ops.py pins the improvement)."""
    rows = REGISTRY["vec_pq_encode"].spark(spark, sf_dir).collect()
    assert all(0 <= r.pq_code < 16**8 for r in rows)
    assert all(r.recon_err >= 0 for r in rows)
    assert len(rows) == len({r.vec_id for r in rows})


def test_anomaly_mad_matches_independent_pandas(spark, sf_dir):
    """Recompute median/MAD flags in pandas (independent implementation)
    and compare every flag — the cross-check discipline graph_pagerank
    uses, guarding against the query and oracle drifting together."""
    df = REGISTRY["events_anomaly_mad"].spark(spark, sf_dir).toPandas()
    for et, g in df.groupby("event_type"):
        med = g.n_events.median()
        mad = (g.n_events - med).abs().median()
        expect = ((mad > 0) & ((g.n_events - med).abs() > 3 * mad)).astype(int)
        assert (g.med == med).all() and (g.mad == mad).all(), et
        assert (g.is_anomaly == expect).all(), et


def test_bloom_prefilter_actually_filters(spark, sf_dir):
    """The oracle proves result == plain join (no false negatives); this
    pins the other half — the map-side bloom really DISCARDS fact rows
    before the join (otherwise the operator is a plain join wearing a
    costume). With 10 of ~100 suppliers selected, the candidate set must
    sit strictly between the true-match count and the full fact table."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.queries.relational_ext import _BLOOM_A, _bloom_pos
    from cdc_dedupe_spark.tables import table

    sup = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 9).select("s_suppkey")
    bloom = F.broadcast(
        sup.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("s_suppkey"), j) for j in range(len(_BLOOM_A))])
            ).alias("p")
        ).agg(F.array_sort(F.collect_set("p")).alias("bits"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_suppkey")
    probe_ok = None
    for j in range(len(_BLOOM_A)):
        hit = F.array_contains(F.col("bits"), _bloom_pos(F.col("l_suppkey"), j))
        probe_ok = hit if probe_ok is None else (probe_ok & hit)
    n_fact = li.count()
    n_cand = li.crossJoin(bloom).filter(probe_ok).count()
    n_true = li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")).count()
    assert n_true <= n_cand < n_fact, (n_true, n_cand, n_fact)


def test_pq_encode_wrong_dim_fails_loudly(spark, tmp_path):
    """A non-64-dim corpus must raise (subvector slices would silently
    zip against NULLs and corrupt codes otherwise)."""
    sf = _write_embeddings(tmp_path, dim=12)
    df = REGISTRY["vec_pq_encode"].spark(spark, sf)
    with pytest.raises(Exception, match="expects embedding dim"):
        df.collect()


def test_stream_bloom_dedupe_guarantees(spark, sf_dir):
    """Bloom-state streaming dedupe: (a) a kept key never appears twice
    (the at-most-once-per-key guarantee — false positives only DROP);
    (b) recall stays near 1 at this density (1 KiB bloom per shard, ~10
    keys/shard at sf0.001: expected fp ~0); (c) output keys are a subset
    of the true key set."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.tables import table

    out = REGISTRY["stream_bloom_dedupe"].spark(spark, sf_dir).toPandas()
    assert not out.duplicated(["key_hash"]).any()
    truth = (
        table(spark, sf_dir, "events")
        .select("user_id", F.xxhash64("user_id", "event_type").alias("kh"))
        .distinct()
        .toPandas()
    )
    true_keys = set(truth.kh)
    kept = set(out.key_hash)
    assert kept <= true_keys
    assert len(kept) >= 0.97 * len(true_keys), (len(kept), len(true_keys))


def test_ewma_matches_independent_fold(spark, sf_dir):
    """Recompute the alpha=1/2 EWMA with a plain python loop over the
    hourly rollup (independent implementation) and compare every type."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.tables import table

    got = {r.event_type: r for r in REGISTRY["ts_ewma_hourly"].spark(spark, sf_dir).collect()}
    roll = (
        table(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_micros(ts) div 3600000000").alias("b"))
        .groupBy("event_type", "b")
        .count()
        .orderBy("event_type", "b")
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in roll:
        series.setdefault(r.event_type, []).append(r["count"])
    for et, xs in series.items():
        y = float(xs[0])
        for x in xs[1:]:
            y = (float(x) + y) / 2
        assert got[et].n_buckets == len(xs)
        assert abs(got[et].ewma - round(y, 6)) < 1e-9, et


def test_welch_t_matches_independent_formula(spark, sf_dir):
    """Recompute Welch's t / df from raw cents in python and compare."""
    import math

    from pyspark.sql import functions as F

    from cdc_dedupe_spark.tables import table

    (row,) = REGISTRY["stats_two_sample"].spark(spark, sf_dir).collect()
    vals = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", F.round(F.col("value") * 100).cast("long").alias("c"))
        .collect()
    )
    groups: dict[str, list[int]] = {"click": [], "purchase": []}
    for r in vals:
        groups[r.event_type].append(r.c)
    stats = {}
    for k, xs in groups.items():
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        stats[k] = (n, m, v)
    (n1, m1, v1), (n2, m2, v2) = stats["click"], stats["purchase"]
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.t_welch - t) < 1e-4
    assert abs(row.df_welch - df) < 0.5


def test_fuzzy_band_hand_case(spark, tmp_path):
    """Hand-computed fuzzy-join semantics on a four-name corpus: only
    same-band pairs within edit distance 1 match."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    tbl = _pa.table(
        {
            "c_custkey": _pa.array([1, 2, 3, 4], _pa.int64()),
            "c_name": _pa.array(["Cust#0011", "Cust#0012", "Cust#0022", "Zust#0013"]),
            "c_nationkey": _pa.array([0, 0, 0, 0], _pa.int32()),
            "c_acctbal": _pa.array([0.0, 0.0, 0.0, 0.0]),
            "c_mktsegment": _pa.array(["A", "A", "A", "A"]),
        }
    )
    _pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    rows = {(r.key_a, r.key_b): r.dist for r in REGISTRY["join_fuzzy_band"].spark(spark, str(tmp_path)).collect()}
    # band "Cust#00" holds keys 1,2,3; "Zust#00" holds 4 alone.
    # (1,2): 0011/0012 dist 1 -> match; (2,3): 0012/0022 dist 1 -> match;
    # (1,3): 0011/0022 dist 2 -> gated out; (x,4): different band
    assert rows == {(1, 2): 1, (2, 3): 1}


def test_quality_gate_hand_cases(spark, tmp_path):
    """Each rule exercised by a crafted document: short, stopword-free,
    repetitive, and a clean keeper; the reasons bitmask attributes every
    firing rule."""
    from tests.test_round8_ops import _write_documents

    short = "one two three"  # 3 tokens -> R1 (1)
    no_stop = " ".join(f"w{i}" for i in range(40))  # 0 stopwords -> R3 (4)
    repetitive = " ".join(["the dup"] * 30)  # 2 types / 60 tokens -> R4 (8)
    clean = " ".join((["the", "a", "of", "and"] * 2) + [f"u{i}" for i in range(22)])
    _write_documents(
        tmp_path,
        [(0, short, "en", "s"), (1, no_stop, "en", "s"), (2, repetitive, "en", "s"), (3, clean, "en", "s")],
    )
    rows = {r.doc_id: r for r in REGISTRY["pipeline_quality_gate"].spark(spark, str(tmp_path)).collect()}
    assert rows[0].reasons & 1 and rows[0].keep == 0
    assert rows[1].reasons == 4 and rows[1].keep == 0
    # 60 tokens of 2 types: repetition fires; stopword density is 50% so R3 off
    assert rows[2].reasons == 8 and rows[2].keep == 0
    assert rows[3].reasons == 0 and rows[3].keep == 1


def test_lsh_bucket_nesting_across_p_boundary(spark, tmp_path):
    """Growing a corpus across a sizing-rule boundary (n=500 -> P=6,
    n=600 -> P=7) REFINES the buckets: for the vectors present in both,
    the coarse bucket is exactly the fine bucket >> 1 (the signature-
    prefix property that makes incremental re-bucketing a split, never
    a reshuffle of unrelated vectors)."""
    import numpy as np

    from pyspark.sql import functions as F

    from cdc_dedupe_spark.queries.llm_ext import _lsh_projection
    from cdc_dedupe_spark.tables import table

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(600, 16)).astype("float32")

    def write(n, sub):
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([list(v) for v in vecs[:n]], pa.list_(pa.float32())),
                }
            ),
            str(d / "embeddings.parquet"),
        )
        return str(d)

    small = write(500, "small")
    big = write(600, "big")
    bk_s = _lsh_projection(
        table(spark, small, "embeddings").select("vec_id", "embedding"), with_norm=False
    ).select("vec_id", F.col("bucket").alias("b6"))
    bk_b = _lsh_projection(
        table(spark, big, "embeddings").select("vec_id", "embedding"), with_norm=False
    ).select("vec_id", F.col("bucket").alias("b7"))
    joined = bk_s.join(bk_b, "vec_id")
    assert joined.count() == 500
    assert joined.filter(F.shiftright("b7", 1) != F.col("b6")).count() == 0
    # and the fine side really uses one more bit
    assert bk_b.agg(F.max("b7")).first()[0] >= 64


def test_label_prop_hand_case(spark, tmp_path):
    """Independent pure-python LPA on the same edge set must agree with
    the Spark result (the graph_pagerank cross-check discipline)."""
    from pyspark.sql import functions as F

    from cdc_dedupe_spark.queries.llm_ext import _knn_edges

    sf = "/root/testdata/sf0.001"
    edges = [(r.vec_id, r.nbr_id) for r in _knn_edges(spark, sf).select("vec_id", "nbr_id").collect()]
    und = set()
    nodes = set()
    for a, b in edges:
        und.add((a, b)); und.add((b, a)); nodes.add(a); nodes.add(b)
    from cdc_dedupe_spark.tables import table

    all_nodes = [r.vec_id for r in table(spark, sf, "embeddings").select("vec_id").collect()]
    lbl = {v: v for v in all_nodes}
    for _ in range(2):
        cnt: dict[tuple[int, int], int] = {}
        for v, u in und:
            cnt[(v, lbl[u])] = cnt.get((v, lbl[u]), 0) + 1
        new = dict(lbl)
        byv: dict[int, list[tuple[int, int]]] = {}
        for (v, l), c in cnt.items():
            byv.setdefault(v, []).append((-c, l))
        for v, cands in byv.items():
            new[v] = min(cands)[1]
        lbl = new
    got = {r.vec_id: r.community for r in REGISTRY["graph_label_prop"].spark(spark, sf).collect()}
    assert got == lbl
