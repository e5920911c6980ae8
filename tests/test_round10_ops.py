"""Round-10 hardening units: the four ADVICE r9 fixes.

Each fix changed BOTH engine twins (or a shared helper); parity is pinned
by the sweep — these tests pin the degenerate/boundary behavior the sweep
corpus never exercises.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cdc_dedupe_spark.queries import REGISTRY


# --- ADVICE #1: HLL rho clamp ----------------------------------------------


def test_hll_rho_clamped_at_vbits(spark):
    """rho(v=0) must be 52 (clamped), not 53: the 2^52-scaled sum term for
    rho is shiftleft(1, 52 - rho), and rho = 53 would shift by -1, which
    Spark masks mod 64 into 1<<63 (sum corruption) while DuckDB errors —
    the scheme cannot represent its own maximum."""
    from cdc_dedupe_spark.queries.sketch import _HLL_VBITS, _hll_rho

    df = spark.createDataFrame(
        [Row(v=0), Row(v=1), Row(v=2), Row(v=(1 << 51))]
    ).select("v", _hll_rho(F.col("v")).alias("r"))
    got = {r["v"]: r["r"] for r in df.collect()}
    assert got[0] == _HLL_VBITS  # clamped (true rho is 53)
    assert got[1] == _HLL_VBITS  # 51 leading zeros + 1
    assert got[2] == _HLL_VBITS - 1
    assert got[1 << 51] == 1
    # Every rho the expression can produce keeps the scaled term a
    # representable positive BIGINT.
    terms = df.select(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_VBITS} - r AS INT))").alias("t")
    ).collect()
    assert all(0 < row["t"] <= (1 << _HLL_VBITS) for row in terms)


# --- ADVICE #2: bloom sized from the build side -----------------------------


def test_bloom_m_scales_with_build_keys():
    from cdc_dedupe_spark.queries.relational_ext import (
        _BLOOM_M_MAX,
        _BLOOM_M_MIN,
        _bloom_m_for,
    )

    assert _bloom_m_for(0) == _BLOOM_M_MIN
    assert _bloom_m_for(10) == _BLOOM_M_MIN  # 160 bits wanted, floor wins
    assert _bloom_m_for(100) == 2048  # 1600 -> next pow2
    assert _bloom_m_for(400) == 8192  # sf1's ~400 suppliers/nation (ADVICE r9)
    assert _bloom_m_for(10**9) == _BLOOM_M_MAX  # clamped
    # monotone, powers of two
    prev = 0
    for n in [1, 50, 100, 400, 5000, 100000]:
        m = _bloom_m_for(n)
        assert m >= prev and (m & (m - 1)) == 0
        prev = m


def test_bloom_not_saturated_at_sized_m():
    """The r9 bug shape: n ~ m/k keys set nearly every bit, so the filter
    passed everything. At the sized m the set-bit fraction must stay well
    under saturation (theory: 1 - e^(-k*n/m) ~ 17% at 16 bits/key)."""
    from cdc_dedupe_spark.queries.relational_ext import (
        _BLOOM_A,
        _BLOOM_B,
        _BLOOM_P,
        _bloom_m_for,
    )

    n = 1200  # the sf1 scale the ADVICE called out against fixed m=1024
    m = _bloom_m_for(n)
    bits = set()
    for key in range(1, n + 1):
        for a, b in zip(_BLOOM_A, _BLOOM_B):
            bits.add(((key % _BLOOM_P * a + b) % _BLOOM_P) % m)
    frac = len(bits) / m
    assert frac < 0.30, f"bloom saturated: {frac:.2f} of {m} bits set"
    # and the old fixed floor really WAS saturated at this n — the bug
    # existed, the fix is load-bearing
    bits_old = set()
    for key in range(1, n + 1):
        for a, b in zip(_BLOOM_A, _BLOOM_B):
            bits_old.add(((key % _BLOOM_P * a + b) % _BLOOM_P) % 1024)
    assert len(bits_old) / 1024 > 0.90


# --- trained PQ codebook (VERDICT r9 item 4) --------------------------------


def test_pq_training_strictly_reduces_recon_err(spark, sf_dir):
    """One per-subspace Lloyd update must strictly reduce TOTAL integer
    reconstruction error vs the r9 first-16-vectors seed rule (Lloyd's
    assignment and mean steps are both non-increasing; on a real corpus
    the drop is strict)."""
    from cdc_dedupe_spark.functions.vector import il2, iscale
    from cdc_dedupe_spark.queries.llm_ext import _PQ_K, _PQ_SUB_DIM, _PQ_SUBS
    from cdc_dedupe_spark.tables import table

    trained = (
        REGISTRY["vec_pq_encode"]
        .spark(spark, sf_dir)
        .agg(F.sum("recon_err").alias("t"))
        .collect()[0]["t"]
    )

    # seed-rule reconstruction error, computed independently of the query
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sc_df = e.select("vec_id", iscale(F.col("embedding")).alias("se"))
    cb = sc_df.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("se").alias("ce")
    )
    cb_row = cb.agg(F.array_sort(F.collect_list(F.struct("cid", "ce"))).alias("cents"))

    def seed_d(s):
        lo = s * _PQ_SUB_DIM + 1
        return F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    il2(
                        F.slice(F.col("se"), lo, _PQ_SUB_DIM),
                        F.slice(c["ce"], lo, _PQ_SUB_DIM),
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        )["d"]

    seed = (
        sc_df.crossJoin(F.broadcast(cb_row))
        .select(sum([seed_d(s) for s in range(1, _PQ_SUBS)], seed_d(0)).alias("err"))
        .agg(F.sum("err").alias("t"))
        .collect()[0]["t"]
    )
    assert trained < seed, (trained, seed)
    assert trained > 0


# --- ann_ivfpq_topk: independent numpy reimplementation ---------------------


def test_ivfpq_matches_independent_numpy_impl(spark, sf_dir):
    """Full independent twin of the IVF-PQ read path in numpy (scaled ints
    fetched via the shared DuckDB ISCALE expression so rounding semantics
    are not re-derived here): coarse cells, one Lloyd update per subspace
    (trunc-toward-zero integer means), candidate codes, ADC lookup sums,
    top-5 by (adc, vec_id). Catches any drift in either engine twin that
    they might share."""
    import numpy as np

    from cdc_dedupe_spark.functions.vector import SQL_ISCALE
    from cdc_dedupe_spark.queries.llm_ext import (
        _IVFPQ_CELLS,
        _IVFPQ_TOPK,
        _PQ_K,
        _PQ_SUB_DIM,
        _PQ_SUBS,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, {SQL_ISCALE.format(a='embedding')} AS se "
        f"FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    se = np.array([r[1] for r in rows], dtype=np.int64)
    assert (ids == np.arange(len(ids))).all()

    def l2(a, b):
        d = a - b
        return int((d * d).sum())

    # coarse cells: nearest of the first 8 full vectors, ties to lowest cid
    cents = se[:_IVFPQ_CELLS]
    cells = np.array(
        [min(range(_IVFPQ_CELLS), key=lambda c: (l2(v, cents[c]), c)) for v in se]
    )
    # trained codebook: seed = first-16 subvectors, one Lloyd update
    subs = se.reshape(len(se), _PQ_SUBS, _PQ_SUB_DIM)
    cb = {}
    for s in range(_PQ_SUBS):
        seed = subs[:_PQ_K, s, :]
        assign = np.array(
            [min(range(_PQ_K), key=lambda c: (l2(v, seed[c]), c)) for v in subs[:, s, :]]
        )
        for cid in sorted(set(assign.tolist())):
            members = subs[assign == cid, s, :]
            mean = np.trunc(members.sum(axis=0) / len(members)).astype(np.int64)
            cb[(s, cid)] = mean
    # probe LUT + candidate ADC
    probe = subs[0]
    lut = {k: l2(probe[k[0]], ce) for k, ce in cb.items()}
    cand_ids = [int(i) for i in ids if cells[i] == cells[0] and i != 0]
    scored = []
    for i in cand_ids:
        adc = 0
        for s in range(_PQ_SUBS):
            entries = sorted(c for (si, c) in cb if si == s)
            code = min(entries, key=lambda c: (l2(subs[i, s, :], cb[(s, c)]), c))
            adc += lut[(s, code)]
        scored.append((adc, i))
    expected = sorted(scored)[:_IVFPQ_TOPK]

    got = [
        (r.adc_d, r.vec_id)
        for r in REGISTRY["ann_ivfpq_topk"].spark(spark, sf_dir).collect()
    ]
    assert got == expected, (got, expected)


# --- dedup_minhash_incremental: contract units ------------------------------


def test_minhash_incremental_contract(spark, sf_dir):
    """(a) one output row per incoming doc; (b) is_new_cluster == 1 exactly
    when cluster_id == doc_id (assigned docs always point at a SNAPSHOT
    label, and snapshot ids are disjoint from incoming ids by the 80/20
    rule); (c) refinement: docs the incremental pass assigns to an
    existing cluster must land in the same component as that cluster in
    the FULL dedup_minhash_cluster run (the full closure only merges
    more, never less)."""
    from cdc_dedupe_spark.tables import table

    out = REGISTRY["dedup_minhash_incremental"].spark(spark, sf_dir).toPandas()
    n_incoming = (
        table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 >= 8).count()
    )
    assert len(out) == n_incoming
    for r in out.itertuples():
        if r.is_new_cluster:
            assert r.cluster_id == r.doc_id
        else:
            assert r.cluster_id % 10 < 8  # a snapshot label

    full = {
        r.doc_id: r.cluster_id
        for r in REGISTRY["dedup_minhash_cluster"].spark(spark, sf_dir).collect()
    }
    assigned = out[out.is_new_cluster == 0]
    assert len(assigned) > 0, "corpus has no cross-split near-dups; test is vacuous"
    for r in assigned.itertuples():
        assert full[r.doc_id] == full[r.cluster_id], (
            r.doc_id,
            r.cluster_id,
            full[r.doc_id],
            full[r.cluster_id],
        )


# --- ADVICE #3: fuzzy band clamp on short names -----------------------------


def test_fuzzy_band_survives_short_names(spark, tmp_path):
    """Sub-2-char names pass a negative length to substr: Spark returns ''
    but DuckDB substr RAISES — both engines must stay total and agree."""
    rows = [
        Row(c_custkey=1, c_name="A"),
        Row(c_custkey=2, c_name="AB"),
        Row(c_custkey=3, c_name="AC"),
        Row(c_custkey=4, c_name="Customer#1"),
        Row(c_custkey=5, c_name="Customer#2"),
    ]
    pq = str(tmp_path / "customer.parquet")
    spark.createDataFrame(rows).coalesce(1).write.parquet(pq)

    sdf = REGISTRY["join_fuzzy_band"].spark(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{pq}/*.parquet'")
    odf = con.execute(REGISTRY["join_fuzzy_band"].oracle).df()
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.values.tolist() == o.values.tolist()
    # 1-char name bands to '' alongside the 2-char names; dist<=1 pairs
    # among {A, AB, AC} are exactly (A,AB), (A,AC) — (AB,AC) has dist 1
    # too, so all three must surface; the clamp didn't just avoid the
    # error, it kept the short names IN the candidate space.
    pairs = {(r.key_a, r.key_b) for r in sdf.itertuples()}
    assert {(1, 2), (1, 3), (2, 3)} <= pairs


# --- ADVICE #4: stats_two_sample degenerate tripwire ------------------------


def _write_events(spark, tmp_path, rows):
    pq = str(tmp_path / "events.parquet")
    spark.createDataFrame(rows).coalesce(1).write.parquet(pq)
    return pq


_T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
_EV = [  # healthy corpus: both groups, n >= 2 (ts present: table() normalizes it)
    Row(event_id=1, user_id=1, event_type="click", value=1.0, ts=_T0),
    Row(event_id=2, user_id=1, event_type="click", value=2.0, ts=_T0),
    Row(event_id=3, user_id=2, event_type="purchase", value=3.0, ts=_T0),
    Row(event_id=4, user_id=2, event_type="purchase", value=5.0, ts=_T0),
]


@pytest.mark.parametrize(
    "drop",
    [
        "purchase_group",  # absent group -> would be silently empty
        "purchase_tail",  # single-row group -> var_c division by zero
    ],
)
def test_stats_two_sample_degenerate_raises(spark, tmp_path, drop):
    if drop == "purchase_group":
        rows = [r for r in _EV if r.event_type == "click"]
    else:
        rows = _EV[:3]
    pq = _write_events(spark, tmp_path, rows)

    with pytest.raises(Exception, match="stats_two_sample needs both"):
        REGISTRY["stats_two_sample"].spark(spark, str(tmp_path)).collect()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}/*.parquet'")
    with pytest.raises(Exception, match="stats_two_sample needs both"):
        con.execute(REGISTRY["stats_two_sample"].oracle).df()


def test_stats_two_sample_healthy_passes_guard(spark, tmp_path):
    pq = _write_events(spark, tmp_path, _EV)
    sdf = REGISTRY["stats_two_sample"].spark(spark, str(tmp_path)).toPandas()
    assert len(sdf) == 1
    assert sdf.loc[0, "n1"] == 2 and sdf.loc[0, "n2"] == 2
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}/*.parquet'")
    odf = con.execute(REGISTRY["stats_two_sample"].oracle).df()
    cols = sorted(sdf.columns)
    assert sdf[cols].values.tolist() == odf[cols].values.tolist()


# --- round-10 surface additions: independent-implementation twins -----------


def test_priority_sample_matches_flat_topk(spark, sf_dir):
    """Independent twin of sample_priority_weighted: fetch the portable
    hash per doc via the shared DuckDB expression (not re-derived), then
    compute the FLAT per-source top-k and the DLT estimator in pure
    Python — the Spark side computes the same thing through the salted
    two-phase prune, so equality proves the prune loses nothing."""
    from cdc_dedupe_spark.functions.text import SQL_TOKEN_HASH_WIDE
    from cdc_dedupe_spark.queries.curation import _PRIO_K

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, doc_id, n_chars, "
        f"{SQL_TOKEN_HASH_WIDE.format(t='md5(text)')} AS h "
        f"FROM '{sf_dir}/documents.parquet' WHERE n_chars > 0"
    ).fetchall()
    by_source = {}
    for source, doc_id, n_chars, h in rows:
        by_source.setdefault(source, []).append((h / n_chars, doc_id, n_chars))
    expected = {}
    for source, docs in by_source.items():
        docs.sort()
        tau_inv = docs[_PRIO_K][0] if len(docs) > _PRIO_K else None
        for rk, (inv, doc_id, w) in enumerate(docs[:_PRIO_K], start=1):
            w_hat = float(w) if tau_inv is None else max(float(w), 1.0 / tau_inv)
            expected[(source, doc_id)] = (rk, round(w_hat, 4) + 0.0)

    got = REGISTRY["sample_priority_weighted"].spark(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.source, r.doc_id)] == (r.rk, r.w_hat), r


def test_path_transitions_independent_pandas(spark, sf_dir):
    """Pandas/Counter twin of events_path_transitions, plus the row-level
    invariant that floors make probabilities sum to just under 1e6."""
    from collections import Counter

    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    cnt = Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    totals = Counter()
    for (a, _), n in cnt.items():
        totals[a] += n

    got = REGISTRY["events_path_transitions"].spark(spark, sf_dir).collect()
    assert {(r.from_type, r.to_type): r.n_trans for r in got} == dict(cnt)
    import math

    for r in got:
        assert r.prob_ppm == math.floor(1e6 * cnt[(r.from_type, r.to_type)] / totals[r.from_type])
    by_from = Counter()
    n_to = Counter()
    for r in got:
        by_from[r.from_type] += r.prob_ppm
        n_to[r.from_type] += 1
    for f, s in by_from.items():
        assert 1_000_000 - n_to[f] <= s <= 1_000_000


def test_hll_intersect_matches_pure_python_sketch(spark, sf_dir):
    """Full independent twin of agg_hll_intersect from hashlib.md5 up:
    registers, scaled sums, and the exact intersection — pinning the
    sketch bits, not the (small-range-biased) estimate. Also pins the
    merge laws: the union register sum is <= each side's (more distinct
    keys can only raise register maxima)."""
    import hashlib

    import pandas as pd

    from cdc_dedupe_spark.queries.sketch import _HLL_M, _HLL_VBITS

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    keys = {
        g: {f"{u}|{t.strftime('%Y-%m-%d')}" for u, t in zip(d.user_id, d.ts)}
        for g, d in ev.groupby("event_type")
    }

    def s_scaled(s: set) -> int:
        regs = {}
        for k in s:
            hv = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
            reg, v = hv % _HLL_M, hv >> 8
            r = _HLL_VBITS if v == 0 else _HLL_VBITS + 1 - v.bit_length()
            regs[reg] = max(regs.get(reg, 0), r)
        return sum(1 << (_HLL_VBITS - m) for m in regs.values()) + (
            _HLL_M - len(regs)
        ) * (1 << _HLL_VBITS)

    a, b = keys["click"], keys["purchase"]
    [row] = REGISTRY["agg_hll_intersect"].spark(spark, sf_dir).collect()
    assert row.s_scaled_a == s_scaled(a)
    assert row.s_scaled_b == s_scaled(b)
    assert row.s_scaled_union == s_scaled(a | b)
    assert row.true_intersect == len(a & b)
    assert row.s_scaled_union <= min(row.s_scaled_a, row.s_scaled_b)
    assert row.hll_intersect_estimate <= row.est_a + row.est_b


def test_lm_bigram_independent_counter(spark, sf_dir):
    """Counter twin of text_lm_bigram with the same floor arithmetic;
    scores must be exactly equal for every document, and the boilerplate/
    gibberish ordering property must hold: a doc made of the corpus's
    single most common transition scores above every real doc."""
    import math
    from collections import Counter

    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c2: Counter = Counter()
    per_doc = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            per_doc[doc_id] = bgs
            c2.update(bgs)
    c1: Counter = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    expected = {}
    for doc_id, bgs in per_doc.items():
        ss = [math.floor(1e6 * c2[b] / c1[b[0]]) for b in bgs]
        expected[doc_id] = (len(ss), math.floor(sum(ss) / len(ss)))

    got = REGISTRY["text_lm_bigram"].spark(spark, sf_dir).collect()
    assert {r.doc_id: (r.n_bigrams, r.lm_score_ppm) for r in got} == expected
    best = max(c2, key=lambda b: 1e6 * c2[b] / c1[b[0]])
    best_score = math.floor(1e6 * c2[best] / c1[best[0]])
    assert best_score > max(r.lm_score_ppm for r in got)


def test_triangle_count_independent_python(spark, sf_dir):
    """Pure-python twin of graph_triangle_count: take the declared k-NN
    edges (already independently verified by
    test_ivfpq/ann oracles), undirect them, count triangles by adjacency
    intersection, and recompute the coefficient with the same floor
    arithmetic. Also pins the global identity Σ n_tri = 3·|triangles|."""
    import math
    from collections import defaultdict

    knn = REGISTRY["ann_knn_graph"].spark(spark, sf_dir).collect()
    und = {tuple(sorted((r.vec_id, r.nbr_id))) for r in knn}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    # each triangle closes exactly 3 edges, so this per-edge sum is 3T
    three_t = sum(len(adj[u] & adj[v]) for u, v in und)
    # per-node: triangles at node x = pairs of neighbors that are edges
    import itertools

    pern = {}
    for x, ns in adj.items():
        t = sum(
            1 for a, b in itertools.combinations(sorted(ns), 2) if (a, b) in und
        )
        pern[x] = t

    got = REGISTRY["graph_triangle_count"].spark(spark, sf_dir).collect()
    assert three_t % 3 == 0
    assert sum(r.n_tri for r in got) == three_t
    for r in got:
        assert r.degree == len(adj.get(r.vec_id, ())), r
        assert r.n_tri == pern.get(r.vec_id, 0), r
        if r.degree >= 2:
            want = math.floor(2000000.0 * r.n_tri / r.degree / (r.degree - 1))
            assert r.clustering_ppm == want, r
            assert 0 <= r.clustering_ppm <= 1_000_000
        else:
            assert r.clustering_ppm == 0


def test_market_basket_independent_counter(spark, sf_dir):
    """Counter twin of market_basket_pairs: distinct baskets, pair counts
    via combinations, the same (-n_both, p1, p2) top-k, the same lift
    floor arithmetic."""
    import itertools
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from cdc_dedupe_spark.queries.relational_ext import _BASKET_K

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    baskets = defaultdict(set)
    for o, p in zip(li.l_orderkey, li.l_partkey):
        baskets[o].add(p)
    n_orders = len(baskets)
    support = Counter()
    pair = Counter()
    for parts in baskets.values():
        support.update(parts)
        pair.update(itertools.combinations(sorted(parts), 2))
    top = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:_BASKET_K]
    expected = {}
    for (p1, p2), n_both in top:
        lift = math.floor(1000000.0 * n_both / support[p1] / support[p2] * n_orders)
        expected[(p1, p2)] = (n_both, support[p1], support[p2], lift)

    got = REGISTRY["market_basket_pairs"].spark(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r.p1, r.p2)] == (r.n_both, r.n_ord1, r.n_ord2, r.lift_ppm), r


def test_bloom_m_sql_matches_python_and_construction_is_lazy(spark, sf_dir):
    """ADVICE r10: join_bloom_prefilter used to run sup.count() while
    BUILDING the DataFrame. Construction must now be a pure plan (no jobs),
    and the in-plan bit-smear next-pow2 must agree with _bloom_m_for."""
    import pyspark.sql.functions as F

    from cdc_dedupe_spark.queries.relational_ext import (
        _BLOOM_M_MAX,
        _BLOOM_M_MIN,
        _bloom_m_for,
        join_bloom_prefilter,
    )

    # Reading parquet schemas launches a couple of tiny driver jobs for ANY
    # query construction; the eager-count bug added an extra full count job
    # on top. Baseline against a plain two-table join's construction cost.
    from cdc_dedupe_spark.queries.relational import join_inner

    tracker = spark.sparkContext.statusTracker()

    def njobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    a = njobs()
    join_inner(spark, sf_dir)
    baseline = njobs() - a
    a = njobs()
    df = join_bloom_prefilter(spark, sf_dir)
    cost = njobs() - a
    assert cost <= baseline, (
        f"bloom construction launched {cost} jobs vs {baseline} for a plain "
        "join — an eager action is back in the build path"
    )
    assert df.columns == ["l_suppkey", "n_items", "revenue_cents"]

    # SQL next-pow2 == the Python sizing rule, including floor/clamp edges.
    rows = []
    for n in [0, 1, 10, 64, 100, 400, 1200, 5000, 10**6, 10**9]:
        rows.append((n,))
    ndf = spark.createDataFrame(rows, "n long")
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
    got = {r["n"]: r["m"] for r in ndf.select("n", (v + F.lit(1)).alias("m")).collect()}
    for n, m in got.items():
        assert m == _bloom_m_for(n), f"n={n}: sql m={m} != python {_bloom_m_for(n)}"
