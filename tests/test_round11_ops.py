"""Round-11 operator units: independent pure-Python reference
implementations for the five pipeline_ops queries, run against the
sf0.001 corpus. The DuckDB oracle twins are pinned by the sweep /
test_oracle_parity; these recompute the SAME answers from first
principles (hashlib md5, brute-force O(n^2) interval scans, sorted-list
ranks, collections.Counter) so a shared misconception between the two
SQL twins cannot hide.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

from cdc_dedupe_spark.queries import REGISTRY

DAY_US = 86_400 * 1_000_000
ERR_PAD_US = 300 * 1_000_000


def _docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def _events(sf_dir):
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    # epoch micros regardless of the pandas datetime unit (parquet NANOS
    # comes back as datetime64[ns] or [us] depending on pandas version)
    df["ts_us"] = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
    return df


def test_doc_global_shuffle_shard_matches_pure_python(spark, sf_dir):
    from cdc_dedupe_spark.queries.pipeline_ops import _SHARD_TOKENS

    docs = _docs(sf_dir)
    rows = []
    for r in docs.itertuples():
        h = int(hashlib.md5(r.text.encode()).hexdigest()[:15], 16)
        rows.append((h, r.doc_id, len(r.text.split(" "))))
    rows.sort()
    expect = {}
    cum = 0
    for h, doc_id, n_tok in rows:
        expect[doc_id] = (n_tok, cum, cum // _SHARD_TOKENS)
        cum += n_tok
    got = REGISTRY["doc_global_shuffle_shard"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(docs)
    for r in got.itertuples():
        assert expect[r.doc_id] == (r.n_tokens, r.tok_start, r.shard), r.doc_id
    # balance: every shard's token load is within one max-document of the
    # budget (the planner cuts a running stream, it never splits a doc)
    loads = got.groupby("shard")["n_tokens"].sum()
    max_doc = got["n_tokens"].max()
    assert all(loads.iloc[:-1] <= _SHARD_TOKENS + max_doc)
    assert all(loads.iloc[:-1] >= _SHARD_TOKENS - max_doc)


def test_join_interval_overlap_matches_bruteforce(spark, sf_dir):
    ev = _events(sf_dir)
    clicks = ev[ev.event_type == "click"]
    errors = ev[ev.event_type == "error"]
    sessions = {}
    for r in clicks.itertuples():
        key = (r.user_id, (r.ts_us // DAY_US) * DAY_US)
        lo, hi, n = sessions.get(key, (r.ts_us, r.ts_us, 0))
        sessions[key] = (min(lo, r.ts_us), max(hi, r.ts_us), n + 1)
    expect = {}
    for (uid, day), (lo, hi, n) in sessions.items():
        cnt = 0
        for e in errors[errors.user_id == uid].itertuples():
            if lo <= e.ts_us + ERR_PAD_US and e.ts_us - ERR_PAD_US <= hi:
                cnt += 1
        expect[(uid, day)] = (lo, hi, n, cnt)
    got = REGISTRY["join_interval_overlap"].spark(spark, sf_dir).toPandas()
    assert len(got) == len(expect)
    for r in got.itertuples():
        assert expect[(r.user_id, r.day_us)] == (
            r.start_us,
            r.end_us,
            r.n_clicks,
            r.n_err_windows,
        ), (r.user_id, r.day_us)
    # non-degenerate both ways: some sessions see zero overlaps, some >0
    assert (got.n_err_windows == 0).any() and (got.n_err_windows > 0).any()


def test_events_rfm_segments_matches_sorted_rank(spark, sf_dir):
    ev = _events(sf_dir)
    p = ev[ev.event_type == "purchase"]
    users = {}
    for r in p.itertuples():
        last, freq, cents = users.get(r.user_id, (0, 0, 0))
        users[r.user_id] = (
            max(last, r.ts_us),
            freq + 1,
            cents + int(round(r.value * 100)),
        )
    n = len(users)

    def scores(metric_idx):
        order = sorted(users, key=lambda u: (users[u][metric_idx], u))
        return {u: (rank * 5) // n + 1 for rank, u in enumerate(order)}

    r_s, f_s, m_s = scores(0), scores(1), scores(2)
    got = REGISTRY["events_rfm_segments"].spark(spark, sf_dir).toPandas()
    assert len(got) == n
    for r in got.itertuples():
        last, freq, cents = users[r.user_id]
        assert (r.last_us, r.freq, r.monetary_cents) == (last, freq, cents)
        assert (r.r_score, r.f_score, r.m_score) == (
            r_s[r.user_id],
            f_s[r.user_id],
            m_s[r.user_id],
        )
        assert r.segment == f"R{r.r_score}F{r.f_score}M{r.m_score}"
    # exact 5-tile: group sizes differ by at most 1
    for col in ("r_score", "f_score", "m_score"):
        sizes = got[col].value_counts()
        assert set(sizes.index) <= {1, 2, 3, 4, 5}
        assert sizes.max() - sizes.min() <= 1


def test_profile_skew_keys_matches_counter(spark, sf_dir):
    got = REGISTRY["profile_skew_keys"].spark(spark, sf_dir).toPandas()
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    for label, series in [
        ("lineitem.l_suppkey", li.l_suppkey),
        ("lineitem.l_partkey", li.l_partkey),
        ("orders.o_custkey", orders.o_custkey),
    ]:
        c = Counter(series.tolist())
        top_cnt, top_key = max((v, k) for k, v in c.items())
        row = got[got.col_name == label].iloc[0]
        assert row.n_rows == len(series)
        assert row.n_keys == len(c)
        assert (row.top_key, row.top_cnt) == (top_key, top_cnt)
        assert row.skew_ratio == round(top_cnt * len(c) * 1.0 / len(series), 6)


def test_text_pmi_bigrams_matches_counter(spark, sf_dir):
    from cdc_dedupe_spark.queries.pipeline_ops import _PMI_MIN_COUNT, _PMI_TOPK

    docs = _docs(sf_dir)
    uni, big = Counter(), Counter()
    for text in docs.text:
        toks = text.split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n_tok, n_big = sum(uni.values()), sum(big.values())
    scored = [
        (c * n_tok * n_tok * 1.0 / (n_big * uni[w1] * uni[w2]), w1, w2, c)
        for (w1, w2), c in big.items()
        if c >= _PMI_MIN_COUNT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = scored[:_PMI_TOPK]
    got = REGISTRY["text_pmi_bigrams"].spark(spark, sf_dir).toPandas()
    assert len(got) == min(_PMI_TOPK, len(scored))
    for (ratio, w1, w2, c), r in zip(expect, got.itertuples()):
        assert (w1, w2, c) == (r.w1, r.w2, r.c_xy)
        assert (r.c1, r.c2) == (uni[w1], uni[w2])
        assert math.isclose(r.pmi_r6, round(ratio, 6), abs_tol=1e-9)
