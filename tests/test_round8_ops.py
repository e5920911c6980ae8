"""Hand-computed unit tests for the round-8 operators
(dedup_span_ngram, mix_sources_temperature, split_train_holdout,
text_vocab_unk, subquery_correlated, ts_downsample_ohlc).

The oracle harness proves Spark == DuckDB; these prove both equal the
INTENDED semantics on inputs small enough to verify by hand — the guard
against a query and its oracle drifting together.
"""

from __future__ import annotations

import datetime
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from cdc_dedupe_spark.queries import REGISTRY


def _write_documents(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _token_hash(t: str) -> int:
    """Python twin of functions.text.token_hash (ascii-mix family)."""

    def a(i: int) -> int:
        return ord(t[i]) if i < len(t) else 0

    h = a(0) * 130003 + a(1) * 1009 + a(2) * 31 + len(t)
    return (h * 2654435761) % (1 << 61)


def _token_hash_wide(t: str) -> int:
    """Python twin of functions.text.token_hash_wide (8-char mix)."""

    def a(i: int) -> int:
        return ord(t[i]) if i < len(t) else 0

    h = (
        a(0) * 130003 + a(1) * 1009 + a(2) * 31 + a(3) * 10007
        + a(4) * 2003 + a(5) * 101 + a(6) * 401 + a(7) * 7 + len(t)
    )
    return (h * 2654435761) % (1 << 61)


def _content_bucket(text: str, mod: int) -> int:
    """%100 decisions (split) use the narrow hash; %10000 decisions
    (mix membership) use the wide one — mirroring the operators."""
    hx = hashlib.md5(text.encode()).hexdigest()
    return (_token_hash_wide(hx) if mod >= 10000 else _token_hash(hx)) % mod


# ---------------------------------------------------------------------------
# dedup_span_ngram


def test_span_ngram_hand_computed(spark, tmp_path):
    """doc 0 and doc 1 are identical 9-token docs -> their 2 spans each
    are duplicated (cross-doc); doc 2 has a unique 8-token span; doc 3
    (7 tokens, under the window) emits nothing."""
    nine = " ".join(f"t{i}" for i in range(9))
    rows = [
        (0, nine, "en", "s1"),
        (1, nine, "en", "s1"),
        (2, " ".join(f"u{i}" for i in range(8)), "en", "s1"),
        (3, " ".join(f"v{i}" for i in range(7)), "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.doc_id: (r.n_spans, r.dup_spans, r.dup_frac_bp)
        for r in REGISTRY["dedup_span_ngram"].spark(spark, sf).collect()
    }
    assert got == {0: (2, 2, 10000), 1: (2, 2, 10000), 2: (1, 0, 0)}


def test_span_ngram_within_doc_repeats_count(spark, tmp_path):
    """A single doc of 16 identical tokens: all 9 spans are the same
    8-gram -> every occurrence is duplicated (within-doc multiplicity
    counts, the Lee-et-al semantics)."""
    sf = _write_documents(tmp_path, [(0, " ".join(["x"] * 16), "en", "s1")])
    [r] = REGISTRY["dedup_span_ngram"].spark(spark, sf).collect()
    assert (r.n_spans, r.dup_spans, r.dup_frac_bp) == (9, 9, 10000)


# ---------------------------------------------------------------------------
# mix_sources_temperature


def test_mix_temperature_rates_and_membership(spark, tmp_path):
    """srcB has 4x srcA's token mass -> rate(B)=10000 (keeps all),
    rate(A)=floor(10000*sqrt(1/4))=5000; membership must equal the
    Python-recomputed content-hash rule exactly."""
    rows = [(i, f"doc number {i} " + "pad " * i, "en", "srcA") for i in range(8)]
    mass_a = sum(len(r[1]) for r in rows)
    # one srcB doc padded to exactly 4x srcA's mass
    rows.append((100, "b" * (4 * mass_a), "en", "srcB"))
    sf = _write_documents(tmp_path, rows)
    out = REGISTRY["mix_sources_temperature"].spark(spark, sf).collect()
    rates = {r.source: r.rate_bp for r in out}
    assert rates.get("srcB") == 10000
    expected = {
        r[0]
        for r in rows
        if _content_bucket(r[1], 10000) < (5000 if r[3] == "srcA" else 10000)
    }
    assert {r.doc_id for r in out} == expected
    assert all(r.rate_bp == (5000 if r.source == "srcA" else 10000) for r in out)


# ---------------------------------------------------------------------------
# split_train_holdout


def test_split_leakage_safe_and_exhaustive(spark, tmp_path):
    """Byte-identical docs (different doc_id/source) land in the SAME
    split; every doc gets exactly one split; bucket matches the Python
    twin of the content hash."""
    rows = [(i, f"unique doc {i} " + "w " * (i % 7), "en", "s1") for i in range(40)]
    rows.append((999, rows[0][1], "de", "s2"))  # dup of doc 0, other source
    sf = _write_documents(tmp_path, rows)
    out = {r.doc_id: r for r in REGISTRY["split_train_holdout"].spark(spark, sf).collect()}
    assert len(out) == len(rows)
    assert out[999].split == out[0].split and out[999].text_hash == out[0].text_hash
    for r in rows:
        b = _content_bucket(r[1], 100)
        want = "train" if b < 90 else ("valid" if b < 95 else "test")
        assert out[r[0]].content_bucket == b and out[r[0]].split == want


# ---------------------------------------------------------------------------
# text_vocab_unk


def test_vocab_unk_hand_computed(spark, tmp_path):
    """Corpus: 9x 'aa', 1x 'rare' -> vocab=2, total=10; rare iff
    cnt*2*2 < 10: 'rare' (4<10) is OOV, 'aa' (36>=10) kept. Rewrite
    preserves order."""
    rows = [
        (0, "aa aa aa rare", "en", "s1"),
        (1, "aa aa aa aa aa aa", "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_bp, r.text_unk)
        for r in REGISTRY["text_vocab_unk"].spark(spark, sf).collect()
    }
    assert got == {
        0: (4, 1, 2500, "aa aa aa <unk>"),
        1: (6, 0, 0, "aa aa aa aa aa aa"),
    }


# ---------------------------------------------------------------------------
# subquery_correlated


def test_subquery_correlated_hand_computed(spark, tmp_path):
    """Nation 1: cust 10 spends 300c, cust 11 spends 100c -> only 10 is
    strictly above the nation average (200c). Nation 2: single customer
    is exactly AT the average -> excluded (strict >). Customers with no
    orders never appear."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 11, 20, 30], pa.int64()),
                "c_nationkey": pa.array([1, 1, 2, 1], pa.int64()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([10, 10, 11, 20], pa.int64()),
                "o_totalprice": pa.array([1.0, 2.0, 1.0, 5.0], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = {
        r.c_custkey: (r.c_nationkey, r.total_cents)
        for r in REGISTRY["subquery_correlated"].spark(spark, str(tmp_path)).collect()
    }
    assert out == {10: (1, 300)}


# ---------------------------------------------------------------------------
# ts_downsample_ohlc


def test_ohlc_hand_computed(spark, tmp_path):
    """Hour 0 (out-of-order arrival): open = value at earliest ts, close
    at latest, high/low/sum over the bucket. Hour 1: two events at the
    SAME ts -> event_id breaks the tie for open/close."""
    h = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minute, hour=0):
        return h + datetime.timedelta(hours=hour, minutes=minute)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [ts(10), ts(20), ts(5), ts(30, 1), ts(30, 1)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([0] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0, 3.0, 2.0, 4.0, 5.0], pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {
        r.bucket_us: r
        for r in REGISTRY["ts_downsample_ohlc"].spark(spark, str(tmp_path)).collect()
    }
    epoch = datetime.datetime(1970, 1, 1)
    b0 = int((h - epoch).total_seconds()) * 1_000_000
    b1 = b0 + 3_600_000_000
    r0, r1 = out[b0], out[b1]
    assert (r0.n_events, r0.sum_cents, r0.open_cents, r0.close_cents, r0.high_cents, r0.low_cents) == (3, 600, 200, 300, 300, 100)
    # tie at identical ts: event_id 4 opens, event_id 5 closes
    assert (r1.n_events, r1.open_cents, r1.close_cents) == (2, 400, 500)


# ---------------------------------------------------------------------------
# graph_pagerank


def test_pagerank_matches_independent_python(spark, sf_dir):
    """The PageRank arithmetic, checked against a plain-Python
    implementation driven by the (independently oracle-verified)
    ann_knn_graph edge set — an independent witness that isn't SQL in
    either engine."""
    edges = [
        (r.vec_id, r.nbr_id)
        for r in REGISTRY["ann_knn_graph"].spark(spark, sf_dir).collect()
    ]
    nodes = [r.vec_id for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id").collect()]
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {v: 1_000_000 for v in nodes}
    for _ in range(2):
        s: dict = {}
        for a, b in edges:
            s[b] = s.get(b, 0) + pr[a] // outdeg[a]
        pr = {v: 150_000 + (850 * s.get(v, 0)) // 1000 for v in nodes}
    ind: dict = {}
    for _, b in edges:
        ind[b] = ind.get(b, 0) + 1
    got = {
        r.vec_id: (r.pr, r.in_deg)
        for r in REGISTRY["graph_pagerank"].spark(spark, sf_dir).collect()
    }
    assert got == {v: (pr[v], ind.get(v, 0)) for v in nodes}
    # nodes with no in-edges sit exactly at the damping baseline
    assert all(got[v][0] == 150_000 for v in nodes if v not in ind)


# ---------------------------------------------------------------------------
# stream_ohlc_candles


def test_stream_ohlc_hand_computed(spark, tmp_path):
    """Streaming twin of the ts_downsample_ohlc hand case: out-of-order
    arrival within the hour and a same-ts tie broken by event_id, via
    min_by/max_by over the padded string key on a real stream."""
    h = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minute, hour=0):
        return h + datetime.timedelta(hours=hour, minutes=minute)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [ts(10), ts(20), ts(5), ts(30, 1), ts(30, 1)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([0] * 5, pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0, 3.0, 2.0, 4.0, 5.0], pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {
        r.window_start_us: r
        for r in REGISTRY["stream_ohlc_candles"].spark(spark, str(tmp_path)).collect()
    }
    epoch = datetime.datetime(1970, 1, 1)
    b0 = int((h - epoch).total_seconds()) * 1_000_000
    r0, r1 = out[b0], out[b0 + 3_600_000_000]
    assert (r0.n_events, r0.sum_cents, r0.open_cents, r0.close_cents, r0.high_cents, r0.low_cents) == (3, 600, 200, 300, 300, 100)
    assert (r1.n_events, r1.open_cents, r1.close_cents) == (2, 400, 500)


# ---------------------------------------------------------------------------
# cdc_upsert_latest


def test_upsert_latest_hand_computed(spark, tmp_path):
    """user 0: out-of-order arrival — the ts-latest event wins, not the
    last-written row; user 1: same-ts tie broken by event_id."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minute):
        return t0 + datetime.timedelta(minutes=minute)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([ts(10), ts(5), ts(7), ts(7)], pa.timestamp("us")),
            "user_id": pa.array([0, 0, 1, 1], pa.int64()),
            "event_type": pa.array(["click", "view", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {
        r.user_id: (r.n_versions, r.last_event_id, r.last_event_type, r.last_cents)
        for r in REGISTRY["cdc_upsert_latest"].spark(spark, str(tmp_path)).collect()
    }
    assert out == {0: (2, 1, "click", 100), 1: (2, 4, "purchase", 400)}


# ---------------------------------------------------------------------------
# retrieval_hybrid_rerank


def test_hybrid_rerank_invariants(spark, sf_dir):
    """Stage-1 candidates must contain text_bm25_topk's top-10 (shared
    scorer); final_rank must be the permutation 1..20 ordered by the
    Python-recomputed exact cosine vs probe vec 0 (descending, doc_id
    tie-break)."""
    import math

    out = REGISTRY["retrieval_hybrid_rerank"].spark(spark, sf_dir).collect()
    assert len(out) == 20
    top10 = {r.doc_id for r in REGISTRY["text_bm25_topk"].spark(spark, sf_dir).collect()}
    assert top10 <= {r.doc_id for r in out}
    # HALF_UP like Spark's F.round (Python round() is banker's rounding:
    # an exact-.5 component would diverge and flake)
    def _iscale(x: float) -> int:
        return int(math.floor(x * 10_000_000 + 0.5)) if x >= 0 else -int(math.floor(-x * 10_000_000 + 0.5))

    vecs = {
        r.vec_id: [_iscale(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    p = vecs[0]

    def cos(v):
        dot = sum(a * b for a, b in zip(v, p))
        return dot / (math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in p)))

    want = sorted(out, key=lambda r: (-cos(vecs[r.doc_id]), r.doc_id))
    assert [r.doc_id for r in sorted(out, key=lambda r: r.final_rank)] == [r.doc_id for r in want]
    assert sorted(r.final_rank for r in out) == list(range(1, 21))
    for r in out:
        assert abs(r.cos_r - round(cos(vecs[r.doc_id]), 4)) < 1e-9


def test_span_ngram_randomized_vs_bruteforce(spark, tmp_path):
    """Seeded random corpus vs a brute-force Python recomputation of the
    span-dedup profile — catches windowing/multiplicity edge cases the
    hand cases don't enumerate (var-length docs straddling the 8-token
    minimum, partial cross-doc overlap)."""
    import random

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(6)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 14))), "en", "s1")
        for i in range(30)
    ]
    sf = _write_documents(tmp_path, rows)
    spans: dict = {}
    per_doc: dict = {}
    for doc_id, text, _, _ in rows:
        toks = text.split(" ")
        ss = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
        if ss:
            per_doc[doc_id] = ss
            for s in ss:
                spans[s] = spans.get(s, 0) + 1
    want = {}
    for doc_id, ss in per_doc.items():
        dup = sum(1 for s in ss if spans[s] > 1)
        want[doc_id] = (len(ss), dup, dup * 10000 // len(ss))
    got = {
        r.doc_id: (r.n_spans, r.dup_spans, r.dup_frac_bp)
        for r in REGISTRY["dedup_span_ngram"].spark(spark, sf).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# events_gap_fill


def test_gap_fill_hand_computed(spark, tmp_path):
    """'click' has events in hours 0 and 3 only -> the grid densifies
    hours 1-2 with n=0 / NULL sum / LOCF of hour 0 / is_gap; 'view' has
    one hour -> one row, no gap. Grid is per-type min..max, not global."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(hour, minute=0):
        return t0 + datetime.timedelta(hours=hour, minutes=minute)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([ts(0), ts(0, 30), ts(3), ts(5)], pa.timestamp("us")),
            "user_id": pa.array([0] * 4, pa.int64()),
            "event_type": pa.array(["click", "click", "click", "view"]),
            "value": pa.array([1.0, 2.0, 4.0, 9.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = REGISTRY["events_gap_fill"].spark(spark, str(tmp_path)).collect()
    epoch = datetime.datetime(1970, 1, 1)
    h0 = int((t0 - epoch).total_seconds()) * 1_000_000
    HR = 3_600_000_000
    got = {(r.event_type, r.bucket_us): (r.n_events, r.sum_cents, r.locf_cents, r.is_gap) for r in rows}
    assert got == {
        ("click", h0): (2, 300, 300, False),
        ("click", h0 + HR): (0, None, 300, True),
        ("click", h0 + 2 * HR): (0, None, 300, True),
        ("click", h0 + 3 * HR): (1, 400, 400, False),
        ("view", h0 + 5 * HR): (1, 900, 900, False),
    }


# ---------------------------------------------------------------------------
# stream_upsert_latest


def test_stream_upsert_matches_batch_twin(spark, tmp_path):
    """The streaming materialization must equal the batch fold on the
    same events — same out-of-order + same-ts-tie fixture as the batch
    test."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minute):
        return t0 + datetime.timedelta(minutes=minute)

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([ts(10), ts(5), ts(7), ts(7)], pa.timestamp("us")),
            "user_id": pa.array([0, 0, 1, 1], pa.int64()),
            "event_type": pa.array(["click", "view", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = {
        r.user_id: (r.n_versions, r.last_event_id, r.last_cents)
        for r in REGISTRY["stream_upsert_latest"].spark(spark, str(tmp_path)).collect()
    }
    assert out == {0: (2, 1, 100), 1: (2, 4, 400)}


# ---------------------------------------------------------------------------
# pipeline_curation_mix


def test_curation_pipeline_hand_computed(spark, tmp_path):
    """Stage interaction: doc 0/1 are identical 16-token docs (100%
    duplicated spans -> gated out); docs 2-4 are unique and survive the
    gate; the mix rates must be computed from the SURVIVING corpus only
    (dropping 0/1 changes source masses); split matches the content
    hash."""
    dup = " ".join(f"d{i}" for i in range(16))
    rows = [
        (0, dup, "en", "srcA"),
        (1, dup, "en", "srcA"),
        (2, " ".join(f"a{i}" for i in range(10)), "en", "srcA"),
        (3, " ".join(f"b{i}" for i in range(40)), "en", "srcB"),
        (4, "tiny doc", "en", "srcB"),  # <8 tokens: no spans, passes gate
    ]
    sf = _write_documents(tmp_path, rows)
    out = {r.doc_id: r for r in REGISTRY["pipeline_curation_mix"].spark(spark, sf).collect()}
    assert 0 not in out and 1 not in out  # gated: dup_bp = 10000 > 2000
    # surviving masses: srcA = len(rows[2]), srcB = len(rows[3]) + len(rows[4])
    import math

    tok_a = len(rows[2][1])
    tok_b = len(rows[3][1]) + len(rows[4][1])
    mx = max(tok_a, tok_b)
    rate = {
        "srcA": math.floor(10000.0 * math.sqrt(tok_a) / math.sqrt(mx)),
        "srcB": math.floor(10000.0 * math.sqrt(tok_b) / math.sqrt(mx)),
    }
    for doc_id, text, _, src in rows[2:]:
        kept = _content_bucket(text, 10000) < rate[src]
        assert (doc_id in out) == kept
        if kept:
            r = out[doc_id]
            assert r.rate_bp == rate[src] and r.dup_bp == 0
            b = _content_bucket(text, 100)
            assert r.split == ("train" if b < 90 else "valid" if b < 95 else "test")


def test_upsert_latest_wide_ids(spark, tmp_path):
    """Order-key width edge (code-review finding): event ids wider than
    12 digits at the SAME ts must order numerically — a truncating pad
    would rank 1000000000000 below 999999999999 and pick the wrong last
    version."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    tbl = pa.table(
        {
            "event_id": pa.array([999_999_999_999, 1_000_000_000_000], pa.int64()),
            "ts": pa.array([t0, t0], pa.timestamp("us")),
            "user_id": pa.array([7, 7], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}"] * 2),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    [r] = REGISTRY["cdc_upsert_latest"].spark(spark, str(tmp_path)).collect()
    assert (r.last_event_id, r.last_event_type, r.last_cents) == (1_000_000_000_000, "b", 200)


# ---------------------------------------------------------------------------
# text_pii_scrub (r15)


def test_pii_scrub_counts_and_masks(spark, tmp_path):
    """doc_id 60 gets all three injections (div by 4, 5, 6), doc 1 none;
    the scrubbed text must contain the typed masks and NO residual match
    of any pattern, and counts must be category-exact."""
    import re

    rows = [
        (60, "hello world", "en", "s1"),
        (1, "clean doc", "en", "s1"),
        (4, "email only", "en", "s1"),
        (5, "phone only", "en", "s1"),
    ]
    sf = _write_documents(tmp_path, rows)
    out = {r.doc_id: r for r in REGISTRY["text_pii_scrub"].spark(spark, sf).collect()}

    assert (out[60].n_emails, out[60].n_phones, out[60].n_ips) == (1, 1, 1)
    assert out[60].pii_total == 3
    for mask in ("<EMAIL>", "<PHONE>", "<IP>"):
        assert mask in out[60].text_scrubbed
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (0, 0, 0)
    assert out[1].text_scrubbed == "clean doc"
    assert (out[4].n_emails, out[4].pii_total) == (1, 1)
    assert (out[5].n_phones, out[5].pii_total) == (1, 1)

    from cdc_dedupe_spark.queries.curation import _PII_EMAIL, _PII_IP, _PII_PHONE

    for r in out.values():
        for pat in (_PII_EMAIL, _PII_PHONE, _PII_IP):
            assert not re.search(pat, r.text_scrubbed), (r.doc_id, pat, r.text_scrubbed)
