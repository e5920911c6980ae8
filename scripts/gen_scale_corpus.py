#!/usr/bin/env python
"""Generate an sf1-scale corpus (documents, embeddings, and — as of
round 17 — the FULL star schema: customer, orders, lineitem, part,
supplier, nation, region, plus events) for LOCAL scaling measurements
(SCALING.md's measured table): /root/testdata tops out at sf0.1, and the
three historically-superlinear queries (dedup_minhash_exact,
dedup_embed_cluster, ann_knn_graph) need one measured point beyond it
(VERDICT r8 "Next round" #8; star schema is VERDICT r16 ask #1).

NOT driver test data and NOT used by correctness runs — the shapes follow
the observed driver corpus (unit-norm dim-64 float32 embeddings with 10
loose labels; ~300-char docs over a small tech vocab; langs ~41% en /
~15% each zh es fr de; sources src0..src19; ~0.2% exact-dup texts and
~1% near-dup embedding pairs so the dedup queries stay non-trivial), but
values are from an independent fixed seed. Output is gitignored.

Usage: python scripts/gen_scale_corpus.py [out_dir] [n_docs] [n_vecs]
defaults: .localdata/sf1  50000  20000
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = Path(__file__).resolve().parents[1]

VOCAB = (
    "batch part spark line column order small sort vector scan fast query agg "
    "stream filter big merge group value customer slow join shuffle hash key "
    "plan table row read write cache disk memory node task stage broadcast "
    "window state store sink source offset commit log file page index"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else _REPO / ".localdata" / "sf1"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260814)

    # --- documents -------------------------------------------------------
    lengths = rng.poisson(48, n_docs) + 8  # ~300 chars at ~6 chars/word
    langs = rng.choice(len(LANGS), n_docs, p=LANG_W)
    sources = rng.integers(0, 20, n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        words = rng.choice(VOCAB, lengths[i])
        texts.append(" ".join(words))
    # ~0.2% exact duplicates of an earlier doc
    for j in rng.choice(np.arange(1, n_docs), max(1, n_docs // 500), replace=False):
        texts[j] = texts[j // 2]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([LANGS[k] for k in langs]),
                "source": pa.array([f"src{s}" for s in sources]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(out / "documents.parquet"),
    )

    # --- embeddings ------------------------------------------------------
    dim = 64
    labels = rng.integers(0, 10, n_vecs)
    centers = rng.normal(size=(10, dim)) * 0.3
    v = rng.normal(size=(n_vecs, dim)) + centers[labels]
    # ~1% near-duplicate pairs: copy an earlier vector + small noise
    dups = rng.choice(np.arange(1, n_vecs), max(1, n_vecs // 100), replace=False)
    v[dups] = v[dups // 2] + rng.normal(size=(len(dups), dim)) * 0.02
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array([list(r) for r in v], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(out / "embeddings.parquet"),
    )
    # --- customer (round 10: join_fuzzy_band's input; round 17: full
    # star-schema columns for the FK/dq family) ---------------------------
    # Driver-corpus shape: sequential keys, fixed-width 'Customer#%09d'
    # names (sf0.1 has 15k rows -> sf1 is 150k). The fixed format means
    # band blocks (all but the last 2 chars) are runs of <= 100
    # consecutive keys — the banding structure the fuzzy join exploits.
    # The round-17 columns draw from a SEPARATE rng stream so every table
    # generated before round 17 stays byte-identical (the SCALING.md wave
    # rows measured on them remain reproducible).
    rng17 = np.random.default_rng(20260816)
    n_cust = n_docs * 3
    segments = np.array(
        ["MACHINERY", "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    rng17.integers(0, 25, n_cust).astype("int32"), pa.int32()
                ),
                "c_acctbal": pa.array(
                    np.round(rng17.random(n_cust) * 11000 - 1000, 2), pa.float64()
                ),
                "c_mktsegment": pa.array(rng17.choice(segments, n_cust)),
            }
        ),
        str(out / "customer.parquet"),
    )
    # --- events (round 10: the events-family off-scale point) -------------
    # Driver-corpus shape at 10x sf0.1: 1M rows, user pool ~10x, same 5
    # event types, 30-day span, micro-second timestamps (the plain-us
    # TIMESTAMP branch of tables.normalize_event_ts).
    n_events = n_docs * 20
    n_users = 1500
    ev_user = rng.integers(0, n_users, n_events)
    ev_type = rng.choice(
        np.array(["view", "click", "signup", "purchase", "error"]), n_events
    )
    span_us = 30 * 24 * 3600 * 1_000_000
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    ev_ts = base_us + rng.integers(0, span_us, n_events)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_events), pa.int64()),
                "ts": pa.array(ev_ts, pa.timestamp("us")),
                "user_id": pa.array(ev_user, pa.int64()),
                "event_type": pa.array(ev_type),
                "value": pa.array(rng.random(n_events) * 100.0, pa.float64()),
                "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_events)]),
            }
        ),
        str(out / "events.parquet"),
    )

    # --- lineitem (round 10: market_basket_pairs' off-scale point) --------
    # 10x sf0.1: 6M lines over 1.5M orders (1 + Poisson(3) lines each,
    # truncated to the generated total), part pool 10x.
    n_lines = n_docs * 120
    n_parts = n_docs * 4 // 10
    lines_per_order = 1 + rng.poisson(3, n_lines // 3)
    okeys = np.repeat(np.arange(len(lines_per_order)), lines_per_order)[:n_lines]
    n_lines = len(okeys)
    lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per_order])[:n_lines]
    qty = rng.integers(1, 51, n_lines).astype("float64")
    price = np.round(rng.random(n_lines) * 90000 + 900, 2)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_parts, n_lines), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_parts // 20, n_lines), pa.int64()),
                "l_linenumber": pa.array(lnum, pa.int32()),
                "l_quantity": pa.array(qty, pa.float64()),
                "l_extendedprice": pa.array(price, pa.float64()),
                "l_discount": pa.array(np.round(rng.random(n_lines) * 0.1, 2), pa.float64()),
                "l_tax": pa.array(np.round(rng.random(n_lines) * 0.08, 2), pa.float64()),
                "l_returnflag": pa.array(rng.choice(np.array(["A", "N", "R"]), n_lines)),
                "l_linestatus": pa.array(rng.choice(np.array(["O", "F"]), n_lines)),
                "l_shipdate": pa.array(
                    base_us + rng.integers(0, span_us * 12, n_lines), pa.timestamp("us")
                ),
            }
        ),
        str(out / "lineitem.parquet"),
    )

    # --- part (round 14: the fn_string/scalar family's off-scale point) ---
    # Driver-corpus shape (sf0.1 = 20k rows -> sf1 = 200k): 'adj noun'
    # names over a small vocab, 'Brand#N', size-class p_type, price ramp.
    n_part = n_docs * 4
    adjs = np.array("large hot small cold smooth rough shiny dull quick slow".split())
    nouns = np.array("ring bolt screw washer nut gear plate rod tube clip".split())
    p_names = [
        f"{adjs[i % len(adjs)]} {nouns[(i // len(adjs)) % len(nouns)]}"
        for i in range(n_part)
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(p_names),
                "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)]),
                "p_type": pa.array(
                    rng.choice(np.array(["LARGE", "MEDIUM", "SMALL", "ECONOMY", "PROMO"]), n_part)
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": pa.array(
                    np.round(900.0 + np.arange(n_part) * 0.1 % 1100, 2), pa.float64()
                ),
            }
        ),
        str(out / "part.parquet"),
    )

    # --- orders / supplier / nation / region (round 17: the full star
    # schema, VERDICT r16 ask #1 — sf1 wave rows for pipeline_dq_checks
    # and the relational/FK family need coherent FK edges) ----------------
    # Orders cover exactly the l_orderkey range the lineitem generator
    # emitted, so lineitem->orders referential integrity holds, and every
    # o_custkey references the customer table (orders->customer holds) —
    # the same invariants the driver corpus has (verified sf0.1: zero
    # orphans on both edges). Draws come from the round-17 rng stream;
    # the pre-r17 tables above are untouched bytes.
    n_orders = int(okeys.max()) + 1
    span_days = (2001 - 1995) * 365 + 213  # 1995-01-01 .. 2001-08-01ish
    base_day_us = 788_918_400_000_000  # 1995-01-01T00:00:00Z
    o_dates = base_day_us + rng17.integers(0, span_days, n_orders) * (
        24 * 3600 * 1_000_000
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_orders), pa.int64()),
                "o_custkey": pa.array(
                    rng17.integers(0, n_cust, n_orders), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    rng17.choice(np.array(["O", "P", "F"]), n_orders)
                ),
                "o_totalprice": pa.array(
                    np.round(rng17.random(n_orders) * 499000 + 1000, 2),
                    pa.float64(),
                ),
                "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    rng17.choice(
                        np.array(
                            [
                                "1-URGENT",
                                "2-HIGH",
                                "3-MEDIUM",
                                "4-NOT SPECIFIED",
                                "5-LOW",
                            ]
                        ),
                        n_orders,
                    )
                ),
            }
        ),
        str(out / "orders.parquet"),
    )
    # Supplier pool 10x the sf0.1 corpus (1k -> 10k). lineitem.l_suppkey
    # (generated pre-r17, range 0..n_parts//20-1 = 0..999) references a
    # PREFIX of this pool — referential integrity holds; the tail suppliers
    # simply have no lines, like a dim with inactive members.
    n_supp = 10_000
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(
                    rng17.integers(0, 25, n_supp).astype("int32"), pa.int32()
                ),
                "s_acctbal": pa.array(
                    np.round(rng17.random(n_supp) * 11000 - 1000, 2), pa.float64()
                ),
            }
        ),
        str(out / "supplier.parquet"),
    )
    # nation / region: fixed tiny dims, same values as the driver corpus.
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype="int32"), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(
                    (np.arange(25) % 5).astype("int32"), pa.int32()
                ),
            }
        ),
        str(out / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype="int32"), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
        str(out / "region.parquet"),
    )

    print(
        f"wrote {out}/documents.parquet ({n_docs}), embeddings.parquet "
        f"({n_vecs}), customer.parquet ({n_cust}), events.parquet "
        f"({n_events}), lineitem.parquet ({n_lines}), part.parquet "
        f"({n_part}), orders.parquet ({n_orders}), supplier.parquet "
        f"({n_supp}), nation.parquet (25), region.parquet (5)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
