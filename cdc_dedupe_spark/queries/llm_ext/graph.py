"""kNN-edge graph analytics family (split from llm_ext.py r17)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .._determinism import round_pos
from ...functions.text import (
    SQL_TOKEN_HASH,
    SQL_TOKEN_HASH_WIDE,
    char_shingles,
    marker_count,
    simhash,
    sql_marker_count,
    token_hash,
    token_hash_wide,
)
from ...functions.vector import (
    LSH_MAX_PLANES,
    SQL_ICOSINE,
    SQL_ISCALE,
    icosine,
    idot,
    il2,
    iscale,
    lsh_bucket,
    lsh_shift,
    sql_lsh_bucket,
    sql_lsh_shift,
)
from ...tables import spread_scan, table
from ..registry import register
from .ann_vec import _CLUSTER_ORACLE, _SQL_ADAPTIVE_BK, _lsh_projection, dedup_embed_cluster
from .text_stats import _dec2




_KNN_K = 3



_KNN_GRAPH_ORACLE = f"""
    WITH sc AS (
      SELECT vec_id, {SQL_ISCALE.format(a='embedding')} AS se FROM embeddings
    ), bk AS (
      {_SQL_ADAPTIVE_BK}
    ), scored AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
             {SQL_ICOSINE.format(sa='a.se', sb='b.se')} AS cos_r
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, nbr_id, cos_r,
           CAST(row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos_r DESC, nbr_id) AS INTEGER) AS rank
    FROM scored
    QUALIFY rank <= {_KNN_K}
    """




def _knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared k-NN edge builder: (vec_id, nbr_id, cos_r, rank<=K) per
    vector, neighbors restricted to the vector's LSH bucket. Used by
    ann_knn_graph (declared output) and graph_pagerank (edge input)."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Norm precomputed ONCE per vector (n sqrt+fold evaluations), not once
    # per candidate pair (~80n here): sqrt of the same integer-valued
    # double is bit-identical wherever it's computed, so the oracle — which
    # expands it per pair — still matches exactly.
    bk = _lsh_projection(e)
    a, b = bk.alias("a"), bk.alias("b")
    cos_r = round_pos(
        idot(F.col("a.se"), F.col("b.se")).cast("double") / (F.col("a.nrm") * F.col("b.nrm")),
        4,
    )
    scored = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nbr_id"),
        cos_r.alias("cos_r"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_r").desc(), "nbr_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= _KNN_K)




@register("ann_knn_graph", group="llm-ext", oracle=_KNN_GRAPH_ORACLE)
def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph: for EVERY vector, its top-3 cosine
    neighbors within its hyperplane-LSH bucket — the all-vectors
    generalization of ann_lsh_topk's single probe and the edge-building
    stage SemDeDup-style semantic dedup (dedup_embed_cluster) runs before
    clustering, declared here as a first-class output.

    Scale shape: bucketing is map-side; candidate scoring is the same
    content-banded bucket equi self-join as dedup_embed_lsh (pairs bounded
    per bucket, never all-pairs); top-k per vector is one window over the
    candidate rows, partitioned on a high-cardinality key. Exact integer
    cosine => exact oracle, ties broken by neighbor id."""
    return _knn_edges(spark, sf_dir)




_PR_ORACLE = f"""
    WITH knn AS (
      SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})
    ), deg AS (
      SELECT vec_id, COUNT(*) AS outdeg FROM knn GROUP BY vec_id
    ), n AS (
      SELECT vec_id FROM embeddings
    ), c1 AS (
      SELECT nbr_id, SUM(1000000 // outdeg) AS s
      FROM knn JOIN deg USING (vec_id) GROUP BY nbr_id
    ), p1 AS (
      SELECT n.vec_id, 150000 + (850 * COALESCE(c1.s, 0)) // 1000 AS pr
      FROM n LEFT JOIN c1 ON c1.nbr_id = n.vec_id
    ), c2 AS (
      SELECT knn.nbr_id, SUM(p1.pr // deg.outdeg) AS s
      FROM knn JOIN deg USING (vec_id) JOIN p1 ON p1.vec_id = knn.vec_id
      GROUP BY knn.nbr_id
    ), ind AS (
      SELECT nbr_id, COUNT(*) AS cnt FROM knn GROUP BY nbr_id
    )
    SELECT n.vec_id,
           CAST(150000 + (850 * COALESCE(c2.s, 0)) // 1000 AS BIGINT) AS pr,
           CAST(COALESCE(ind.cnt, 0) AS BIGINT) AS in_deg
    FROM n
    LEFT JOIN c2 ON c2.nbr_id = n.vec_id
    LEFT JOIN ind ON ind.nbr_id = n.vec_id
    """




@register("graph_pagerank", group="llm-ext", oracle=_PR_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank iterations over the approximate k-NN
    similarity graph (damping 0.85, all-integer arithmetic scaled 1e6 —
    exact oracle): a centrality score for every embedding plus its
    in-degree, the ranking signal a semantic-dedup / data-curation
    pipeline derives from the same edge set dedup_embed_cluster consumes.
    Dangling mass is dropped (the standard simplification); nodes with
    no in-edges sit at the 0.15 baseline.

    Scale shape: edges come from the banded k-NN build (bounded per
    bucket, never all-pairs) and are lineage-truncated once
    (localCheckpoint, the dedup_embed_cluster loop discipline) so both
    iterations read the same materialization instead of re-running the
    self-join. Each iteration is: co-partitioned edges ⋈ ranks on the
    source key, partial-aggregated contribution sum on the target key —
    the standard Pregel-on-shuffle shape, |edges| rows moved per
    iteration, integer `div` contributions (Spark `div` == DuckDB `//`)."""
    edges = (
        _knn_edges(spark, sf_dir).select("vec_id", "nbr_id").localCheckpoint(eager=False)
    )
    deg = edges.groupBy("vec_id").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "vec_id")
    nodes = table(spark, sf_dir, "embeddings").select("vec_id")

    def iterate(ranks: DataFrame) -> DataFrame:
        contrib = (
            ed.join(ranks, "vec_id")
            .select("nbr_id", F.expr("pr div outdeg").alias("c"))
            .groupBy("nbr_id")
            .agg(F.sum("c").alias("s"))
        )
        return nodes.join(
            contrib, nodes["vec_id"] == contrib["nbr_id"], "left"
        ).select(
            nodes["vec_id"],
            (F.lit(150000) + F.expr("(850 * coalesce(s, 0L)) div 1000")).alias("pr"),
        )

    p0 = nodes.select("vec_id", F.lit(1000000).cast("long").alias("pr"))
    p2 = iterate(iterate(p0))
    ind = edges.groupBy("nbr_id").agg(F.count(F.lit(1)).alias("cnt"))
    return p2.join(ind, p2["vec_id"] == ind["nbr_id"], "left").select(
        p2["vec_id"], "pr", F.coalesce(F.col("cnt"), F.lit(0)).alias("in_deg")
    )




_LP_ORACLE = f"""
    WITH knn AS (
      SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})
    ), und AS (
      SELECT DISTINCT vec_id AS v, nbr_id AS u FROM knn
      UNION SELECT DISTINCT nbr_id, vec_id FROM knn
    ), l0 AS (
      SELECT vec_id, vec_id AS lbl FROM embeddings
    ), c1 AS (
      SELECT e.v, l.lbl, COUNT(*) AS cnt
      FROM und e JOIN l0 l ON l.vec_id = e.u GROUP BY e.v, l.lbl
    ), p1 AS (
      SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY cnt DESC, lbl) AS rn
      FROM c1
    ), l1 AS (
      SELECT n.vec_id, COALESCE(p.lbl, n.vec_id) AS lbl
      FROM l0 n LEFT JOIN (SELECT v, lbl FROM p1 WHERE rn = 1) p ON p.v = n.vec_id
    ), c2 AS (
      SELECT e.v, l.lbl, COUNT(*) AS cnt
      FROM und e JOIN l1 l ON l.vec_id = e.u GROUP BY e.v, l.lbl
    ), p2 AS (
      SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY cnt DESC, lbl) AS rn
      FROM c2
    )
    SELECT n.vec_id, CAST(COALESCE(p.lbl, n.vec_id) AS BIGINT) AS community
    FROM l1 n LEFT JOIN (SELECT v, lbl FROM p2 WHERE rn = 1) p ON p.v = n.vec_id
    """




@register("graph_label_prop", group="llm-ext", oracle=_LP_ORACLE)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous label-propagation iterations over the k-NN
    similarity graph — COMMUNITY detection, completing the graph family
    next to connected components (reachability) and PageRank
    (centrality): each node adopts its neighbors' most frequent label
    (ties to the smallest label — deterministic, unlike classic
    random-order LPA), isolated nodes keep their own.

    Shape at scale (the graph_pagerank discipline): the undirected edge
    table is localCheckpoint'd ONCE; each iteration is a co-partitioned
    edge⋈label join + a (node, label) partial-agg count + an argmax via
    min(struct(-count, label)) — |edges| rows move per iteration, the
    embedding table is read exactly once by the shared edge builder, and
    a production loop repeats the body to stability with the CC-style
    one-scalar convergence probe."""
    edges = _knn_edges(spark, sf_dir).select("vec_id", "nbr_id")
    und = (
        edges.select(F.col("vec_id").alias("v"), F.col("nbr_id").alias("u"))
        .union(edges.select(F.col("nbr_id").alias("v"), F.col("vec_id").alias("u")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = table(spark, sf_dir, "embeddings").select("vec_id")
    labels = nodes.select("vec_id", F.col("vec_id").alias("lbl"))
    for _ in range(2):
        cnt = (
            und.join(labels.select(F.col("vec_id").alias("u"), "lbl"), "u")
            .groupBy(F.col("v").alias("vec_id"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = cnt.groupBy("vec_id").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("lbl").alias("lbl")))["lbl"].alias(
                "new_lbl"
            )
        )
        labels = nodes.join(labels, "vec_id").join(best, "vec_id", "left").select(
            "vec_id", F.coalesce("new_lbl", "lbl").alias("lbl")
        )
    return labels.select("vec_id", F.col("lbl").cast("long").alias("community"))




# ---------------------------------------------------------------------------
# graph_triangle_count — exact triangles + clustering coefficient on the k-NN graph


_TRI_ORACLE = f"""
    WITH knn AS (SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
      FROM knn
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM und e1 JOIN und e2 ON e2.u = e1.v
           JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pern AS (
      SELECT x AS vec_id, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS x FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    ),
    deg AS (
      SELECT x AS vec_id, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT u AS x FROM und UNION ALL SELECT v FROM und
      ) GROUP BY 1
    )
    SELECT e.vec_id, COALESCE(deg.degree, 0) AS degree,
           COALESCE(pern.n_tri, 0) AS n_tri,
           CAST(CASE WHEN COALESCE(deg.degree, 0) >= 2
                THEN floor((2000000.0 * COALESCE(pern.n_tri, 0))
                           / deg.degree / (deg.degree - 1))
                ELSE 0 END AS BIGINT) AS clustering_ppm
    FROM embeddings e
    LEFT JOIN deg USING (vec_id) LEFT JOIN pern USING (vec_id)
    """




@register("graph_triangle_count", group="llm-ext", oracle=_TRI_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node triangle count and local clustering coefficient over
    the approximate k-NN graph (round 10) — the density diagnostic that
    separates tight semantic clusters (coefficient near 1: this
    neighborhood is a near-dup clique SemDeDup should collapse) from
    hub-like noise (high degree, no closure), completing the graph family
    next to CC, PageRank and label propagation on the same shared edges.

    Algorithm: canonical edge orientation (u < v) makes each triangle
    countable exactly once as a wedge a<b<c closed by membership — two
    equi hash joins, the standard distributed triangle enumeration.
    Clustering coefficient = floor(2e6·T / d(d−1)) ppm, exact-integer
    inputs and a fixed IEEE op order shared with the oracle.

    Shape at scale: the undirected edge list is O(n·k) rows; the wedge
    join fan-out per middle node is bounded by its oriented degree
    (≤ 2k from a k-NN build), so candidates are O(n·k²), never O(n²);
    the closure check is a third equi-join on the (u, v) edge key. All
    shuffles are on high-cardinality keys; the k-NN edges reuse the
    shared LSH projection checkpoint."""
    nodes = table(spark, sf_dir, "embeddings").select("vec_id")
    edges = _knn_edges(spark, sf_dir).select("vec_id", "nbr_id")
    und = (
        edges.select(
            F.least("vec_id", "nbr_id").alias("u"),
            F.greatest("vec_id", "nbr_id").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # three self-join sides share the build
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c"))
    )
    pern = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    joined = (
        nodes.join(deg, "vec_id", "left")
        .join(pern, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("degree", F.lit(0).cast("long")).alias("degree"),
            F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri"),
        )
    )
    return joined.select(
        "vec_id",
        "degree",
        "n_tri",
        F.when(
            F.col("degree") >= 2,
            F.floor(
                F.lit(2000000.0) * F.col("n_tri") / F.col("degree") / (F.col("degree") - 1)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("clustering_ppm"),
    )




# --- connected-component census (round 11) ----------------------------------


@register(
    "graph_cc_sizes",
    group="llm-ext",
    oracle=f"""
    WITH comp AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size
      FROM ({_CLUSTER_ORACLE}) GROUP BY cluster_id
    )
    SELECT size,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(size * COUNT(*) AS BIGINT) AS n_nodes
    FROM comp GROUP BY size
    """,
)
def graph_cc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component size census over the semantic-dedup cluster
    graph — the audit every production dedup run emits before dropping
    data: how many singletons, how many pairs, does one giant component
    swallow the corpus (the classic too-loose-threshold failure)? Rolls
    [[dedup_embed_cluster]]'s label table up twice (cluster -> size,
    size -> count); both rollups are partial-aggregated O(|nodes|) then
    O(|distinct sizes|) rows, so the census costs two tiny exchanges on
    top of the CC labels. A healthy near-dup graph shows a long
    singleton bar and a short tail — a census row with size ~ |corpus|
    is the alarm."""
    labels = dedup_embed_cluster(spark, sf_dir)
    comp = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    return (
        comp.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .select(
            "size",
            "n_components",
            (F.col("size") * F.col("n_components")).alias("n_nodes"),
        )
    )




# --- neighbor-Jaccard link prediction (round 11) ----------------------------


_LP_TOP = 20




@register(
    "graph_link_predict",
    group="llm-ext",
    oracle=f"""
    WITH knn AS (SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
      FROM knn
    ),
    adj AS (
      SELECT u AS w, v AS x FROM und UNION ALL SELECT v, u FROM und
    ),
    cand AS (
      SELECT a1.x AS u, a2.x AS v, CAST(COUNT(*) AS BIGINT) AS common
      FROM adj a1 JOIN adj a2 ON a1.w = a2.w AND a1.x < a2.x
      GROUP BY a1.x, a2.x
    ),
    non_edge AS (
      SELECT c.* FROM cand c ANTI JOIN und ON und.u = c.u AND und.v = c.v
    ),
    deg AS (
      SELECT w AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM adj GROUP BY w
    )
    SELECT ne.u, ne.v, ne.common,
           (ne.common * 1000000) // (du.degree + dv.degree - ne.common)
             AS jaccard_ppm
    FROM non_edge ne
    JOIN deg du ON du.node = ne.u JOIN deg dv ON dv.node = ne.v
    ORDER BY jaccard_ppm DESC, ne.u, ne.v LIMIT {_LP_TOP}
    """,
)
def graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor Jaccard over the shared k-NN graph:
    the top-20 NON-adjacent node pairs ranked by
    |N(u)∩N(v)| / |N(u)∪N(v)| — "these two vectors share most of their
    neighborhoods but no edge", the candidate-generation step of graph-
    based dedup review and recommendation. Candidates come from the
    wedge join (pairs with ≥1 common neighbor — O(n·k²) like
    [[graph_triangle_count]], never all-pairs), existing edges drop via
    an anti join, and the score is EXACT integer ppm
    (common·10⁶ div (deg_u + deg_v − common)) with a total
    (ppm DESC, u, v) order into TakeOrderedAndProject. Degrees join on
    high-cardinality node keys — nothing broadcasts the graph.

    At 100 TB: identical scale story to the triangle pass — wedge
    fan-out is bounded by the k-NN build's k, and the top-k never
    materializes the candidate list anywhere."""
    edges = _knn_edges(spark, sf_dir).select("vec_id", "nbr_id")
    und = (
        edges.select(
            F.least("vec_id", "nbr_id").alias("u"),
            F.greatest("vec_id", "nbr_id").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # adjacency, anti join and degrees share it
    )
    adj = und.select(F.col("u").alias("w"), F.col("v").alias("x")).unionByName(
        und.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    cand = (
        a1.join(a2, (F.col("a1.w") == F.col("a2.w")) & (F.col("a1.x") < F.col("a2.x")))
        .groupBy(F.col("a1.x").alias("u"), F.col("a2.x").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    non_edge = cand.join(und, ["u", "v"], "left_anti")
    deg = adj.groupBy(F.col("w").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    return (
        non_edge.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            F.expr("common * 1000000 div (deg_u + deg_v - common)").alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "u", "v")
        .limit(_LP_TOP)
    )




# --- graph_2hop_reach — 2-hop neighborhood census (round 12) -----------------


_REACH2_ORACLE = f"""
    WITH knn AS (SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
      FROM knn
    ),
    sym AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT src AS vec_id, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY 1),
    h2 AS (
      SELECT DISTINCT a.src, b.dst
      FROM sym a JOIN sym b ON b.src = a.dst AND b.dst <> a.src
      WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.src = a.src AND s.dst = b.dst)
    ),
    n2 AS (SELECT src AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_two_hop FROM h2 GROUP BY 1)
    SELECT e.vec_id,
           COALESCE(deg.degree, 0) AS degree,
           COALESCE(n2.n_two_hop, 0) AS n_two_hop,
           COALESCE(deg.degree, 0) + COALESCE(n2.n_two_hop, 0) AS n_reach2
    FROM embeddings e
    LEFT JOIN deg USING (vec_id) LEFT JOIN n2 USING (vec_id)
    """




@register("graph_2hop_reach", group="llm-ext", oracle=_REACH2_ORACLE)
def graph_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-hop neighborhood census over the shared k-NN graph (round
    12): per node, its 1-hop degree, the number of STRICTLY-2-hop nodes
    (reachable through a neighbor, not adjacent, not self) and the total
    2-ball size — the expansion profile that tells a semantic-dedup
    review how fast cluster influence spreads (low 2-hop growth = tight
    near-dup pockets the CC pass will collapse; high growth = hub
    contamination), the BFS-frontier companion of
    [[graph_triangle_count]]'s closure view on the same edges.

    Algorithm: symmetric adjacency from the canonical undirected edges,
    one wedge equi-join (a.dst = b.src) for 2-hop candidates — O(n·k²)
    rows from a k-NN build, never O(n²) — then a hash ANTI join against
    the adjacency drops 1-hop shortcuts (the graph_link_predict
    discipline) and a distinct + count per source. All shuffles are on
    high-cardinality node keys; the edge build reuses the shared LSH
    checkpoint. At 100 TB the same plan is iterated BFS with lineage
    truncation per hop — 2 hops is two joins, never a driver loop."""
    nodes = table(spark, sf_dir, "embeddings").select("vec_id")
    und = (
        _knn_edges(spark, sf_dir)
        .select(
            F.least("vec_id", "nbr_id").alias("u"),
            F.greatest("vec_id", "nbr_id").alias("v"),
        )
        .distinct()
    )
    sym = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .union(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=False)  # wedge join + anti join + degree share it
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    a, b = sym.alias("a"), sym.alias("b")
    cand = (
        a.join(b, (F.col("a.dst") == F.col("b.src")) & (F.col("b.dst") != F.col("a.src")))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        .distinct()
    )
    strict2 = cand.join(sym, ["src", "dst"], "left_anti")
    n2 = strict2.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n_two_hop"))
    return (
        nodes.join(deg, nodes.vec_id == deg.src, "left")
        .drop("src")
        .join(n2, nodes.vec_id == n2.src, "left")
        .drop("src")
        .select(
            "vec_id",
            F.coalesce("degree", F.lit(0).cast("long")).alias("degree"),
            F.coalesce("n_two_hop", F.lit(0).cast("long")).alias("n_two_hop"),
            (
                F.coalesce("degree", F.lit(0).cast("long"))
                + F.coalesce("n_two_hop", F.lit(0).cast("long"))
            ).alias("n_reach2"),
        )
    )




# --- ml_knn_classify — k-NN label prediction over the shared graph ----------


_KNNC_ORACLE = f"""
    WITH knn AS (SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})),
    votes AS (
      SELECT k.vec_id, e.label AS lbl, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM knn k JOIN embeddings e ON e.vec_id = k.nbr_id
      GROUP BY 1, 2
    ), pred AS (
      SELECT vec_id, lbl AS pred_label
      FROM votes
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY n_votes DESC, lbl) = 1
    )
    SELECT CAST(e.label AS BIGINT) AS true_label,
           CAST(p.pred_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN embeddings e USING (vec_id)
    GROUP BY 1, 2
    """




@register("ml_knn_classify", group="llm-ext", oracle=_KNNC_ORACLE)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the shared approximate-NN graph (round
    12): each vector is predicted as the majority label of its LSH-bucket
    top-3 cosine neighbors (ties to the smallest label — a min(struct)
    argmax, the [[agg_mode_group]] discipline), scored as a label
    confusion matrix — the lazy-learner baseline every embedding-quality
    audit runs ([[ml_nb_classify]] is the parametric twin on text; if
    k-NN can't recover the labels, the embedding space is the problem).

    Plan: the edge list (O(n·k) rows, shared [[ann_knn_graph]] build)
    joins the label column on the NEIGHBOR key, votes partial-agg to
    (vec_id, label), the argmax is one more partial agg on vec_id, and
    the confusion rollup is |labels|²-bounded. The embedding vectors
    themselves never shuffle — only ids and labels."""
    labels = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    edges = _knn_edges(spark, sf_dir).select("vec_id", "nbr_id")
    votes = (
        edges.join(
            labels.select(F.col("vec_id").alias("nbr_id"), F.col("label").alias("lbl")),
            "nbr_id",
        )
        .groupBy("vec_id", "lbl")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    pred = votes.groupBy("vec_id").agg(
        F.min(F.struct((-F.col("n_votes")).alias("neg"), F.col("lbl").alias("lbl")))[
            "lbl"
        ].alias("pred_label")
    )
    return (
        pred.join(labels, "vec_id")
        .groupBy(
            F.col("label").cast("long").alias("true_label"),
            F.col("pred_label").cast("long").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )




# --- graph_assortativity — degree-mixing coefficient (round 12) --------------


_ASSORT_ORACLE = f"""
    WITH knn AS (SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})),
    und AS (
      SELECT DISTINCT least(vec_id, nbr_id) AS u, greatest(vec_id, nbr_id) AS v
      FROM knn
    ),
    sym AS (SELECT u AS src, v AS dst FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    ed AS (
      SELECT da.d AS x, db.d AS y
      FROM sym s JOIN deg da ON da.node = s.src JOIN deg db ON db.node = s.dst
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM ed
    )
    SELECT n AS n_directed_edges,
           (round(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)),
             6) + 0.0) AS assortativity
    FROM m
    """




@register("graph_assortativity", group="llm-ext", oracle=_ASSORT_ORACLE)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the k-NN similarity graph — the Pearson
    correlation of endpoint degrees over all directed edges (Newman's
    mixing coefficient): positive = hubs link hubs (a dense semantic
    core the dedup pass will collapse wholesale), negative = hub-spoke
    (centroids with singleton satellites — the IVF-friendly shape). One
    number that tells you which dedup topology you have before you run
    CC; completes the graph-statistics family beside
    [[graph_triangle_count]]'s local and [[graph_cc_sizes]]' global
    views.

    Plan: degrees from the symmetric edge list (one partial agg), each
    edge picks up both endpoint degrees via two id-key joins, then the
    Pearson moments are ONE exact-BIGINT partial-agg row (the
    [[stats_corr_matrix]] machinery on edges); HUGEINT/DECIMAL(38,0)
    numerators, one double chain. O(n·k) edge rows, never vectors."""
    und = (
        _knn_edges(spark, sf_dir)
        .select(
            F.least("vec_id", "nbr_id").alias("u"),
            F.greatest("vec_id", "nbr_id").alias("v"),
        )
        .distinct()
    )
    sym = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).union(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint(eager=False)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ed = (
        sym.join(deg.select(F.col("src").alias("a"), F.col("d").alias("x")), F.col("src") == F.col("a"))
        .join(deg.select(F.col("src").alias("b"), F.col("d").alias("y")), F.col("dst") == F.col("b"))
        .select("x", "y")
    )
    m = ed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (_dec2(F.col("n")) * F.col("sxy") - _dec2(F.col("sx")) * F.col("sy")).cast("double")
    vx = (_dec2(F.col("n")) * F.col("sxx") - _dec2(F.col("sx")) * F.col("sx")).cast("double")
    vy = (_dec2(F.col("n")) * F.col("syy") - _dec2(F.col("sy")) * F.col("sy")).cast("double")
    return m.select(
        F.col("n").alias("n_directed_edges"),
        round_pos(num / F.sqrt(vx * vy), 6).alias("assortativity"),
    )




# ---------------------------------------------------------------------------
# graph_hits — hubs & authorities on the k-NN graph


_HITS_ORACLE = f"""
    WITH knn AS (SELECT vec_id, nbr_id FROM ({_KNN_GRAPH_ORACLE})),
    n AS (SELECT vec_id FROM embeddings),
    a1 AS (SELECT nbr_id AS vec_id, SUM(1000000) AS s FROM knn GROUP BY 1),
    a1n AS (SELECT n.vec_id, COALESCE(a1.s, 0) AS s FROM n LEFT JOIN a1 USING (vec_id)),
    a1m AS (SELECT MAX(s) AS m FROM a1n),
    a1s AS (SELECT vec_id, s * 1000000 // m AS auth FROM a1n CROSS JOIN a1m),
    h1 AS (SELECT knn.vec_id, SUM(a1s.auth) AS s
           FROM knn JOIN a1s ON a1s.vec_id = knn.nbr_id GROUP BY 1),
    h1n AS (SELECT n.vec_id, COALESCE(h1.s, 0) AS s FROM n LEFT JOIN h1 USING (vec_id)),
    h1m AS (SELECT MAX(s) AS m FROM h1n),
    h1s AS (SELECT vec_id, s * 1000000 // m AS hub FROM h1n CROSS JOIN h1m),
    a2 AS (SELECT knn.nbr_id AS vec_id, SUM(h1s.hub) AS s
           FROM knn JOIN h1s ON h1s.vec_id = knn.vec_id GROUP BY 1),
    a2n AS (SELECT n.vec_id, COALESCE(a2.s, 0) AS s FROM n LEFT JOIN a2 USING (vec_id)),
    a2m AS (SELECT MAX(s) AS m FROM a2n),
    a2s AS (SELECT vec_id, s * 1000000 // m AS auth FROM a2n CROSS JOIN a2m),
    h2 AS (SELECT knn.vec_id, SUM(a2s.auth) AS s
           FROM knn JOIN a2s ON a2s.vec_id = knn.nbr_id GROUP BY 1),
    h2n AS (SELECT n.vec_id, COALESCE(h2.s, 0) AS s FROM n LEFT JOIN h2 USING (vec_id)),
    h2m AS (SELECT MAX(s) AS m FROM h2n)
    SELECT a2s.vec_id, CAST(a2s.auth AS BIGINT) AS authority,
           CAST(h2n.s * 1000000 // h2m.m AS BIGINT) AS hub
    FROM a2s JOIN h2n ON h2n.vec_id = a2s.vec_id CROSS JOIN h2m
    """




@register("graph_hits", group="llm-ext", oracle=_HITS_ORACLE)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of HITS (Kleinberg's hubs & authorities) over the
    directed k-NN similarity graph — the centrality pair
    [[graph_pagerank]] doesn't give: an AUTHORITY is a vector many
    others point at (a density center worth keeping in curation), a HUB
    points at many strong authorities (a broker/bridge vector;
    hub >> authority flags outliers whose own neighborhood is empty).
    Classic HITS normalizes each half-step by the L2 norm; this uses
    max-normalization to 0..1e6 (the same fixed-point family as
    PageRank's 1e6 scale) so every operation is exact integer SUM /
    `div` — identical in both engines, exact oracle, no rows-only
    escape for an "iterative" algorithm.

    Shape at scale (the graph_pagerank discipline): edges are built
    once by the banded k-NN stage (pairs bounded per LSH bucket) and
    lineage-truncated; each half-step is ONE co-partitioned edge⋈score
    join + a partial-agg SUM on the opposite endpoint, and the max is a
    single broadcast scalar (1-row crossJoin, a BNLJ probe, not a
    cartesian). |edges| rows move per half-step. Each normalized score
    table is localCheckpoint'd so the 4-level recursion never re-runs
    upstream steps. Integer headroom: score*1e6 stays < 2^63 up to
    ~9e6 in-degree; past that the SUM accumulates in DECIMAL(38,0) the
    way [[ml_linreg_normal]]'s `_dec` does."""
    edges = (
        _knn_edges(spark, sf_dir).select("vec_id", "nbr_id").localCheckpoint(eager=False)
    )
    nodes = table(spark, sf_dir, "embeddings").select("vec_id")

    def norm(scores: DataFrame, col: str) -> DataFrame:
        filled = nodes.join(scores, "vec_id", "left").select(
            "vec_id", F.coalesce("s", F.lit(0).cast("long")).alias("s")
        )
        m = filled.agg(F.max("s").alias("m"))
        return (
            filled.crossJoin(F.broadcast(m))
            .selectExpr("vec_id", f"s * 1000000 div m AS {col}")
            .localCheckpoint(eager=False)
        )

    def auth_step(hubs: DataFrame) -> DataFrame:
        return norm(
            edges.join(hubs, "vec_id")
            .groupBy(F.col("nbr_id").alias("vec_id"))
            .agg(F.sum("hub").alias("s")),
            "auth",
        )

    def hub_step(auths: DataFrame) -> DataFrame:
        return norm(
            edges.join(
                auths.select(F.col("vec_id").alias("nbr_id"), "auth"), "nbr_id"
            )
            .groupBy("vec_id")
            .agg(F.sum("auth").alias("s")),
            "hub",
        )

    h0 = nodes.select("vec_id", F.lit(1000000).cast("long").alias("hub"))
    a1 = auth_step(h0)
    h1 = hub_step(a1)
    a2 = auth_step(h1)
    h2 = hub_step(a2)
    return (
        a2.join(h2, "vec_id")
        .selectExpr("vec_id", "cast(auth as bigint) AS authority", "cast(hub as bigint) AS hub")
    )
