"""Link-graph operators: hyperlink extraction and PageRank.

The web-scale corpus primitives the HTML side of the north rule implies:
`extract_links` turns the raw HTML turns into an edge relation (the
link graph every crawl pipeline materializes), and `pagerank` runs the
canonical iterative graph centrality over it — the classic quality
prior for crawl corpora (and the original reason MapReduce-style
engines exist). Extraction is one codegen regexp pass (the reference's
DOM tokenizer handles layout; links only need the anchor-tag grammar,
ref /root/reference/pdf_extractor_protocol.py HTML handling); PageRank
is the `dedup.connected_components` pattern — per-iteration bounded
driver traffic, rounded state at every boundary so an unrolled SQL
twin replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# anchor-tag grammar: double-quoted href, text up to the closing tag.
# No \s classes anywhere (the Java-vs-RE2 \x0B fork, dedup.WS_CHARS).
LINK_RE = '<a href="([^"]*)">([^<]*)</a>'


def extract_links(df: DataFrame, id_cols: tuple = ("conv_id", "turn_idx"),
                  text_col: str = "text") -> DataFrame:
    """Hyperlink edge extraction: one whole-stage-codegen projection —
    two `regexp_extract_all` group captures zipped and position-exploded
    into (id..., link_idx, href, anchor) rows. No DOM parse, no Python:
    the anchor-tag regex is the whole grammar, so a 100 TB crawl pays
    exactly one scan. Turns without links emit nothing."""
    hrefs = F.expr(f"regexp_extract_all({text_col}, '{LINK_RE}', 1)")
    anchors = F.expr(f"regexp_extract_all({text_col}, '{LINK_RE}', 2)")
    return (df.select(*id_cols,
                      F.posexplode(F.arrays_zip(hrefs.alias("h"),
                                                anchors.alias("a"))))
            .select(*id_cols,
                    F.col("pos").cast("long").alias("link_idx"),
                    F.col("col.h").alias("href"),
                    F.col("col.a").alias("anchor")))


def pagerank(edges: DataFrame, iters: int = 2, d: float = 0.85,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """PageRank with uniform teleport and dangling-mass redistribution:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + D/N)

    where D is the total rank sitting on dangling nodes (no out-edges).

    Distributed shape (the `connected_components` discipline): each
    iteration is ONE contribution shuffle keyed on dst — the edge
    relation joins the current ranks (broadcast when small, hash-join
    otherwise) and partially aggregates r/outdeg per dst; the dangling
    mass D is ONE driver scalar per iteration, summed as exact 1e-9
    integer units (ranks are 9dp-rounded state, so D is
    order-independent and engine-exact where a float sum would drift
    ulps into the boundary). Ranks are rounded 9dp at every iteration
    boundary — the `kmeans_refine` protocol that lets an UNROLLED SQL
    twin replay an iterative distributed algorithm hash-for-hash.
    State is localCheckpointed per iteration (lineage would otherwise
    double per round). Duplicate edges count twice by design (parallel
    links = stronger endorsement); pre-`distinct` to change that."""
    # materialize the edge relation ONCE: every iteration (plus the
    # node set and degree frame) re-reads it, so an expensive upstream
    # lineage — extract_links' regexp scan here — would otherwise
    # re-run 2+iters times (measured 11x wall at sf1 before this:
    # 102 s -> 9.3 s). At cluster scale this is "write the edge table
    # before iterating", which every graph engine does.
    edges = edges.localCheckpoint()
    nodes = (edges.select(F.col(src_col).alias("node"))
             .union(edges.select(F.col(dst_col).alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    deg = (edges.groupBy(F.col(src_col).alias("node"))
           .agg(F.count(F.lit(1)).alias("outdeg"))
           .localCheckpoint())
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 9).alias("r")) \
        .localCheckpoint()

    for _ in range(iters):
        ranks = _pagerank_iteration(
            nodes, edges, deg, ranks, d, n,
            src_col=src_col, dst_col=dst_col).localCheckpoint()
    return ranks


def pagerank_converged(edges: DataFrame, max_iters: int = 20,
                       tol: float = 1e-6, d: float = 0.85,
                       src_col: str = "src",
                       dst_col: str = "dst") -> tuple:
    """`pagerank` with per-iteration convergence reporting and early
    stop: returns ``(ranks, deltas)`` where ``deltas[i]`` is the L1
    distance Σ|r'(v) - r(v)| after iteration i+1, summed as exact 1e-9
    integer units over the 9dp-rounded state (same order-independent
    scalar discipline as the dangling mass). Iteration stops when the
    delta drops below ``tol`` or at ``max_iters``.

    This is the production entry (`jobs/graph_job.py` default): the
    fixed-`iters` `pagerank` stays the hash-exact gate/oracle surface
    (an unrolled SQL twin needs a static iteration count), while a real
    crawl-prioritization run wants to *observe* convergence — the delta
    sequence is the evidence the ranking is stable, and each delta
    costs one extra bounded-size join over state already checkpointed
    that round."""
    edges = edges.localCheckpoint()
    nodes = (edges.select(F.col(src_col).alias("node"))
             .union(edges.select(F.col(dst_col).alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    deg = (edges.groupBy(F.col(src_col).alias("node"))
           .agg(F.count(F.lit(1)).alias("outdeg"))
           .localCheckpoint())
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 9).alias("r")) \
        .localCheckpoint()

    deltas: list[float] = []
    for _ in range(max_iters):
        nxt = _pagerank_iteration(
            nodes, edges, deg, ranks, d, n,
            src_col=src_col, dst_col=dst_col).localCheckpoint()
        units = (nxt.join(ranks.withColumnRenamed("r", "r_prev"), "node")
                 .agg(F.sum(F.abs(F.round(F.col("r") * 1e9)
                                  - F.round(F.col("r_prev") * 1e9))
                            .cast("long")).alias("u"))
                 .first()["u"]) or 0
        delta = float(units) / 1e9
        deltas.append(delta)
        ranks = nxt
        if delta < tol:
            break
    return ranks, deltas


def _pagerank_iteration(nodes: DataFrame, edges: DataFrame,
                        deg: DataFrame, ranks: DataFrame,
                        d: float, n: int, src_col: str = "src",
                        dst_col: str = "dst") -> DataFrame:
    """One un-checkpointed PageRank step (split out so the plan audit
    can assert the iteration's physical shape before the checkpoint
    collapses it to a Scan ExistingRDD)."""
    with_deg = ranks.join(deg, "node", "left")
    dangling = (with_deg.filter(F.col("outdeg").isNull())
                .agg(F.sum(F.round(F.col("r") * 1e9)
                           .cast("long")).alias("units"))
                .first()["units"]) or 0
    dmass = float(dangling) / 1e9
    contrib = (edges
               .join(with_deg.filter(F.col("outdeg").isNotNull()),
                     edges[src_col] == F.col("node"))
               .select(F.col(dst_col).alias("node"),
                       (F.col("r") / F.col("outdeg")).alias("c")))
    summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
    base = (1.0 - d) / n + d * (dmass / n)
    return (nodes.join(summed, "node", "left")
            .select("node",
                    F.round(F.lit(base)
                            + d * F.coalesce(F.col("s"), F.lit(0.0)),
                            9).alias("r")))


def hits(edges: DataFrame, iters: int = 1,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) — PageRank's
    bipartite sibling, the natural centrality for link graphs where
    sources and targets play different roles (conversations CITE
    section pages; pages are ENDORSED): per iteration, authority(v) =
    Σ hub(u) over u→v, then hub(u) = Σ authority(v) over u→v, each
    L1-normalized.

    Same distributed discipline as `pagerank`: edges/nodes
    materialized once, each half-step is ONE contribution shuffle, and
    the L1 normalizer is a driver scalar summed as exact 1e-9 integer
    units over the 9dp-rounded scores (order-independent, so the
    unrolled SQL twin replays every stage hash-for-hash). Output:
    (node, hub, auth), both rounded 9dp."""
    edges = edges.localCheckpoint()
    nodes = (edges.select(F.col(src_col).alias("node"))
             .union(edges.select(F.col(dst_col).alias("node")))
             .distinct().localCheckpoint())

    def _normalize(scores: DataFrame, col: str) -> DataFrame:
        units = (scores.agg(F.sum(F.round(F.col(col) * 1e9)
                                  .cast("long")).alias("u"))
                 .first()["u"]) or 0
        s = float(units) / 1e9
        if s == 0.0:
            return scores
        return scores.select("node",
                             F.round(F.col(col) / s, 9).alias(col))

    def _step(scores: DataFrame, score_col: str, key_in: str,
              key_out: str, out_col: str) -> DataFrame:
        raw = (edges.join(scores, edges[key_in] == F.col("node"))
               .groupBy(F.col(key_out).alias("n2"))
               .agg(F.sum(score_col).alias("raw")))
        nine = (nodes.join(raw, nodes["node"] == F.col("n2"), "left")
                .select("node",
                        F.round(F.coalesce(F.col("raw"), F.lit(0.0)), 9)
                        .alias(out_col)))
        return _normalize(nine, out_col).localCheckpoint()

    h = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint()
    a = None
    for _ in range(iters):
        a = _step(h, "hub", src_col, dst_col, "auth")
        h = _step(a, "auth", dst_col, src_col, "hub")
    return (h.join(a, "node")
            .select("node", "hub", "auth"))


def hits_converged(edges: DataFrame, max_iters: int = 20,
                   tol: float = 1e-6, src_col: str = "src",
                   dst_col: str = "dst") -> tuple:
    """`hits` with per-iteration convergence reporting and early stop —
    the `pagerank_converged` protocol applied to the bipartite scores:
    returns ``(scores, deltas)`` where ``deltas[i]`` is the L1 distance
    of the HUB vector after full iteration i+1 (hub moves second, so
    its delta bounds the authority delta one half-step earlier),
    summed as exact 1e-9 integer units over the 9dp-rounded state.
    Same one-shuffle half-steps as the fixed-iters `hits`, which stays
    the gate/oracle surface; the only deliberate difference is the
    L1-normalized start (hub = 1/N, so the delta sequence is on the
    normalized scale from iteration 1), which follows the same
    trajectory up to 9dp rounding of intermediate sums."""
    edges = edges.localCheckpoint()
    nodes = (edges.select(F.col(src_col).alias("node"))
             .union(edges.select(F.col(dst_col).alias("node")))
             .distinct().localCheckpoint())

    def _normalize(scores: DataFrame, col: str) -> DataFrame:
        units = (scores.agg(F.sum(F.round(F.col(col) * 1e9)
                                  .cast("long")).alias("u"))
                 .first()["u"]) or 0
        s = float(units) / 1e9
        if s == 0.0:
            return scores
        return scores.select("node",
                             F.round(F.col(col) / s, 9).alias(col))

    def _step(scores: DataFrame, score_col: str, key_in: str,
              key_out: str, out_col: str) -> DataFrame:
        raw = (edges.join(scores, edges[key_in] == F.col("node"))
               .groupBy(F.col(key_out).alias("n2"))
               .agg(F.sum(score_col).alias("raw")))
        nine = (nodes.join(raw, nodes["node"] == F.col("n2"), "left")
                .select("node",
                        F.round(F.coalesce(F.col("raw"), F.lit(0.0)), 9)
                        .alias(out_col)))
        return _normalize(nine, out_col).localCheckpoint()

    h = nodes.select("node", F.lit(1.0).alias("hub"))
    h = _normalize(h, "hub").localCheckpoint()
    a = None
    deltas: list[float] = []
    for _ in range(max_iters):
        a = _step(h, "hub", src_col, dst_col, "auth")
        nxt = _step(a, "auth", dst_col, src_col, "hub")
        units = (nxt.join(h.withColumnRenamed("hub", "h_prev"), "node")
                 .agg(F.sum(F.abs(F.round(F.col("hub") * 1e9)
                                  - F.round(F.col("h_prev") * 1e9))
                            .cast("long")).alias("u"))
                 .first()["u"]) or 0
        delta = float(units) / 1e9
        deltas.append(delta)
        h = nxt
        if delta < tol:
            break
    return h.join(a, "node").select("node", "hub", "auth"), deltas
