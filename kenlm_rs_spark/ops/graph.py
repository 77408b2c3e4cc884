"""Web link-graph analytics: href extraction, degree statistics, and
PageRank (Page et al. 1999, "The PageRank Citation Ranking").

A web-corpus pipeline uses the link graph for spam/quality signals
(in-degree, reciprocal-link farms, PageRank mass) next to the text-level
filters. The reference engine has no graph operators; these follow the
repo's iterative-operator pattern (ops/components.py).

Scale shape (100 TB):
- ``extract_links``: a narrow codegen projection (regexp_extract_all +
  explode) — no shuffle until the caller aggregates.
- ``degree_stats``: two uniform-key groupBys (src, dst) + one outer join
  on node. Mega-hub skew on dst is the salted-aggregation shape
  (ops/partitioning.py) if a single host dominates.
- ``pagerank``: per iteration ONE shuffle (groupBy dst) + one join back
  to the node table; ranks are node-sized, edges are the big table and
  are re-used unshuffled each round (join on src is broadcast-able only
  when nodes fit — at web scale both sides shuffle-hash on node id, and
  pre-bucketing edges by src makes every round's join co-located).
  Lineage is truncated per round with localCheckpoint like
  ops/components.py.

Engine-exact iteration (the repo's float-parity discipline): each edge
contribution is round(rank/out_deg, 9) cast DECIMAL(38,9) BEFORE the sum,
so the per-destination aggregation is order-independent and bit-equal
across engines; the new rank is round(base + damping*sum, 9) — one
IEEE-exact add/multiply chain on already-rounded values. Dangling-node
mass (out_deg = 0) is dropped by default, the standard map-reduce
simplification; ranks then sum to < 1 but the ordering signal is
unchanged. ``dangling="redistribute"`` instead folds the dangling mass
back uniformly each iteration (Page et al. 1999 §2.7's strongly-preferred
variant when rank VALUES are consumed absolutely, not just the order):
dsum = Σ over out_deg-0 nodes of rank::DECIMAL(38,9) (exact — ranks are
already round-9 doubles), ds = round(dsum::DOUBLE / N, 9) — ONE scalar per
iteration, broadcast via a 1-row cross join — and the update becomes
round(base/N + damping*(contrib + ds), 9). Ranks then sum to 1 up to
round-9 truncation. Cost: one extra node-sized anti-join aggregate per
iteration; the edge table is untouched, so the 100 TB shape is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Broadcast the node-sized side of every per-iteration PageRank join when
#: the graph has at most this many nodes (known exactly on the driver —
#: pagerank counts them anyway for 1/N).  Ranks/contrib rows are ~24 bytes,
#: so 4M nodes ≈ 100 MB broadcast — comfortably inside executors; above the
#: bound the joins fall back to the shuffled shape (pre-bucketing edges by
#: src is the documented web-scale move).  Scale-ADAPTIVE by node count,
#: not tuned to a core count (guide §3.1: pick the strategy deliberately
#: when the real size is known and estimates are not).
PAGERANK_BROADCAST_MAX_NODES = int(
    os.environ.get("KENLM_PAGERANK_BROADCAST_MAX_NODES", "4000000")
)

# href="..." / href='...' — attribute form only, tag-agnostic (matches <a>,
# <link>, <area>); the canonicalization/scheme filter composes downstream
# (ops/urls.canonical_url).
HREF_RE = r"""href=["']([^"']+)["']"""


def extract_links(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, href) per href attribute occurrence, document order
    preserved in ``pos``. Pure codegen (regexp_extract_all + posexplode)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.col(html_col).cast("string"), F.lit(HREF_RE), 1
            )
        ).alias("pos", "href"),
    )


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node out-degree and in-degree over a distinct edge set."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("out_deg")
    )
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
    dangling: str = "drop",
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous iterations from the
    uniform start round(1/N, 9). See module docstring for the exact
    arithmetic contract (shared with the unrolled SQL twin,
    __spark_entry__.pagerank_iter_sql). ``dangling``: "drop" (default)
    loses the mass of out-degree-0 nodes; "redistribute" folds it back
    uniformly each iteration (scalar cross join — see module docstring)."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    if dangling not in ("drop", "redistribute"):
        raise ValueError("dangling must be 'drop' or 'redistribute'")
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).distinct()
    e = e.persist()
    # loop-invariant node table: persisted, NOT recomputed per iteration
    # (r7: the union+distinct subtree used to re-execute inside every
    # iteration's update join — 2 shuffles x n_iter for a fixed table)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    out_deg = e.groupBy("src").agg(F.count("*").cast("long").alias("out_deg"))
    e_deg = e.join(out_deg, "src").persist()

    n = nodes.count()
    # node-sized sides (ranks, contrib, dangling set) are broadcast when
    # the exact node count permits: the edge table then never shuffles in
    # the iteration (BroadcastHashJoin on its cached partitions) — only
    # the per-destination contribution aggregation exchanges, and those
    # rows are (dst, decimal) pairs, not edges (guide §2.3/§3.1)
    bcast = n <= PAGERANK_BROADCAST_MAX_NODES
    _b = F.broadcast if bcast else (lambda df: df)
    dang_nodes = None
    if dangling == "redistribute":
        # loop-invariant dangling-node SET (out_deg = 0): the per-iteration
        # anti-join against out_deg collapses to a semi-join with this
        # persisted node-sized table (r7; only the ranks values change)
        dang_nodes = nodes.join(
            out_deg, nodes.node == out_deg.src, "left_anti"
        ).persist()
    base = 1.0 - damping  # teleport mass; divided by N in the update
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / F.lit(float(n)), 9).alias("rank")
    )
    for it in range(n_iter):
        contrib = (
            e_deg.join(_b(ranks), e_deg.src == ranks.node)
            .select(
                "dst",
                F.round(F.col("rank") / F.col("out_deg"), 9)
                .cast("decimal(38,9)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        if dangling == "redistribute":
            # dsum over out-degree-0 nodes is an exact DECIMAL(38,9) sum
            # (ranks are round-9 doubles); ds is one scalar row, broadcast.
            dang = (
                ranks.join(_b(dang_nodes), "node", "leftsemi")
                .agg(
                    F.coalesce(
                        F.sum(F.col("rank").cast("decimal(38,9)")),
                        F.lit(0).cast("decimal(38,9)"),
                    ).alias("dsum")
                )
                .select(
                    F.round(
                        F.col("dsum").cast("double") / F.lit(float(n)), 9
                    ).alias("ds")
                )
            )
            ranks = (
                nodes.join(_b(contrib), nodes.node == contrib.dst, "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    F.round(
                        F.lit(base) / F.lit(float(n))
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                            + F.col("ds")
                        ),
                        9,
                    ).alias("rank"),
                )
            )
        else:
            ranks = nodes.join(
                _b(contrib), nodes.node == contrib.dst, "left"
            ).select(
                "node",
                F.round(
                    F.lit(base) / F.lit(float(n))
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
        # r7 (measured A/B on sf0.1): the dangling path references ranks
        # TWICE per iteration (contribution join + dangling-mass fold), so
        # without per-iteration truncation the plan/evaluation doubles per
        # round (5 iters unchecked: 22.9 s vs 5.1-7.6 s).  The plain path
        # references ranks once — its lineage is a linear chain, and the
        # per-iteration checkpoint was pure materialization overhead
        # (8.0 s -> 5.9 s without); truncate every 8th round only, which
        # bounds plan depth for large n_iter.
        if checkpoint and (
            dangling == "redistribute" or (it + 1) % 8 == 0
        ):
            ranks = ranks.localCheckpoint(eager=False)
    ranks.cached_deps = [e, e_deg, nodes] + (
        [dang_nodes] if dang_nodes is not None else []
    )
    return ranks


# <a ...href="...">anchor</a> — href + inner text captured by ONE pattern so
# the two regexp_extract_all passes align positionally (arrays_zip). Inner
# text stops at the first '<' (no nested markup), the common-crawl-practical
# subset; both quote styles accepted, attributes may precede/follow href.
ANCHOR_RE = r"""<a [^>]*?href=["']([^"']+)["'][^>]*>([^<]*)</a>"""


def extract_anchors(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, href, anchor) per <a> occurrence — pure codegen: the
    SAME regex run once per capture group, zipped positionally (identical
    match set, so the arrays always align). Anchor text is a search/quality
    signal aggregated per TARGET page (anchor_text_topk)."""
    html = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 2).alias("anchor"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(pairs).alias("pos", "z")
    ).select("doc_id", "pos", F.col("z.href").alias("href"), F.col("z.anchor").alias("anchor"))


def anchor_text_topk(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Top-k anchor texts per target href by occurrence count, ties broken
    on anchor text ascending (deterministic, engine-portable).

    Scale shape: the corpus-sized explode collapses in ONE uniform-key
    groupBy (href, anchor) with map-side combine; the window then runs on
    the distinct-anchor table, whose per-href partitions are bounded by
    anchor-text diversity, not by link popularity (a mega-hub with 10^9
    in-links and 50 distinct anchor strings is a 50-row partition). A
    pathological href with millions of DISTINCT anchors is the salted
    two-phase aggregation shape (ops/partitioning.py) — cap with a
    HAVING count >= floor first at 10^12."""
    from pyspark.sql import Window

    cnt = anchors.groupBy("href", "anchor").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("href").orderBy(F.col("n").desc(), F.col("anchor"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
