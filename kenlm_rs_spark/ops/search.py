"""Full-text retrieval primitives: inverted index, TF-IDF keyword
extraction, and BM25 top-k search (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond").

Scale shape (100 TB):
- ``inverted_index``: one explode + groupBy(term) — the posting lists are
  the groupBy output; uniform token keys, map-side partial counts. At web
  scale you'd range-bucket terms before collect_list to bound a hot term's
  posting list per partition; here the list aggregation is left whole and
  the cap is documented at the call.
- ``tfidf_topk``: per-(doc, term) tf join broadcast idf (vocab-sized per
  partition after a distinct), per-doc top-k via rank window — partitioned
  by doc_id, so no global sort.
- ``bm25_search``: the classic tiny-queries × huge-corpus shape. Query
  terms (a few dozen rows) broadcast against the per-(doc, term) tf table —
  the corpus is filtered to matching terms BEFORE any shuffle; scores
  aggregate per (query, doc); top-k via a per-query rank window.

Engine-exact scoring (the repo's float-parity discipline, CLAUDE.md):
every per-term weight is rounded to 9 decimals and cast to DECIMAL(38,9)
BEFORE the sum, making the aggregation order-independent and bit-equal
across engines; ln() is the only libm call and its last-ulp spread is
absorbed by the round-9. Final scores are surfaced rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.textstats import tokens_col


def doc_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_keyed: bool = True,
) -> DataFrame:
    """Per-(doc, term) frequency + doc length: the shared base relation.

    ``doc_keyed`` (r7 second pass, guide §2.4): exchange the token stream
    ONCE keyed by doc_id — HashPartitioning(doc_id) satisfies the
    clustering requirement of the (doc, term) count, the dl window, AND
    any downstream per-doc window (tfidf's rank), so none of them inserts
    its own exchange.  Callers that immediately re-key by term and never
    read dl (inverted_index) pass False and keep the (doc, term)
    partial-aggregation exchange instead."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    if doc_keyed:
        toks = toks.repartition("doc_id")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    # r7 (guide §2.4): dl = Σ tf per doc — identical to counting the raw
    # token stream, but derived from the already-aggregated tf table via a
    # window sum, so the corpus tokenize+explode runs ONCE instead of twice
    # (the second groupBy re-executed the whole scan subtree; Catalyst does
    # not CSE it).  Callers that never read dl (inverted_index) get the
    # window pruned away entirely.
    return tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """term -> sorted posting list [(doc_id, tf), ...] + document frequency.
    At 100 TB, cap or bucket hot terms before collect_list (a stopword's
    postings are corpus-sized); the df/tf aggregation itself is safe."""
    terms = doc_terms(df, text_col, id_col, doc_keyed=False)
    return terms.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sort_array(
            F.collect_list(F.struct("doc_id", "tf"))
        ).alias("postings"),
    )


def _idf_bm25(df_col, n_docs: int):
    # BM25+-style idf, always positive: ln(1 + (N - df + .5)/(df + .5))
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf
    (idf = ln((N+1)/(df+1)) + 1, the smoothed sklearn form). Ties break on
    term ascending; the weight is rounded to 9 then surfaced at 6."""
    terms = doc_terms(df, text_col, id_col).persist()
    n_docs = terms.select("doc_id").distinct().count()
    dfreq = terms.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    ) + F.lit(1.0)
    scored = terms.join(F.broadcast(dfreq), "term").withColumn(
        "w", F.round(F.col("tf") * idf, 9)
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("w"), F.asc("term")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            F.round("w", 6).alias("tfidf"),
            "rank",
        )
    )
    out.cached_deps = [terms]
    return out


def bm25_search(
    df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """BM25 top-k documents per query. ``queries_df`` is tiny
    (query_id, query text); its terms broadcast against the per-(doc, term)
    table so the corpus is term-filtered before any shuffle."""
    terms = doc_terms(df, text_col, id_col).persist()
    stats = terms.groupBy().agg(
        F.countDistinct("doc_id").alias("n"),
        F.sum("tf").alias("total"),
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["total"]) / int(stats["n"])

    dfreq = terms.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    qterms = (
        queries_df.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(tokens_col(F.col(query_col)))
            ).alias("term"),
        )
    )
    tfnorm = (F.col("tf") * (F.lit(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    w = F.round(_idf_bm25(F.col("df"), n_docs) * tfnorm, 9).cast(
        "decimal(38,9)"
    )
    scored = (
        terms.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(w).alias("score_dec"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("score_dec"), F.asc("doc_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score_dec").cast("double"), 6).alias("score"),
            "rank",
        )
    )
    out.cached_deps = [terms]
    return out
