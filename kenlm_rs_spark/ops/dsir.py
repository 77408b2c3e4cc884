"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

The standard public recipe for picking "target-domain-like" documents out
of a raw web crawl without running a model over the corpus: hash every
word n-gram into B buckets, fit two bag-of-hashed-ngrams unigram models
(target seed corpus vs raw corpus), and score each document by its
log-likelihood ratio sum_g [ln p_tgt(bucket(g)) - ln p_raw(bucket(g))].
Documents whose n-gram profile looks like the target score high.

Scale shape (100 TB):
- feature counting is one explode + groupBy(bucket) with B = O(10^4)
  distinct keys — Catalyst's partial aggregation collapses it map-side,
  so the shuffle carries at most B rows per task regardless of corpus
  size;
- the weight table is exactly B rows, broadcast to the scoring join —
  the corpus is never shuffled for scoring except the final
  groupBy(doc_id) (one shuffle on the uniform id key);
- selection reuses the mergeable histogram sketch (ops/quantiles.py) to
  fit the keep threshold — no global sort, unlike naive top-k.

Engine-exactness: buckets come from the repo-wide md5-hex-prefix idiom
(bit-identical in any engine with md5); per-bucket weights are a single
ln() rounded to 9 decimals (round-9 absorbs libm last-ulp, the
ops/search.py discipline) and cast DECIMAL(38,9); per-document scores
are DECIMAL sums — exact integers in scaled arithmetic, so summation
order cannot change them.

Reference has no equivalent (this is pipeline surface beyond kenlm-rs);
the smoothing follows the paper's add-1 over B buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.textstats import ngrams_from_tokens, tokens_col

# Shared render source for the hash — keep the Spark and SQL twins in sync.
DSIR_SALT = "dsir:"


def _bucket(ngram_col, buckets: int):
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(DSIR_SALT), ngram_col)), 1, 15), 16, 10
    ).cast("bigint")
    return F.pmod(h, F.lit(buckets)).cast("long")


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    orders: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(doc_id, bucket) — one row per word n-gram OCCURRENCE (multiplicity
    matters: the score is a sum over the document's n-gram stream).
    Tokenizes once and derives every order from the same array."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    toks = tokens_col(F.col(text_col))
    grams = None
    for n in orders:
        g = ngrams_from_tokens(F.col("_toks"), n)
        grams = g if grams is None else F.concat(grams, g)
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", F.explode(grams).alias("ngram"))
        .select("doc_id", _bucket(F.col("ngram"), buckets).alias("bucket"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    orders: tuple[int, ...] = (1, 2),
    raw_features: DataFrame | None = None,
    target_features: DataFrame | None = None,
) -> DataFrame:
    """(bucket, w) over the FULL 0..B-1 spine: w = round(ln((ct+1)/(Nt+B))
    - ln((cr+1)/(Nr+B)), 9) as DECIMAL(38,9) — add-1 smoothing means every
    bucket has a finite weight even if unseen in one corpus.

    ``raw_features``/``target_features`` (r7): precomputed (ideally
    cached) ``hashed_features`` tables — a caller that also scores the
    raw corpus (dsir_scores) shares ONE tokenize+hash pass instead of
    re-running it per consumer; when the target is a subset of the raw
    corpus, pass the cached raw features semi-joined to the target ids
    (bit-identical to re-hashing the subset, minus the second
    tokenize+md5 pass)."""
    spark = raw.sparkSession

    def counts(df, name, feats=None):
        if feats is None:
            feats = hashed_features(df, text_col, id_col, buckets, orders)
        return (
            feats.groupBy("bucket")
            .agg(F.count("*").cast("long").alias(name))
        )

    cr = counts(raw, "cr", raw_features)
    ct = counts(target, "ct", target_features)
    spine = spark.range(buckets).select(F.col("id").cast("long").alias("bucket"))
    # r7: cached — joined (spine-sized: B rows) feeds BOTH the scalar
    # totals aggregate and the final weight projection; without the cache
    # the whole corpus/target count subtree re-executed per reference
    joined = (
        spine.join(cr, "bucket", "left")
        .join(ct, "bucket", "left")
        .fillna(0, ["cr", "ct"])
        .cache()
    )
    totals = joined.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    # scalar totals: broadcast 1-row cross join (the ops/mixing.py pattern)
    w = F.round(
        F.log((F.col("ct") + 1.0) / (F.col("nt") + float(buckets)))
        - F.log((F.col("cr") + 1.0) / (F.col("nr") + float(buckets))),
        9,
    ).cast("decimal(38,9)")
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket", w.alias("w")
    )


def dsir_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    orders: tuple[int, ...] = (1, 2),
    features: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, dsir_score) — decimal-exact sum of bucket weights over the
    document's n-gram stream, emitted as round(score, 6) double. Documents
    with zero n-grams score 0 (left join keeps them). ``features`` (r7):
    share a precomputed hashed_features table with dsir_weights."""
    feats = (
        features
        if features is not None
        else hashed_features(df, text_col, id_col, buckets, orders)
    )
    per_doc = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("score_dec"))
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.round(
            F.coalesce(F.col("score_dec"), F.lit(0).cast("decimal(38,9)"))
            .cast("double"),
            6,
        ).alias("dsir_score"),
    )


def dsir_select(
    scores: DataFrame,
    keep_num: int,
    keep_den: int,
    bin_width: float = 0.25,
) -> DataFrame:
    """Keep the top keep_num/keep_den fraction by score WITHOUT a global
    sort: fit the (1 - frac) quantile with the mergeable histogram sketch
    (ops/quantiles.py) and keep score >= threshold. Exact up to bin_width
    at the boundary — the DSIR paper itself resamples stochastically, so
    a bin-width boundary band is well inside the method's noise."""
    from kenlm_rs_spark.ops.quantiles import quantiles_of

    if not (0 < keep_num <= keep_den):
        raise ValueError(f"keep fraction must be in (0,1], got {keep_num}/{keep_den}")
    thr = quantiles_of(
        scores,
        "dsir_score",
        probs=[(keep_den - keep_num, keep_den)],
        bin_width=bin_width,
    ).select(F.col("quantile").alias("_thr"))
    return (
        scores.crossJoin(F.broadcast(thr))
        .filter(F.col("dsir_score") >= F.col("_thr"))
        .drop("_thr")
    )
