"""Keyword-taxonomy topic tagging — assign each document a topic by
dictionary lookup over its tokens (the Pile/Dolma-style source/domain
bucketing signal: mixture construction wants per-topic token budgets, and
a frozen keyword->topic dictionary is the standard cheap classifier
before any model-based tagger). Per doc: per-topic keyword hit counts,
the dominant topic (most hits, min-struct tie-break — no per-doc window),
and the hit density.

The reference engine has no taxonomy tagging; this extends the mixing
surface (ops/mixing.py consumes exactly the (doc, topic) assignment this
produces as its group column).

Scale shape (100 TB): tokenize once (the shared TOKEN_SPLIT discipline),
posexplode -> broadcast hash join against the dictionary (dictionaries
are thousands of rows — KBs), one groupBy(doc_id, topic) + one
groupBy(doc_id) with min(struct(-hits, topic)) for the argmax. The
corpus shuffles only on doc_id (uniform); the dictionary never shuffles
the corpus. Left-anti docs (zero hits) are restored by a join back to
the id spine so the output is total.

Engine-exactness: integer hit counts, rational density (hits/tokens)
round-6ed — one IEEE division; tokenization is the repo-wide
TOKEN_SPLIT; matching is exact lowercase token equality (no stemming —
deterministic by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import TOKEN_SPLIT

# frozen demo taxonomy (a deployment swaps in its own dictionary table);
# lowercase keyword -> topic, exact token match.
DEFAULT_TAXONOMY: tuple[tuple[str, str], ...] = (
    ("science", "stem"), ("physics", "stem"), ("theorem", "stem"),
    ("chemistry", "stem"), ("biology", "stem"), ("mathematics", "stem"),
    ("software", "tech"), ("computer", "tech"), ("data", "tech"),
    ("internet", "tech"), ("algorithm", "tech"), ("code", "tech"),
    ("election", "politics"), ("government", "politics"),
    ("policy", "politics"), ("senate", "politics"), ("law", "politics"),
    ("market", "finance"), ("stock", "finance"), ("bank", "finance"),
    ("price", "finance"), ("trade", "finance"), ("economy", "finance"),
    ("game", "sports"), ("team", "sports"), ("season", "sports"),
    ("player", "sports"), ("score", "sports"), ("league", "sports"),
    ("film", "culture"), ("music", "culture"), ("novel", "culture"),
    ("art", "culture"), ("theatre", "culture"), ("festival", "culture"),
)


def topic_tag(
    df: DataFrame,
    taxonomy: tuple[tuple[str, str], ...] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, n_hits, topic, topic_hits, density): dominant
    topic per document (null when no keyword matches). Total over input
    docs; `density` = n_hits/n_tokens round-6 (null for empty docs)."""
    tax = taxonomy if taxonomy is not None else DEFAULT_TAXONOMY
    if len(set(k for k, _ in tax)) != len(tax):
        raise ValueError("duplicate keywords in taxonomy")
    spark = df.sparkSession
    dic = spark.createDataFrame(list(tax), "kw string, topic string")
    return _topic_tag_with_dic(df, dic, text_col, id_col)


def _topic_tag_with_dic(
    df: DataFrame, dic_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    dic = F.broadcast(dic_df)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), TOKEN_SPLIT
        ).alias("toks"),
    )
    spine = base.select(
        "doc_id",
        F.size(F.filter("toks", lambda t: t != "")).cast("long").alias("n_tokens"),
    )
    ex = base.select("doc_id", F.explode("toks").alias("kw"))
    hits = (
        ex.join(dic, "kw")
        .groupBy("doc_id", "topic")
        .agg(F.count(F.lit(1)).cast("long").alias("topic_hits"))
    )
    best = hits.groupBy("doc_id").agg(
        F.sum("topic_hits").cast("long").alias("n_hits"),
        F.min(
            F.struct(
                (-F.col("topic_hits")).alias("neg"),
                F.col("topic").alias("topic"),
            )
        ).alias("_b"),
    )
    return (
        spine.join(best, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.col("_b.topic").alias("topic"),
            F.coalesce(F.col("_b.neg") * -1, F.lit(0))
            .cast("long")
            .alias("topic_hits"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("n_hits", F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                    6,
                ),
            ).alias("density"),
        )
    )


def topic_tag_table(
    df: DataFrame,
    taxonomy_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kw_col: str = "kw",
    topic_col: str = "topic",
) -> DataFrame:
    """Production-shaped variant: the dictionary arrives as a (kw, topic)
    DataFrame (a parquet/Iceberg table at deployment — a million-keyword
    taxonomy is data, not driver code). Same plan as `topic_tag`: the
    dictionary side is broadcast (megabytes even at 10^6 keywords), the
    corpus shuffles only on the doc_id rollup. Keywords are lowercased
    and deduplicated here (last-writer-wins would be nondeterministic, so
    duplicates FAIL instead — same contract as the tuple form)."""
    dic = taxonomy_df.select(
        F.lower(F.col(kw_col)).alias("kw"), F.col(topic_col).alias("topic")
    ).distinct()
    # a keyword mapping to two topics makes the argmax ill-defined
    dup = dic.groupBy("kw").count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("taxonomy table maps a keyword to multiple topics")
    return _topic_tag_with_dic(df, dic, text_col, id_col)


def topic_tag_sql(
    table_sql: str,
    taxonomy: tuple[tuple[str, str], ...] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """The DuckDB twin: identical TOKEN_SPLIT tokenization, identical
    exact-match dictionary (rendered VALUES list), identical min-struct
    argmax and round-6 density."""
    tax = taxonomy if taxonomy is not None else DEFAULT_TAXONOMY
    values = ", ".join(
        f"('{k}', '{t}')" for k, t in tax
    )
    return f"""
        WITH dic(kw, topic) AS (VALUES {values}),
        tk AS (
          SELECT {id_col} AS doc_id,
                 string_split_regex(lower(coalesce({text_col}, '')),
                                    '{TOKEN_SPLIT}') AS toks
          FROM {table_sql}
        ), spine AS (
          SELECT doc_id,
                 CAST(len(list_filter(toks, t -> t <> '')) AS BIGINT)
                   AS n_tokens,
                 toks
          FROM tk
        ), ex AS (
          SELECT doc_id, unnest(toks) AS kw FROM spine
        ), h AS (
          SELECT doc_id, topic, CAST(count(*) AS BIGINT) AS topic_hits
          FROM ex JOIN dic USING (kw)
          GROUP BY doc_id, topic
        ), b AS (
          SELECT doc_id,
                 CAST(sum(topic_hits) AS BIGINT) AS n_hits,
                 min(struct_pack(neg := -topic_hits, topic := topic)) AS _b
          FROM h GROUP BY doc_id
        )
        SELECT s.doc_id, s.n_tokens,
               coalesce(b.n_hits, 0) AS n_hits,
               b._b.topic AS topic,
               CAST(coalesce(-b._b.neg, 0) AS BIGINT) AS topic_hits,
               CASE WHEN s.n_tokens > 0
                    THEN round(CAST(coalesce(b.n_hits, 0) AS DOUBLE)
                               / s.n_tokens, 6)
               END AS density
        FROM (SELECT doc_id, n_tokens FROM spine) s
        LEFT JOIN b USING (doc_id)
    """
