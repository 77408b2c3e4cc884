"""Per-paragraph language ID and mixed-language document detection.

Web documents are frequently multilingual (boilerplate in one language,
body in another; machine-translated spam interleaving both). Document-level
language ID (pipeline/langid.py) assigns ONE label; the CCNet/FineWeb-style
cleanup needs the paragraph-level view: which paragraphs are which
language, what the document's majority language is, and whether the
document is "mixed" (majority share below a threshold) — mixed docs are
either dropped or routed to paragraph-level filtering
(ops/paragraphs.paragraph_filter).

Spark shape (100 TB): paragraph split is a narrow posexplode (no shuffle),
language ID is the same broadcast-model Arrow UDF as document scoring, and
the rollup is ONE groupBy(doc_id, lang) + one groupBy(doc_id) — both on
uniform keys; the majority vote is min(struct(-cnt, lang)) so there is no
per-document window or sort.

Engine-exactness: the mixed threshold is a RATIONAL (num, den) compared in
integer arithmetic (top_cnt * den < n_paras * num) — no float share, so
Spark and the oracle agree bit-for-bit. Per-paragraph predictions are
frozen by the standalone NumPy classifier (tools/freeze_oracle.py), making
the gate a cross-implementation check of the Spark Arrow path, exactly
like langid_docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.paragraphs import PARA_SPLIT, split_paragraphs

# The gate row / frozen fixture's separator: the synthetic corpus has no
# newlines, so — like the paragraph_dedup gate row — the fixture splits on
# a frequent token to exercise real multi-paragraph structure. Shared by
# q_mixed_language and tools/freeze_oracle.py.
GATE_SEP = " the "


def paragraph_langid(
    df: DataFrame,
    bc_model,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = PARA_SPLIT,
) -> DataFrame:
    """(doc_id, para_idx, para_lang) — one row per non-empty paragraph."""
    from kenlm_rs_spark.pipeline.langid import make_langid_udf

    paras = split_paragraphs(df, id_col=id_col, text_col=text_col, sep=sep)
    udf = make_langid_udf(bc_model)
    return paras.select(
        "doc_id", "para_idx", udf(F.col("para")).alias("_lid")
    ).select("doc_id", "para_idx", F.col("_lid.lang").alias("para_lang"))


def mixed_language_stats(
    plang: DataFrame,
    mixed_num: int = 7,
    mixed_den: int = 10,
) -> DataFrame:
    """(doc_id, n_paras, top_lang, top_cnt, is_mixed) from a
    (doc_id, para_idx, para_lang) table. is_mixed = majority share strictly
    below mixed_num/mixed_den, decided in integer arithmetic. Ties on count
    break to the lexicographically smallest language."""
    if not (0 < mixed_num <= mixed_den):
        raise ValueError(
            f"mixed threshold must be a rational in (0,1], got {mixed_num}/{mixed_den}"
        )
    per = plang.groupBy("doc_id", "para_lang").agg(
        F.count("*").cast("long").alias("cnt")
    )
    top = per.groupBy("doc_id").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("negc"), F.col("para_lang").alias("lang"))
        ).alias("_top"),
        F.sum("cnt").cast("long").alias("n_paras"),
    )
    return top.select(
        "doc_id",
        "n_paras",
        F.col("_top.lang").alias("top_lang"),
        (-F.col("_top.negc")).cast("long").alias("top_cnt"),
        (
            F.col("_top.negc") * F.lit(-mixed_den)
            < F.col("n_paras") * F.lit(mixed_num)
        ).alias("is_mixed"),
    )
