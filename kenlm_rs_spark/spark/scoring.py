"""Broadcast-model KenLM scoring as an Arrow-vectorized pandas UDF.

Spark execution model (SURVEY.md §1.3/§3.2): the model is deserialized ONCE on
the driver (ARPA/binary -> NumPy arrays), shipped to executors with
``SparkContext.broadcast`` (torrent protocol — the distributed analogue of the
reference's mmap sharing, /root/reference/src/cxx/lm/binary_format.cc:192-204),
and each Python worker lazily unpickles it once. Scoring runs inside
``pandas_udf`` over Arrow RecordBatches, so the JVM<->Python boundary is
crossed once per batch, and inside the batch everything is the vectorized
NumPy scorer (no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..lm.model import NGramModel
from ..lm.score import score_texts

SCORE_SCHEMA = StructType(
    [
        StructField("log10_prob", FloatType()),
        StructField("tokens", IntegerType()),
        StructField("oov", IntegerType()),
        StructField("ppl", DoubleType()),
    ]
)


def broadcast_model(spark: SparkSession, model_or_path) -> "pyspark.Broadcast":
    model = (
        model_or_path
        if isinstance(model_or_path, NGramModel)
        else NGramModel.load(str(model_or_path))
    )
    return spark.sparkContext.broadcast(model)


def make_score_udf(bc_model, bos: bool = True, eos: bool = True):
    """pandas UDF text -> struct(log10_prob, tokens, oov, ppl).

    Perplexity semantics per the reference query tool
    (/root/reference/src/cxx/lm/ngram_query.hh:52-101)."""

    @F.pandas_udf(SCORE_SCHEMA)
    def score_udf(texts: pd.Series) -> pd.DataFrame:
        model = bc_model.value
        res = score_texts(model, texts.fillna("").tolist(), bos=bos, eos=eos)
        return pd.DataFrame(
            {
                "log10_prob": res["log10_prob"],
                "tokens": res["tokens"].astype("int32"),
                "oov": res["oov"].astype("int32"),
                "ppl": res["ppl"],
            }
        )

    return score_udf


def score_with_model(
    df: DataFrame,
    bc_model,
    text_col: str = "text",
    output_col: str = "lm",
    bos: bool = True,
    eos: bool = True,
) -> DataFrame:
    """Attach per-document LM columns: ``<output_col>.{log10_prob,tokens,oov,ppl}``."""
    udf = make_score_udf(bc_model, bos=bos, eos=eos)
    return df.withColumn(output_col, udf(F.col(text_col)))


def register_sql_udfs(
    spark: SparkSession,
    bc_model,
    bc_langid=None,
    prefix: str = "kenlm_",
) -> list[str]:
    """Expose the Python-model kernels to SQL users:

        spark.sql("SELECT kenlm_score(text).ppl, kenlm_langid(text).lang
                   FROM docs")

    Registers ``<prefix>score`` (struct log10_prob/tokens/oov/ppl) and, when
    ``bc_langid`` is given, ``<prefix>langid`` (struct lang/lang_conf). Both
    stay Arrow-vectorized through spark.udf.register. Returns the registered
    names."""
    names = []
    spark.udf.register(f"{prefix}score", make_score_udf(bc_model))
    names.append(f"{prefix}score")
    if bc_langid is not None:
        from ..pipeline.langid import make_langid_udf

        spark.udf.register(f"{prefix}langid", make_langid_udf(bc_langid))
        names.append(f"{prefix}langid")
    return names


LANGID_SCORE_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("lang_conf", FloatType()),
        StructField("log10_prob", FloatType()),
        StructField("tokens", IntegerType()),
        StructField("oov", IntegerType()),
        StructField("ppl", DoubleType()),
    ]
)


def make_langid_score_udf(bc_langid, bc_models: dict, bos: bool = True, eos: bool = True):
    """FUSED language-ID + per-language KenLM scoring in ONE JVM<->Python
    crossing: (raw_text, scrubbed_text) -> struct(lang, lang_conf,
    log10_prob, tokens, oov, ppl).

    Unfused, langid and scoring are two ArrowEvalPython stages that Spark
    cannot combine (scoring consumes langid's output column), so every batch
    crosses the boundary twice and the scrubbed text is serialized in a
    second Arrow pass. The fusion runs the identical kernels (langid over
    the raw text, grouped per-language vectorized scoring over the scrubbed
    text) back-to-back in one worker call — values bit-identical to the
    two-stage chain."""
    import numpy as np

    @F.pandas_udf(LANGID_SCORE_SCHEMA)
    def fused_udf(texts: pd.Series, scrubbed: pd.Series) -> pd.DataFrame:
        langid = bc_langid.value
        langs, confs = langid.predict_batch(texts.fillna("").tolist())
        langs = pd.Series(langs, index=texts.index)
        out = pd.DataFrame(
            {
                "lang": langs,
                "lang_conf": pd.Series(confs, index=texts.index, dtype="float32"),
                "log10_prob": np.zeros(len(texts), dtype="float32"),
                "tokens": np.zeros(len(texts), dtype="int32"),
                "oov": np.zeros(len(texts), dtype="int32"),
                "ppl": np.zeros(len(texts), dtype="float64"),
            }
        )
        default_lang = next(iter(bc_models))
        lang_norm = langs.where(langs.isin(list(bc_models)), default_lang)
        for lang, idx in lang_norm.groupby(lang_norm).groups.items():
            model = bc_models[lang].value
            res = score_texts(
                model, scrubbed.loc[idx].fillna("").tolist(), bos=bos, eos=eos
            )
            out.loc[idx, "log10_prob"] = res["log10_prob"]
            out.loc[idx, "tokens"] = res["tokens"].astype("int32")
            out.loc[idx, "oov"] = res["oov"].astype("int32")
            out.loc[idx, "ppl"] = res["ppl"]
        return out

    return fused_udf


def make_multi_lm_score_udf(bc_models: dict, bos: bool = True, eos: bool = True):
    """Score with a per-language model chosen by a lang column.

    ``bc_models`` maps lang code -> broadcast NGramModel; unknown langs fall
    back to the first model. Grouped inside the batch so each model still
    scores vectorized sub-batches.
    """

    @F.pandas_udf(SCORE_SCHEMA)
    def score_udf(texts: pd.Series, langs: pd.Series) -> pd.DataFrame:
        import numpy as np

        out = pd.DataFrame(
            {
                "log10_prob": np.zeros(len(texts), dtype="float32"),
                "tokens": np.zeros(len(texts), dtype="int32"),
                "oov": np.zeros(len(texts), dtype="int32"),
                "ppl": np.zeros(len(texts), dtype="float64"),
            }
        )
        default_lang = next(iter(bc_models))
        lang_norm = langs.fillna(default_lang).where(
            langs.isin(list(bc_models)), default_lang
        )
        for lang, idx in lang_norm.groupby(lang_norm).groups.items():
            model = bc_models[lang].value
            res = score_texts(model, texts.loc[idx].fillna("").tolist(), bos=bos, eos=eos)
            out.loc[idx, "log10_prob"] = res["log10_prob"]
            out.loc[idx, "tokens"] = res["tokens"].astype("int32")
            out.loc[idx, "oov"] = res["oov"].astype("int32")
            out.loc[idx, "ppl"] = res["ppl"]
        return out

    return score_udf
