"""Streaming CCNet-style quality filter: the flagship batch decision chain
(scrub -> heuristic features -> broadcast-KenLM perplexity -> per-language
bucket -> keep/drop) applied to a Structured Streaming source.

The chain is a stateless per-document map — the ONLY corpus-level step of
the batch pipeline, the per-language perplexity-tertile fit
(pipeline/quality.ppl_thresholds), is a training-time artifact: production
fits thresholds offline on a batch snapshot and applies them online, which
is exactly the shape here (thresholds arrive as a pre-fitted dict and join
in as a broadcast stream-static join). Consequently stream==batch equality
is exact given equal thresholds — pinned by the pytest — and there is no
state store, no watermark, and no output-mode relaxation to document.

Scale: each micro-batch runs the identical narrow plan as the batch job
(one Arrow scoring stage over the broadcast model, codegen for everything
else); throughput per executor is the same as batch, and the stream scales
by partitions of the source exactly like the batch scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops import textstats as ts
from ..pipeline.quality import decide, with_buckets
from ..pipeline.scrub import scrub_text
from ..spark.scoring import make_score_udf


def filter_stream(
    pages: DataFrame,
    bc_model,
    thresholds: dict[str, tuple[float, float]],
    lang_col: str = "lang_pred",
) -> DataFrame:
    """pages (streaming or batch) with (doc_id, text, <lang_col>) ->
    (doc_id, lang_pred, tokens, oov, ppl, bucket, keep, drop_reason).
    Works identically on a batch DataFrame — the stream==batch test runs
    THIS function on both sides."""
    docs = pages.withColumn("text_scrubbed", scrub_text(F.col("text")))
    docs = ts.quality_features(docs, "text_scrubbed")
    udf = make_score_udf(bc_model, bos=True, eos=True)
    docs = (
        docs.withColumn("lm", udf(F.col("text_scrubbed")))
        .select("*", "lm.log10_prob", "lm.tokens", "lm.oov", "lm.ppl")
        .drop("lm", "text", "text_scrubbed")
    )
    docs = with_buckets(docs, thresholds, lang_col=lang_col)
    docs = decide(docs, lang_conf_col=None)
    return docs.select(
        "doc_id",
        F.col(lang_col).alias("lang_pred"),
        "tokens",
        "oov",
        F.round("ppl", 4).alias("ppl"),
        "bucket",
        "keep",
        "drop_reason",
    )
