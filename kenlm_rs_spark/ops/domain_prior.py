"""Per-domain quality prior: aggregate a document-level quality score to
the registered domain and join it back to every document.

The CCNet/Gopher-practical observation: document-level quality signals
are noisy, but their DOMAIN-level mean is a strong prior (content farms
score uniformly low, reference sites uniformly high); production web
filters mix `domain_score` into the keep/drop decision and use it to
seed crawl blocklists. Composes two gate-checked kernels: the PSL-aware
registered domain (ops/urls.py) and the distilled linear classifier
(pipeline/classifier.py).

Engine-exact mean (the repo's float discipline): each per-doc score is
round-6ed and cast DECIMAL(38,9) BEFORE the sum, so the per-domain
aggregation is order-independent and bit-equal across engines; the mean
is ONE IEEE division of that exact decimal (cast double) by the count,
round-6ed.

Scale shape (100 TB): one groupBy on registered domain (PSL keeps
unrelated .co.uk sites apart — without it mega-"domains" are
artificial hot keys; a genuinely mega domain is the salted two-phase
shape, ops/partitioning.py). The domain table is |domains| ~ 10^7 rows
regardless of corpus size — broadcast for the join-back, so the corpus
never shuffles on the return path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.classifier import classifier_score_col
from .urls import registered_domain


def domain_quality_prior(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, domain, n_domain_docs, domain_score) per document."""
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        registered_domain(F.col(url_col), psl=True).alias("domain"),
        F.round(classifier_score_col(F.col(text_col)), 6)
        .cast("decimal(38,9)")
        .alias("s"),
    )
    prior = scored.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_domain_docs"),
        F.round(
            F.sum("s").cast("double") / F.count("*").cast("double"), 6
        ).alias("domain_score"),
    )
    return scored.select("doc_id", "domain").join(
        F.broadcast(prior), "domain"
    ).select("doc_id", "domain", "n_domain_docs", "domain_score")
