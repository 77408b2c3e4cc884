"""Leakage-safe train/holdout splitting — assignment by REGISTERED
DOMAIN, not by document. A per-document random split leaks: web corpora
are full of intra-site near-duplicates (templated pages, mirrored
articles, boilerplate variants), so a document-level holdout ends up
sharing near-copies with the training set and eval numbers inflate.
Grouping the split by PSL-aware registered domain (the unit CCNet-style
pipelines also report by) guarantees every page of a site — and
therefore the vast majority of its near-duplicate mass — lands on one
side. The same guarantee is the standard decontamination complement:
`ops/decontam.py` scrubs known eval sets, this prevents manufacturing a
contaminated eval set in the first place.

DETERMINISTIC, coordination-free: split = md5(salt:domain) permille
bucket, a pure function of (salt, domain) — reruns, resumed jobs, and
independent pipelines (or engines: the oracle) reproduce the identical
assignment with no shared state, the `pipeline/quality.resample_u_col`
idiom. Integer permille (first 8 md5 hex digits mod 1000) keeps the
threshold comparison exact — no float scaling.

Scale shape (100 TB): one codegen projection — regexp domain extraction
+ md5 + modulo; no shuffle, no join, no Python. Expected holdout mass ≈
holdout_permille/1000 of DOMAINS (not documents; mega-domains make the
document fraction vary — by design, the price of the leakage guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.urls import registered_domain


def domain_split_bucket(domain, salt: str):
    """Integer permille bucket in [0, 1000) — pure function of
    (salt, domain), identical in the SQL twin."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), domain)), 1, 8),
            16,
            10,
        ).cast("long")
        % 1000
    )


def domain_holdout_split(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    holdout_permille: int = 50,
    salt: str = "holdout",
    psl: bool = True,
) -> DataFrame:
    """(doc_id, url, domain, bucket, split) with split in
    {'train','holdout'}: holdout iff the domain's permille bucket <
    ``holdout_permille``. Same domain => same bucket => same split —
    the leakage guard, pytest-pinned."""
    if not 0 <= holdout_permille <= 1000:
        raise ValueError(
            f"holdout_permille must be in [0, 1000], got {holdout_permille}"
        )
    domain = registered_domain(F.col(url_col), psl=psl)
    bucket = domain_split_bucket(domain, salt)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("url"),
        domain.alias("domain"),
        bucket.alias("bucket"),
        F.when(bucket < holdout_permille, F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def domain_split_sql_exprs(
    url_expr: str, salt: str, holdout_permille: int, psl: bool = True
) -> tuple[str, str, str]:
    """(domain, bucket, split) SQL renderings of the identical logic for
    the DuckDB twin — shared source with the Spark plan."""
    from kenlm_rs_spark.ops.urls import registered_domain_sql_expr

    domain = registered_domain_sql_expr(url_expr, psl=psl)
    bucket = (
        f"(('0x' || substr(md5('{salt}:' || {domain}), 1, 8))::BIGINT % 1000)"
    )
    split = (
        f"(CASE WHEN {bucket} < {int(holdout_permille)} "
        "THEN 'holdout' ELSE 'train' END)"
    )
    return domain, bucket, split
