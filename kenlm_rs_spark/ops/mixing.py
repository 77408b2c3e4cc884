"""Token-budget corpus mixing: deterministically select documents per group
(language, source, quality bucket, ...) until a per-group TOKEN budget is
reached — how a training mix is assembled from a filtered corpus ("x B
tokens of English web, y B of code, ...") with reproducible membership.

Selection order inside a group is the md5 of the document id — a stable,
uniform, engine-portable shuffle of the group (the same keyed-randomness
trick as pipeline/quality.bucket_resample: no RNG state, any engine can
replay it). A document is kept while the cumulative token count of its
group, taken in that order and INCLUDING the document, stays within budget
(the first document of a group is always kept even if it alone exceeds
the budget — a budget must never silence a group entirely).

Scale shape: one window sum per group ordered by the md5 key. The sort is
per-group (shuffle on the group key, sort within partition); groups in a
training mix are few and fat, so Spark range-partitions each group's sort
across the cluster. For extreme cases (one group = the whole corpus), the
two-phase alternative is: sample the (md5 -> tokens) distribution, fit the
hash threshold t where cumulative tokens reach the budget, then keep rows
with key <= t in one narrow pass plus an exact top-up at the boundary —
same membership, no global sort. The windowed form below is the exact
semantics the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
) -> DataFrame:
    """(doc_id, group, tokens, cum_tokens, mix_keep): mix_keep is true for
    rows whose group's cumulative token count in md5(doc_id) order stays
    within the group budget (first row of each group always kept)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        token_count(F.col(text_col)).cast("long").alias("tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_k"),
    )
    w = Window.partitionBy("grp").orderBy("_k", "doc_id")
    budget = F.coalesce(mapping[F.col("grp")], F.lit(default_budget))
    out = base.withColumn("cum_tokens", F.sum("tokens").over(w)).withColumn(
        "mix_keep",
        (F.col("cum_tokens") <= budget)
        | (F.row_number().over(w) == 1),
    )
    return out.select("doc_id", F.col("grp").alias("group"), "tokens", "cum_tokens", "mix_keep")


def temperature_sample(
    df: DataFrame,
    target_total: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "temp",
) -> DataFrame:
    """Temperature-based group rebalancing at alpha = 1/2 (the multilingual
    sampling of Lample & Conneau 2019 / XLM-R: sample group g with
    probability q_g proportional to p_g^alpha, p_g = n_g/N — upweighting
    tail languages relative to their natural share). Realized as a
    deterministic per-row keep: rate_g = min(1, target_total * q_g / n_g),
    kept iff the md5-keyed u(seed:id) < rate_g (the same keyed-randomness
    primitive as pipeline/quality.bucket_resample — reruns, resumes and a
    SQL oracle reproduce the exact sample).

    alpha is FIXED at 1/2 so the only non-rational operation is sqrt, which
    IEEE 754 requires correctly rounded — the rate arithmetic is therefore
    bit-identical across engines (a general-alpha variant would go through
    pow(), whose last-ulp behavior is libm-specific; rates are additionally
    round-6'd). Rates come from one tiny groupBy (G rows) cross-joined
    back — no collect, no window over the corpus."""
    from ..pipeline.quality import resample_u_col

    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_g")
    )
    tot = counts.agg(
        F.sum("n_g").alias("n_total"),
        F.sum(F.sqrt(F.col("n_g").cast("double"))).alias("s_sqrt"),
    )
    # q_g = sqrt(n_g/N) / sum_h sqrt(n_h/N) = sqrt(n_g) / sum_h sqrt(n_h)
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_g",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_total))
                * (F.sqrt(F.col("n_g").cast("double")) / F.col("s_sqrt"))
                / F.col("n_g"),
            ),
            6,
        ).alias("keep_rate"),
    )
    out = (
        df.select(
            F.col(id_col).alias("doc_id"), F.col(group_col).alias("grp")
        )
        .join(F.broadcast(rates), "grp")
        .withColumn("sample_u", F.round(resample_u_col("doc_id", seed), 9))
        .withColumn("temp_keep", F.col("sample_u") < F.col("keep_rate"))
    )
    return out.select(
        "doc_id", F.col("grp").alias("group"), "n_g", "keep_rate",
        "sample_u", "temp_keep",
    )
