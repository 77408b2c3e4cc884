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
across the cluster. For extreme cases (one group = the whole corpus),
``token_budget_mix_two_phase`` computes the IDENTICAL membership with no
group-wide sort: hash-bucket token sums -> driver-side boundary fit ->
one narrow keep pass + a window over only the single boundary bucket.
The windowed form is the exact semantics the oracle pins; the two-phase
form is pytest-pinned equivalent.
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


def token_budget_mix_two_phase(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    bucket_chars: int = 2,
) -> DataFrame:
    """The no-global-sort scale path of ``token_budget_mix`` (VERDICT r4
    item 4): IDENTICAL membership, but the per-group sort is confined to
    one hash bucket per group instead of the whole group — the shape that
    survives a mix where one group ("2T tokens of English web") IS the
    corpus.

    Phase 1: bucket every row by the first ``bucket_chars`` hex chars of
    its md5 selection key (the bucket order is a prefix of the windowed
    form's (_k, doc_id) order, so bucket-cumulative = key-cumulative at
    bucket boundaries) and aggregate token sums per (group, bucket) —
    G x 16^bucket_chars rows, collected driver-side (model-sized; 4 chars
    = 65k buckets/group still collects fine at any corpus size).

    Phase 2 (driver, pure arithmetic): walk each group's buckets in order;
    buckets fully inside the budget -> keep-all, buckets past it ->
    drop-all, the ONE boundary bucket -> 'window'. Broadcast the decision
    table back; only boundary-bucket rows (1/16^bucket_chars of each
    group) get a window sort, seeded with the exact cumulative offset of
    the preceding buckets. The first-row-always-kept rule lives in the
    boundary window (offset == 0 there iff it is the group's first
    nonempty bucket; earlier buckets are keep-all and need no rule).

    Returns (doc_id, group, tokens, mix_keep) — no cum_tokens column: the
    keep-all branch never materializes per-row cumulative sums (that is
    the point). Equivalence with the windowed form is pytest-pinned."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        token_count(F.col(text_col)).cast("long").alias("tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_k"),
    ).withColumn("_bucket", F.substring("_k", 1, bucket_chars))
    # r7: cached — base (narrow: id/grp/tokens/key, no text) feeds the
    # phase-1 stats collect AND both phase-2 branches; without the cache
    # the tokenize (token_count) re-runs once per reference
    base = base.cache()
    stats = base.groupBy("grp", "_bucket").agg(
        F.sum("tokens").alias("btoks")
    ).collect()

    from collections import defaultdict

    per: dict = defaultdict(list)
    for r in stats:
        per[r["grp"]].append((r["_bucket"], r["btoks"]))
    decisions = []
    for grp, lst in per.items():
        budget = budgets.get(grp, default_budget)
        cum, past = 0, False
        for b, t in sorted(lst):
            if past:
                decisions.append((grp, b, "drop", cum))
            elif cum + t <= budget:
                decisions.append((grp, b, "keep", cum))
                cum += t
            else:
                decisions.append((grp, b, "window", cum))
                past = True

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    spark = df.sparkSession
    dec_schema = StructType(
        [
            StructField("grp", base.schema["grp"].dataType),
            StructField("_bucket", StringType()),
            StructField("action", StringType()),
            StructField("offset", LongType()),
        ]
    )
    dec = F.broadcast(spark.createDataFrame(decisions, dec_schema))
    tagged = base.join(dec, ["grp", "_bucket"])
    fast = tagged.filter(F.col("action") != "window").select(
        "doc_id", "grp", "tokens", (F.col("action") == "keep").alias("mix_keep")
    )
    mapping = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
    budget_col = F.coalesce(mapping[F.col("grp")], F.lit(default_budget))
    w = Window.partitionBy("grp").orderBy("_k", "doc_id")
    win = (
        tagged.filter(F.col("action") == "window")
        .withColumn("cum_in", F.sum("tokens").over(w))
        .withColumn(
            "mix_keep",
            ((F.col("offset") + F.col("cum_in")) <= budget_col)
            | ((F.row_number().over(w) == 1) & (F.col("offset") == 0)),
        )
        .select("doc_id", "grp", "tokens", "mix_keep")
    )
    out = fast.union(win).select(
        "doc_id", F.col("grp").alias("group"), "tokens", "mix_keep"
    )
    # unpersist handle for long-lived sessions (cached_deps contract)
    out.cached_deps = [base]
    return out


def dyadic_sqrt_depths(alpha: float, max_depth: int = 6) -> list[int] | None:
    """Binary expansion of alpha as a sum of 2^-d terms (d <= max_depth):
    0.5 -> [1], 0.75 -> [1, 2], 0.375 -> [2, 3]; None when alpha is not
    dyadic at this depth (0.7, 0.3 -> None -> pow() path)."""
    x = float(alpha)
    depths: list[int] = []
    for d in range(1, max_depth + 1):
        x *= 2.0
        if x >= 1.0 - 1e-12:
            depths.append(d)
            x -= 1.0
    return depths if abs(x) < 1e-12 else None


def pow_alpha_col(x, alpha: float):
    """x^alpha as a Spark Column. Dyadic alpha (k/2^m, m <= 6) compiles to
    a product of nested sqrt()s — every factor is an IEEE-correctly-rounded
    op, so the result is bit-identical on any conforming engine evaluating
    the same expression tree. Non-dyadic alpha falls back to pow(), whose
    last-ulp behavior is libm-specific — callers absorb that with round-6
    (verified empirically against DuckDB by the gate row at alpha=0.7)."""
    if alpha == 1.0:
        return x
    depths = dyadic_sqrt_depths(alpha)
    if depths is None:
        return F.pow(x, F.lit(float(alpha)))
    terms, cur, depth = [], x, 0
    for d in depths:
        while depth < d:
            cur = F.sqrt(cur)
            depth += 1
        terms.append(cur)
    out = terms[0]
    for t in terms[1:]:
        out = out * t
    return out


def pow_alpha_sql_expr(x: str, alpha: float) -> str:
    """The SAME x^alpha expression tree rendered as SQL (shared source with
    pow_alpha_col — the oracle and the Spark plan compute identically)."""
    if alpha == 1.0:
        return x
    depths = dyadic_sqrt_depths(alpha)
    if depths is None:
        return f"power({x}, CAST({float(alpha)!r} AS DOUBLE))"
    terms, cur, depth = [], x, 0
    for d in depths:
        while depth < d:
            cur = f"sqrt({cur})"
            depth += 1
        terms.append(cur)
    return "(" + " * ".join(terms) + ")"


def temperature_sample(
    df: DataFrame,
    target_total: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "temp",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based group rebalancing (the multilingual sampling of
    Lample & Conneau 2019 / XLM-R: sample group g with probability q_g
    proportional to p_g^alpha, p_g = n_g/N — upweighting tail languages
    relative to their natural share). Realized as a deterministic per-row
    keep: rate_g = min(1, target_total * q_g / n_g), kept iff the md5-keyed
    u(seed:id) < rate_g (the same keyed-randomness primitive as
    pipeline/quality.bucket_resample — reruns, resumes and a SQL oracle
    reproduce the exact sample).

    alpha covers the canonical settings (0.7 XLM-R, 0.3 mC4/mT5, 0.5
    CCNet-style — VERDICT r4 item 3): dyadic alphas (k/2^m) compile to
    IEEE-exact sqrt products (bit-identical across engines), other alphas
    go through pow() with the round-6 rate absorbing libm last-ulp
    differences. Rates come from one tiny groupBy (G rows) cross-joined
    back — no collect, no window over the corpus."""
    from ..pipeline.quality import resample_u_col

    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_g")
    )
    w_g = pow_alpha_col(F.col("n_g").cast("double"), alpha)
    tot = counts.agg(
        F.sum("n_g").alias("n_total"),
        F.sum(w_g).alias("s_w"),
    )
    # q_g = (n_g/N)^a / sum_h (n_h/N)^a = n_g^a / sum_h n_h^a
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_g",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_total)) * (w_g / F.col("s_w")) / F.col("n_g"),
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
