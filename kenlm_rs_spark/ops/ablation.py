"""Filter ablation / attribution report — for an ordered list of drop
rules, how much does each rule actually remove? Per rule: `n_flagged`
(docs the rule fires on at all), `n_unique` (docs ONLY this rule fires
on — the rule's irreplaceable contribution), and `n_first` (docs
attributed to the rule in pipeline order — the waterfall a
first-failing-rule pipeline like `gopher_decide` actually charges).
This is the standard filter-tuning report (the FineWeb/Dolma ablation
loop): `n_unique` ≈ what you lose by deleting the rule, `n_flagged` −
`n_unique` = overlap other rules already cover, and Σ `n_first` =
total dropped, exactly.

Scale shape (100 TB): the corpus is touched by exactly ONE pass — every
per-rule statistic is a conditional sum inside a single aggregation
(3·k sums for k rules), so the output is one row per group regardless
of corpus size; the per-rule unpivot (`stack`) runs on that tiny
aggregate. No joins, no windows, no per-rule scans — adding a rule adds
three counters, not a job.

Engine-exactness: every statistic is a BIGINT count; rules are ANSI SQL
boolean expressions executed verbatim by both Spark and the DuckDB
oracle (`ablation_sql` renders the identical conditional sums, with
DuckDB's HUGEINT sums cast back to BIGINT).

Reference scope: the reference ships no ablation tooling; this extends
the quality-filter surface the brief demands (tuning the rule set is
how the thresholds in `ops/gopher.py` / `ops/c4.py` were chosen in the
first place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_ablation(
    df: DataFrame,
    rules: list[tuple[str, str]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-rule ablation counts over `df`.

    `rules` is an ORDERED list of (name, sql_bool_expr); order defines
    the first-failing-rule attribution (`n_first`). Returns one row per
    (group..., rule): (group..., rule, n_flagged, n_unique, n_first,
    n_docs, n_dropped) where n_docs/n_dropped are the group totals
    replicated onto every rule row (Σ n_first == n_dropped).
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    group_cols = group_cols or []

    flags = [F.expr(e).cast("boolean").alias(f"_f_{n}") for n, e in rules]
    base = df.select(*group_cols, *flags)

    # total fired + first-failing attribution, built left-to-right
    total = None
    firsts = []
    prev = F.lit(False)
    for n, _ in rules:
        f = F.coalesce(F.col(f"_f_{n}"), F.lit(False))
        firsts.append((f & ~prev).alias(f"_w_{n}"))
        prev = prev | f
        total = f.cast("int") if total is None else total + f.cast("int")
    base = base.select(
        *group_cols,
        *[F.col(f"_f_{n}") for n in names],
        *firsts,
        total.alias("_total"),
    )

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_total") > 0).cast("long")).cast("long").alias("n_dropped"),
    ]
    for n in names:
        f = F.coalesce(F.col(f"_f_{n}"), F.lit(False))
        aggs += [
            F.sum(f.cast("long")).cast("long").alias(f"_cf_{n}"),
            F.sum((f & (F.col("_total") == 1)).cast("long"))
            .cast("long")
            .alias(f"_cu_{n}"),
            F.sum(F.col(f"_w_{n}").cast("long")).cast("long").alias(f"_cw_{n}"),
        ]
    agg = base.groupBy(*group_cols).agg(*aggs)

    # unpivot the one aggregate row into k rule rows (tiny)
    stack_args = ", ".join(
        f"'{n}', _cf_{n}, _cu_{n}, _cw_{n}" for n in names
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "n_dropped",
        F.expr(
            f"stack({len(names)}, {stack_args}) "
            "AS (rule, n_flagged, n_unique, n_first)"
        ),
    ).select(
        *group_cols, "rule", "n_flagged", "n_unique", "n_first",
        "n_docs", "n_dropped",
    )


def ablation_sql(
    rules: list[tuple[str, str]],
    table_sql: str,
    group_cols: list[str] | None = None,
) -> str:
    """The DuckDB twin: identical conditional sums rendered as ANSI SQL
    over `table_sql` (a table name or parenthesized subquery), one
    UNION ALL arm per rule over the single aggregate CTE. Sums cast to
    BIGINT (DuckDB aggregates to HUGEINT)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    group_cols = group_cols or []
    g = "".join(f"{c}, " for c in group_cols)
    gby = f" GROUP BY {', '.join(group_cols)}" if group_cols else ""
    names = [n for n, _ in rules]
    flag_cols = ",\n          ".join(
        f"coalesce(CAST(({e}) AS BOOLEAN), FALSE) AS f_{n}" for n, e in rules
    )
    total = " + ".join(f"CAST(f_{n} AS INTEGER)" for n in names)
    first_cols = []
    prev = "FALSE"
    for n in names:
        first_cols.append(f"(f_{n} AND NOT ({prev})) AS w_{n}")
        prev = f"({prev}) OR f_{n}"
    sums = []
    for n in names:
        sums += [
            f"CAST(sum(CAST(f_{n} AS BIGINT)) AS BIGINT) AS cf_{n}",
            f"CAST(sum(CAST(f_{n} AND total = 1 AS BIGINT)) AS BIGINT)"
            f" AS cu_{n}",
            f"CAST(sum(CAST(w_{n} AS BIGINT)) AS BIGINT) AS cw_{n}",
        ]
    arms = "\n          UNION ALL ".join(
        f"SELECT {g}'{n}' AS rule, cf_{n} AS n_flagged, cu_{n} AS n_unique,"
        f" cw_{n} AS n_first, n_docs, n_dropped FROM a"
        for n in names
    )
    return f"""
        WITH fl AS (
          SELECT {g}{flag_cols}
          FROM {table_sql}
        ), fw AS (
          SELECT *, {total} AS total,
          {", ".join(first_cols)}
          FROM fl
        ), a AS (
          SELECT {g}CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(total > 0 AS BIGINT)) AS BIGINT) AS n_dropped,
                 {", ".join(sums)}
          FROM fw{gby}
        )
        {arms}
    """
