"""Unicode script profiling — per-document character counts, ratios and
dominant script over a frozen set of codepoint ranges (the mC4/CCNet
routing signal: a doc whose langid says "en" but whose characters are 40%
Cyrillic is mojibake, spam, or misrouted; per-script corpus accounting
drives the temperature-rebalancing mix next to language ID).

The reference engine has no script analytics; this sits next to
pipeline/langid.py (model-based) as the model-free complement — pure
character-class arithmetic, robust to short/garbled text where an n-gram
LM has nothing to grip.

Engine-exactness: each script is a FROZEN explicit BMP codepoint-range
character class (identical regex text in Java and RE2 — no \\p{Script=}
syntax, which the two engines spell differently). Counts are computed as
``length(s) - length(regexp_replace(s, class, ''))`` — every match is
exactly one codepoint, and both engines' ``length`` counts codepoints —
so all statistics are BIGINT-exact; the ratio is one IEEE division
round-6ed. Supplementary-plane scripts (CJK ext-B+, emoji) are outside
the frozen snapshot and count only toward ``n_chars`` (documented cap).

Scale shape (100 TB): one narrow codegen projection — 2·k regexp passes
per doc, no shuffle, no UDF, no join. The dominant-script CASE chain
textually inlines every count expression ~30x in the plan, but
whole-stage codegen's subexpression elimination collapses them (MEASURED,
sf0.1 local[8] noop-write: full profile 1.06 s vs bare 12-count
projection 1.20 s — each regex runs once per row; this is the scalar
case where CSE rescues what the HOF array-inlining pathology in
CLAUDE.md cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# frozen BMP block ranges (Unicode 15 block boundaries, public data),
# (lo, hi) codepoint pairs. Order is the dominant-script tie-break
# priority. Rendered as LITERAL characters inside the class — Java regex
# accepts \\uXXXX but RE2 (DuckDB) does not, while literal codepoints are
# identical pattern text in both engines.
_BLOCKS: tuple[tuple[str, tuple[tuple[int, int], ...]], ...] = (
    ("latin", ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F), (0x1E00, 0x1EFF))),
    ("cyrillic", ((0x400, 0x4FF), (0x500, 0x52F))),
    ("greek", ((0x370, 0x3FF), (0x1F00, 0x1FFF))),
    ("arabic", ((0x600, 0x6FF), (0x750, 0x77F))),
    ("hebrew", ((0x590, 0x5FF),)),
    ("devanagari", ((0x900, 0x97F),)),
    ("bengali", ((0x980, 0x9FF),)),
    ("tamil", ((0xB80, 0xBFF),)),
    ("thai", ((0xE00, 0xE7F),)),
    ("cjk", ((0x4E00, 0x9FFF), (0x3400, 0x4DBF))),
    ("kana", ((0x3040, 0x309F), (0x30A0, 0x30FF))),
    ("hangul", ((0xAC00, 0xD7AF), (0x1100, 0x11FF))),
)

SCRIPT_RANGES: tuple[tuple[str, str], ...] = tuple(
    (name, "".join(f"{chr(lo)}-{chr(hi)}" for lo, hi in blocks))
    for name, blocks in _BLOCKS
)

SCRIPT_NAMES: tuple[str, ...] = tuple(n for n, _ in SCRIPT_RANGES)


def _class(ranges: str) -> str:
    return f"[{ranges}]"


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_chars, n_<script>... , n_scripted, dominant_script,
    dominant_ratio): per-script codepoint counts, the priority-ordered
    argmax over them, and dominant/scripted ratio (round-6; null when no
    scripted characters). One codegen projection, zero shuffle."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text).cast("long")
    counts = {
        name: (
            F.length(text) - F.length(F.regexp_replace(text, _class(rng), ""))
        ).cast("long")
        for name, rng in SCRIPT_RANGES
    }
    n_scripted = None
    for name in SCRIPT_NAMES:
        c = counts[name]
        n_scripted = c if n_scripted is None else n_scripted + c
    best = F.greatest(*[counts[n] for n in SCRIPT_NAMES])
    dominant = F.lit(None).cast("string")
    for name in reversed(SCRIPT_NAMES):  # earlier name wins ties
        dominant = F.when(counts[name] == best, F.lit(name)).otherwise(dominant)
    dominant = F.when(best > 0, dominant)  # all-zero -> null
    ratio = F.when(
        n_scripted > 0, F.round(best.cast("double") / n_scripted, 6)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        *[counts[n].alias(f"n_{n}") for n in SCRIPT_NAMES],
        n_scripted.alias("n_scripted"),
        dominant.alias("dominant_script"),
        ratio.alias("dominant_ratio"),
    )


def script_profile_sql(table_sql: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """The DuckDB twin: identical frozen classes, identical
    length-difference counts, identical priority argmax and round-6
    ratio, rendered over `table_sql`."""
    text = f"coalesce({text_col}, '')"
    cnt = {
        name: (
            f"CAST(length({text}) - length(regexp_replace({text}, "
            f"'{_class(rng)}', '', 'g')) AS BIGINT)"
        )
        for name, rng in SCRIPT_RANGES
    }
    n_scripted = " + ".join(f"n_{n}" for n in SCRIPT_NAMES)
    best = f"greatest({', '.join(f'n_{n}' for n in SCRIPT_NAMES)})"
    dominant = "CAST(NULL AS VARCHAR)"
    for name in reversed(SCRIPT_NAMES):
        dominant = (
            f"CASE WHEN n_{name} = best THEN '{name}' ELSE {dominant} END"
        )
    cols = ",\n              ".join(
        f"{expr} AS n_{name}" for name, expr in cnt.items()
    )
    return f"""
        WITH c AS (
          SELECT {id_col} AS doc_id,
              CAST(length({text}) AS BIGINT) AS n_chars,
              {cols}
          FROM {table_sql}
        ), b AS (
          SELECT *, ({n_scripted}) AS n_scripted, {best} AS best FROM c
        )
        SELECT doc_id, n_chars,
               {', '.join(f'n_{n}' for n in SCRIPT_NAMES)},
               n_scripted,
               CASE WHEN best > 0 THEN {dominant} END AS dominant_script,
               CASE WHEN n_scripted > 0
                    THEN round(CAST(best AS DOUBLE) / n_scripted, 6)
               END AS dominant_ratio
        FROM b
    """
