"""PII / toxicity scrubbing — a deterministic, order-fixed regexp_replace
chain (SURVEY.md §7 step 13). Byte-stable: same input -> same output, in any
engine with RE2/Java-compatible character-class regexes (no lookaround, no
engine-specific syntax), so scrubbed text hashes are oracle-checkable.

Applied in a fixed order; each rule replaces with a typed placeholder token.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER MATTERS and is frozen.
# Patterns restricted to the common regex subset (portable Java/RE2).
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("cc", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "<CC>"),
]

# fixed toxicity wordlist (synthetic; the mechanism is what matters)
TOXIC_WORDS = ["badword1", "badword2", "slurword", "toxicterm"]


def scrub_text(col: Column) -> Column:
    """Apply the full scrub chain to a text column."""
    out = col
    for _, pattern, repl in SCRUB_RULES:
        out = F.regexp_replace(out, pattern, repl)
    for w in TOXIC_WORDS:
        out = F.regexp_replace(out, r"\b" + w + r"\b", "<TOXIC>")
    return out


def scrub_hits(col: Column) -> Column:
    """Total number of scrub replacements (lineage metric)."""
    total = F.lit(0)
    cur = col
    for _, pattern, repl in SCRUB_RULES:
        nxt = F.regexp_replace(cur, pattern, repl)
        # count by occurrence delta of the placeholder
        total = total + (
            F.length(nxt) - F.length(F.regexp_replace(nxt, _escape(repl), ""))
        ) / F.length(F.lit(repl)) - (
            F.length(cur) - F.length(F.regexp_replace(cur, _escape(repl), ""))
        ) / F.length(F.lit(repl))
        cur = nxt
    return total.cast("int")


def _escape(s: str) -> str:
    return s.replace("<", "\\<").replace(">", "\\>")


def scrub_sql_expr(col_name: str) -> str:
    """The SAME chain as ANSI/DuckDB SQL (global regexp_replace) — used to
    generate the oracle query so Spark and the oracle share one source of
    truth for patterns and order."""
    expr = col_name
    for _, pattern, repl in SCRUB_RULES:
        p = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    for w in TOXIC_WORDS:
        expr = f"regexp_replace({expr}, '\\b{w}\\b', '<TOXIC>', 'g')"
    return expr
