"""Deterministic HTML -> text extraction.

The per-row invariant of the pipeline (BASELINE.json input_hint) is
byte-identical extracted text per url, so the extractor is a pure, versioned
function with no heuristics that could drift: strip script/style blocks, drop
tags, decode the five standard entities, collapse whitespace. Implemented as
a pure Spark SQL expression chain (codegen'd, no Python) with a matching
pure-Python twin used by tests and by the expected-output fixture generator.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

EXTRACTOR_VERSION = 1

_SCRIPT_RE = r"(?s)<(script|style)[^>]*>.*?</\1>"
_TAG_RE = r"<[^>]*>"
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


def extract_text(html_col: Column) -> Column:
    """binary/string html -> extracted text column (pure SQL functions)."""
    t = html_col.cast("string")
    t = F.regexp_replace(t, _SCRIPT_RE, " ")
    t = F.regexp_replace(t, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r\n]+", " ")
    return F.trim(t)


def extract_text_py(html: bytes | str) -> str:
    """Pure-Python twin — MUST stay byte-identical with extract_text."""
    t = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    t = re.sub(_SCRIPT_RE, " ", t)
    t = re.sub(_TAG_RE, " ", t)
    for ent, rep in _ENTITIES:
        t = t.replace(ent, rep)
    t = re.sub(r"[ \t\r\n]+", " ", t)
    return t.strip()


def with_extracted_text(df, html_col: str = "html", text_col: str = "text"):
    """Fill NULL text from html (FIXTURES.md §1: a fraction of rows carry
    only html). Column pruning note: when text is non-null the html column
    is never touched — keep this a lazy coalesce so Parquet page-skips it."""
    return df.withColumn(
        text_col,
        F.coalesce(F.col(text_col), extract_text(F.col(html_col))),
    )


def extract_sql_expr(col: str) -> str:
    """DuckDB twin of extract_text (oracle side). RE2 has no
    backreferences, so the script/style strip renders as one global pass
    per tag instead of the Java-regex `</\\1>` form — same behavior except
    on pathologically interleaved <script>/<style> nesting; entity table
    and whitespace collapse shared with the Spark chain."""
    t = f"CAST({col} AS VARCHAR)"
    for tag in ("script", "style"):
        t = f"regexp_replace({t}, '<{tag}[^>]*>.*?</{tag}>', ' ', 'gs')"
    t = f"regexp_replace({t}, '<[^>]*>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        ent_sql = ent.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        t = f"replace({t}, '{ent_sql}', '{rep_sql}')"
    t = f"regexp_replace({t}, '[ \\t\\r\\n]+', ' ', 'g')"
    return f"trim({t})"
