"""Rule-based sentence segmentation + per-document sentence statistics —
the granularity between paragraphs (ops/paragraphs.py, \\n\\n) and token
chunks (ops/chunking.py): sentence counts drive the C4 page rule
(ops/c4.py counts terminal marks but never materializes sentences),
sentence-level bitext mining (ops/bitext.py) needs the actual spans, and
mean-sentence-length is a Gopher-adjacent quality signal.

Rule subset (deterministic, engine-portable — RE2 has no lookahead, so
the boundary CONSUMES its context): a sentence boundary is one-or-more
terminal marks [.!?] followed by one-or-more spaces followed by an
ASCII-uppercase letter or digit that starts the next sentence.
Abbreviation handling ("Dr. Smith") is out of the subset and documented:
rule-based splitters that guess abbreviation lists drift between
releases; this one is frozen and reproducible. The replacement inserts a
\\x01 sentinel (a character the corpus cannot contain — the same
reserved-symbol argument as KenLM's \\0 token separators,
/root/reference/src/cxx/util/tokenize_piece.hh) and the split on the
sentinel yields the sentences with their boundary marks preserved.

Engine-exactness: the pattern and replacement are SHARED constants;
Spark spells group refs `$1` and DuckDB `\\1` — the two renderings are
generated from the one template below, never hand-written twice. Counts
are BIGINT; mean length is one IEEE division round-6 (null for empty
docs).

Scale shape (100 TB): `sentence_stats` is one narrow codegen projection
(two regexp passes + aggregates on a split array — no shuffle, no UDF);
`explode_sentences` adds the posexplode fan-out (no shuffle until the
caller aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# boundary: terminal run + spaces, then the capitalized/digit next start.
# {G} is the group-reference marker rendered per engine ($N / \\N).
SENT_BOUNDARY_RE = r"([.!?]+) +([A-Z0-9])"
SENT_SENTINEL = "\x01"
_REPL_TEMPLATE = "{G1}" + SENT_SENTINEL + "{G2}"

SPARK_REPL = _REPL_TEMPLATE.format(G1="$1", G2="$2")
DUCK_REPL = _REPL_TEMPLATE.format(G1="\\1", G2="\\2")


def sentences_col(text) -> "F.Column":
    """array<string> of sentences (boundary marks kept, outer whitespace
    trimmed per sentence); empty/null text gives an empty array."""
    marked = F.regexp_replace(
        F.coalesce(text, F.lit("")), SENT_BOUNDARY_RE, SPARK_REPL
    )
    return F.filter(
        F.transform(F.split(marked, SENT_SENTINEL), F.trim),
        lambda s: s != "",
    )


def sentence_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_sentences, n_sent_chars, mean_sent_len): counts are
    exact BIGINTs over the split array; mean is one division round-6
    (null when no sentences)."""
    sents = sentences_col(F.col(text_col))
    n = F.size(sents).cast("long")
    chars = F.aggregate(
        sents, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_sentences"),
        chars.alias("n_sent_chars"),
        F.when(n > 0, F.round(chars.cast("double") / n, 6)).alias(
            "mean_sent_len"
        ),
    )


def explode_sentences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sent_idx, sentence): one row per sentence in order."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sentences_col(F.col(text_col))).alias(
            "sent_idx", "sentence"
        ),
    )


def _q(s: str) -> str:
    return s.replace("'", "''")


def sentences_sql_expr(col: str) -> str:
    """DuckDB list-of-sentences twin from the SAME constants."""
    marked = (
        f"regexp_replace(coalesce({col}, ''), '{_q(SENT_BOUNDARY_RE)}', "
        f"'{_q(DUCK_REPL)}', 'g')"
    )
    return (
        f"list_filter(list_transform(string_split({marked}, "
        f"'{SENT_SENTINEL}'), s -> trim(s)), s -> s <> '')"
    )


def sentence_stats_sql(table_sql: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """The DuckDB twin of sentence_stats over `table_sql`."""
    sents = sentences_sql_expr(text_col)
    return f"""
        WITH s AS (
          SELECT {id_col} AS doc_id, {sents} AS sents FROM {table_sql}
        ), a AS (
          SELECT doc_id,
                 CAST(len(sents) AS BIGINT) AS n_sentences,
                 CAST(coalesce(list_sum(list_transform(sents,
                      x -> length(x))), 0) AS BIGINT) AS n_sent_chars
          FROM s
        )
        SELECT doc_id, n_sentences, n_sent_chars,
               CASE WHEN n_sentences > 0
                    THEN round(CAST(n_sent_chars AS DOUBLE) / n_sentences, 6)
               END AS mean_sent_len
        FROM a
    """
