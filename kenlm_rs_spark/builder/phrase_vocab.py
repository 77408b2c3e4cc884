"""Per-sentence vocabulary extraction from a phrase table (the operator
behind the reference's phrase_table_vocab tool,
lm/filter/phrase_table_vocab_main.cc): every source sentence's vocab is its
own words plus the target words of every phrase-table entry whose source
phrase occurs as a contiguous sub-phrase (length <= max_length) of the
sentence.

Spark shape: explode bounded sub-phrases (<= max_length * len(sentence) rows,
a narrow map), hash-join against the table's source phrases (uniform key),
explode target words, union with the sentence's own words, one groupBy.
No driver-side maps — both sides stay distributed, so a web-scale phrase
table (billions of entries) joins instead of becoming an in-memory
unordered_map as in the single-node reference."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference: TokenIter<AnyCharacter>(sentence, "\0 \t") — NUL/space/tab
_SPLIT = "[\\x00 \\t]+"


def _words(col):
    return F.filter(F.split(col, _SPLIT), lambda w: w != "")


def subphrases(col, max_length: int):
    """All contiguous sub-phrases (space-joined) of length 1..max_length.

    Empty/whitespace-only sentences yield an empty array: without the guard,
    F.sequence(1, 0) produces the DESCENDING [1, 0] and start=0 makes
    F.slice throw INVALID_PARAMETER_VALUE.START. The reference tool prints
    an empty vocab line for such sentences (phrase_table_vocab_main.cc)."""
    toks = _words(col)
    return F.when(
        F.size(toks) > 0,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_length), F.size(toks))),
                lambda length: F.transform(
                    F.sequence(F.lit(1), F.size(toks) - length + 1),
                    lambda start: F.array_join(F.slice(toks, start, length), " "),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def phrase_table_vocab(
    sentences: DataFrame,
    table: DataFrame,
    id_col: str = "sentence_id",
    text_col: str = "text",
    source_col: str = "source",
    target_col: str = "target",
    max_length: int = 7,
) -> DataFrame:
    """(sentence_id, words array<string> sorted) — own words + matched
    targets. Output word order is canonical (sorted); the reference prints
    an unordered hash set, so sorting is the deterministic rendering."""
    # explode_outer keeps empty sentences as a w=NULL row; collect_set drops
    # the NULL, so they surface with an empty vocab (reference prints an
    # empty line rather than skipping the sentence)
    own = sentences.select(
        F.col(id_col).alias("sentence_id"),
        F.explode_outer(_words(F.col(text_col))).alias("w"),
    )
    subs = sentences.select(
        F.col(id_col).alias("sentence_id"),
        F.explode(F.array_distinct(subphrases(F.col(text_col), max_length))).alias("phrase"),
    )
    tbl = table.select(
        F.array_join(_words(F.col(source_col)), " ").alias("phrase"),
        F.col(target_col).alias("target"),
    )
    matched = subs.join(tbl, "phrase").select(
        "sentence_id", F.explode(_words(F.col("target"))).alias("w")
    )
    return (
        own.unionByName(matched)
        .groupBy("sentence_id")
        .agg(F.array_sort(F.collect_set("w")).alias("words"))
    )
