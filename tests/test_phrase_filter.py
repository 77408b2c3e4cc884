"""F5 phrase filter: n-gram kept iff assemblable as
[phrase suffix][whole phrases]*[phrase prefix] or a substring of one phrase
(filter/phrase.hh:25-58 semantics)."""

import pytest

from kenlm_rs_spark.builder.phrase_filter import PhraseSets, ngram_matches


@pytest.fixture(scope="module")
def sets():
    return PhraseSets.parse_line("the quick fox\tjumps over")


@pytest.mark.parametrize(
    "ngram,expected",
    [
        (("quick",), True),  # substring of a phrase
        (("the", "quick", "fox"), True),  # whole phrase
        (("quick", "fox", "jumps"), True),  # suffix(p1) + prefix(p2)
        (("fox", "jumps", "over"), True),  # suffix(p1) + whole/prefix(p2)
        (("fox", "the", "quick"), True),  # suffix(p1) + prefix(p1)
        (("over", "jumps"), True),  # suffix(p2) + prefix(p2), cross-boundary
        # suffix(p1) + whole(p2) + prefix(p1)
        (("the", "quick", "fox", "jumps", "over", "the"), True),
        (("quick", "jumps"), False),  # 'quick' is not right-aligned anywhere
        (("fox", "over"), False),  # 'over' is not left-aligned anywhere
        (("banana",), False),
        (("fox", "banana", "jumps"), False),  # gap word breaks assembly
    ],
)
def test_ngram_matches(sets, ngram, expected):
    assert ngram_matches(ngram, sets) is expected


def test_spark_phrase_filter(spark):
    from kenlm_rs_spark.builder.phrase_filter import phrase_filter

    df = spark.createDataFrame(
        [(list(g),) for g in [("quick",), ("banana",), ("fox", "jumps")]],
        "ngram array<string>",
    )
    kept = {tuple(r["ngram"]) for r in phrase_filter(df, "the quick fox\tjumps over").collect()}
    assert kept == {("quick",), ("fox", "jumps")}
