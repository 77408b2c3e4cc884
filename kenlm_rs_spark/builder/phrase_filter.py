"""F5: phrase filter (reference /root/reference/src/cxx/lm/filter/phrase.cc,
semantics per the Substrings table in filter/phrase.hh:25-58).

An n-gram is kept for a sentence iff it can be assembled from that sentence's
tab-delimited phrases: either it is a SUBSTRING of a single phrase, or it
decomposes as

    [suffix of some phrase] [whole phrases]* [prefix of some phrase]

(the reference evaluates this lazily over sorted sentence-id posting lists;
here phrase tables are query-sized, so we broadcast four frozensets of word
tuples — substring/left/right/whole — and run the equivalent O(n^2) DP per
n-gram inside the filter, driver- or UDF-side.)
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class PhraseSets:
    substring: frozenset
    left: frozenset    # phrase prefixes
    right: frozenset   # phrase suffixes
    whole: frozenset

    @classmethod
    def from_phrases(cls, phrases: list[list[str]]) -> "PhraseSets":
        sub, left, right, whole = set(), set(), set(), set()
        for p in phrases:
            t = tuple(p)
            whole.add(t)
            n = len(t)
            for i in range(n):
                for j in range(i + 1, n + 1):
                    piece = t[i:j]
                    sub.add(piece)
                    if i == 0:
                        left.add(piece)
                    if j == n:
                        right.add(piece)
        return cls(frozenset(sub), frozenset(left), frozenset(right), frozenset(whole))

    @classmethod
    def parse_line(cls, line: str) -> "PhraseSets":
        """A tab-delimited line of phrases (filter tool input format)."""
        return cls.from_phrases(
            [p.split() for p in line.split("\t") if p.strip()]
        )


def ngram_matches(ngram: tuple[str, ...], sets: PhraseSets) -> bool:
    g = tuple(ngram)
    if g in sets.substring:
        return True
    n = len(g)
    # dp[i] = the prefix g[:i] is a valid assembly ending on a piece boundary,
    # where the first piece was a phrase suffix and middle pieces are whole
    # phrases; final piece must be a phrase prefix.
    dp = [False] * (n + 1)
    starts = [i for i in range(1, n) if g[:i] in sets.right]
    for i in starts:
        dp[i] = True
    for i in range(1, n):
        if not dp[i]:
            continue
        for j in range(i + 1, n):
            if g[i:j] in sets.whole:
                dp[j] = True
    return any(dp[i] and g[i:] in sets.left for i in range(1, n))


def phrase_filter(ngrams_df, phrase_line: str):
    """DataFrame filter: keep rows whose ``ngram`` array matches the phrase
    pattern. The phrase sets are tiny -> shipped in the UDF closure."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    sets = PhraseSets.parse_line(phrase_line)

    @F.pandas_udf(BooleanType())
    def matches(ngram: pd.Series) -> pd.Series:
        return ngram.map(lambda g: ngram_matches(tuple(g), sets))

    return ngrams_df.filter(matches(F.col("ngram")))
