"""Property-based Spark<->DuckDB parity for the r5 text profilers: script
profiling and topic tagging must agree on ARBITRARY unicode text (mixed
scripts, astral plane, empties, punctuation runs), not just the synthetic
corpus the gate rows cover."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# pieces spanning the frozen script blocks, astral plane, and noise
PIECES = st.sampled_from(
    [
        "hello", "WORLD", "привет", "Ελλάδα", "مرحبا", "שלום", "नमस्ते",
        "தமிழ்", "ไทย", "日本語", "かな", "한국어", "中文", "123", "!!!",
        "\t", "  ", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "🚀🌍", "café", "naïve", "Ω", "ё",
    ]
)
TEXT = st.lists(PIECES, max_size=10).map(" ".join)
MAYBE_TEXT = st.one_of(st.none(), TEXT)


def _norm(series):
    return list(series.astype(object).where(pd.notna(series), None))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(MAYBE_TEXT, min_size=1, max_size=15))
def test_script_profile_parity_random_text(spark, texts):
    from kenlm_rs_spark.ops.scripts import script_profile, script_profile_sql

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = script_profile(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(
        script_profile_sql("docs") + " ORDER BY doc_id"
    ).fetchdf()
    con.close()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert _norm(got[c]) == _norm(want[c]), c


TAX = (
    ("hello", "greet"), ("привет", "greet"),
    ("123", "num"), ("café", "accent"),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(MAYBE_TEXT, min_size=1, max_size=15))
def test_topic_tag_parity_random_text(spark, texts):
    from kenlm_rs_spark.ops.topics import topic_tag, topic_tag_sql

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = topic_tag(df, TAX).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(topic_tag_sql("docs", TAX) + " ORDER BY doc_id").fetchdf()
    con.close()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert _norm(got[c]) == _norm(want[c]), c


VEC = st.lists(
    st.floats(
        min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False,
        width=64,
    ),
    min_size=4,
    max_size=4,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    svecs=st.lists(VEC, min_size=2, max_size=8),
    tvecs=st.lists(VEC, min_size=2, max_size=8),
)
def test_bitext_parity_random_vectors(spark, svecs, tvecs):
    """The bitext margin pipeline's engine-exactness claim, probed on
    arbitrary in-range doubles INCLUDING zero/subnormal vectors: identical
    mined pairs AND identical round-6 cosine/margin values (bit-equal IEEE
    sequences, not a tolerance band). A zero-norm side gives NULL cosine
    on both engines (Spark kernel guard == DuckDB 0/0), ranked last by the
    explicit NULLS LAST in both twins."""
    from kenlm_rs_spark.ops.bitext import mine_bitext, mine_bitext_sql

    srows = list(enumerate(svecs))
    trows = list(enumerate(tvecs))
    sdf = spark.createDataFrame(srows, "vec_id long, embedding array<double>")
    tdf = spark.createDataFrame(trows, "vec_id long, embedding array<double>")
    got = (
        mine_bitext(sdf, tdf, k=3, threshold=0.0)
        .orderBy("src_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("s_raw", pd.DataFrame(srows, columns=["vec_id", "embedding"]))
    con.register("t_raw", pd.DataFrame(trows, columns=["vec_id", "embedding"]))
    con.execute(
        "CREATE VIEW s AS SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        "AS embedding FROM s_raw"
    )
    con.execute(
        "CREATE VIEW t AS SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        "AS embedding FROM t_raw"
    )
    want = con.execute(
        mine_bitext_sql("s", "t", k=3, threshold=0.0) + " ORDER BY src_id"
    ).fetchdf()
    con.close()
    for c in ["src_id", "tgt_id", "cosine", "margin"]:
        assert _norm(got[c]) == _norm(want[c]), c
