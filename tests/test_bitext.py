"""Margin-based bitext mining (ops/bitext.py): planted parallel pairs are
mined mutually, threshold gates, mutual-argmax exclusivity (each side
appears at most once), validation, and Spark == DuckDB twin equality on
deterministic pseudo-random vectors."""

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kenlm_rs_spark.ops.bitext import mine_bitext, mine_bitext_sql

DIM = 6


def _vec(seed, i):
    # deterministic pseudo-random unit-free vector (same floats both engines)
    return [math.sin(seed * 1000 + i * DIM + d) for d in range(DIM)]


def _planted(n=8, noise=0.05):
    # tgt i = src i + small deterministic perturbation -> cos(i,i) ~ 1
    src = [(i, _vec(1, i)) for i in range(n)]
    tgt = [
        (i, [v + noise * math.sin(2000 + i * DIM + d) for d, v in enumerate(vec)])
        for i, vec in src
    ]
    return src, tgt


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_pairs_mined(spark):
    src, tgt = _planted()
    out = mine_bitext(_df(spark, src), _df(spark, tgt), k=3, threshold=1.0).collect()
    got = {(r["src_id"], r["tgt_id"]) for r in out}
    # every planted twin is its source's and target's mutual best margin
    assert got == {(i, i) for i in range(8)}
    for r in out:
        assert r["cosine"] > 0.99
        assert r["margin"] >= 1.0


def test_threshold_gates(spark):
    src, tgt = _planted()
    out = mine_bitext(_df(spark, src), _df(spark, tgt), k=3, threshold=10.0).collect()
    assert out == []


def test_mutual_exclusive(spark):
    # arbitrary vectors: each src/tgt id appears in at most one mined pair
    src = [(i, _vec(3, i)) for i in range(10)]
    tgt = [(i, _vec(4, i)) for i in range(10)]
    out = mine_bitext(_df(spark, src), _df(spark, tgt), k=4, threshold=0.0).collect()
    srcs = [r["src_id"] for r in out]
    tgts = [r["tgt_id"] for r in out]
    assert len(srcs) == len(set(srcs))
    assert len(tgts) == len(set(tgts))


def test_validation(spark):
    src, tgt = _planted(2)
    with pytest.raises(ValueError):
        mine_bitext(_df(spark, src), _df(spark, tgt), k=0)
    with pytest.raises(ValueError):
        mine_bitext_sql("s", "t", k=0)


def test_duckdb_twin_identical(spark):
    src = [(i, _vec(7, i)) for i in range(12)]
    tgt = [(i, _vec(8, i)) for i in range(12)]
    got = (
        mine_bitext(_df(spark, src), _df(spark, tgt), k=4, threshold=0.9)
        .orderBy("src_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("s_raw", pd.DataFrame(src, columns=["vec_id", "embedding"]))
    con.register("t_raw", pd.DataFrame(tgt, columns=["vec_id", "embedding"]))
    # force DOUBLE[] (pandas object lists register as DOUBLE[] already,
    # but be explicit so the fold matches Spark's array<double>)
    con.execute(
        "CREATE VIEW s AS SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        "AS embedding FROM s_raw"
    )
    con.execute(
        "CREATE VIEW t AS SELECT vec_id, CAST(embedding AS DOUBLE[]) "
        "AS embedding FROM t_raw"
    )
    want = con.execute(
        mine_bitext_sql("s", "t", k=4, threshold=0.9) + " ORDER BY src_id"
    ).fetchdf()
    assert len(got) == len(want) > 0
    assert list(got["src_id"]) == list(want["src_id"])
    assert list(got["tgt_id"]) == list(want["tgt_id"])
    assert list(got["cosine"]) == list(want["cosine"])
    assert list(got["margin"]) == list(want["margin"])


def test_lsh_variant_recovers_planted(spark):
    """The scale path (mine_bitext_lsh) recovers every planted twin pair:
    near-identical vectors collide in at least one LSH table with the
    deterministic plane matrix, and the candidate-list margins still rank
    the twin first on both sides."""
    from kenlm_rs_spark.ops.bitext import mine_bitext_lsh

    src, tgt = _planted()
    out = mine_bitext_lsh(
        _df(spark, src), _df(spark, tgt), dim=DIM, k=3, threshold=1.0,
        n_tables=6, planes_per_table=6,
    ).collect()
    got = {(r["src_id"], r["tgt_id"]) for r in out}
    assert {(i, i) for i in range(8)} <= got
    # mutual-argmax exclusivity holds on the LSH path too
    srcs = [r["src_id"] for r in out]
    assert len(srcs) == len(set(srcs))


def test_lsh_variant_deterministic(spark):
    from kenlm_rs_spark.ops.bitext import mine_bitext_lsh

    src = [(i, _vec(11, i)) for i in range(10)]
    tgt = [(i, _vec(12, i)) for i in range(10)]
    runs = [
        sorted(
            (r["src_id"], r["tgt_id"], r["cosine"], r["margin"])
            for r in mine_bitext_lsh(
                _df(spark, src), _df(spark, tgt), dim=DIM, k=3,
                threshold=0.0,
            ).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_lsh_validation(spark):
    from kenlm_rs_spark.ops.bitext import mine_bitext_lsh

    src, tgt = _planted(2)
    with pytest.raises(ValueError):
        mine_bitext_lsh(_df(spark, src), _df(spark, tgt), dim=DIM, k=0)


def test_zero_mean_margin_does_not_abort(spark):
    """Mutually orthogonal vectors make every cosine exactly 0, so the
    pooled kNN mean is exactly 0 — the ratio margin is undefined. Before
    the guard this was a job-killing ANSI DIVIDE_BY_ZERO (found by the
    Hypothesis parity test); now such pairs get NULL margins and nothing
    is mined, on both engines."""
    import duckdb as _duckdb

    import pandas as _pd

    from kenlm_rs_spark.ops.bitext import mine_bitext, mine_bitext_sql

    src = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    tgt = [(0, [0.0, 0.0, 1.0, 0.0]), (1, [0.0, 0.0, 0.0, 1.0])]
    out = mine_bitext(_df(spark, src), _df(spark, tgt), k=2, threshold=0.0)
    assert out.collect() == []
    con = _duckdb.connect()
    con.register("s_raw", _pd.DataFrame(src, columns=["vec_id", "embedding"]))
    con.register("t_raw", _pd.DataFrame(tgt, columns=["vec_id", "embedding"]))
    con.execute("CREATE VIEW s AS SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM s_raw")
    con.execute("CREATE VIEW t AS SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM t_raw")
    assert con.execute(mine_bitext_sql("s", "t", k=2, threshold=0.0)).fetchall() == []
    con.close()
