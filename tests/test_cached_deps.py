"""ADVICE r3: the self-join caches inside lsh_jaccard_pairs /
ngram_jaccard_pairs / embedding_near_dup_pairs must be releasable by the
caller — they cannot be unpersisted inside the op (the returned plan is
lazy), so the op exposes them as ``result.cached_deps``."""


def _release(df, may_be_empty=False):
    deps = getattr(df, "cached_deps", None)
    assert deps is not None, "op must expose its cached-deps handle"
    if not may_be_empty:
        assert deps, "op must expose its cached dependencies"
    for d in deps:
        d.unpersist()
    return deps


def test_lsh_jaccard_cached_deps_released(spark):
    from kenlm_rs_spark.ops.dedup import lsh_jaccard_dedup

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % (i % 2))
         for i in range(8)],
        "doc_id long, text string",
    )
    out = lsh_jaccard_dedup(docs, threshold=0.5)
    out.count()
    deps = _release(out)
    assert all(not d.is_cached for d in deps)


def test_ngram_jaccard_cached_deps_released(spark):
    from kenlm_rs_spark.ops.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta %d" % (i % 2))
         for i in range(6)],
        "doc_id long, text string",
    )
    out = ngram_jaccard_pairs(docs, threshold=0.5)
    out.count()
    # r7: the single-aggregation posting-list shape needs no cache — the
    # handle must still exist and unpersisting must be a safe no-op
    deps = _release(out, may_be_empty=True)
    assert all(not d.is_cached for d in deps)


def test_embedding_near_dup_cached_deps_released(spark):
    from kenlm_rs_spark.ops.similarity import embedding_near_dup_pairs

    vecs = spark.createDataFrame(
        [(i, [float(i % 2), 1.0, 0.5, 0.25]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = embedding_near_dup_pairs(vecs, threshold=0.9)
    out.count()
    deps = _release(out)
    assert all(not d.is_cached for d in deps)
