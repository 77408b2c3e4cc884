"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE SHORT JSON line (guaranteed to fit
the driver's 2000-char stdout tail window whole):
  {"metric": "filter_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {slowest 12}, "queries_full": "BENCH/queries_latest.json",
   "sf": ..., "docs": N, ...}
The complete per-query map (all 102 queries) is written to
BENCH/queries_latest.json, which is committed per round.

The headline metric is the CCNet-style filter pipeline throughput
(docs/sec) over the documents table — scrub + heuristics + KenLM
perplexity + buckets + keep/drop — with the LM already built/broadcast
(steady-state scoring, matching how the reference's benchmark harness
times queries after load, kenlm_benchmark_main.cc:80-120).

Contention-robust timing (VERDICT r3 item 3): the host is shared with
external tenants whose load bursts contaminated single-pass timings
(r3 headline 513 vs 849/1438 for identical code at different loadavg).
The harness therefore runs BENCH_ROUNDS (default 3) interleaved rounds
over the full query list and reports the per-query MIN, plus the
observed loadavg before each round so the artifact carries its own load
evidence. spark.catalog.clearCache() runs before every timed query so
ops that cache self-join subtrees (lsh_jaccard, dedup_embedding, ...)
are re-timed from the parquet scan, not from their own cache.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))
# stop starting new rounds past this wall-clock budget (>=1 round always
# completes; the min over completed rounds remains a valid statistic)
BUDGET_SEC = float(os.environ.get("BENCH_BUDGET_SEC", "900"))

BENCH_QUERIES = [
    "perplexity_docs",
    "filter_pipeline",
    "token_stats",
    "quality_features",
    "pii_scrub",
    "dedup_exact",
    "minhash_signatures",
    "dedup_jaccard",
    "simhash",
    "ngram_counts",
    "continuation_counts",
    "vocab_filter",
    "suffix_sort_topk",
    "j1_suffix_join",
    "cosine_topk",
    "lsh_ann",
    "langid_docs",
    # added r02 (appended so r01 per-query timings stay comparable)
    "pruned_counts",
    "context_filter",
    "multiout_filter",
    "phrase_filter",
    "lsh_jaccard",
    "image_metadata",
    "dedup_embedding",
    "events_sessionize",
    "paragraph_stats",
    # added r03 (appended so r02 per-query timings stay comparable)
    "pruned_model_probs",
    "image_headers",
    "bucket_resample",
    "events_sessionize_skew",
    "paragraph_dedup",
    "decontaminate",
    "gopher_rules",
    "gopher_repetition",
    "salted_domain_counts",
    # added r04: the 4 gate queries previously excluded — coverage is total
    "count_of_counts",
    "union_filter",
    "doc_fingerprint",
    "events_windowed",
    # added r04: web-pipeline operators (URLs, clusters, mixing, NFC)
    "url_canonicalize",
    "url_dedup",
    "domain_blocklist",
    "dedup_clusters",
    "token_budget_mix",
    "nfc_normalize",
    "fuzzy_dedup_e2e",
    "quality_classifier",
    "url_pattern_filter",
    "corpus_report",
    "winnow_fingerprints",
    "winnow_pairs",
    "temperature_sample",
    # added r05 (appended so r04 per-query timings stay comparable)
    "registered_domain_psl",
    "temperature_sample_a07",
    "image_pixel_stats",
    "token_budget_mix_2p",
    "image_pooled_features",
    "dup_spans",
    "audio_pcm_stats",
    "video_metadata",
    "c4_rules",
    "robots_filter",
    "ivf_ann",
    "pack_sequences",
    "bloom_filter",
    "cms_counts",
    "bpe_merges",
    # added late r05 (appended so earlier per-query timings stay comparable)
    "inverted_index",
    "tfidf_topk",
    "bm25_topk",
    "extract_links",
    "link_degrees",
    "pagerank",
    "warc_parse",
    "warc_wet",
    "dedup_spans_removed",
    "hll_distinct",
    "anchor_topk",
    "crawl_diff",
    # added late r05 (appended so earlier per-query timings stay comparable)
    "fix_mojibake",
    "domain_prior",
    "dedup_normalize",
    "group_sample",
    "hist_quantiles",
    "dsir_scores",
    "mixed_language",
    "semdedup",
    "training_order",
    "incremental_dedup",
    "char_entropy",
    "chunk_documents",
    "psi_drift",
    "cdx_select",
    "domain_split",
    "classifier_calibration",
    "boilerplate_removal",
    # added late r05 (appended so earlier per-query timings stay comparable)
    "filter_ablation",
    "bitext_mining",
    "script_profile",
    "topic_tag",
    "gif_pixel_stats",
    "sentence_stats",
    # added r06
    "jpeg_pixel_stats",
    # added late r06 (appended so earlier per-query timings stay comparable)
    "bpe_encode",
    "pagerank_dangling",
    "image_phash",
    "image_hash_dedup",
    "audio_mp3_metadata",
    "video_frame_sample",
]


def main():
    import __spark_entry__ as entrymod
    from kenlm_rs_spark.spark.session import get_spark

    spark = get_spark(
        "kenlm-bench", master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()

    # warm: build + broadcast the corpus LM once (excluded from timing, like
    # the reference benchmark which times queries after model load)
    entrymod._corpus_model(spark, SF_DIR)

    qs = entrymod.queries()
    all_rounds: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    errors: dict[str, str] = {}
    loadavgs: list[float] = []
    round_totals: list[float] = []
    t_bench = time.time()
    for r in range(ROUNDS):
        if r > 0 and time.time() - t_bench > BUDGET_SEC:
            break
        loadavgs.append(round(os.getloadavg()[0], 2))
        r0 = time.time()
        for name in BENCH_QUERIES:
            if name in errors:
                continue
            # re-time the real work, not a prior round's cached subtree
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                df = qs[name](spark, SF_DIR)
                # noop write materializes EVERY column, so Python-UDF stages
                # are not column-pruned away the way df.count() prunes them
                # (CLAUDE.md gotcha; VERDICT r01 item 3)
                df.write.format("noop").mode("overwrite").save()
                all_rounds[name].append(round(time.time() - t0, 3))
            except Exception as e:  # a broken query must not kill the bench
                errors[name] = str(e)[:200]
        round_totals.append(round(time.time() - r0, 2))

    timings = {
        name: (min(secs) if secs else -1.0) for name, secs in all_rounds.items()
    }
    filter_sec = max(timings.get("filter_pipeline", 0.0), 0.0)
    docs_per_sec = round(n_docs / filter_sec, 2) if filter_sec else 0.0
    out = {
        "metric": "filter_docs_per_sec",
        "value": docs_per_sec,
        "unit": "docs/sec",
        "queries": timings,
        "sf": SF_DIR,
        "docs": n_docs,
        "cpus": int(CPUS),
        "rounds": len(round_totals),
        "loadavg_per_round": loadavgs,
        "round_totals_sec": round_totals,
        "total_sec": round(sum(t for t in timings.values() if t > 0), 2),
    }
    if errors:
        out["errors"] = errors

    # The driver's BENCH artifact keeps only the LAST 2000 chars of stdout
    # and parses a JSON line out of them (BENCH_r05 recorded parsed:null
    # because the single line with 101 per-query times exceeded the window
    # and lost its front, including "metric"/"value").  VERDICT r5 item 2:
    # the full per-query map goes to a committed file; stdout carries ONE
    # short headline line — guaranteed to fit the window whole — whose
    # "queries" field holds the slowest queries only, plus a pointer to
    # the full map.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    full_path = os.path.join(bench_dir, "queries_latest.json")
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v > 0),
            key=lambda kv: -kv[1],
        )[:12]
    )
    headline = dict(out)
    headline["queries"] = slowest
    headline["queries_full"] = "BENCH/queries_latest.json"
    headline["n_queries"] = len(BENCH_QUERIES)
    if errors:
        headline["errors"] = {k: v[:60] for k, v in list(errors.items())[:3]}
    line = json.dumps(headline, separators=(",", ":"))
    while len(line) > 1500 and headline["queries"]:
        headline["queries"].popitem()
        line = json.dumps(headline, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
