"""Freeze DuckDB-oracle inputs for the Python-model flagship queries
(perplexity_docs / langid_docs / filter_pipeline) — VERDICT r01 item 1.

The per-document LM scores here are computed by the SEQUENTIAL state-machine
scorer (``NGramModel.perplexity``, the path golden-tested against the
reference's own unit values), NOT the vectorized batch scorer the Spark
pandas UDF uses — so the driver's hash comparison becomes a genuine
cross-implementation check of the vectorized path. The scrubbed text input is
produced by DuckDB itself via ``scrub_sql_expr`` (byte-identity with Spark's
``scrub_text`` is proven by the green ``pii_scrub`` oracle row), keeping the
scrub semantics single-sourced.

Outputs (per sf dir, under fixtures/oracle/<sfname>/):
  lm_raw.parquet       doc_id, log10_prob (f32 widened to f64), tokens, oov, ppl
  lm_scrubbed.parquet  same, scored over the DuckDB-scrubbed text
  langid.parquet       doc_id, lang_pred (NumPy classifier, run outside Spark)

The corpus model is the same pure function of the documents table that
__spark_entry__._corpus_model builds (trigram KN estimate; cached ARPA).

Usage: python tools/freeze_oracle.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sequential_scores(model, texts: list[str]):
    """Per-doc (log10_prob, tokens, oov, ppl) via the state-machine walk."""
    from kenlm_rs_spark.lm.score import _DELIM_TABLE

    out = {"log10_prob": [], "tokens": [], "oov": [], "ppl": []}
    for t in texts:
        toks = [w for w in (t or "").translate(_DELIM_TABLE).split(" ") if w]
        total, tokens, oov, ppl = model.perplexity(toks, bos=True, eos=True)
        out["log10_prob"].append(float(total))
        out["tokens"].append(tokens)
        out["oov"].append(oov)
        out["ppl"].append(ppl)
    return out


def cross_check(model, texts, seq):
    """Assert the vectorized batch scorer is bit-identical to the sequential
    walk on every document (the invariant CLAUDE.md pins)."""
    from kenlm_rs_spark.lm.score import score_texts

    vec = score_texts(model, texts, bos=True, eos=True)
    seq32 = np.array(seq["log10_prob"], dtype=np.float32)
    if not np.array_equal(vec["log10_prob"], seq32):
        bad = np.nonzero(vec["log10_prob"] != seq32)[0][:5]
        raise AssertionError(f"vectorized != sequential log10_prob at docs {bad}")
    assert np.array_equal(vec["tokens"], np.array(seq["tokens"])), "tokens mismatch"
    assert np.array_equal(vec["oov"], np.array(seq["oov"])), "oov mismatch"
    # math.pow and np.power can differ in the final ulp; the frozen ppl is
    # recomputed below with np.power from the bit-checked log10_prob, so here
    # only guard against real divergence
    assert np.allclose(vec["ppl"], np.array(seq["ppl"]), rtol=1e-12), "ppl mismatch"


def write(path, doc_ids, cols):
    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            **{k: pa.array(v) for k, v in cols.items()},
        }
    )
    pq.write_table(table, path)
    print(f"wrote {path} ({table.num_rows} rows)")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(REPO, "fixtures", "oracle", sf_name)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from kenlm_rs_spark.pipeline.langid import default_langid
    from kenlm_rs_spark.pipeline.scrub import scrub_sql_expr
    from kenlm_rs_spark.spark.session import get_spark

    # the corpus LM is estimated with Spark (it is an input artifact — the
    # independent piece is the scoring walk below)
    spark = get_spark("freeze-oracle", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    model = entrymod._corpus_model(spark, sf_dir)
    spark.stop()

    docs_pq = os.path.join(sf_dir, "documents.parquet")
    con = duckdb.connect()
    raw = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{docs_pq}') ORDER BY doc_id"
    ).df()
    scrubbed = con.sql(
        f"SELECT doc_id, {scrub_sql_expr('text')} AS text "
        f"FROM read_parquet('{docs_pq}') ORDER BY doc_id"
    ).df()

    for name, frame in (("lm_raw", raw), ("lm_scrubbed", scrubbed)):
        texts = frame["text"].fillna("").tolist()
        seq = sequential_scores(model, texts)
        cross_check(model, texts, seq)
        # ppl as the vectorized formulation computes it (np.power over f64),
        # a pure function of the bit-checked log10_prob/tokens pair
        totals32 = np.array(seq["log10_prob"], dtype=np.float32)
        toks = np.array(seq["tokens"], dtype=np.int64)
        ppl = np.power(10.0, -totals32.astype(np.float64) / np.maximum(toks, 1))
        ppl = np.where(toks == 0, np.inf, ppl)
        write(
            os.path.join(out_dir, f"{name}.parquet"),
            frame["doc_id"].tolist(),
            {
                "log10_prob": pa.array(seq["log10_prob"], pa.float64()),
                "tokens": pa.array(seq["tokens"], pa.int64()),
                "oov": pa.array(seq["oov"], pa.int64()),
                "ppl": pa.array(ppl.tolist(), pa.float64()),
            },
        )

    langs, _conf = default_langid().predict_batch(raw["text"].fillna("").tolist())
    write(
        os.path.join(out_dir, "langid.parquet"),
        raw["doc_id"].tolist(),
        {"lang_pred": pa.array([str(x) for x in langs], pa.string())},
    )

    # per-paragraph langid (ops/mixed_lang.py): split exactly like
    # split_paragraphs — posexplode index over ALL split parts, keep parts
    # whose space-trim (Spark trim = ASCII space only) is non-empty. The
    # separator is the gate row's GATE_SEP (the synthetic corpus has no
    # newlines; same device as the paragraph_dedup gate row).
    from kenlm_rs_spark.ops.mixed_lang import GATE_SEP

    p_doc, p_idx, p_text = [], [], []
    for did, text in zip(raw["doc_id"].tolist(), raw["text"].fillna("").tolist()):
        for i, part in enumerate(text.split(GATE_SEP)):
            if part.strip(" ") != "":
                p_doc.append(did)
                p_idx.append(i)
                p_text.append(part)
    p_langs, _ = default_langid().predict_batch(p_text)
    write(
        os.path.join(out_dir, "paragraph_langid.parquet"),
        p_doc,
        {
            "para_idx": pa.array(p_idx, pa.int32()),
            "lang_pred": pa.array([str(x) for x in p_langs], pa.string()),
        },
    )


if __name__ == "__main__":
    main()
