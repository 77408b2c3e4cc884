"""kenlm_rs_spark — a PySpark-native quality-filter engine.

A from-scratch reimplementation of the capabilities of twuebi/kenlm-rs
(KenLM n-gram language-model scoring) re-expressed Spark-first:

- ``kenlm_rs_spark.lm``       pure-NumPy KenLM model: ARPA/binary readers,
  Kneser-Ney scoring state machine, vectorized batch scorer.
- ``kenlm_rs_spark.spark``    SparkSession helpers + broadcast-model
  Arrow-vectorized pandas UDFs.
- ``kenlm_rs_spark.pipeline`` CCNet-style web-corpus quality filter
  (extraction, language ID, perplexity buckets, heuristic rules, PII scrub).
- ``kenlm_rs_spark.builder``  lmplz-lite: Kneser-Ney LM estimation as a
  DataFrame dataflow; ARPA filter operators.
- ``kenlm_rs_spark.ops``      large-scale training-data ops: dedup
  (exact/MinHash-LSH/SimHash), similarity search, text stats, multimodal.
"""

__version__ = "0.1.0"
