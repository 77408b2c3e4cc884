"""CLI twins of the reference's binaries — the surface a kenlm-rs user
actually drives (lmplz, build_binary, query, filter). Each module mirrors
the core flags of its reference main and routes into the Spark/NumPy
implementations:

  python -m kenlm_rs_spark.tools.lmplz        (builder/lmplz_main.cc)
  python -m kenlm_rs_spark.tools.build_binary (build_binary_main.cc)
  python -m kenlm_rs_spark.tools.query        (query_main.cc / ngram_query.hh)
  python -m kenlm_rs_spark.tools.filter       (filter/filter_main.cc)
"""
