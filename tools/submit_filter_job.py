"""spark-submit entry script for the quality-filter job (north rule launch
shape): the package arrives via --py-files, this file is the application.

  spark-submit --master <...> --py-files dist/kenlm_rs_spark.zip \
      tools/submit_filter_job.py --generate 100000 --output /out \
      --lm-dir /models --chunks 64
"""

if __name__ == "__main__":
    from kenlm_rs_spark.pipeline.filter_job import main

    main()
