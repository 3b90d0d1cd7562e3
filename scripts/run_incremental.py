"""spark-submit entry point for incremental ingest (absolute imports;
the package ships via --py-files):

    spark-submit --py-files dist/aws_log_ingestion_spark.zip \
        scripts/run_incremental.py <transcript_parquet_dir> <out_dir>

Each run processes only input files not yet recorded in the out_dir
manifest and appends one ingest_batch; re-running with no new files is
a no-op that reprints the cumulative counts.
"""

import sys

from aws_log_ingestion_spark.plans.incremental import main

if __name__ == "__main__":
    main(sys.argv)
