"""spark-submit entry point for table maintenance (absolute imports;
the package ships via --py-files):

    spark-submit --py-files dist/aws_log_ingestion_spark.zip \
        scripts/run_maintenance.py compact <root> [target_mb]
    spark-submit --py-files dist/aws_log_ingestion_spark.zip \
        scripts/run_maintenance.py bucketize <in_parquet> <table_path> [n_buckets]
"""

import sys

from aws_log_ingestion_spark.plans.maintenance import main

if __name__ == "__main__":
    main(sys.argv)
