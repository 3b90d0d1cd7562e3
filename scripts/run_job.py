"""spark-submit entry point (absolute imports; the package itself ships
via --py-files):

    spark-submit --py-files dist/aws_log_ingestion_spark.zip \
        scripts/run_job.py <in_sf_dir> <out_dir>
"""

import sys

from aws_log_ingestion_spark.plans.job import main

if __name__ == "__main__":
    main(sys.argv)
