#!/usr/bin/env bash
# Package the pipeline for spark-submit --py-files (BASELINE.json north
# rule: "ships as spark-submit --py-files modules").
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
cd "$REPO"
rm -f dist/aws_log_ingestion_spark.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/aws_log_ingestion_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("aws_log_ingestion_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print("wrote dist/aws_log_ingestion_spark.zip")
PY
echo "run: spark-submit --py-files dist/aws_log_ingestion_spark.zip scripts/run_job.py <in_sf_dir> <out_dir>"
