#!/bin/bash
# Build the --py-files archive for cluster submission.
# Includes the CMap/AFM/AGL resources (they ride inside the zip and are
# loaded via importlib-relative paths, so every executor gets them).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pdfminer_six_spark.zip
zip -qr dist/pdfminer_six_spark.zip pdfminer_six_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "wrote dist/pdfminer_six_spark.zip ($(du -h dist/pdfminer_six_spark.zip | cut -f1))"
