#!/usr/bin/env bash
# Build the --py-files artifact and show the spark-submit invocation
# (BASELINE.json packaging contract).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/nise_dedup.zip
mkdir -p dist
zip -qr dist/nise_dedup.zip nise_dedup -x '*__pycache__*'
echo "built dist/nise_dedup.zip"
echo
echo "run on a cluster:"
echo "  spark-submit --py-files dist/nise_dedup.zip \\"
echo "      \$(python -c 'import nise_dedup.cli as m; print(m.__file__)') \\"
echo "      run --input <corpus-uri> --format iceberg \\"
echo "      --output <dir> --checkpoint <ckpt-dir>"
