#!/bin/bash
# Package the engine for spark-submit --py-files (north-rule ship form).
#
#   tools/make_pyfiles.sh                 # -> dist/entity_linking_spark.zip
#   spark-submit --master yarn \
#       --py-files dist/entity_linking_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       submit_job.py --workdir s3://bucket/el/run1 \
#       --input-docs  iceberg.prod.documents \
#       --input-aliases iceberg.prod.aliases
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/entity_linking_spark.zip
zip -qr dist/entity_linking_spark.zip entity_linking_spark -x "*__pycache__*"
echo "wrote dist/entity_linking_spark.zip ($(du -h dist/entity_linking_spark.zip | cut -f1))"
python - <<'EOF'
import sys, zipfile
sys.path.insert(0, "dist/entity_linking_spark.zip")
import entity_linking_spark  # noqa: F401  (import check from the zip)
names = zipfile.ZipFile("dist/entity_linking_spark.zip").namelist()
assert "entity_linking_spark/pipeline.py" in names
print(f"zip importable, {len(names)} files")
EOF
