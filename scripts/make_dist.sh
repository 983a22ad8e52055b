#!/bin/bash
# Package the engine for cluster submission (north_rule: spark-submit --py-files).
# Produces dist/fast_carpenter_spark.zip — importable from executors' PYTHONPATH.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$REPO/dist"
cd "$REPO"
rm -f dist/fast_carpenter_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/fast_carpenter_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("fast_carpenter_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/fast_carpenter_spark.zip")
EOF
