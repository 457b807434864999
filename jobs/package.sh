#!/bin/sh
# Package spiderspark for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/spiderspark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/spiderspark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("spiderspark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/spiderspark.zip written")
EOF
