#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule launch mode).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/validate_xml_rust_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("validate_xml_rust_spark")
with zipfile.ZipFile("dist/validate_xml_rust_spark.zip", "w") as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/validate_xml_rust_spark.zip")
EOF
