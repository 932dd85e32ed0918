"""Zip the lucene_spark package for `spark-submit --py-files`."""

from __future__ import annotations

import os
import sys
import zipfile

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lucene_spark.zip"
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(root, "lucene_spark")
    for dirpath, _, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
print(OUT)
