"""Package pyproj_spark for spark-submit --py-files.

Produces dist/pyproj_spark.zip containing the package (pure python, no
native deps beyond numpy/pandas which executors already have), so jobs
run as:

    spark-submit --py-files dist/pyproj_spark.zip your_job.py

Run: python tools/make_pyfiles_zip.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "dist", "pyproj_spark.zip")


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    n = 0
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "pyproj_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
                n += 1
    print(f"wrote {OUT} ({n} files)")


if __name__ == "__main__":
    main()
