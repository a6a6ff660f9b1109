"""Build dist/scoobie_spark.zip for spark-submit --py-files.

Only library sources go in the zip (no tests, no fixtures data); the
driver script stays outside (scripts/submit_job.py).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "scoobie_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "scoobie_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                # .json.gz = the trained conll2000 model artifacts
                # (perceptron.py) — workers unpack them from the zip
                if fn.endswith((".py", ".json.gz")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
