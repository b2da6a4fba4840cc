"""Package awesome_spark_search for `spark-submit --py-files`.

Usage:
    python tools/make_pyfiles.py [dist/awesome_spark_search.zip]
    spark-submit --py-files dist/awesome_spark_search.zip jobs/build_index.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "awesome_spark_search.zip"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "awesome_spark_search")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
