"""Package the engine for cluster submission.

Produces dist/blacklab_spark.zip suitable for
`spark-submit --py-files dist/blacklab_spark.zip jobs/build_index.py ...`
(north rule: index builds run via spark-submit --py-files on
multi-executor clusters). Pure stdlib; deterministic member order.
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "blacklab_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    members = []
    pkg = os.path.join(ROOT, "blacklab_spark")
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append((full, os.path.relpath(full, ROOT)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            zf.write(full, arc)
    return out_path


if __name__ == "__main__":
    print(make_zip())
