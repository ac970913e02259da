"""Build the --py-files zip for spark-submit deployment.

    python -m extractpdf4j_spark.package [dist_dir]

Produces ``dist/extractpdf4j_spark.zip`` containing the package tree —
ship it to executors via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(dist_dir: str = "dist") -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    os.makedirs(os.path.join(repo_root, dist_dir), exist_ok=True)
    out = os.path.join(repo_root, dist_dir, "extractpdf4j_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in os.walk(pkg_root):
            for f in files:
                if f.endswith((".pyc", ".pyo")) or "__pycache__" in base:
                    continue
                full = os.path.join(base, f)
                rel = os.path.relpath(full, repo_root)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "dist"
    print(build_zip(dest))
