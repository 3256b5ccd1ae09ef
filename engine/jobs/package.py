"""Build the --py-files zip for spark-submit deployment.

Usage: ``python -m engine.jobs.package /tmp/engine.zip`` then
``spark-submit --py-files /tmp/engine.zip engine/jobs/tile_pyramid.py ...``
(executors import ``engine.*`` from the zip; the driver script itself is
shipped by spark-submit).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(root, "engine")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "engine.zip"))
