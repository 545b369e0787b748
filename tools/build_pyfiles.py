"""Package the engine for spark-submit --py-files (north rule launch
mode: `spark-submit --py-files linkgraph.zip job.py` on a multi-
executor cluster).

Usage: python tools/build_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = "dist/linkgraph.zip") -> str:
    out = os.path.join(ROOT, out) if not os.path.isabs(out) else out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "linkgraph")
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    dest = build(sys.argv[1] if len(sys.argv) > 1 else "dist/linkgraph.zip")
    print(dest)
