"""Build dist/engine.zip for spark-submit --py-files.

Zips the ``event_driven_etl_msc_research_spark`` package (source only) so
executors' Python workers can import it.  Usage::

    python tools/make_pyfiles_zip.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "event_driven_etl_msc_research_spark"


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "engine.zip")
    print(build(out))
