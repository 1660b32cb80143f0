"""Build engine.zip for spark-submit --py-files.

Usage: python scripts/package.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in os.walk(os.path.join(ROOT, "gear5_spark")):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    z.write(full, os.path.relpath(full, ROOT))
        z.write(os.path.join(ROOT, "gen_fixtures.py"), "gen_fixtures.py")
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "engine.zip")
    print(build(out))
