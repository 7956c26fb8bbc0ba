"""Package the engine for ``spark-submit --py-files`` (north_rule: the
job runs on multi-executor clusters as a zipped python dependency).

Usage: python scripts/make_pyfiles.py [out.zip]  →  prints the zip path.
"""

from __future__ import annotations

import pathlib
import sys
import zipfile


def build(out: str = "dist/playwrightcrawler_spark.zip") -> str:
    root = pathlib.Path(__file__).resolve().parent.parent
    out_p = root / out
    out_p.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_p, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((root / "playwrightcrawler_spark").rglob("*.py")):
            z.write(p, p.relative_to(root))
    return str(out_p)


if __name__ == "__main__":
    print(build(*sys.argv[1:]))
