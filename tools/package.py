#!/usr/bin/env python3
"""Build dist/go_cdc_chunkers_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "dist" / "go_cdc_chunkers_spark.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        # .c ships too: cdc/native.py compiles it on each worker at first
        # use (reads the source through importlib.resources, zip-safe).
        for pat in ("*.py", "*.c"):
            for p in sorted((ROOT / "go_cdc_chunkers_spark").rglob(pat)):
                z.write(p, p.relative_to(ROOT))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
