"""Package pii_spark for spark-submit --py-files.

Builds dist/pii_spark.zip containing the pure-Python package (word
lists + models are built deterministically at import, so the zip is the
complete artifact — no side files to ship). Cluster usage:

    spark-submit --py-files dist/pii_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        jobs/run_quality.py --input s3://corpus --output s3://out

Executors import pii_spark from the zip; every UDF closure references
module-level functions only (no driver-captured state), which is what
makes the shipped artifact sufficient.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def build(out: Path | None = None) -> Path:
    out = out or ROOT / "dist" / "pii_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "pii_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    return out


if __name__ == "__main__":
    path = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(path)
