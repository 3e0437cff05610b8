"""Package pii_spark for spark-submit --py-files.

Builds dist/pii_spark.zip (pure-Python package; word lists + the
langid/perplexity models build deterministically at import). The
trained token head (artifacts/token_head.npz) ships via --files and is
picked up from the executor working dir. Cluster usage:

    spark-submit --py-files dist/pii_spark.zip \\
        --files artifacts/token_head.npz \\
        jobs/run_quality.py --input s3://corpus --output s3://out

Without the artifact the detector falls back to rule-only serving —
functional, a point of F1 lower. Every UDF closure references
module-level functions only (no driver-captured state).
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
