"""Regenerate the committed golden corpus (oracle-produced, FIXTURES.md §2).

Run: python jobs/make_golden.py
Only the oracle may regenerate goldens — never the Spark job (that would
make the golden test circular).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from ukrainian_ocr_pipeline_spark.fixtures import gen_pages
from ukrainian_ocr_pipeline_spark.oracle import run_oracle

T2_ROWS = 500
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden")


def main():
    golden = run_oracle(list(gen_pages(T2_ROWS)))
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in ("extracted", "blocks", "spans", "matches", "regions", "metrics"):
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(golden[name], preserve_index=False), path)
        print(f"wrote {path} ({len(golden[name])} rows)")


if __name__ == "__main__":
    main()
