"""Dev harness mirroring the driver's correctness gate. Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    from anycrawl_spark.queries import EXTRA_QUERIES, QUERIES, verify_against_duckdb
    from anycrawl_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    failures = verify_against_duckdb(spark, sf_dir, only)
    n = len([q for q in {**QUERIES, **EXTRA_QUERIES} if only is None or q in only])
    spark.stop()
    print(f"{n - len(failures)}/{n} queries OK")
    for name, msg in failures:
        print(f"FAIL {name}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
