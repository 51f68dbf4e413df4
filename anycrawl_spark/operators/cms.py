"""Count-min sketch — mergeable frequency state for crawl counters.

Public reference: Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications". Companion
to the HLL sketch (``operators/sketches.py``): HLL answers "how many
DISTINCT", CMS answers "about how OFTEN is key k" from state that is
O(depth x width) integers per group regardless of key cardinality —
and, unlike a top-N count table, it can answer for ANY key after the
fact, not just keys someone thought to keep.

Where it fits the engine: per-(job, day) fetch counters over hosts at
10^8-host scale. An exact per-host count table is O(hosts) rows per
window; rolling 30-day windows then need a 30-way merge of O(hosts)
tables. A CMS per window is a few KB, merges by element-wise ADDITION
(exact integer math — counts over a union of windows are EXACTLY the
sum of the windows' sketches), and over-estimates by at most
eps * total_count with probability 1 - delta (eps = e/width,
delta = exp(-depth)). Heavy hitters stay accurate; the long tail takes
the epsilon noise — the right trade for "is this host suddenly hot".

Determinism/oracle: row hashes are the repo's md5 convention with the
row index as salt — DuckDB rebuilds identical cells (q_cms_hosts);
sums are integers, so no accumulation-order concerns anywhere.

Scale shape: ONE two-phase groupBy((group, row, col)) count whose
exchange carries at most depth x width partial rows per map task
(map-side combine over the fixed cell space), then an O(groups) rollup
to the dense sketch. Pure JVM.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256


def _cell(value: Column, row: int, width: int) -> Column:
    """Column for the CMS column index of ``value`` in hash row ``row``."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), value.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_cells(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Sparse (group..., row, col, n) cell counts — the data-scale
    aggregation. The (row, col) space is depth x width, so map-side
    combine caps the exchange regardless of input size."""
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                _cell(F.col(value_col), r, width).alias("col"),
            )
            for r in range(depth)
        ])
    ).alias("rc")
    return (
        df.select(*group_cols, rows)
        .select(*group_cols, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .groupBy(*group_cols, "row", "col")
        .agg(F.count("*").alias("n"))
    )


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Dense per-group sketch: (group..., sketch array<array<long>> of
    depth rows x width cols). Store next to progress rows; merge with
    ``cms_merge``; query with ``cms_query``."""
    sparse = cms_cells(df, group_cols, value_col, depth, width)
    return (
        sparse.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct((F.col("row") * width + F.col("col")).alias("k"), F.col("n").alias("v"))
                )
            ).alias("_mp")
        )
        .select(
            *group_cols,
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda r: F.transform(
                    F.sequence(F.lit(0), F.lit(width - 1)),
                    lambda c: F.coalesce(
                        F.element_at("_mp", (r * width + c).cast("long")), F.lit(0).cast("long")
                    ),
                ),
            ).alias("sketch"),
        )
    )


def cms_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge by element-wise ADDITION — counts over a union of windows are
    exactly the sum of the windows' sketches (integer math, no
    approximation added by merging)."""
    first = F.slice(F.collect_list("sketch"), 1, 1)[0]
    zero = F.transform(first, lambda row: F.transform(row, lambda c: F.lit(0).cast("long")))
    return sketches.groupBy(*group_cols).agg(
        F.aggregate(
            F.collect_list("sketch"),
            zero,
            lambda acc, sk: F.zip_with(
                acc, sk, lambda ra, rb: F.zip_with(ra, rb, lambda a, b: a + b)
            ),
        ).alias("sketch")
    )


def cms_query(sketch: Column, value: Column, depth: int = DEPTH, width: int = WIDTH) -> Column:
    """Point estimate for ``value``: min over rows of the hashed cell —
    never under the true count, over by <= (e/width) * total with
    probability 1 - e^-depth."""
    est = None
    for r in range(depth):
        cell = F.element_at(F.element_at(sketch, r + 1), (_cell(value, r, width) + 1).cast("int"))
        est = cell if est is None else F.least(est, cell)
    return est


def py_cms(values, depth: int = DEPTH, width: int = WIDTH):
    """Sequential mirror: dense sketch + query function."""
    sk = [[0] * width for _ in range(depth)]
    for v in values:
        for r in range(depth):
            h = int(hashlib.md5(f"cms{r}|{v}".encode()).hexdigest()[:15], 16) % width
            sk[r][h] += 1

    def query(v):
        return min(
            sk[r][int(hashlib.md5(f"cms{r}|{v}".encode()).hexdigest()[:15], 16) % width]
            for r in range(depth)
        )

    return sk, query
