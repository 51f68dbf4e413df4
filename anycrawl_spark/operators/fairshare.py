"""Max-min fair allocation of per-host fetch capacity across jobs.

When several crawl jobs want pages from the same host, the host's
politeness budget (requests per round) is a shared resource. The
standard answer is max-min fairness (progressive filling / water-
filling — classic networking theory, Bertsekas & Gallager's *Data
Networks* §6.5.2, public): small demands are satisfied fully, the rest
split the remaining capacity evenly. The reference serializes jobs
through one queue per job with no cross-job host arbitration
(`packages/libs/queue`), so this is rebuild-added multi-tenant
scheduling.

Closed-form, not iterative: with demands sorted ascending, the
water level breaks at the largest k where
``d_k·(n-k+1) + prefix_{k-1} <= C`` — everything at or below k is fully
served, and the ``n-k`` bigger demands share ``C - prefix_k``. That
makes the whole allocation window/column math: one sort-rank window per
host, one prefix sum, one conditional max — no loop, no python, exact
int64 throughout. (The satisfied set is provably a rank prefix: demands
ascending make the break condition monotone in k.) The integer
remainder ``(C - prefix_k) mod (n-k)`` goes one token each to the first
unsatisfied jobs in (demand asc, job asc) order, so results are
bit-deterministic and the oracle can restate them.

Scale shape: windows partition by host; a host's demand list is
O(concurrent jobs) — tens, not millions — so partitions stay tiny at
any corpus size, and the output feeds the politeness stage on the same
(host) key it is already partitioned by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fairshare_alloc(
    demands: DataFrame,
    host_col: str = "host",
    job_col: str = "job_id",
    demand_col: str = "demand",
    capacity_col: str = "capacity",
) -> DataFrame:
    """Adds ``alloc`` — the max-min fair share of ``capacity_col``
    (constant per host) across the host's job demands, plus the
    ``k`` rank and ``fully_served`` flag for inspection."""
    w_ord = Window.partitionBy(host_col).orderBy(
        F.col(demand_col).asc(), F.col(job_col).asc()
    )
    w_all = Window.partitionBy(host_col)
    k = F.row_number().over(w_ord).cast("long")
    n = F.count("*").over(w_all).cast("long")
    prefix = F.sum(demand_col).over(
        w_ord.rowsBetween(Window.unboundedPreceding, 0)
    ).cast("long")
    d = F.col(demand_col).cast("long")
    cap = F.col(capacity_col).cast("long")
    ranked = demands.select(
        F.col(host_col).alias("host"),
        F.col(job_col).alias("job_id"),
        d.alias("demand"),
        cap.alias("capacity"),
        k.alias("k"),
        n.alias("n"),
        prefix.alias("prefix"),
    ).withColumn(
        "_sat",
        (F.col("demand") * (F.col("n") - F.col("k") + 1)
         + F.col("prefix") - F.col("demand")) <= F.col("capacity"),
    )
    w_host = Window.partitionBy("host")
    big_k = F.max(F.when(F.col("_sat"), F.col("k")).otherwise(F.lit(0))).over(w_host)
    prefix_k = F.max(
        F.when(F.col("_sat"), F.col("prefix")).otherwise(F.lit(0))
    ).over(w_host)
    out = (
        ranked.withColumn("_K", big_k.cast("long"))
        .withColumn("_prefK", prefix_k.cast("long"))
        .withColumn("_rest", (F.col("n") - F.col("_K")).cast("long"))
        .withColumn(
            "_base",
            F.when(
                F.col("_rest") > 0,
                F.expr("(capacity - _prefK) div _rest"),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn(
            "_rem",
            F.when(
                F.col("_rest") > 0,
                F.expr("(capacity - _prefK) % _rest"),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )
    alloc = F.when(F.col("k") <= F.col("_K"), F.col("demand")).otherwise(
        F.col("_base")
        + F.when(F.col("k") - F.col("_K") <= F.col("_rem"), F.lit(1)).otherwise(
            F.lit(0)
        )
    )
    return out.select(
        "host",
        "job_id",
        "demand",
        "capacity",
        "k",
        alloc.cast("long").alias("alloc"),
        (F.col("k") <= F.col("_K")).cast("long").alias("fully_served"),
    )
