"""Batch grouped-map Pandas UDF surface (``groupBy().applyInPandas``) —
the Table B UDF/UDAF row's batch half (streaming half: stream_tws_* /
stream_stateful_*; row-stream half: mapInPandas in multimodal).

Median selection is order-insensitive and its interpolation (mean of
the middle pair) is one exact IEEE operation on identical doubles, so
unlike sums this per-group Python computation carries a full SQL
oracle: numpy ``median`` == DuckDB ``quantile_cont(0.5)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etlalchemy_spark.registry import register
from etlalchemy_spark.queries._util import t

_MAD_SQL = """
WITH m AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY user_id
)
SELECT e.user_id,
       any_value(m.med) AS med,
       quantile_cont(abs(e.value - m.med), 0.5) AS mad,
       COUNT(*) AS n
FROM events e JOIN m USING (user_id)
GROUP BY e.user_id
"""


@register("pandas_grouped_mad", oracle=_MAD_SQL, tags=("udf", "agg", "robust"))
def pandas_grouped_mad(spark, sf_dir):
    """Per-user robust dispersion (median absolute deviation) via
    applyInPandas: one Arrow batch per user, numpy inside. The
    two-pass median (med, then median of |x-med|) is what a SQL window
    can't do in one grouped pass — the canonical grouped-map use case.
    Scale shape: one shuffle on the group key; each group must fit a
    worker's memory (fine for per-entity groups; re-key or sketch
    when a single group outgrows a worker)."""
    import numpy as np
    import pandas as pd

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        med = float(np.median(v))
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "med": [med],
                "mad": [float(np.median(np.abs(v - med)))],
                "n": [len(v)],
            }
        )

    ev = t(spark, sf_dir, "events").select("user_id", "value")
    # Explicit keyed repartition at defaultParallelism: AQE coalesces
    # the group exchange by BYTES (a few MB here -> 2 post-shuffle
    # partitions), but the per-group work is an opaque Python stage
    # whose cost AQE cannot see — the whole UDF ran on 2 of 32 cores
    # (guide §2.5/§4). A user repartition on the SAME key satisfies
    # the groupBy's clustering requirement (no second exchange), is
    # not AQE-coalescible, and scales with the cluster via
    # defaultParallelism. Alternating same-session A/B: 3.54 -> 0.73 s.
    ev = ev.repartition(spark.sparkContext.defaultParallelism, "user_id")
    return ev.groupBy("user_id").applyInPandas(
        mad, "user_id long, med double, mad double, n long"
    )
