"""Post-execution physical metrics: measured shuffle/broadcast bytes.

`assert_no_cartesian` and friends (audit.py) check plan SHAPE before
running; this module reads the SQL metrics AFTER an action, turning
"minimize shuffles" from prose into numbers a test can pin — e.g.
map-side combine proven by shuffle bytes ≪ input bytes, or a bucketed
join proven by zero exchange bytes, on real data rather than plan text.

Implementation walks the executed plan via py4j: AdaptiveSparkPlanExec
unwraps to its final plan, query stages unwrap to their materialized
subtree, and ReusedExchange nodes are NOT re-counted (their metrics
belong to the original exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _metric_values(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            out[kv._1()] = int(kv._2().value())
        except Exception:
            pass
    return out


def execution_metrics(df: DataFrame) -> dict:
    """Aggregate executed-plan metrics for ``df``'s LAST execution — call
    after an action (collect/count/write), otherwise metrics are zero.

    The action must run on THIS exact frame (``df.collect()`` /
    ``df.toPandas()``): ``df.count()`` or a write builds and executes a
    DIFFERENT QueryExecution, leaving this one's metrics at zero.

    Returns::

        {
          "shuffle_bytes_written": total across ShuffleExchange nodes,
          "shuffle_records_written": total exchange records,
          "broadcast_bytes": total across BroadcastExchange nodes,
          "exchanges": per-exchange [{"node", "bytes", "records"}...],
        }
    """
    plan = df._jdf.queryExecution().executedPlan()
    acc = {
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "broadcast_bytes": 0,
        "exchanges": [],
    }

    def walk(node):
        name = node.getClass().getSimpleName()
        if name.startswith("ReusedExchange"):
            return  # metrics live on (and were counted at) the original
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        vals = _metric_values(node)
        if name.startswith("ShuffleExchange"):
            b = vals.get("shuffleBytesWritten", 0)
            r = vals.get("shuffleRecordsWritten", 0)
            acc["shuffle_bytes_written"] += b
            acc["shuffle_records_written"] += r
            acc["exchanges"].append({"node": name, "bytes": b, "records": r})
        elif name.startswith("BroadcastExchange"):
            b = vals.get("dataSize", 0)
            acc["broadcast_bytes"] += b
            acc["exchanges"].append({"node": name, "bytes": b, "records": 0})
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    return acc
