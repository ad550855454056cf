"""Lineage truncation for iterative DataFrame loops.

Iterative operators (PageRank, connected components, label propagation)
reference the carried relation several times per round; persist() caches
execution but leaves the LOGICAL plan growing, and with ~4 references per
round Catalyst's planning cost grows exponentially until the driver OOMs
while planning (~round 5, measured in round 2). Eager checkpointing each
round truncates lineage and keeps per-round planning O(1).

Two flavors, chosen per deployment:

 - localCheckpoint() (default): blocks live on executor block managers.
   Zero-config and fast — right for tests and short local jobs — but a lost
   executor discards its blocks with NO recompute path (the lineage is
   gone), killing a long production run mid-loop.
 - checkpoint() against a RELIABLE directory (HDFS/object store): blocks
   survive executor loss, so a 40-round components job on a 1000-executor
   cluster shrugs off preemptions. Enabled by configuring a checkpoint dir
   (SparkContext.setCheckpointDir) or exporting SPARK_GRAFT_CHECKPOINT_DIR.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize `df` and truncate its lineage.

    Uses reliable checkpoint() when a checkpoint dir is configured on the
    SparkContext (or via $SPARK_GRAFT_CHECKPOINT_DIR); localCheckpoint()
    otherwise."""
    sc = df.sparkSession.sparkContext
    configured = sc._jsc.sc().getCheckpointDir()
    if not configured.isDefined():
        env_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if env_dir:
            sc.setCheckpointDir(env_dir)
            configured = sc._jsc.sc().getCheckpointDir()
    if configured.isDefined():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
