"""Lineage-truncation policy for iterative / multi-consumer frames.

The dedup and graph pipelines materialize intermediate frames (shingle
sets, fingerprints, per-round component labels) so self-joins and
iteration don't re-run the upstream pipeline or grow the plan without
bound.  HOW they materialize is a deployment decision, not an
algorithmic one, so it is threaded through as ``checkpoint_mode``:

* ``"local"`` (default) — ``localCheckpoint(eager=False)``: blocks are
  stored on executors.  Cheapest, and on a static cluster (or
  local[N]) semantically identical to reliable mode.  On a cluster
  with dynamic allocation or spot/preemptible nodes, executor loss
  forces recomputation and cached blocks pin executors against
  decommissioning — at 100 TB this is the wrong default.
* ``"reliable"`` — ``checkpoint(eager=False)``: blocks are written to
  the fault-tolerant checkpoint directory
  (``sparkContext.setCheckpointDir``, normally on the cluster's
  distributed store).  Survives executor loss; the choice for
  long-running dedup / connected-components jobs at scale.
* ``"none"`` — no truncation.  For short pipelines where the optimizer
  should see through the frame (or plan-inspection tests).

Lazy (``eager=False``) in all modes: the write happens when the first
action touches the frame, so an unexecuted plan costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_MODES = ("local", "reliable", "none")


def materialize(df: DataFrame, mode: str = "local") -> DataFrame:
    """Truncate ``df``'s lineage per ``mode`` (see module docstring)."""
    if mode == "local":
        return df.localCheckpoint(eager=False)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "checkpoint_mode='reliable' needs a checkpoint directory: "
                "call spark.sparkContext.setCheckpointDir(<dfs path>) first"
            )
        return df.checkpoint(eager=False)
    if mode == "none":
        return df
    raise ValueError(
        f"unknown checkpoint_mode {mode!r}; expected one of {CHECKPOINT_MODES}"
    )
