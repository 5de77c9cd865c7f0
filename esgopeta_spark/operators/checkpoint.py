"""Checkpoint-mode knob for iterative DataFrame operators.

Every driver-paced iterative operator in this package (connected
components, k-means codebook training, BFS shortest hops, BPE training)
must cut the Catalyst lineage once per round or plan re-analysis
dominates within a few rounds (measured cliff documented in
operators/dedup.py).  HOW the lineage is cut is a deployment decision:

- ``"local"`` (default): ``DataFrame.localCheckpoint`` — blocks live in
  executor storage.  Fast (no DFS write), but blocks die with an
  executor, which on a real cluster kills the whole iterative job on a
  single executor loss.  The right choice for local["*"] and short jobs.
- ``"reliable"``: ``DataFrame.checkpoint`` — blocks are written to the
  directory registered via ``spark.sparkContext.setCheckpointDir(...)``
  (HDFS/S3/... on a cluster).  Survives executor loss; the right choice
  for long iterative jobs at 100 TB.  The caller MUST have called
  ``setCheckpointDir`` first — Spark raises otherwise.

The knob changes durability only, never values: both modes materialize
the same rows (pinned by tests/test_llm_ops.py
test_reliable_checkpoint_mode_identical_results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_MODES = ("local", "reliable")


def materialize(df: DataFrame, checkpoint: str = "local", eager: bool = True) -> DataFrame:
    """Cut lineage on ``df`` per the requested durability mode."""
    if checkpoint not in CHECKPOINT_MODES:
        raise ValueError(f"checkpoint must be one of {CHECKPOINT_MODES}, got {checkpoint!r}")
    if checkpoint == "reliable":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
