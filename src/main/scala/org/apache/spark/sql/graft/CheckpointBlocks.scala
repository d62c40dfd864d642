package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release for `Dataset.localCheckpoint()` blocks.
  *
  * `localCheckpoint(eager = true)` is the right lineage cut for iterative
  * DataFrame loops (the checkpointed plan collapses to a `LogicalRDD` leaf,
  * so ANALYZED plans stay shallow — plain `persist` only substitutes the
  * cache at physical planning, leaving the analyzed tree to double per
  * iteration until even AQE's plan-string logging takes minutes). But
  * `Dataset.unpersist()` cannot free a checkpoint's blocks: they belong to
  * the underlying RDD, which otherwise waits for the ContextCleaner's
  * post-GC sweep. This helper reaches through the `LogicalRDD` leaf and
  * unpersists that RDD directly — lives in this package purely because the
  * execution-plan leaf types are Spark-internal surface.
  */
object CheckpointBlocks {

  /** Free the blocks behind a `localCheckpoint()`ed Dataset. No-op for any
    * other plan shape (never throws — safe to call defensively). */
  def release(ds: Dataset[_]): Unit = ds.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
    case _             => ()
  }
}
