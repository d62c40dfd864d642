package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Dataset, Encoder, SaveMode, SparkSession}
import org.apache.spark.util.CollectionAccumulator

/** One row of per-partition lineage/metrics (north rule: every stage is
  * resumable with per-partition lineage + metrics; FIXTURES.md §6). */
final case class StageMetric(
    stage: String,
    partitionId: Int,
    rowsOut: Long,
    wallMs: Long,
    runId: String,
    completedAtMs: Long
)

/** Checkpointed stage runner — the Structured-Streaming-style "each stage is
  * a materialized, restartable table" idiom over batch parquet (in-sandbox
  * stand-in for Iceberg snapshots; the storage layer is this one class, so
  * swapping `parquet` for `writeTo(...).append()` is local).
  *
  * Contract per stage:
  *  - output table at `<root>/<name>` written via Spark's committed job
  *    protocol (`_SUCCESS` marks the atomic commit — partial writes from a
  *    killed run are invisible to the resume check and simply overwritten);
  *  - per-partition metrics appended to `<root>/_metrics` (stage, partition,
  *    rows, wall, runId) — computed DURING the write by a partition-count
  *    wrapper, not by a second pass;
  *  - a completed stage is NEVER recomputed: re-running the job skips to the
  *    first missing stage and reads the materialized table (downstream
  *    stages therefore read checkpointed data, not a recomputed lineage —
  *    resume-identical by construction).
  */
final class StageRunner(spark: SparkSession, root: String, runId: String) {

  private def dir(name: String) = s"$root/$name"
  def isComplete(name: String): Boolean =
    Files.exists(Paths.get(dir(name), "_SUCCESS"))

  /** Run (or resume) one stage. `compute` is only evaluated when the stage's
    * committed output is absent. */
  def stage[T: Encoder](name: String)(compute: => Dataset[T]): Dataset[T] = {
    import spark.implicits._
    if (!isComplete(name)) {
      val t0 = System.currentTimeMillis()
      val acc: CollectionAccumulator[(Int, Long)] =
        spark.sparkContext.collectionAccumulator[(Int, Long)](s"graft.$name.partitions")
      val counted = compute.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var n = 0L
        val out = it.map { r => n += 1; r }
        new Iterator[T] {
          private var reported = false
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && !reported) { reported = true; acc.add((pid, n)) }
            h
          }
          def next(): T = out.next()
        }
      }
      counted.write.mode(SaveMode.Overwrite).parquet(dir(name))
      val wall = System.currentTimeMillis() - t0
      val now = System.currentTimeMillis()
      val rows = new scala.collection.mutable.HashMap[Int, Long]()
      acc.value.forEach { case (pid, n) => rows(pid) = rows.getOrElse(pid, 0L) + n }
      val metrics = rows.toSeq.sortBy(_._1).map { case (pid, n) =>
        StageMetric(name, pid, n, wall, runId, now)
      }
      spark.createDataset(metrics)
        .write.mode(SaveMode.Append).parquet(s"$root/_metrics")
    }
    spark.read.parquet(dir(name)).as[T]
  }

  def metrics(): Dataset[StageMetric] = {
    import spark.implicits._
    spark.read.parquet(s"$root/_metrics").as[StageMetric]
  }
}

object StageRunner {
  /** Fresh runner with a caller-supplied runId (keep deterministic inputs
    * deterministic — derive runId from config, not wall clock, when replay
    * identity matters). */
  def apply(spark: SparkSession, root: String, runId: String): StageRunner =
    new StageRunner(spark, root, runId)
}
