package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyse.VtFormat
import graft.model.DocVec

/** Distributed read/write of the reference's `.vt` vector-dump format
  * (`SimilarityComputer.java:331-380` line codec; one file per region key,
  * the key carried by the file PATH, not the line). Composed from built-in
  * sources per the Spark-first preference order — the text source already
  * gives splittable parallel scans, partition pruning on the `partKey`
  * directory column, and committed writes; only the line codec is ours:
  *
  *  - layout: `<dir>/partKey=<key>/part-*.txt`, one serialized DocVec per
  *    line. `partitionBy("partKey")` on write ⇒ reading with a
  *    `.where($"partKey" === k)` prunes to one directory at the SCAN (the
  *    same partition-pruning contract PlanSpec pins for the parquet docs
  *    table).
  *  - idfs are NOT part of the `.vt` format (the reference recomputes them
  *    on load); deserialized DocVecs carry zero idfs exactly like the
  *    reference's loader, and `Linker.attachIdf` re-stamps them.
  */
object VtFiles {

  /** Write docs as `.vt` lines partitioned by partKey. */
  def write(docs: Dataset[DocVec], dir: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map(d => (d.partKey, VtFormat.serialize(d)))
      .toDF("partKey", "value")
      .write.partitionBy("partKey").mode("overwrite").text(dir)
  }

  /** Read a `.vt` directory back to DocVecs (zero idfs, as the reference's
    * loader produces them — re-stamp with `Linker.attachIdf`).
    *
    * `partKeys`, when non-empty, filters BEFORE deserialization so the
    * predicate lands on the scan as a PartitionFilter (directory pruning:
    * unselected keys are never read — asserted by VtFilesSpec). A filter
    * applied AFTER `read` sits above the opaque `mapPartitions` and cannot
    * prune, which is why pruning is an argument, not a caller-side
    * `.where`. */
  def read(spark: SparkSession, dir: String,
      partKeys: Seq[String] = Nil): Dataset[DocVec] = {
    import spark.implicits._
    val raw = spark.read.text(dir)
    val pruned =
      if (partKeys.isEmpty) raw else raw.where(col("partKey").isin(partKeys: _*))
    pruned
      .select(col("partKey").cast("string"), col("value"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (pk, line) =>
        Option(VtFormat.deserialize(line, pk))
      })
  }
}
