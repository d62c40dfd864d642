package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: quiet-session wall time of named driver queries.
  * Usage: runMain graft.ProbeQuery <queryName> [queryName...] */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (2 * cpus.toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[probe] $name pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    spark.stop()
  }
}
