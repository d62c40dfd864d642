package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: quiet-session wall time of named driver queries.
  * Usage: runMain graft.ProbeQuery <queryName> [queryName...]
  * GRAFT_JOBS=1 prints per-Spark-job wall + first non-spark call site. */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("GRAFT_PASSES", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (2 * cpus.toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var verbose = false
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Seq[Int])]()
    val stageSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    if (sys.env.get("GRAFT_JOBS").exists(v => v.nonEmpty && v != "0")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          j.stageInfos.foreach { si =>
            val site = si.details.linesIterator
              .find(l => l.contains("graft") && !l.contains("ProbeQuery"))
              .getOrElse(si.name).trim.take(70)
            stageSite.put(si.stageId, site)
            stageTasks.put(si.stageId, si.numTasks)
          }
          jobStart.put(j.jobId, (System.nanoTime(), j.stageIds.toSeq.map(_.toInt))); ()
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.remove(j.jobId)
          if (verbose && s != null) {
            val ms = (System.nanoTime() - s._1) / 1e6
            val sites = s._2.flatMap(id => Option(stageSite.get(id))).distinct
            val tasks = s._2.flatMap(id => Option(stageTasks.get(id)).map(_.toInt)).sum
            if (ms >= 30)
              println(f"  [job] ${j.jobId}%4d ${ms}%7.0f ms tasks=$tasks%4d  ${sites.mkString(" | ").take(150)}")
          }
        }
      })
    }
    args.foreach { name =>
      (1 to passes).foreach { pass =>
        verbose = pass == passes
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[probe] $name pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
      verbose = false
    }
    spark.stop()
  }
}
