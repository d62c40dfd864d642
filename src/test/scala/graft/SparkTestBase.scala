package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for suites (lazy; one JVM per sbt test fork). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // The engine's SQL functions ride the standard extension hook — the
      // shared test session exercises the same injection a spark-submit
      // `--conf spark.sql.extensions=` deployment uses.
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
