package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway plan-capture probe for the ITERATIVE graph family (round 6):
  * the driver-facing queries materialize through the stash seam, so their
  * final `explain` is just the stash scan — this probe captures the plan of
  * ONE k-core peeling round's degree aggregation (the exact expression
  * `GraphOps.kCore` runs per round) under the two regimes the round-6 work
  * compares:
  *
  *   before — the round-5 shape: symmetrized edges at their upstream layout,
  *            shuffles at the corpus-width session default, AQE on;
  *   after  — the round-6 shape: edges repartitioned to the graph-sized
  *            width, shuffle partitions sized to the edge count, AQE off.
  *
  * Writes plans/r06/q50_kcore_round_{before,after}.txt. Not part of the
  * driver contract.
  */
object ProbeRoundPlan {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dict = graft.link.Dict.default()
    val b = spark.sparkContext.broadcast(dict)
    val corpus = graft.data.SynthCorpus.corpusDS(spark, b, 20000, 12, 42)
    val turns = graft.data.SynthCorpus.transcriptsDS(spark, b, 6000, 12, 7)
    val r = graft.kg.KgPipeline.run(spark, turns, corpus, b, 5)
    val edges = graft.kg.KgPipeline.coMentionEdges(spark, r.mentions, r.hits)
    val dir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(dir)

    def roundDeg(sym: org.apache.spark.sql.DataFrame) = {
      // One peeling round's alive-degree aggregation — the same expression
      // GraphOps.kCore runs per round (alive = all nodes in round 1).
      val alive = sym.select("id").distinct()
      sym.join(alive, "id")
        .join(alive.select(col("id").as("nbr")), "nbr")
        .groupBy("id").agg(count(lit(1)).as("core_deg"))
    }
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(name), plan)
      println(s"[plans] wrote plans/r06/$name")
    }

    // BEFORE: round-5 shape — upstream layout, session-width shuffles, AQE on.
    val symBefore = edges.select(col("src").as("id"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("id"), col("src").as("nbr")))
    dump("q50_kcore_round_before.txt", roundDeg(symBefore))

    // AFTER: round-6 shape — graph-sized repartition + sized shuffles, AQE off.
    val eCnt = edges.count()
    val gp = math.max(1L, math.min(2 * eCnt / 50000L + 1,
      4L * spark.sparkContext.defaultParallelism)).toInt
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", gp.toString)
      val symAfter = edges.select(col("src").as("id"), col("dst").as("nbr"))
        .union(edges.select(col("dst").as("id"), col("src").as("nbr")))
        .repartition(gp)
        .localCheckpoint(true)
      dump("q50_kcore_round_after.txt", roundDeg(symAfter))
      org.apache.spark.sql.graft.CheckpointBlocks.release(symAfter)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    org.apache.spark.sql.graft.CheckpointBlocks.release(edges)
    r.unpersistAll()
    spark.stop()
  }
}
