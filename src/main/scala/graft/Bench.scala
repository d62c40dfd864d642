package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.data.SynthCorpus
import graft.kg.KgPipeline
import graft.link.Dict

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{"cores_n":8,"tps_n":...,"cores_4n":32,"tps_4n":...,
  *             "efficiency":...}}
  *
  * The scaling block evidences the north rule's two-cluster-size criterion
  * in-sandbox: the SAME transcript→KG job on the SAME input at local[8] vs
  * local[32]; efficiency = tps(4N) / (4 * tps(N)). Also appended to BENCH.md.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Scaling-run input sizes: larger than the correctness runs so compute
    * dominates fixed job overhead. */
  private def scalingSizes(sfDir: String): (Long, Long, Int) = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1).toDouble).getOrElse(0.001)
    if (sf >= 0.1) (60000L, 40000L, 12)
    else if (sf >= 0.01) (12000L, 8000L, 8)
    else (3000L, 1500L, 5)
  }

  /** Materialize the scaling input ONCE as parquet (distributed generation),
    * so both cluster-size runs read the identical table from disk. */
  private def writeScalingInput(sfDir: String, dict: Dict, dir: String): Unit = {
    val spark = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    try {
      val (corpusN, nConvs, nDistricts) = scalingSizes(sfDir)
      val b = spark.sparkContext.broadcast(dict)
      SynthCorpus.corpusDS(spark, b, corpusN, nDistricts, 42)
        .toDF("id", "rawText").write.mode("overwrite").parquet(s"$dir/corpus")
      SynthCorpus.transcriptsDS(spark, b, nConvs, nDistricts, 7)
        .write.mode("overwrite").parquet(s"$dir/turns")
    } finally spark.stop()
  }

  /** Full transcript→KG pipeline wall time at a given core count; returns
    * (turns, linkedMentions, seconds). Reads the shared parquet input. */
  private def pipelineRun(cpus: Int, inputDir: String, dict: Dict): (Long, Long, Double) = {
    val spark = session(cpus)
    try {
      import spark.implicits._
      val corpus = spark.read.parquet(s"$inputDir/corpus")
        .select("id", "rawText").as[(Long, String)]
      val turns = spark.read.parquet(s"$inputDir/turns").as[graft.model.Turn]
      val bdict = spark.sparkContext.broadcast(dict)
      val nTurns = turns.count()
      val t0 = System.nanoTime()
      val (_, triples, hits) = KgPipeline.run(spark, turns, corpus, bdict, 5)
      triples.count()
      val linked = hits.select("queryId").distinct().count() // cheap: hits cached
      val sec = (System.nanoTime() - t0) / 1e9
      (nTurns, linked, sec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dict = Dict.default()

    // 1. Per-query timings at the configured core count.
    val spark = session(cpus)
    val results: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    spark.stop()

    // 2. Scaling: same KG job at N and 4N cores on identical parquet input.
    val inputDir = Files.createTempDirectory("graft-bench").toString
    writeScalingInput(sfDir, dict, inputDir)
    val coresN = math.max(1, cpus / 4)
    val (turnsN, linkedN, secN) = pipelineRun(coresN, inputDir, dict)
    val (turns4N, linked4N, sec4N) = pipelineRun(cpus, inputDir, dict)
    val tpsN = turnsN / secN
    val tps4N = turns4N / sec4N
    val eff = tps4N / ((cpus.toDouble / coresN) * tpsN)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"cores_n":$coresN,"tps_n":$tpsN%.1f,"sec_n":$secN%.2f,""" +
      f""""cores_4n":$cpus,"tps_4n":$tps4N%.1f,"sec_4n":$sec4N%.2f,""" +
      f""""turns":$turns4N,"linked_turns":$linked4N,"efficiency":$eff%.3f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")

    // 3. Persist the scaling evidence for BASELINE.md's target table.
    val report =
      f"""## BENCH — transcript→KG throughput scaling (latest run)
         |
         |Same job, same input ($sfDir synthetic scale), single machine:
         |
         || cores | turns | linked turns | wall sec | turns/sec |
         ||---|---|---|---|---|
         || $coresN | $turnsN | $linkedN | $secN%.2f | $tpsN%.1f |
         || $cpus | $turns4N | $linked4N | $sec4N%.2f | $tps4N%.1f |
         |
         |Scaling efficiency N→4N (target >= 0.8): **$eff%.3f**
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"), report)
  }
}
