package graft

import org.apache.spark.sql.SparkSession

import graft.data.SynthCorpus
import graft.kg.KgPipeline
import graft.link.{Dict, Linker}

/** Throwaway optimization probe (round 6): WARM per-phase wall + Spark job
  * counts for the KG pipeline and its derived kg_* analytics, in a session
  * configured exactly like Bench. Not part of the driver contract. */
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        if (verbose) {
          val i = s.stageInfo
          val wall = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
          if (wall >= 40) {
            val site = i.details.linesIterator
              .filterNot(_.contains("org.apache.spark")).take(1).mkString
            println(f"  [stage] ${i.stageId} ${i.name.take(45)} wall=${wall}ms tasks=${i.numTasks} site=$site")
          }
        }
        ()
      }
    })
    def time[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val s0 = stages.get(); val t0n = tasks.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get() - j0} stages=${stages.get() - s0} tasks=${tasks.get() - t0n}")
      r
    }

    val dict = Dict.default()
    val b = spark.sparkContext.broadcast(dict)
    val (corpusN, nConvs, nDistricts) = (20000L, 6000L, 12)

    for (pass <- 1 to 3) {
      println(s"=== pass $pass ===")
      val corpus = SynthCorpus.corpusDS(spark, b, corpusN, nDistricts, 42)
      val turns = SynthCorpus.transcriptsDS(spark, b, nConvs, nDistricts, 7)
      import org.apache.spark.storage.StorageLevel
      val docs = time("dedup+buildDocs") {
        val d = Linker.buildDocs(spark, Linker.dedupCorpus(spark, corpus), b)
          .persist(StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      val idf = time("buildIdf") {
        val i = Linker.buildIdf(spark, docs).persist(StorageLevel.MEMORY_AND_DISK)
        i.count(); i
      }
      val mentions = time("mentions+stamp") {
        val m = KgPipeline.stampQueryIdf(spark,
          KgPipeline.detectMentions(spark, turns, b), idf)
          .persist(StorageLevel.MEMORY_AND_DISK)
        m.count(); m
      }
      val hits = time("linkTopKAuto") {
        verbose = pass == 3
        val h = Linker.linkTopKAuto(spark, mentions.map(_.doc), docs, 5,
            idf = Some(idf))
          .persist(StorageLevel.MEMORY_AND_DISK)
        h.count()
        verbose = false
        h
      }
      time("triples+count") {
        KgPipeline.mentionTriples(spark, mentions, b)
          .union(KgPipeline.linkTriples(spark, mentions, hits)).count()
      }
      time("comention") {
        KgPipeline.coMentionEdges(spark, mentions, hits, topRank = 1).count()
      }
      time("pmi") {
        KgPipeline.pmiEdges(spark, mentions, hits, topRank = 1).count()
      }
      time("negatives") {
        KgPipeline.negativeSamples(spark, hits, k = 4).count()
      }
      time("timeline") {
        KgPipeline.entityTimeline(spark, mentions, hits, turns).count()
      }
      time("tool_edges") {
        KgPipeline.toolEntityEdges(spark, mentions, hits, turns).count()
      }
      Seq(docs, idf, mentions, hits).foreach(_.unpersist())
    }
    spark.stop()
  }
}
