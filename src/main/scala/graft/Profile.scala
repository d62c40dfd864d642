package graft

import org.apache.spark.sql.SparkSession

import graft.data.SynthCorpus
import graft.kg.KgPipeline
import graft.link.{Dict, Linker}

/** Ad-hoc stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 4 * cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's size-based coalescing merges compute-heavy-but-small scoring
      // cells back together — partition sizes don't reflect O(|q|·|d|) work.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
      private val maxes = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAccumulator]()
      private val counts = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
      private val swrite = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
      private val sread = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        tasks.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(d)
        maxes.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAccumulator(Math.max(_, _), 0L)).accumulate(d)
        counts.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(1)
        val m = te.taskMetrics
        if (m != null) {
          swrite.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(m.shuffleWriteMetrics.bytesWritten)
          sread.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val id = sc.stageInfo.stageId
        val wall = sc.stageInfo.completionTime.getOrElse(0L) - sc.stageInfo.submissionTime.getOrElse(0L)
        if (wall > 1500) {
          val tot = Option(tasks.get(id)).map(_.sum).getOrElse(0L)
          val mx = Option(maxes.get(id)).map(_.get).getOrElse(0L)
          val n = Option(counts.get(id)).map(_.sum).getOrElse(0L)
          val sw = Option(swrite.get(id)).map(_.sum).getOrElse(0L)
          val sr = Option(sread.get(id)).map(_.sum).getOrElse(0L)
          val site = sc.stageInfo.details.linesIterator
            .filterNot(_.contains("org.apache.spark")).take(2).mkString(" <- ")
          println(f"[stage] $id ${sc.stageInfo.name.take(60)} wall=${wall}ms tasks=$n taskSum=${tot}ms taskMax=${mx}ms shufW=${sw / 1048576}MB shufR=${sr / 1048576}MB site=$site")
        }
      }
    })

    val dict = Dict.default()
    val b = spark.sparkContext.broadcast(dict)

    // Raw kernel microbenchmark: single-threaded pairs/sec.
    if (sys.env.contains("GRAFT_KERNEL_BENCH")) {
      val regions = dict.regions
      val interp = new graft.interpret.AddressInterpreter(regions, dict.termIndex)
      val visitor = interp.newVisitor()
      val rows = SynthCorpus.corpus(regions, 2000, 8, 42)
      val docs = rows.flatMap { case (id, text) =>
        val a = interp.interpret(text, visitor)
        if (a == null || !a.division.hasCity) None
        else Some(graft.analyse.DocAnalyser.analyse(id, "x", a))
      }
      val dsides = docs.map(new graft.link.Scoring.Side(_)).toArray
      val queries = docs.take(500)
      var warm = 0.0
      for (rep <- 0 until 3) {
        val t0 = System.nanoTime()
        var acc = 0.0
        queries.foreach { qd =>
          val q = new graft.link.Scoring.QuerySide(qd)
          var i = 0
          while (i < dsides.length) { acc += graft.link.Scoring.score(q, dsides(i)); i += 1 }
        }
        val sec = (System.nanoTime() - t0) / 1e9
        warm = queries.size.toLong * dsides.length / sec
        println(f"[kernel] rep$rep: ${queries.size.toLong * dsides.length} pairs in $sec%.2f s = ${warm / 1e6}%.2f M pairs/s (acc=$acc%.1f)")
      }
      // Thread-scaling of the raw kernel (no Spark): 8 vs 32 JVM threads.
      for (nThreads <- Seq(8, 32)) {
        val t0 = System.nanoTime()
        val threads = (0 until nThreads).map { t =>
          new Thread(() => {
            queries.foreach { qd =>
              val q = new graft.link.Scoring.QuerySide(qd)
              var i = 0
              var acc = 0.0
              while (i < dsides.length) { acc += graft.link.Scoring.score(q, dsides(i)); i += 1 }
              if (acc == Double.MinValue) println(acc)
            }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        val pairs = nThreads.toLong * queries.size * dsides.length
        println(f"[kernel-mt] $nThreads threads: $pairs pairs in $sec%.2f s = ${pairs / sec / 1e6}%.2f M pairs/s")
      }
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val corpusN = sys.env.getOrElse("GRAFT_CORPUS_N", "12000").toLong
    val convN = sys.env.getOrElse("GRAFT_CONV_N", "8000").toLong
    val nDistricts = sys.env.getOrElse("GRAFT_DISTRICTS", "8").toInt
    val corpus = SynthCorpus.corpusDS(spark, b, corpusN, nDistricts, 42)
    val turns = SynthCorpus.transcriptsDS(spark, b, convN, nDistricts, 7)
    time("gen corpus count")(corpus.count())
    time("gen turns count")(turns.count())
    val docs = time("buildDocs") {
      val d = Linker.buildDocs(spark, corpus, b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val idf = time("buildIdf") {
      val i = Linker.buildIdf(spark, docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      i.count(); i
    }
    val mentions = time("detectMentions+stamp") {
      val m = KgPipeline.stampQueryIdf(spark,
        KgPipeline.detectMentions(spark, turns, b), idf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    // GRAFT_AB_QSPREAD=1: A/B the query-side rebalance (qspread) in ONE
    // session — ABBA order so JIT warmup and drifting ambient contention
    // charge both arms equally.
    if (sys.env.get("GRAFT_AB_QSPREAD").exists(v => v.nonEmpty && v != "0")) {
      for ((qs, i) <- Seq(true, false, false, true).zipWithIndex) {
        time(s"linkTopKAuto qspread=$qs rep$i") {
          Linker.linkTopKAuto(spark, mentions.map(_.doc), docs, 5,
            idf = Some(idf), qspread = qs).count()
        }
      }
      spark.stop()
      return
    }

    // GRAFT_FUSED=0 profiles the legacy prestamped path (attachIdf cogroup
    // + idf-carrying blobs) for A/B against the fused default — same
    // session, same input, so ambient noise cancels.
    val fusedMode = sys.env.getOrElse("GRAFT_FUSED", "1") == "1"
    val hits = if (fusedMode) time("linkTopKAuto (fused idf)") {
      // The AUTO FUSED path — what KgPipeline.run actually executes (round
      // 4: idf stamps in-cell, no attachIdf cogroup); persisted so the
      // triples timing below measures triple emission, not a second link
      // pass.
      val h = Linker.linkTopKAuto(spark, mentions.map(_.doc), docs, 5,
          idf = Some(idf))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      h.count(); h
    } else {
      val docsIdf = time("attachIdf") {
        val d = Linker.attachIdf(spark, docs, idf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      time("linkTopKAuto (prestamped)") {
        val h = Linker.linkTopKAuto(spark, mentions.map(_.doc), docsIdf, 5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        h.count(); h
      }
    }
    time("triples") {
      KgPipeline.mentionTriples(spark, mentions, b)
        .union(KgPipeline.linkTriples(spark, mentions, hits)).count()
    }
    spark.stop()
  }
}
