package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.data.SynthCorpus
import graft.kg.KgPipeline
import graft.link.Dict

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{"cores_n":2,...,"cores_4n":8,...,"cores_16n":32,...,
  *             "efficiency":<2→8>,"efficiency_8_32":<8→32>}}
  *
  * The scaling block evidences the north rule's two-cluster-size criterion
  * in-sandbox: the SAME transcript→KG job on the SAME parquet input at
  * local[2] / local[8] / local[32] (best-of-3 per point, symmetric reps);
  * efficiency = tps(4N) / (4 * tps(N)). Also written to BENCH.md.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Size-based coalescing merges compute-heavy-but-small scoring cells;
      // partition bytes don't reflect O(|q|*|d|) pair work (see Linker).
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // The engine's SQL functions (cosine_sim) ride the standard extension
      // hook — the bench session exercises the same injection a spark-submit
      // `--conf spark.sql.extensions=` deployment uses.
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
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
    // Sized so parallel compute W dominates the measured ~20s fixed per-job
    // overhead F (the scaling points fit T(c) = F + W/c almost exactly) —
    // the representative regime for the 10^12-turn design point, where F is
    // invisible. Round 3's inverted-index candidate pruning halved W at
    // fixed input, which would have let F dominate the ratio again, so the
    // sf0.1 standard input is 2.5× the round-2 size. Calibration from the
    // round-3 4×-input run (W grows ~quadratically with the multiplier m —
    // queries ×m and candidates-per-query ×m — W(m) ≈ 120·m²s): m=2.5 puts
    // the 2-core point near 400s and predicted 2→8 efficiency ≈ 0.87
    // (measured 0.873 at m=4, 2-core 979s, BENCH.md), keeping the full
    // 3-point best-of-3 bench under ~40 min. GRAFT_SCALE_MULT still
    // multiplies the input for Amdahl evidence runs (efficiency must rise
    // with the multiplier iff F — not a serial stage — is the bound).
    // Round-5 recalibration: WAND pruning cut the scoring work ~2.6× at
    // fixed input (SURVEY §7.4-8), which would have let the ~20s fixed
    // per-job overhead F dominate the 2-core point again — the same trap as
    // round 3's candidate pruning. Standard input scaled 1.6× (the round-4
    // Amdahl-evidence point) to put the 2-core wall back in the
    // W-dominated regime.
    val mult = sys.env.getOrElse("GRAFT_SCALE_MULT", "1").toDouble
    val (c, v, d) =
      if (sf >= 0.1) (360000L, 320000L, 12)
      else if (sf >= 0.01) (32000L, 25600L, 8)
      else (3000L, 1500L, 5)
    ((c * mult).toLong, (v * mult).toLong, d)
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
    * (turns, linkedMentions, seconds). Reads the shared parquet input. The
    * optional warmup run takes JIT compilation of the scoring kernel and
    * codegen out of the timed window — needed ONCE per JVM (the suite pass
    * and min-of-3 reps keep everything hot afterwards), not per session. */
  private def pipelineRun(cpus: Int, inputDir: String, dict: Dict,
      warmup: Boolean = false): (Long, Long, Double) = {
    val spark = session(cpus)
    try {
      import spark.implicits._
      val bdict = spark.sparkContext.broadcast(dict)
      if (warmup) {
        // Tiny synthetic slice through the identical code path.
        val wc = SynthCorpus.corpusDS(spark, bdict, 500, 4, 42)
        val wt = SynthCorpus.transcriptsDS(spark, bdict, 150, 4, 7)
        val warm = KgPipeline.run(spark, wt, wc, bdict, 5)
        warm.triples.count()
        warm.unpersistAll()
      }

      val corpus = spark.read.parquet(s"$inputDir/corpus")
        .select("id", "rawText").as[(Long, String)]
      val turns = spark.read.parquet(s"$inputDir/turns").as[graft.model.Turn]
      val nTurns = turns.count()
      val t0 = System.nanoTime()
      val r = KgPipeline.run(spark, turns, corpus, bdict, 5)
      r.triples.count()
      val linked = r.hits.select("queryId").distinct().count() // cheap: hits cached
      val sec = (System.nanoTime() - t0) / 1e9
      r.unpersistAll()
      (nTurns, linked, sec)
    } finally spark.stop()
  }

  /** Contention canary: a FIXED single-thread busy loop. Its spread across
    * timing points exposes ambient co-tenant load that would otherwise
    * masquerade as a code change (round-2's 2-core sample ran 50% slower
    * than round-1's at identical code; round-4's driver suite recorded
    * kg_comention at 24.1s where a fresh session measures 7.9s). */
  private def canarySec(): Double = {
    val t0 = System.nanoTime()
    var x = 0L; var i = 0L
    while (i < 2000000000L) { x += i | 1L; i += 1 }
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dict = Dict.default()

    // GRAFT_SKEW=0 (or empty) means OFF, matching the GRAFT_WAND=0
    // kill-switch convention — bare contains() would turn an explicit
    // opt-out into an opt-in.
    if (sys.env.get("GRAFT_SKEW").exists(v => v.nonEmpty && v != "0")) {
      skewStress(sfDir, cpus, dict); return
    }

    // 1. Per-query timings at the configured core count — MIN over passes
    //    (2 for all queries, a 3rd for the heavy full-pipeline rows). This
    //    box has measured multi-× contention noise; min is the least-biased
    //    cheap estimator of the job's true cost, and pass 1 doubles as
    //    JIT/codegen warmup. ALL per-pass samples plus a per-pass canary go
    //    into the JSON (round-4 ask: correlated contention defeats a bare
    //    min — the artifact must let a reader classify an outlier as noise
    //    without a re-run).
    val spark = session(cpus)
    // A failed pass must NOT contribute its time-to-failure to min() — that
    // would report a crash as a blazingly fast query. Failures yield None;
    // a query with zero successful passes reports the sentinel -1.0, which
    // is impossible as a real time and unmissable in the JSON.
    def timeQueries(only: String => Boolean): Seq[(String, Option[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).filter(q => only(q._1))
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false }
          name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
        }
    // Heavy rows = the full-pipeline queries (kg_*, the streaming link, and
    // the graph-analytics rows that each run the whole pipeline to derive
    // their co-mention edges): the rows round-4 contention actually
    // distorted. They get a 3rd pass.
    def heavy(name: String): Boolean =
      name.startsWith("kg_") || name == "q27_stream_link" ||
        name == "q35_pagerank" || name == "q40_label_prop" ||
        name == "q41_triangles"
    val passCanaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    def pass(only: String => Boolean): Seq[(String, Option[Double])] = {
      passCanaries += canarySec()
      timeQueries(only)
    }
    val passes = Seq(pass(_ => true), pass(_ => true), pass(heavy))
    val names = passes.head.map(_._1)
    val samplesOf: Map[String, Seq[Double]] = names.map { name =>
      name -> passes.flatMap(_.toMap.get(name).flatten)
    }.toMap
    val results: Seq[(String, Double)] = names.map { name =>
      val ts = samplesOf(name)
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    spark.stop()

    // 2. Scaling: same KG job at 3 core counts on identical parquet input.
    //    Primary N→4N evidence: 2→8 cores (per the two-cluster-size rule's
    //    "N and 4N cores" framing); 8→32 reported as saturation data — on a
    //    single box the all-core run shares one DRAM + all-core clocks, a
    //    confound that a real 4x-machine scale-out does not have.
    val inputDir = Files.createTempDirectory("graft-bench").toString
    // The scaling input can be GBs at high multipliers; delete it on exit
    // instead of leaking one temp tree per bench invocation.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.io.File): Unit = {
        val cs = p.listFiles(); if (cs != null) cs.foreach(rm); p.delete(); ()
      }
      rm(new java.io.File(inputDir))
    }))
    writeScalingInput(sfDir, dict, inputDir)
    val core2 = math.max(1, cpus / 16)
    val core8 = math.max(1, cpus / 4)
    // Best-of-3 per point (min): the box has noisy co-tenants, and the rep
    // count must be EQUAL across points — an asymmetric min (more reps on
    // one side) biases the efficiency ratio itself.
    final case class Point(cores: Int, turns: Long, linked: Long, sec: Double,
        samples: Seq[Double], canary: Double)
    var firstRun = true
    def best(cores: Int, reps: Int): Point = {
      val canary = canarySec()
      // A crashed rep (OOM, lost shuffle file under ambient pressure) must
      // not kill the WHOLE bench — the driver would get no JSON artifact at
      // all. It records the -1.0 sentinel in the samples (visible, never a
      // candidate for min) and the point stands on its surviving reps; only
      // a point with zero successes aborts.
      val runs = (1 to reps).map { _ =>
        val r =
          try Some(pipelineRun(cores, inputDir, dict, warmup = firstRun))
          catch { case e: Throwable =>
            System.err.println(s"[bench] $cores-core rep failed: ${e.getMessage}")
            None
          }
        firstRun = false
        r
      }
      val ok = runs.flatten
      require(ok.nonEmpty, s"all $reps reps failed at $cores cores")
      val b = ok.minBy(_._3)
      Point(cores, b._1, b._2, b._3,
        runs.map(_.map(_._3).getOrElse(-1.0)), canary)
    }
    val p2 = best(core2, 3)
    val p8 = best(core8, 3)
    val p32 = best(cpus, 3)
    val turnsC = p2.turns; val linkedC = p2.linked
    val tps2 = turnsC / p2.sec
    val tps8 = turnsC / p8.sec
    val tps32 = turnsC / p32.sec
    val eff28 = tps8 / ((core8.toDouble / core2) * tps2)
    val eff832 = tps32 / ((cpus.toDouble / core8) * tps8)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Failed queries (-1.0 sentinel) stay visible per-query but must not
    // subtract from the suite total.
    val total = results.map(_._2).filter(_ >= 0).sum
    def arr(xs: Seq[Double]): String = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    // Per-pass evidence: every sample per query + the single-thread canary
    // timed at the START of each pass — a 3× per-query outlier whose pass
    // canary also inflated is ambient contention, not a regression.
    val qSamples = names.map(n => "\"" + n + "\":" + arr(samplesOf(n)))
      .mkString("{", ",", "}")
    val canariesJson = arr(passCanaries.toSeq)
    val scaling =
      f"""{"cores_n":$core2,"tps_n":$tps2%.1f,"sec_n":${p2.sec}%.2f,""" +
      f""""cores_4n":$core8,"tps_4n":$tps8%.1f,"sec_4n":${p8.sec}%.2f,""" +
      f""""cores_16n":$cpus,"tps_16n":$tps32%.1f,"sec_16n":${p32.sec}%.2f,""" +
      f""""turns":$turnsC,"linked_turns":$linkedC,""" +
      f""""efficiency":$eff28%.3f,"efficiency_8_32":$eff832%.3f,""" +
      s""""runs_n":${arr(p2.samples)},"runs_4n":${arr(p8.samples)},""" +
      s""""runs_16n":${arr(p32.samples)},""" +
      f""""canary_n":${p2.canary}%.2f,"canary_4n":${p8.canary}%.2f,"canary_16n":${p32.canary}%.2f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_samples":$qSamples,"pass_canaries":$canariesJson,"sf":"$sfDir","scaling":$scaling}""")

    // 3. Persist the scaling evidence for BASELINE.md's target table.
    def spread(p: Point): String = p.samples.map(x => f"$x%.1f").mkString(" / ")
    val report =
      f"""## BENCH — transcript→KG throughput scaling (latest run)
         |
         |Same checkpoint-shaped job, same parquet input ($sfDir synthetic
         |scale: $turnsC turns, $linkedC linked), single 32-core machine.
         |Per point: best-of-N wall seconds with ALL samples shown (this box
         |has multi-× ambient noise), plus a fixed single-thread canary loop
         |timed before the point — canary spread = ambient contention, not
         |code.
         |
         || cores | best sec | all samples (sec) | canary (sec) | turns/sec |
         ||---|---|---|---|---|
         || $core2 | ${p2.sec}%.2f | ${spread(p2)} | ${p2.canary}%.2f | $tps2%.1f |
         || $core8 | ${p8.sec}%.2f | ${spread(p8)} | ${p8.canary}%.2f | $tps8%.1f |
         || $cpus | ${p32.sec}%.2f | ${spread(p32)} | ${p32.canary}%.2f | $tps32%.1f |
         |
         |Scaling efficiency N→4N ($core2→$core8 cores, target >= 0.8): **$eff28%.3f**
         |Saturation data $core8→$cpus cores: $eff832%.3f — the all-core run
         |shares one DRAM controller and all-core turbo clocks; a real 4x
         |scale-out (4 machines) multiplies memory bandwidth with cores, which
         |this single-box proxy cannot.
         |
         |Methodology note (round 3+): every per-query timing includes a
         |`coalesce(1)` parquet stash of the full result (the cache-release
         |seam); for unbounded outputs (e.g. kg_triples) this serializes the
         |result tail into the timed window, so per-query numbers are not
         |directly comparable to pre-round-3 figures that timed `count()`
         |alone.
         |""".stripMargin
    // Preserve the skew-stress section (written by the GRAFT_SKEW mode,
    // which the driver's per-round bench does not run) across rewrites.
    val benchPath = Paths.get("BENCH.md")
    val skewSection =
      if (Files.exists(benchPath)) {
        val old = Files.readString(benchPath)
        val cut = old.indexOf("\n## Skew stress")
        if (cut >= 0) old.substring(cut) else ""
      } else ""
    Files.writeString(benchPath, report + skewSection)
  }

  // ---- skew stress (GRAFT_SKEW=1; round-5 ask #5) ---------------------------

  private final case class SkewRun(label: String, sec: Double,
      samples: Seq[Double], canary: Double, turns: Long, linked: Long,
      pairWork: Long, hotDocShare: Double, hotQ: Long, nBcast: Int,
      hotOnBcast: Boolean, shuffleCells: Long, taskSumMs: Long,
      taskMaxMs: Long, nTasks: Long)

  /** Skew stress: the SAME standard-sized pipeline on a uniform input vs a
    * power-law input where ONE district holds ~50% of the historical corpus
    * but only a trickle of queries (SURVEY §7.4-4's 北京市 shape). Reports
    * the router's actual decisions (broadcast districts, shuffle cell
    * counts) from the SAME planner the link executes, the scoring stage's
    * taskSum/taskMax balance, and pair-work-normalized wall time — the
    * measured version of the 100×-skew design claim. */
  private def skewStress(sfDir: String, cpus: Int, dict: Dict): Unit = {
    import graft.link.Linker
    import scala.jdk.CollectionConverters._
    val (corpusN, nConvs, nDistricts) = scalingSizes(sfDir)
    val inputDir = Files.createTempDirectory("graft-skew").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.io.File): Unit = {
        val cs = p.listFiles(); if (cs != null) cs.foreach(rm); p.delete(); ()
      }
      rm(new java.io.File(inputDir))
    }))

    locally {
      val gen = session(cpus)
      try {
        val b = gen.sparkContext.broadcast(dict)
        SynthCorpus.corpusDS(gen, b, corpusN, nDistricts, 42)
          .toDF("id", "rawText")
          .write.mode("overwrite").parquet(s"$inputDir/uni/corpus")
        SynthCorpus.transcriptsDS(gen, b, nConvs, nDistricts, 7)
          .write.mode("overwrite").parquet(s"$inputDir/uni/turns")
        // ~50% of docs in district 0; only every Nth conversation may
        // mention it — hot-but-narrow, the broadcast route's case.
        SynthCorpus.corpusDSSkewed(gen, b, corpusN, nDistricts, 42,
            hotTenths = 5)
          .toDF("id", "rawText")
          .write.mode("overwrite").parquet(s"$inputDir/skew/corpus")
        SynthCorpus.transcriptsDSSkewed(gen, b, nConvs, nDistricts, 7,
            hotConvEvery = math.max(1L, nConvs / 500))
          .write.mode("overwrite").parquet(s"$inputDir/skew/turns")
      } finally gen.stop()
    }

    var warmedUp = false
    def runOne(label: String, dir: String, reps: Int): SkewRun = {
      val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
      var best: SkewRun = null
      val canary = canarySec()
      for (_ <- 1 to reps) {
        val spark = session(cpus)
        // Scoring-stage balance: aggregate per-stage task durations; the
        // scoring stage ids come from Linker.ScoringStageIds (registered by
        // the kernel's own tasks), not from a max-taskSum guess.
        val sums = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
        val maxes = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAccumulator]()
        val counts = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val d = te.taskInfo.duration
            sums.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(d)
            maxes.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAccumulator(Math.max(_, _), 0L)).accumulate(d)
            counts.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.LongAdder).add(1)
          }
        })
        try {
          import spark.implicits._
          val b = spark.sparkContext.broadcast(dict)
          if (!warmedUp) {
            val wc = SynthCorpus.corpusDS(spark, b, 500, 4, 42)
            val wt = SynthCorpus.transcriptsDS(spark, b, 150, 4, 7)
            val warm = KgPipeline.run(spark, wt, wc, b, 5)
            warm.triples.count(); warm.unpersistAll()
            warmedUp = true
          }
          val corpus = spark.read.parquet(s"$dir/corpus")
            .select("id", "rawText").as[(Long, String)]
          val turns = spark.read.parquet(s"$dir/turns").as[graft.model.Turn]
          val nTurns = turns.count()
          // Scoring-stage attribution: the kernel registers the stage ids
          // its tasks run in (Linker.ScoringStageIds). Clear right before
          // the timed window so warmup scoring doesn't count, and snapshot
          // right after so the post-timing route recompute can't pollute
          // it — summing over EXACTLY the scoring stages, instead of
          // guessing "max-taskSum stage of the session" (which interpret or
          // the route recompute can win now that WAND cut scoring CPU).
          Linker.ScoringStageIds.clear()
          val t0 = System.nanoTime()
          val r = KgPipeline.run(spark, turns, corpus, b, 5)
          r.triples.count()
          val linked = r.hits.select("queryId").distinct().count()
          val sec = (System.nanoTime() - t0) / 1e9
          val scoringIds: Set[Int] =
            Linker.ScoringStageIds.asScala.iterator.map(_.toInt).toSet
          samples += sec
          // Route report OUTSIDE the timed window, from the same planner
          // the link just executed (mentions/docs recomputed narrowly).
          val docs = Linker.buildDocs(spark, Linker.dedupCorpus(spark, corpus), b)
          val mentions = KgPipeline.detectMentions(spark, turns, b)
          val stats = Linker.countStats(spark, mentions.map(_.doc), docs)
          val plan = Linker.planRoutes(stats,
            spark.sparkContext.defaultParallelism)
          r.unpersistAll()
          val hotPk = plan.dCounts.maxBy(_._2)._1
          // Sum over ALL scoring stages (the auto router can split work
          // across the broadcast mapPartitions stage AND the shuffle-cell
          // cogroup stage — a single max-stage pick undercounts split
          // routes).
          require(scoringIds.nonEmpty, "no scoring stage ran in timed window")
          // ScoringStageIds fills synchronously task-side, but sums/maxes
          // arrive via the ASYNC listener bus — wait (bounded) for every
          // registered stage's task events to land before reading, and
          // degrade to 0 rather than crash if the bus dropped events.
          locally {
            val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
            while (!scoringIds.forall(sums.containsKey(_)) &&
                System.nanoTime() < deadline) Thread.sleep(50)
          }
          val sSum = scoringIds.iterator
            .flatMap(id => Option(sums.get(id)).map(_.sum)).sum
          val sMaxSeq = scoringIds.iterator
            .flatMap(id => Option(maxes.get(id)).map(_.get)).toSeq
          val sMax = if (sMaxSeq.isEmpty) 0L else sMaxSeq.max
          val sTasks = scoringIds.iterator
            .flatMap(id => Option(counts.get(id)).map(_.sum)).sum
          val run = SkewRun(label, sec, Nil, canary, nTurns, linked,
            plan.pairWork,
            plan.dCounts(hotPk).toDouble / math.max(1L, plan.dCounts.values.sum),
            plan.qCounts.getOrElse(hotPk, 0L), plan.bcastPks.size,
            plan.bcastPks.contains(hotPk), plan.shuffleCells,
            sSum, sMax, sTasks)
          if (best == null || run.sec < best.sec) best = run
        } finally spark.stop()
      }
      best.copy(samples = samples.toSeq)
    }

    val uni = runOne("standard", s"$inputDir/uni", reps = 2)
    val skew = runOne("skewed", s"$inputDir/skew", reps = 2)
    // THE normalized metric: scoring-stage task-time per candidate pair.
    // Skew changes total pair work AND leaves the row-proportional stages
    // (interpret, mentions, idf — identical rows in both runs) untouched,
    // so wall/pairs punishes whichever input has less scoring work with the
    // same fixed cost; the skew-collapse claim is about the SCORING stage,
    // and its taskSum/pairs isolates exactly that.
    def scoringMsPerMpair(r: SkewRun): Double =
      r.taskSumMs.toDouble / math.max(1L, r.pairWork) * 1e6
    val ratio = scoringMsPerMpair(skew) / scoringMsPerMpair(uni)
    def wallPerGpair(r: SkewRun): Double = r.sec / math.max(1L, r.pairWork) * 1e9
    def imbalance(r: SkewRun): Double =
      r.taskMaxMs.toDouble / math.max(1L, r.taskSumMs / math.max(1L, r.nTasks))

    def row(r: SkewRun): String =
      f"| ${r.label} | ${r.sec}%.2f | ${r.samples.map(x => f"$x%.1f").mkString(" / ")} | ${r.canary}%.2f | ${r.pairWork / 1e9}%.2f | ${scoringMsPerMpair(r)}%.1f | ${wallPerGpair(r)}%.2f | ${r.hotDocShare * 100}%.1f%% | ${r.hotQ} | ${r.nBcast} | ${r.hotOnBcast} | ${r.shuffleCells} | ${r.taskSumMs} | ${r.taskMaxMs} | ${imbalance(r)}%.1f | ${r.nTasks} |"
    val section =
      f"""
         |## Skew stress (GRAFT_SKEW; round 5)
         |
         |Same pipeline, same standard sizing ($corpusN docs / $nConvs convs /
         |$nDistricts districts, ${cpus} cores, best-of-2). "standard" is the
         |default generator (one district already holds ~30%% of docs AND
         |~30%% of queries — hot-and-wide); "skewed" puts ~50%% of the corpus
         |in ONE district with only ~1/${math.max(1L, nConvs / 500)} of
         |conversations allowed to mention it (hot-but-NARROW — SURVEY
         |§7.4-4's 北京市 shape, the broadcast route's case). The claim under
         |test: the router keeps scoring cost∝work under skew (no skew
         |collapse). Metric = scoring-stage taskSum per candidate pair
         |(wall/pairs would charge the identical row-proportional interpret/
         |mention stages against whichever input has less scoring work):
         |skew/standard = **$ratio%.2f** (target ≤ ~1.3). The broadcast route
         |must be ENGAGED for the hot district in the skewed run
         |(hot-on-bcast = ${skew.hotOnBcast}) — its doc mass never enters the
         |shuffle.
         |
         |Attribution note (late round 5): scoring task time is summed over
         |the stages that actually RAN the scoring kernel (registered by the
         |kernel itself, `Linker.ScoringStageIds`) — not the session's
         |max-taskSum stage, which warmup or the post-timing route recompute
         |could win. A ratio well below 1 is expected when the hot district
         |rides the broadcast route: that kernel streams docs against a
         |query-side inverted index with no blob unpack or cell cogroup, so
         |its per-pair cost undercuts the shuffle-cell kernel's.
         |
         || input | best sec | samples | canary | pairs (G) | scoring ms/Mpair | wall sec/Gpair | hot-district doc share | hot-district queries | bcast districts | hot on bcast route | shuffle cells | scoring taskSum ms | taskMax ms | imbalance | tasks |
         ||---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|---|
         |${row(uni)}
         |${row(skew)}
         |""".stripMargin
    val benchPath = Paths.get("BENCH.md")
    val existing =
      if (Files.exists(benchPath)) Files.readString(benchPath) else ""
    // Replace any previous skew section (stable per-name overwrite, like
    // stash); never clobber the main scaling report.
    val cut = existing.indexOf("\n## Skew stress")
    val base = if (cut >= 0) existing.substring(0, cut) else existing
    Files.writeString(benchPath, base + section)
    println(s"""{"metric":"skew_stress","unit":"scoring_ms_per_mpair_ratio","value":${f"$ratio%.3f"},""" +
      f""""standard_sec":${uni.sec}%.2f,"skew_sec":${skew.sec}%.2f,""" +
      f""""standard_gpairs":${uni.pairWork / 1e9}%.3f,"skew_gpairs":${skew.pairWork / 1e9}%.3f,""" +
      f""""standard_scoring_ms_per_mpair":${scoringMsPerMpair(uni)}%.2f,""" +
      f""""skew_scoring_ms_per_mpair":${scoringMsPerMpair(skew)}%.2f,""" +
      s""""skew_bcast_districts":${skew.nBcast},"hot_on_bcast":${skew.hotOnBcast},""" +
      f""""standard_imbalance":${imbalance(uni)}%.2f,"skew_imbalance":${imbalance(skew)}%.2f,""" +
      s""""standard_samples":${uni.samples.map(x => f"$x%.2f").mkString("[", ",", "]")},""" +
      s""""skew_samples":${skew.samples.map(x => f"$x%.2f").mkString("[", ",", "]")}}""")
  }
}
