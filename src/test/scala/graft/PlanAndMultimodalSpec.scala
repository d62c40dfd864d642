package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

/** Physical-plan quality gates: the declarative plans must keep the
  * properties the 100 TB story depends on — filter pushdown and column
  * pruning at the parquet scan, broadcast joins for small dims, and
  * whole-stage codegen over the hot projections. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .where(col("l_quantity") < 24 && col("l_discount") >= 0.05)
      .select("l_extendedprice")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("LessThan(l_quantity"), plan)
  }

  test("column pruning reaches the scan (2-column projection reads 2 columns)") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = planOf(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"),
      readSchema)
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("small-dim join is a broadcast hash join") {
    val q3 = SparkEntry.queries("q3_segment_join")(spark, sfDir)
    assert(planOf(q3).contains("BroadcastHashJoin"), planOf(q3))
  }

  test("hot projections stay in whole-stage codegen") {
    val q = SparkEntry.queries("q12_quality")(spark, sfDir)
    val codegen = q.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), codegen.take(500))
  }

  test("decontamination broadcasts the eval shingles; corpus side never shuffles pre-agg") {
    val q = SparkEntry.queries("q30_decontaminate")(spark, sfDir)
    val plan = planOf(q)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // Shuffle budget: the (tiny) eval-shingle distinct and the per-doc count
    // agg — the exploded CORPUS side must reach the join shuffle-free.
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nShuffles <= 2, s"$nShuffles hash exchanges:\n${plan.take(1500)}")
  }

  test("boilerplate spans aggregate in two stages (map-side partial combine)") {
    val q = SparkEntry.queries("q33_boilerplate")(spark, sfDir)
    val plan = planOf(q)
    assert(plan.contains("partial_count") || plan.contains("partial_finalmerge")
      || plan.contains("HashAggregate(keys=[span"), plan.take(1500))
    assert(plan.contains("HashAggregate"), plan.take(800))
  }

  test("duplicate span intervals: island agg reuses the window's doc partitioning") {
    // The gaps-and-islands tail (two analytic windows + the island groupBy)
    // must share ONE doc_id exchange: HashPartitioning(doc_id) satisfies
    // ClusteredDistribution(doc_id, island), so the final aggregate may not
    // plan its own shuffle — the property the operator's 100 TB cost story
    // (per-doc state only, no extra corpus pass) rests on.
    val q = SparkEntry.queries("q36_dup_spans")(spark, sfDir)
    val plan = planOf(q)
    assert(!"Exchange hashpartitioning\\([^)]*island".r
        .findFirstIn(plan).isDefined,
      s"island groupBy planned its own exchange:\n${plan.take(1500)}")
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 4, s"$n hash exchanges (expect: span-df pair, span join, " +
      s"doc window; plus the distinct):\n${plan.take(1500)}")
  }

  test("partKey-partitioned docs table prunes partitions on the district filter") {
    val s = spark
    import s.implicits._
    val dict = GoldenFixtures.dict
    val bdict = s.sparkContext.broadcast(dict)
    val corpus = s.createDataset(
      graft.data.SynthCorpus.corpus(dict.regions, 200, 4, seed = 2))
    val docs = graft.link.Linker.buildDocs(s, corpus, bdict)
    val dir = Files.createTempDirectory("graft-docs-part").toString
    // The layout the reference's per-district .vt files become (SURVEY.md A6):
    // one physical partition per partKey; the query-side district predicate
    // then prunes at planning time.
    docs.write.partitionBy("partKey").mode("overwrite").parquet(dir)
    val somePk = docs.head().partKey
    val pruned = s.read.parquet(dir).where(col("partKey") === somePk)
    val plan = planOf(pruned)
    val partLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(partLine.contains("partKey"), plan.take(800))
    assert(pruned.count() > 0)
  }

  test("bucketed similarity joins never degrade to a cartesian product") {
    // q8 (inverted-index join), q9 (band-bucket join), q16 (LSH bucket
    // join): the whole 100 TB story is that these are EQUI-joins on derived
    // keys — a planner regression to CartesianProduct/BroadcastNestedLoop
    // would still pass correctness at sf0.001.
    for (q <- Seq("q8_ngram_jaccard", "q9_minhash_lsh", "q16_ann_lsh",
        "q22_embed_neardup_lsh", "q23_ann_ivf")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
      assert(!plan.contains("BroadcastNestedLoop"), s"$q: ${plan.take(400)}")
    }
    // q15 brute force IS the intentional cross product (the baseline);
    // its query side must be the broadcast side.
    val bf = planOf(SparkEntry.queries("q15_cosine_topk")(spark, sfDir))
    assert(bf.contains("BroadcastNestedLoop") || bf.contains("CartesianProduct"),
      bf.take(400))
  }

  test("media resize and feature-extract stages plan shuffle-free (no Exchange)") {
    // The docs claim a narrow batched-per-partition shape for the codec
    // stages — at 100 TB that is the difference between "payload bytes
    // stream through each task once" and an accidental full-shuffle of
    // blobs. Pin it: neither stage's physical plan may contain an
    // Exchange above the synthesized input.
    val s = spark
    val media = graft.ops.MultimodalOps.synthesize(s, 100, seed = 11)
    val resized = graft.ops.MultimodalOps.resizeMedia(
      s, media, graft.ops.MultimodalOps.StubCodec, maxW = 32, maxH = 32)
    val features = graft.ops.MultimodalOps.extractFeatures(
      s, media, graft.ops.MultimodalOps.StubCodec, dim = 8, frameEvery = 2)
    val pr = resized.queryExecution.executedPlan.toString
    val pf = features.queryExecution.executedPlan.toString
    assert(!pr.contains("Exchange"), pr)
    assert(!pf.contains("Exchange"), pf)
  }

  test("binary payload column prunes away for metadata-only aggregation") {
    val dir = Files.createTempDirectory("graft-media").toString
    MultimodalOps.synthesize(spark, 50, seed = 4).write
      .mode("overwrite").parquet(dir)
    // metadataStats itself must prune the blob: content_len is a metadata
    // column, so the scan's ReadSchema excludes `content` with no manual drop.
    val stats = MultimodalOps.metadataStats(spark.read.parquet(dir))
    val readSchema = planOf(stats).linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("content_len"), readSchema)
    assert(!readSchema.contains("content:") && !readSchema.contains("content,"),
      readSchema)
    assert(stats.count() == 3)
    val totals = stats.orderBy("modality").collect()
    assert(totals.forall(_.getLong(2) > 0))
  }
}

/** Multimodal plumbing: schema, batch shape, determinism of the stubbed
  * decode, video frame sampling. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("synthetic media is deterministic and typed") {
    val a = MultimodalOps.synthesize(spark, 30, seed = 9).collect().sortBy(_.media_id)
    val b = MultimodalOps.synthesize(spark, 30, seed = 9).collect().sortBy(_.media_id)
    assert(a.length == 30)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id == y.media_id && x.content.sameElements(y.content))
    }
    assert(a.map(_.modality).toSet == Set("image", "audio", "video"))
    assert(a.filter(_.modality == "image").forall(m => m.width > 0 && m.sample_rate_hz == 0))
  }

  test("feature extraction: fixed dim, deterministic, frame-sampled video") {
    val media = MultimodalOps.synthesize(spark, 30, seed = 9)
    val f1 = MultimodalOps.extractFeatures(spark, media, MultimodalOps.StubCodec,
      dim = 8, frameEvery = 2, batchSize = 7).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(spark, media.repartition(5),
      MultimodalOps.StubCodec, dim = 8, frameEvery = 2, batchSize = 3)
      .collect().sortBy(_.media_id)
    assert(f1.length == 30)
    f1.zip(f2).foreach { case (x, y) =>
      assert(x.feature.sameElements(y.feature),
        s"partitioning/batch size changed features for ${x.media_id}")
    }
    assert(f1.forall(_.feature.length == 8))
    val video = f1.filter(_.modality == "video")
    assert(video.nonEmpty && video.forall(_.n_frames_sampled >= 1))
    assert(f1.filter(_.modality == "image").forall(_.n_frames_sampled == 1))
  }

  test("resize: bounding box respected, aspect preserved, audio passthrough, deterministic") {
    val media = MultimodalOps.synthesize(spark, 40, seed = 9)
    val before = media.collect().map(m => m.media_id -> m).toMap
    val r1 = MultimodalOps.resizeMedia(spark, media, MultimodalOps.StubCodec,
      maxW = 32, maxH = 32, batchSize = 7).collect().sortBy(_.media_id)
    val r2 = MultimodalOps.resizeMedia(spark, media.repartition(5),
      MultimodalOps.StubCodec, maxW = 32, maxH = 32, batchSize = 3)
      .collect().sortBy(_.media_id)
    r1.zip(r2).foreach { case (x, y) =>
      assert(x.content.sameElements(y.content),
        s"partitioning/batch size changed resize for ${x.media_id}")
    }
    r1.foreach { m =>
      val o = before(m.media_id)
      if (m.modality == "audio") assert(m.content.sameElements(o.content))
      else {
        assert(m.width <= 32 && m.height <= 32)
        assert(m.content_len == m.content.length)
        // Aspect preserved to integer truncation; never upscaled.
        assert(m.width <= o.width && m.height <= o.height)
        if (o.width > 32 || o.height > 32) {
          val scale = math.min(32.0 / o.width, 32.0 / o.height)
          assert(m.width == math.max((o.width * scale).toInt, 1))
          assert(m.height == math.max((o.height * scale).toInt, 1))
        } else assert(m.content.sameElements(o.content), "in-box media untouched")
      }
    }
  }
}
