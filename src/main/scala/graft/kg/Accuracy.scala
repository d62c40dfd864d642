package graft.kg

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.SynthCorpus
import graft.link.{Dict, Linker}

/** End-to-end accuracy regression (SURVEY.md §2 C5 — the reference's
  * headline quality harness `misc/RegressionTestRunTest.java:137-184`):
  * labeled (query → gridId) pairs are linked top-1 against the corpus; the
  * predicted gridId is the linked corpus row's label; results bucket by the
  * 0.85 confidence threshold into high/low-similarity success/failure, plus
  * interpret-fail and no-candidate counters, with the same derived rates
  * (match rate `hs/effective`, low-sim accuracy `ls/(ls+lf)`, high-sim
  * accuracy `hs/(hs+hf)` — `RegressionTestRunTest.java:178-184`).
  */
object Accuracy {
  val HighSimThreshold = 0.85 // `RegressionTestRunTest.java:150`

  /** Evaluate on a deterministic synthetic labeled set of `n` pairs.
    * Returns one summary row (plus per-bucket counts). */
  def evaluate(spark: SparkSession, dict: Broadcast[Dict], n: Long,
      nDistricts: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val pairs = spark.range(n).mapPartitions { it =>
      val regions = dict.value.regions
      val anchors = SynthCorpus.pickAnchors(regions, nDistricts)
      it.map(i => SynthCorpus.labeledPair(regions, anchors, i, seed))
    }

    val corpus = pairs.map(p => (p.id, p.corpusText))
    val docs = Linker.buildDocs(spark, corpus, dict)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idf = Linker.buildIdf(spark, docs)
    val docsIdf = Linker.attachIdf(spark, docs, idf)

    // Query ids offset so they never collide with corpus doc ids.
    val queries = pairs.map(p => (p.id + n, p.queryText))
    val qdocs = Linker.analyseQueries(spark, queries, dict, idf)
    val nQueries = queries.count()
    val nInterpreted = qdocs.count()

    val hits = Linker.linkTopK(spark, qdocs, docsIdf, topN = 1)

    val labels = pairs.select($"id", $"gridId")
    val predicted = hits.toDF()
      .join(labels.withColumnRenamed("id", "docId")
        .withColumnRenamed("gridId", "predGrid"), "docId")
      .withColumn("queryPairId", col("queryId") - n)
      .join(labels.withColumnRenamed("id", "queryPairId")
        .withColumnRenamed("gridId", "trueGrid"), "queryPairId")

    val buckets = predicted
      .withColumn("high", col("similarity") >= HighSimThreshold)
      .withColumn("ok", col("predGrid") === col("trueGrid"))
      .groupBy("high", "ok").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap

    val hs = buckets.getOrElse((true, true), 0L)
    val hf = buckets.getOrElse((true, false), 0L)
    val ls = buckets.getOrElse((false, true), 0L)
    val lf = buckets.getOrElse((false, false), 0L)
    val linked = hs + hf + ls + lf
    val interpretFail = nQueries - nInterpreted
    val noCandidates = nInterpreted - linked
    val effective = nQueries - interpretFail - noCandidates

    Seq((nQueries, interpretFail, noCandidates, hs, hf, ls, lf,
      if (effective > 0) hs.toDouble / effective else 0.0,
      if (ls + lf > 0) ls.toDouble / (ls + lf) else 0.0,
      if (hs + hf > 0) hs.toDouble / (hs + hf) else 0.0))
      .toDF("n_queries", "interpret_fail", "no_candidates", "high_ok",
        "high_bad", "low_ok", "low_bad", "match_rate", "low_acc", "high_acc")
  }
}
