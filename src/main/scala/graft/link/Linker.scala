package graft.link

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.analyse.DocAnalyser
import graft.dict.{Regions, TermIndex}
import graft.interpret.AddressInterpreter
import graft.model.{DocVec, IdfRow, LinkHit, TermRow}

/** Broadcastable dictionary bundle: region tree + trie, built once on the
  * driver (cf. the reference's Spring singletons `TermIndexBuilder` +
  * `AddressPersister`; SURVEY.md §2 A3/B1). */
final class Dict(val regions: Regions, val termIndex: TermIndex) extends Serializable {
  @transient lazy val interpreter = new AddressInterpreter(regions, termIndex)
}

object Dict {
  def default(): Dict = {
    val regions = Regions.loadDefault()
    new Dict(regions, new TermIndex(regions, Regions.IgnoreList))
  }
}

/** Entity-linking stages, Spark-first:
  *
  *  - `buildDocs`: corpus text → interpret (broadcast trie inside
  *    `mapPartitions`, one visitor per partition) → term vectors. Narrow, no
  *    shuffle; scales linearly with input splits.
  *  - `buildIdf`: one partial+final hash aggregation over exploded term keys
  *    (`SimilarityComputer.statInverseDocRefers` + idf rule `:580-599` as a
  *    DataFrame job). Shuffles once on (partKey, termKey).
  *  - `attachIdf` / `analyseQueries`: cogroup on partKey — the equivalent of
  *    the reference's per-district IDF stamp, one shuffle each side, memory
  *    bounded by one district's term dictionary.
  *  - `linkTopK`: cogroup queries×docs on partKey (the reference's partition
  *    -pruned candidate retrieval D1) + per-query bounded top-k heap (E1/E2).
  *    No crossproduct row materialization; memory = one district's docs.
  *
  * Skew note (100 TB): partKey is power-law (big-city districts). The cogroup
  * keeps per-key work sequential per task; for genuinely hot keys flip
  * `spark.sql.adaptive.enabled` + use `linkTopKBroadcast` (broadcast the query
  * side, stream the docs side — no shuffle of the big side at all).
  */
object Linker {

  /** Interpret a corpus of (id, rawText) address rows into term-vector docs.
    * Rows that fail interpretation (no city/district) are dropped, mirroring
    * `AddressInterpreter.interpret(List…)` `:204-208`. */
  def buildDocs(spark: SparkSession, corpus: Dataset[(Long, String)],
      dict: Broadcast[Dict]): Dataset[DocVec] = {
    import spark.implicits._
    corpus.mapPartitions { it =>
      val interp = dict.value.interpreter
      val visitor = interp.newVisitor()
      it.flatMap { case (id, text) =>
        val addr = interp.interpret(text, visitor)
        if (addr == null || !addr.division.hasCity || !addr.division.hasDistrict) None
        else {
          val pk = interp.partKey(addr)
          if (pk == null) None else Some(DocAnalyser.analyse(id, pk, addr))
        }
      }
    }
  }

  /** Per-partition IDF table: df = docs-containing-term (terms are pre-deduped
    * per doc at analyse), idf = ln(nDocs/(df+1)) clamped >= 0, with the
    * numeric/ASCII fixed idf=2 rule (`SimilarityComputer.java:586-596`). */
  def buildIdf(spark: SparkSession, docs: Dataset[DocVec]): Dataset[IdfRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val termKeys = docs.select($"partKey", $"docId", explode($"terms").as("term"))
      .select($"partKey", $"docId", $"term.t".as("t"), $"term.text".as("text"),
        $"term.ref".as("ref"))
      .withColumn("termKey", termKeyCol)
    val df = termKeys.groupBy($"partKey", $"termKey").agg(count(lit(1)).as("df"))
    val nDocs = docs.groupBy($"partKey").agg(count(lit(1)).as("nDocs"))
    df.join(nDocs, "partKey")
      .select($"partKey", $"termKey", $"df",
        when(($"termKey".rlike("^[0-9]+$")) || ($"termKey".rlike("^[A-Za-z]+$")), lit(2.0))
          .otherwise(greatest(lit(0.0), log($"nDocs".cast("double") / ($"df" + 1))))
          .as("idf"))
      .as[IdfRow]
  }

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.Column

  /** RoadNum composite key `road-num` in pure column form would need
    * translateRoadNum; use a tiny codegen-friendly path for the common ASCII
    * case and fall back to the Scala function via UDF-free map for the rest.
    * Here: compute with the exact Scala function through a typed projection to
    * keep parity (termKey materialized before the aggregation). */
  private def termKeyCol: Column = {
    val f = udf((t: String, text: String, ref: String) =>
      DocAnalyser.idfKey(TermRow(t, text, 0.0, ref)))
    f(col("t"), col("text"), col("ref"))
  }

  /** Stamp per-partition idf onto every doc term (reference: `:601-611`).
    * Cogroup on partKey: one shuffle per side, no per-row join explosion. */
  def attachIdf(spark: SparkSession, docs: Dataset[DocVec],
      idf: Dataset[IdfRow]): Dataset[DocVec] = {
    import spark.implicits._
    val grouped = docs.groupByKey(_.partKey)
    val idfGrouped = idf.groupByKey(_.partKey)
    grouped.cogroup(idfGrouped) { (_, docIt, idfIt) =>
      val idfMap = new java.util.HashMap[String, java.lang.Double]()
      idfIt.foreach(r => idfMap.put(r.termKey, r.idf))
      docIt.map { d =>
        d.copy(terms = d.terms.map { t =>
          val v = idfMap.get(DocAnalyser.idfKey(t))
          // Doc-side terms always resolve (idf built from the same corpus);
          // null only on out-of-corpus attach — use MISSING_IDF like queries.
          t.copy(idf = if (v == null) DocAnalyser.MissingIdf else v.doubleValue())
        })
      }
    }
  }

  /** Analyse + idf-stamp the query side. Query terms missing from the
    * partition IDF table get MISSING_IDF=4 (`SimilarityComputer.java:146-154`).
    * Input: (queryId, rawText). Un-interpretable queries are dropped. */
  def analyseQueries(spark: SparkSession, queries: Dataset[(Long, String)],
      dict: Broadcast[Dict], idf: Dataset[IdfRow]): Dataset[DocVec] = {
    import spark.implicits._
    val qdocs = buildDocs(spark, queries, dict)
    qdocs.groupByKey(_.partKey).cogroup(idf.groupByKey(_.partKey)) {
      (_, qIt, idfIt) =>
        val idfMap = new java.util.HashMap[String, java.lang.Double]()
        idfIt.foreach(r => idfMap.put(r.termKey, r.idf))
        qIt.map { q =>
          q.copy(terms = q.terms.map { t =>
            val v = idfMap.get(DocAnalyser.idfKey(t))
            t.copy(idf = if (v == null) DocAnalyser.MissingIdf else v.doubleValue())
          })
        }
    }
  }

  /** Top-k linking: cogroup queries and docs on partKey, score every pair
    * within the partition, keep a bounded per-query heap. Ties pinned
    * (desc similarity, asc docId) — documented divergence from the
    * reference's scan-order tie-keep (`Query.java:73,89`; SURVEY.md §7.4-3).
    * Hits with similarity <= 0 are dropped (`Query.addSimiDoc` `Query.java:62`).
    */
  def linkTopK(spark: SparkSession, queries: Dataset[DocVec],
      docs: Dataset[DocVec], topN: Int): Dataset[LinkHit] = {
    import spark.implicits._
    queries.groupByKey(_.partKey).cogroup(docs.groupByKey(_.partKey)) {
      (_, qIt, dIt) =>
        val dsides = dIt.map(d => new Scoring.DocSide(d)).toArray
        if (dsides.isEmpty) Iterator.empty
        else qIt.flatMap { q => topKForQuery(q, dsides, topN) }
    }
  }

  /** Broadcast-query variant for hot partitions / huge doc side: the docs side
    * streams with NO shuffle; queries (small) are broadcast grouped by
    * partKey. Emits per-partition partial top-k; final top-k is a tiny
    * shuffle of k*|queries| rows. */
  def linkTopKBroadcast(spark: SparkSession, queries: Array[DocVec],
      docs: Dataset[DocVec], topN: Int): Dataset[LinkHit] = {
    import spark.implicits._
    val byPart = queries.groupBy(_.partKey)
    val bq = spark.sparkContext.broadcast(byPart)
    val partial = docs.mapPartitions { it =>
      val heaps = new scala.collection.mutable.HashMap[Long, TopK]()
      val qmap = bq.value
      it.foreach { d =>
        qmap.get(d.partKey).foreach { qs =>
          val ds = new Scoring.DocSide(d)
          qs.foreach { q =>
            val s = Scoring.score(q, ds)
            if (s > 0) heaps.getOrElseUpdate(q.docId, new TopK(topN)).offer(d.docId, s)
          }
        }
      }
      heaps.iterator.flatMap { case (qid, heap) => heap.toHits(qid) }
    }
    // Final reduce: combine partial top-k per query.
    partial.groupByKey(_.queryId).flatMapGroups { (qid, hits) =>
      val heap = new TopK(topN)
      hits.foreach(h => heap.offer(h.docId, h.similarity))
      heap.toHits(qid)
    }
  }

  private def topKForQuery(q: DocVec, dsides: Array[Scoring.DocSide],
      topN: Int): Iterator[LinkHit] = {
    val heap = new TopK(topN)
    var i = 0
    while (i < dsides.length) {
      val s = Scoring.score(q, dsides(i))
      if (s > 0) heap.offer(dsides(i).doc.docId, s)
      i += 1
    }
    heap.toHits(q.docId)
  }

  /** Bounded top-k keeper with pinned ordering (desc sim, asc docId). */
  final class TopK(k: Int) {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    def offer(docId: Long, sim: Double): Unit = {
      buf += ((docId, sim))
      if (buf.length > math.max(k * 4, 64)) compact()
    }
    private def compact(): Unit = {
      val sorted = buf.sortBy { case (id, s) => (-s, id) }.take(k)
      buf.clear(); buf ++= sorted
    }
    def toHits(queryId: Long): Iterator[LinkHit] = {
      val sorted = buf.sortBy { case (id, s) => (-s, id) }.take(k)
      sorted.iterator.zipWithIndex.map { case ((id, s), r) =>
        LinkHit(queryId, id, s, r + 1)
      }
    }
  }
}
