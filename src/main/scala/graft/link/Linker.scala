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
  *  - `linkTopK`: the reference's partition-pruned candidate retrieval (D1)
  *    + weighted-cosine scoring (D2/D3) + bounded top-k (E1/E2) as a
  *    skew-safe blocked cross join — see the method doc for the shuffle
  *    design (binary doc blocks, query bucketing, optional doc bucketing).
  *  - `linkTopKBroadcast`: alternative for hot partitions when the query
  *    side fits a broadcast — the doc side streams with NO shuffle.
  */
object Linker {

  /** Ingest field caps (`AddressPersister.importAddresses`
    * `AddressPersister.java:106-115`): residual text ≤100, road ≤8,
    * roadNum ≤10, buildingNum ≤20 chars, applied to each interpreted address
    * before it becomes a stored doc. Documented divergence: the reference
    * also truncates rawText to 150 — we do NOT, because the north-rule
    * byte-identical turn-text round-trip forbids mutating the raw column
    * (rawText is never a scoring input, so linking semantics are unaffected). */
  def applyIngestCaps(addr: graft.interpret.MutableAddress): Unit = {
    if (addr.text.length > 100) addr.text = addr.text.substring(0, 100)
    if (addr.road.length > 8) addr.road = addr.road.substring(0, 8)
    if (addr.roadNum.length > 10) addr.roadNum = addr.roadNum.substring(0, 10)
    if (addr.buildingNum.length > 20)
      addr.buildingNum = addr.buildingNum.substring(0, 20)
  }

  /** Interpret a corpus of (id, rawText) address rows into term-vector docs.
    * Rows that fail interpretation (no city/district) are dropped, mirroring
    * `AddressInterpreter.interpret(List…)` `:204-208`; surviving rows get the
    * persister's ingest field caps. */
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
          if (pk == null) None
          else {
            applyIngestCaps(addr)
            Some(DocAnalyser.analyse(id, pk, addr))
          }
        }
      }
    }
  }

  /** Exact ingest dedup (SURVEY.md §2 A14): the reference skips rows whose
    * rawText 32-bit hashCode was already seen
    * (`AddressPersister.isDuplicatedAddress` `AddressPersister.java:214-243`).
    * We dedup on the FULL text with deterministic keep-min-id — a documented
    * improvement (32-bit-hash-only dedup silently drops colliding distinct
    * addresses).
    *
    * Hash-first shuffle plan: rows are repartitioned on `xxhash64(rawText)` —
    * an 8-byte shuffle KEY with the text riding as payload — and equal texts
    * (identical hash ⇒ identical partition) dedup in one per-partition hash
    * map. The text itself is never a sort/partition key, so the shuffle
    * machinery hashes/compares 8 bytes instead of whole documents. Memory:
    * a partition holds its share of DISTINCT texts only; at 100 TB size
    * `spark.sql.shuffle.partitions` so distinct-bytes/partitions fits a task
    * (exactness is unaffected by the partition count). */
  def dedupCorpus(spark: SparkSession,
      corpus: Dataset[(Long, String)]): Dataset[(Long, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    corpus.toDF("id", "rawText")
      .repartition(xxhash64($"rawText"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val best = new java.util.HashMap[String, java.lang.Long]()
        it.foreach { case (id, text) =>
          val cur = best.get(text)
          if (cur == null || id < cur.longValue()) best.put(text, id)
        }
        import scala.jdk.CollectionConverters._
        best.entrySet().iterator().asScala.map(e => (e.getValue.longValue(), e.getKey))
      }
  }

  /** Exploded (partKey, docId, termKey) rows — the IDF table's pre-aggregation
    * input, shared with the KG stage materializer so the DuckDB oracle
    * recomputes idf from the exact same rows. */
  def termKeyRows(spark: SparkSession,
      docs: Dataset[DocVec]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, posexplode}
    docs
      .select($"partKey", $"docId", $"tTypes", $"road",
        posexplode($"texts").as(Seq("pos", "text")))
      .select($"partKey", $"docId",
        expr("substring(tTypes, pos + 1, 1)").as("t"), $"text", $"road")
      .withColumn("termKey", termKeyCol)
      .select($"partKey", $"docId", $"termKey")
  }

  /** Per-partition IDF table: df = docs-containing-term (terms are pre-deduped
    * per doc at analyse), idf = ln(nDocs/(df+1)) clamped >= 0, with the
    * numeric/ASCII fixed idf=2 rule (`SimilarityComputer.java:586-596`). */
  def buildIdf(spark: SparkSession, docs: Dataset[DocVec]): Dataset[IdfRow] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val termKeys = termKeyRows(spark, docs)
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

  /** IDF-table key column: the RoadNum composite `road-num` needs the exact
    * `translateRoadNum` semantics, so it stays a Scala function (invoked only
    * for 'N' terms — a handful per doc). */
  private def termKeyCol: Column = {
    val f = udf((t: String, text: String, ref: String) =>
      DocAnalyser.idfKey(TermRow(t, text, 0.0, ref)))
    f(col("t"), col("text"), col("road"))
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
      // Doc-side terms always resolve (idf built from the same corpus);
      // misses only on out-of-corpus attach — MISSING_IDF like queries.
      docIt.map(DocAnalyser.stampIdf(_, idfMap))
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
        qIt.map(DocAnalyser.stampIdf(_, idfMap))
    }
  }

  /** Top-k linking: blocked cross join of queries × candidate docs within
    * each partKey, with the DOC side shipped as packed binary blocks
    * (`DocBlob`) and the QUERY side split into `qBuckets` by queryId hash.
    * Ties pinned (desc similarity, asc docId) — documented divergence from
    * the reference's scan-order tie-keep (`Query.java:73,89`; SURVEY.md
    * §7.4-3). Hits with similarity <= 0 are dropped (`Query.addSimiDoc`
    * `Query.java:62`).
    *
    * Skew + shuffle design (measured on this box, see git history):
    *  - partKey is the district key: power-law skewed, low cardinality. A
    *    plain partKey cogroup caps parallelism at #districts and the hot
    *    district serializes the O(|q|·|d|) pair scoring.
    *  - queries are NOT replicated: each goes to one (partKey, qBucket)
    *    cell and sees the full candidate set there → a single pass emits
    *    final top-k, no merge step.
    *  - docs ARE replicated ×qBuckets, but as ~`blobSize`-doc binary blocks:
    *    per-row encoder deserialization (nested arrays, per-term Strings)
    *    was ~half the stage CPU; blocks amortize it ~256× and unpack
    *    directly into the kernel's compiled Side layout.
    *  - `dBuckets` optionally splits the doc side too (cells then hold
    *    1/dBuckets of a district's docs and partial top-k heaps merge in a
    *    tiny final reduce) — the memory valve for districts whose full doc
    *    set would not fit a task; results are bit-identical for any knobs.
    */
  /** Per-partKey cell-split knobs (query buckets × doc buckets). */
  final case class CellKnobs(qBuckets: Int, dBuckets: Int)

  def linkTopK(spark: SparkSession, queries: Dataset[DocVec],
      docs: Dataset[DocVec], topN: Int, qBuckets: Int = 64,
      dBuckets: Int = 1, blobSize: Int = 256,
      knobsByPk: Map[String, CellKnobs] = Map.empty): Dataset[LinkHit] = {
    import spark.implicits._
    val default = CellKnobs(math.max(1, qBuckets), math.max(1, dBuckets))
    val bknobs = spark.sparkContext.broadcast(knobsByPk)
    def gOf(knobs: Map[String, CellKnobs], pk: String): Int =
      math.max(1, knobs.getOrElse(pk, default).qBuckets)
    def dbOf(knobs: Map[String, CellKnobs], pk: String): Int =
      math.max(1, knobs.getOrElse(pk, default).dBuckets)
    val anyDb = default.dBuckets > 1 || knobsByPk.valuesIterator.exists(_.dBuckets > 1)

    // db(pk)==1: each query visits exactly one cell. db(pk)>1: queries
    // replicate across the doc buckets (partial top-k merged below).
    val qKeyed = queries
      .flatMap(q => (0 until dbOf(bknobs.value, q.partKey)).map(dbk => (dbk, q)))
      .groupByKey { case (dbk, q) =>
        (q.partKey,
          java.lang.Long.remainderUnsigned(q.docId, gOf(bknobs.value, q.partKey)).toInt,
          dbk)
      }
    // Pack per input partition, assign doc-buckets round-robin per blob,
    // replicate each blob to every query bucket of its partKey.
    val blobs = docs.mapPartitions { it =>
      var blobIdx = 0
      DocBlob.packGroups(it, blobSize).map { case (pk, bytes) =>
        blobIdx += 1
        (pk, blobIdx % dbOf(bknobs.value, pk), bytes)
      }
    }
    val dKeyed = blobs.flatMap { case (pk, dbk, bytes) =>
      (0 until gOf(bknobs.value, pk)).map(qb => (pk, qb, dbk, bytes))
    }.groupByKey { case (pk, qb, dbk, _) =>
      (pk, qb, if (dbOf(bknobs.value, pk) == 1) 0 else dbk)
    }

    val partial = qKeyed.cogroup(dKeyed) { (_, qIt, dIt) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Scoring.Side]
      dIt.foreach { case (_, _, _, bytes) => DocBlob.unpackSides(bytes, buf) }
      if (buf.isEmpty) Iterator.empty
      else scoreCellBlocked(qIt.map(_._2), buf.toArray, topN)
    }
    if (!anyDb) partial
    else partial.groupByKey(_.queryId).flatMapGroups { (qid, hits) =>
      val heap = new TopK(topN)
      hits.foreach(h => heap.offer(h.docId, h.similarity))
      heap.toHits(qid)
    }
  }

  /** Self-tuning linkTopK (the 100×-survival path): derives per-partKey cell
    * knobs from COUNTED stats instead of a human-set global, then routes
    * extreme partitions to the broadcast variant. Output is bit-identical to
    * any manual knob setting (KgPipelineSpec).
    *
    * Plan, per partKey with q queries and d candidate docs:
    *  - docs in districts with NO queries never enter the shuffle (broadcast
    *    membership filter) — with a small query batch against a 100 TB
    *    corpus this prunes the dominant cost;
    *  - hot-but-narrow partitions (q ≤ bcastQMax, d ≥ maxDocsPerCell) go to
    *    `linkTopKBroadcast`: their docs stream with NO shuffle at all;
    *  - the rest 2-D block: cells C = ⌈q·d / targetPairsPerCell⌉ bounds the
    *    per-task pair work; qBuckets ∝ √(C·q/d) and dBuckets = ⌈C/g⌉ split
    *    replication evenly (replicated bytes ≈ db·|q| + g·|d| is minimized
    *    at g/db ≈ q/d), with dBuckets also forced up until a cell's doc set
    *    fits the `maxDocsPerCell` task-memory valve. The old failure modes —
    *    docs replicated ×64 regardless of query count, and one whole hot
    *    district's blobs buffered in a single task — cannot occur by
    *    construction. */
  def linkTopKAuto(spark: SparkSession, queries: Dataset[DocVec],
      docs: Dataset[DocVec], topN: Int,
      targetPairsPerCell: Long = 1L << 22, maxDocsPerCell: Int = 1 << 16,
      maxQBuckets: Int = 256, bcastQMax: Long = 512,
      bcastTotalMax: Long = 1L << 17): Dataset[LinkHit] = {
    import spark.implicits._
    // Both sides' per-partKey counts in ONE job (fixed per-job overhead is
    // the measured scaling bound on this box — don't pay it twice).
    val stats = queries.map(q => (q.partKey, 1L, 0L))
      .union(docs.map(d => (d.partKey, 0L, 1L)))
      .groupByKey(_._1)
      .mapGroups { (pk, it) =>
        var q = 0L; var d = 0L
        it.foreach { r => q += r._2; d += r._3 }
        (pk, q, d)
      }.collect()
    val qCounts = stats.iterator.filter(_._2 > 0).map(s => s._1 -> s._2).toMap
    val dCounts = stats.iterator.map(s => s._1 -> s._3).toMap

    // Broadcast route: narrow-query/huge-doc partitions, ordered by doc
    // count (largest shuffle saving first), under a TOTAL driver-collect
    // budget — with many qualifying districts the route must not collect
    // unbounded query rows; overflow districts stay on the shuffle path.
    var bcastBudget = bcastTotalMax
    val bcastPks = qCounts.keysIterator
      .filter { pk =>
        qCounts(pk) <= bcastQMax && dCounts.getOrElse(pk, 0L) >= maxDocsPerCell
      }
      .toSeq.sortBy(pk => (-dCounts(pk), pk))
      .filter { pk => // not takeWhile: a later, smaller district may still fit
        val q = qCounts(pk)
        if (q <= bcastBudget) { bcastBudget -= q; true } else false
      }.toSet
    val shufflePks = qCounts.keySet -- bcastPks

    // Parallelism floor: when total work is far below cluster capacity ×
    // target, shrink the per-cell target so the cluster still fills (the
    // work-based split alone would give one cell per district at small
    // scale). At scale totalWork dominates and the configured target wins.
    val totalWork = shufflePks.iterator
      .map(pk => qCounts(pk) * dCounts.getOrElse(pk, 0L)).sum
    val para = math.max(1, spark.sparkContext.defaultParallelism)
    val effTarget = math.max(1L,
      math.min(targetPairsPerCell, totalWork / (3L * para)))

    val knobs = shufflePks.iterator.flatMap { pk =>
      val q = qCounts(pk)
      val d = dCounts.getOrElse(pk, 0L)
      if (d == 0) None
      else {
        val work = q * d
        val cells = math.max(1L, (work + effTarget - 1) / effTarget)
        val g = math.max(1L, math.min(math.min(q, maxQBuckets.toLong),
          math.round(math.sqrt(cells.toDouble * q / d)))).toInt
        val dbWork = (cells + g - 1) / g
        val dbMem = (d + maxDocsPerCell - 1) / maxDocsPerCell
        Some(pk -> CellKnobs(g, math.max(dbWork, dbMem).toInt))
      }
    }.toMap

    val bShuffle = spark.sparkContext.broadcast(shufflePks)
    val restHits = linkTopK(spark,
      queries.filter(q => bShuffle.value.contains(q.partKey)),
      docs.filter(d => bShuffle.value.contains(d.partKey)),
      topN, qBuckets = 1, dBuckets = 1, knobsByPk = knobs)

    if (bcastPks.isEmpty) restHits
    else {
      val bBcast = spark.sparkContext.broadcast(bcastPks)
      val qB = queries.filter(q => bBcast.value.contains(q.partKey)).collect()
      val hitsB = linkTopKBroadcast(spark,
        qB, docs.filter(d => bBcast.value.contains(d.partKey)), topN)
      restHits.union(hitsB)
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
      val qsides = new scala.collection.mutable.HashMap[String, Array[Scoring.QuerySide]]()
      val qmap = bq.value
      it.foreach { d =>
        val qs = qsides.getOrElseUpdate(d.partKey,
          qmap.getOrElse(d.partKey, Array.empty).map(new Scoring.QuerySide(_)))
        if (qs.nonEmpty) {
          val ds = new Scoring.Side(d)
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

  /** A link hit with its per-term scoring explanation (the reference's
    * `explain=true` result shape, `Query.java:8-13` + `MatchedTerm`). */
  final case class ExplainedHit(queryId: Long, docId: Long, rank: Int,
      similarity: Double, matched: Seq[Scoring.MatchedTermRow])

  /** Per-term explain for FINAL hits only (`SimilarityComputer.java:500-535`
    * recast): re-derives each hit pair's matched terms with
    * `Scoring.scoreExplain`. Cost is O(k·|queries|) pairs — never touches
    * the link kernel. Joins broadcast the tiny hits table, so the doc/query
    * vector sides shuffle nothing extra. */
  def explainHits(spark: SparkSession, queries: Dataset[DocVec],
      docs: Dataset[DocVec], hits: Dataset[LinkHit]): Dataset[ExplainedHit] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val withQ = broadcast(hits)
      .joinWith(queries, hits("queryId") === queries("docId"))
    val withD = broadcast(withQ)
      .joinWith(docs, withQ("_1.docId") === docs("docId"))
    withD.map { case ((h, q), d) =>
      val (_, terms) = Scoring.scoreExplain(new Scoring.QuerySide(q),
        new Scoring.Side(d))
      ExplainedHit(h.queryId, h.docId, h.rank, h.similarity, terms)
    }
  }

  private def topKForQuery(q: DocVec, dsides: Array[Scoring.Side],
      topN: Int): Iterator[LinkHit] = {
    val qside = new Scoring.QuerySide(q)
    val heap = new TopK(topN)
    var i = 0
    while (i < dsides.length) {
      val s = Scoring.score(qside, dsides(i))
      if (s > 0) heap.offer(dsides(i).docId, s)
      i += 1
    }
    heap.toHits(q.docId)
  }

  /** Cache-blocked cell scoring: iterate DOC CHUNKS (sized to stay cache-
    * resident) in the outer loop and all of the cell's queries in the inner
    * loop — each doc byte is pulled from DRAM once per chunk instead of once
    * per query. At 32 cores the naive query-outer order saturated memory
    * bandwidth (~2x CPU inflation vs 8 cores on >10k-doc cells). */
  private val DocChunk = 1024
  private def scoreCellBlocked(qs: Iterator[DocVec],
      dsides: Array[Scoring.Side], topN: Int): Iterator[LinkHit] = {
    val qsides = qs.map(new Scoring.QuerySide(_)).toArray
    if (qsides.isEmpty) return Iterator.empty
    val heaps = Array.fill(qsides.length)(new TopK(topN))
    var c = 0
    while (c < dsides.length) {
      val end = math.min(c + DocChunk, dsides.length)
      var qi = 0
      while (qi < qsides.length) {
        val q = qsides(qi)
        val heap = heaps(qi)
        var di = c
        while (di < end) {
          val s = Scoring.score(q, dsides(di))
          if (s > 0) heap.offer(dsides(di).docId, s)
          di += 1
        }
        qi += 1
      }
      c = end
    }
    (0 until qsides.length).iterator.flatMap(i => heaps(i).toHits(qsides(i).docId))
  }

  /** Town/village discovery (canonicalization of new surface forms —
    * `AddressInterpreter.extractTownVillage` + `acceptTown` SURVEY.md §2
    * A19/C3, then A20 id assignment): per-partition local accumulation
    * (map-side combine for free), global distinct, deterministic new-region
    * ids `districtId*10000 + rank(name)` via a per-district window
    * (`AddressPersister.importRegionTowns/initializeRegionId`
    * `AddressPersister.java:168-208` — ordering pinned by name, a documented
    * divergence from the reference's insertion-order ids). */
  def discoverTowns(spark: SparkSession, corpus: Dataset[(Long, String)],
      dict: Broadcast[Dict]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val candidates = townCandidates(spark, corpus, dict)
    val w = Window.partitionBy(col("district_id")).orderBy(col("name"))
    candidates
      .withColumn("new_region_id",
        col("district_id") * 10000 + row_number().over(w) - 1)
      .withColumn("region_type",
        when(substring(col("name"), -1, 1).isin("镇", "乡"), lit(RegionTypesTown))
          .when(substring(col("name"), -1, 1) === "村", lit(RegionTypesVillage))
          .otherwise(lit(0)))
      .where(col("region_type") > 0)
  }

  private val RegionTypesTown = graft.model.RegionTypes.Town
  private val RegionTypesVillage = graft.model.RegionTypes.Village

  /** Distinct (district_id, name) town/village candidates — discoverTowns'
    * pre-ranking input, shared with the KG stage materializer (the DuckDB
    * oracle reruns the id-assignment window + type filter over it). */
  def townCandidates(spark: SparkSession, corpus: Dataset[(Long, String)],
      dict: Broadcast[Dict]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    corpus.mapPartitions { it =>
      val interp = dict.value.interpreter
      val visitor = interp.newVisitor()
      val towns = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[String]]
      it.foreach { case (_, text) =>
        interp.extractTownVillage(text, visitor, towns)
      }
      towns.iterator.flatMap { case (did, names) => names.iterator.map(n => (did, n)) }
    }.toDF("district_id", "name").distinct()
  }

  /** Bounded top-k keeper with pinned ordering (desc sim, asc docId).
    * Sorted primitive arrays of size k: O(1) rejection of the common
    * below-threshold offer, shift-insert otherwise — no boxing, no resort
    * (`Query.addSimiDoc` replace-min semantics `Query.java:61-78`, ordering
    * pinned). */
  final class TopK(k: Int) {
    private val sims = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var size = 0
    def offer(docId: Long, sim: Double): Unit = {
      if (size == k) {
        val ws = sims(size - 1); val wi = ids(size - 1)
        if (sim < ws || (sim == ws && docId >= wi)) return
        size -= 1
      }
      var i = size
      while (i > 0 && (sims(i - 1) < sim || (sims(i - 1) == sim && ids(i - 1) > docId))) {
        sims(i) = sims(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      sims(i) = sim; ids(i) = docId
      size += 1
    }
    def toHits(queryId: Long): Iterator[LinkHit] = {
      val s = size
      (0 until s).iterator.map(r => LinkHit(queryId, ids(r), sims(r), r + 1))
    }
  }
}
