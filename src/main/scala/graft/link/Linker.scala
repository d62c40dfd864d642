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

  /** Close the reference's dictionary-growth loop (SURVEY.md §3.3 footnote):
    * merge discovered town/village surface forms into the region tree and
    * rebuild the trie, so the NEXT interpret pass resolves them as real
    * Town/Village regions — the Spark-side analog of `ExtractTown.main` →
    * `AddressPersister.importRegionTowns` inserting `bas_region` rows
    * (`persist/AddressPersister.java:168-208`) that the next
    * `TermIndexBuilder.indexRegions` picks up
    * (`index/TermIndexBuilder.java:33-74`).
    *
    * Id assignment is [[Dict.townIdBase]] + rank — ONE scheme shared with
    * `Linker.discoverTowns` (and mirrored by the kg_towns DuckDB oracle), so
    * the merged dictionary and the emitted towns table can never silently
    * disagree on an id: start past any EXISTING child already in the
    * `districtId*10000` block (reference `initializeRegionId` — on a base
    * dictionary the block is empty and the base is exactly
    * `districtId*10000`), then number ALL distinct candidate names in sorted
    * order (the same determinism divergence from the reference's
    * Map-iteration-order ids that `discoverTowns` documents). A candidate
    * whose name does not end in 镇/乡/村 still CONSUMES its rank's id but
    * produces no region — matching `discoverTowns`' rank-before-filter
    * window and the oracle SQL (documented divergence from the reference's
    * `else continue`, which skips the id too; vacuous in practice because
    * `acceptTown`'s patterns only emit suffixed names). Districts unknown to
    * the base tree are dropped (reference `parent==null` skip).
    *
    * Driver-side by design: `discovered` is the distinct (district, name)
    * vocabulary — bounded by real-world place names (~10^5-10^6 entries at
    * any corpus scale), the same order as the 47.7k-region base dictionary
    * this bundle already broadcasts. */
  def withDiscoveredTowns(base: Dict,
      discovered: Seq[(Long, String)]): Dict = {
    val regions = base.regions
    val newRegions = discovered
      .filter { case (_, n) => n != null && n.nonEmpty }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (did, rows) =>
        if (regions.get(did) == null) Nil
        else {
          val base = townIdBase(regions, did)
          rows.map(_._2).distinct.sortWith(codePointLess).zipWithIndex.flatMap {
            case (name, rank) =>
              val t = name.charAt(name.length - 1) match {
                case '镇' | '乡' => graft.model.RegionTypes.Town
                case '村'        => graft.model.RegionTypes.Village
                case _           => 0
              }
              if (t == 0) None
              else Some(graft.model.Region(base + rank, did, name, "", t, ""))
          }
        }
      }
    val merged = new Regions(regions.all ++ newRegions)
    new Dict(merged, new TermIndex(merged, Regions.IgnoreList))
  }

  /** CODE-POINT string order — the collation `discoverTowns`' Spark
    * `orderBy(name)` actually uses (UTF8String compares UTF-8 bytes, which
    * preserves code-point order). Scala's default `String` ordering is
    * UTF-16 code-UNIT order, which DISAGREES for supplementary-plane
    * characters (a CJK Extension-B surrogate pair 0xD840… sorts below
    * U+E000–U+FFFF there but above in code-point order) — sorting the merge
    * with it would silently hand out swapped ids versus the towns table. */
  private def codePointLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    i >= a.length && j < b.length // a exhausted first ⇒ a < b
  }

  /** First free id in a district's discovered-town block (reference
    * `initializeRegionId`): `districtId*10000`, bumped past any existing
    * child already in the block (i.e. towns merged by an EARLIER
    * [[withDiscoveredTowns]] pass). The single source of the id-scheme
    * origin, shared by [[withDiscoveredTowns]] and `Linker.discoverTowns`. */
  def townIdBase(regions: Regions, did: Long): Long = {
    var id = did * 10000L
    regions.children(did).foreach(c => if (c.id >= id) id = c.id + 1)
    id
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

  /** Interpret a corpus to full division rows (every input row, matched or
    * not) — the second-pass surface of the dictionary-growth loop: after
    * `Dict.withDiscoveredTowns` a re-interpret resolves discovered 镇/村
    * mentions to their new Town/Village region ids. Narrow map, same shape
    * as `buildDocs`. */
  def interpretCorpus(spark: SparkSession, corpus: Dataset[(Long, String)],
      dict: Broadcast[Dict]): Dataset[graft.model.InterpretedAddress] = {
    import spark.implicits._
    corpus.mapPartitions { it =>
      val interp = dict.value.interpreter
      val visitor = interp.newVisitor()
      it.flatMap { case (id, text) =>
        val addr = interp.interpret(text, visitor)
        if (addr == null) None else Some(interp.toInterpreted(id, addr))
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
    * (exactness is unaffected by the partition count).
    *
    * (Round 6 A/B'd the codegen'd `groupBy(rawText).agg(min(id))` shape —
    * map-side partial agg + no encoder boundary — and it measured a wash to
    * a slight LOSS on this corpus (kg_dedup_corpus 5-pass min 0.93→1.04 s):
    * with few duplicates the partial agg dedups nothing and adds a map-side
    * hash-table pass. On a dup-heavy 100 TB ingest the partial agg's
    * shuffled-row savings would win; for the declared corpus the hash-first
    * shape stands.) */
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
    // One row per district (bounded ~10³ nationally) — broadcast, so the
    // term-df side streams out of its aggregation without a join exchange.
    df.join(broadcast(nDocs), "partKey")
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
    // Codegen for the common case (round 6, guide §4): every non-'N' term's
    // idf key IS its text — only the RoadNum composite needs the Scala
    // `translateRoadNum` UDF, and 'N' terms are a handful per doc. The
    // branch is the same rule as `DocAnalyser.idfKey`, value-identical.
    val f = udf((text: String, ref: String) =>
      (if (ref == null) "" else ref) + "-" +
        graft.analyse.Segmenter.translateRoadNum(text))
    when(col("t") === "N", f(col("text"), col("road")))
      .otherwise(col("text"))
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
      knobsByPk: Map[String, CellKnobs] = Map.empty,
      idf: Option[Dataset[graft.model.IdfRow]] = None,
      wand: Boolean = WandDefault,
      qspread: Boolean = QSpreadDefault,
      stampQueries: Boolean = false): Dataset[LinkHit] = {
    import spark.implicits._
    // Fused QUERY stamping (round 6): with `stampQueries` the query side may
    // arrive with ZERO idfs and each cell stamps it from the same in-cell
    // idf map the doc sides use (`DocAnalyser.stampIdf` — the identical
    // rule, so scores are bit-identical to the pre-stamped path; the
    // LinkIndex stream link has used exactly this contract since round 5).
    // This removes the per-run `stampQueryIdf` cogroup — two exchanges of
    // the mention side — from the pipeline DAG.
    require(!stampQueries || idf.isDefined,
      "stampQueries needs the fused idf path (idf = Some(...))")
    val default = CellKnobs(math.max(1, qBuckets), math.max(1, dBuckets))
    val bknobs = spark.sparkContext.broadcast(knobsByPk)
    def gOf(knobs: Map[String, CellKnobs], pk: String): Int =
      math.max(1, knobs.getOrElse(pk, default).qBuckets)
    def dbOf(knobs: Map[String, CellKnobs], pk: String): Int =
      math.max(1, knobs.getOrElse(pk, default).dBuckets)
    val anyDb = default.dBuckets > 1 || knobsByPk.valuesIterator.exists(_.dBuckets > 1)
    // Fused idf attach (round 4): with `idf` given, `docs` carry ZERO idfs
    // and the per-district IDF table ships into every scoring cell as
    // chunked binary blocks alongside the doc blobs; sides are stamped
    // in-cell before scoring (`Scoring.stampSideIdfs`). This removes the
    // separate `attachIdf` cogroup — one fewer full doc-side shuffle and no
    // per-task district-dictionary buffer on the doc path — and the doc
    // blobs drop their 8-bytes-per-term idf payload from the ×qBuckets
    // replication. Replication trade: idf rows travel ×(g·db) per district,
    // but a district's DISTINCT-term table is far smaller than its
    // doc-term payload. Bit-identical: same map content, same stamp rule
    // (KgPipelineSpec fused-vs-prestamped gate, DriftPinSpec hashes).
    val fused = idf.isDefined

    // db(pk)==1: each query visits exactly one cell. db(pk)>1: queries
    // replicate across the doc buckets (partial top-k merged below).
    //
    // The query side typically arrives CLUSTERED by partKey (stampQueryIdf's
    // cogroup leaves one partition per district), so without a rebalance the
    // ×dBuckets replication flatMap and its shuffle write for a hot district
    // run inside ONE map task — measured as an 81 s straggler (= the fixed
    // Amdahl term that capped 2→8-core scaling at 0.62) at the sf0.1 scaling
    // point: the hot district's 210k queries × db=60 ≈ 6.6 GB written
    // serially. One cheap extra shuffle of the small UNREPLICATED query side
    // (hash on queryId — uniform by construction) makes the replication
    // stage embarrassingly parallel. Bit-identical results: the cell cogroup
    // re-keys every row anyway, and per-query top-k is order-independent.
    val qSpread =
      if (!qspread || !anyDb) queries // no ×db replication ⇒ nothing to spread
      else queries.repartition(
        math.max(spark.sparkContext.defaultParallelism,
          spark.sessionState.conf.numShufflePartitions),
        org.apache.spark.sql.functions.col("docId"))
    val qKeyed = qSpread
      .flatMap(q => (0 until dbOf(bknobs.value, q.partKey)).map(dbk => (dbk, q)))
      .groupByKey { case (dbk, q) =>
        (q.partKey,
          java.lang.Long.remainderUnsigned(q.docId, gOf(bknobs.value, q.partKey)).toInt,
          dbk)
      }
    // Pack per input partition, assign doc-buckets round-robin per blob,
    // replicate each blob to every query bucket of its partKey. Tag 0 =
    // doc blob, tag 1 = idf blob (replicated to every cell of its partKey).
    val blobs = docs.mapPartitions { it =>
      var blobIdx = 0
      DocBlob.packGroups(it, blobSize, withIdfs = !fused).map { case (pk, bytes) =>
        blobIdx += 1
        (pk, blobIdx % dbOf(bknobs.value, pk), bytes)
      }
    }
    val dTagged = blobs.flatMap { case (pk, dbk, bytes) =>
      (0 until gOf(bknobs.value, pk)).map(qb => (pk, qb, dbk, 0, bytes))
    }
    val dAll = idf match {
      case None => dTagged
      case Some(rows) =>
        val idfTagged = rows.mapPartitions(it => IdfBlob.packGroups(it))
          .flatMap { case (pk, bytes) =>
            val knobs = bknobs.value
            val g = gOf(knobs, pk)
            val db = dbOf(knobs, pk)
            val dbks = if (db == 1) 1 else db
            for { qb <- 0 until g; dbk <- 0 until dbks }
              yield (pk, qb, dbk, 1, bytes)
          }
        dTagged.union(idfTagged)
    }
    val dKeyed = dAll.groupByKey { case (pk, qb, dbk, _, _) =>
      (pk, qb, if (dbOf(bknobs.value, pk) == 1) 0 else dbk)
    }

    val partial = qKeyed.cogroup(dKeyed) { (_, qIt, dIt) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Scoring.Side]
      val idfMap =
        if (fused) new java.util.HashMap[String, java.lang.Double]() else null
      dIt.foreach { case (_, _, _, tag, bytes) =>
        if (tag == 1) IdfBlob.unpackInto(bytes, idfMap)
        else DocBlob.unpackSides(bytes, buf, withIdfs = !fused)
      }
      if (buf.isEmpty) Iterator.empty
      else {
        if (fused) {
          // Stamp AFTER the full pass: idf chunks interleave arbitrarily
          // with doc blobs in the cell's iterator.
          var i = 0
          while (i < buf.length) { Scoring.stampSideIdfs(buf(i), idfMap); i += 1 }
        }
        // Lazy map over the query iterator: stamping runs inside
        // scoreCellBlocked's drain, which happens after the idf map above
        // is complete.
        val qs =
          if (stampQueries) qIt.map(p => DocAnalyser.stampIdf(p._2, idfMap))
          else qIt.map(_._2)
        scoreCellBlocked(qs, buf.toArray, topN, wand = wand)
      }
    }
    if (!anyDb) partial
    else partial.groupByKey(_.queryId).flatMapGroups { (qid, hits) =>
      val heap = new TopK(topN)
      hits.foreach(h => heap.offer(h.docId, h.similarity))
      heap.toHits(qid)
    }
  }

  /** Both sides' per-partKey (query, doc) counts in ONE job (fixed per-job
    * overhead is the measured scaling bound on this box — don't pay it
    * twice). Driver-sized result: one row per district. */
  def countStats(spark: SparkSession, queries: Dataset[DocVec],
      docs: Dataset[DocVec]): Array[(String, Long, Long)] = {
    import spark.implicits._
    // Per-partition local maps merged on the driver (round 6): district
    // cardinality is bounded (~10³ nationally), so the partial maps are
    // tiny — no exchange at all, one narrow stage per side instead of a
    // map + shuffle + reduce (the OrderedScan per-partition-totals idiom).
    def partials(ds: Dataset[DocVec], qSide: Boolean) = ds.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      it.foreach(d => m.merge(d.partKey, 1L, (a, b) => a + b))
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala.map(e =>
        if (qSide) (e.getKey, e.getValue.longValue(), 0L)
        else (e.getKey, 0L, e.getValue.longValue()))
    }
    val merged = new scala.collection.mutable.HashMap[String, (Long, Long)]()
    partials(queries, qSide = true).union(partials(docs, qSide = false))
      .collect()
      .foreach { case (pk, q, d) =>
        val (q0, d0) = merged.getOrElse(pk, (0L, 0L))
        merged(pk) = (q0 + q, d0 + d)
      }
    merged.iterator.map { case (pk, (q, d)) => (pk, q, d) }.toArray
  }

  /** The auto-router's decision, exposed for inspection (the skew-stress
    * bench reports routes and cell counts from the SAME planner the link
    * executes). */
  final case class RoutePlan(qCounts: Map[String, Long],
      dCounts: Map[String, Long], bcastPks: Set[String],
      shufflePks: Set[String], knobs: Map[String, CellKnobs]) {
    /** Total candidate pair work q·d across queried districts. */
    def pairWork: Long = qCounts.iterator
      .map { case (pk, q) => q * dCounts.getOrElse(pk, 0L) }.sum
    def shuffleCells: Long = knobs.valuesIterator
      .map(k => k.qBuckets.toLong * k.dBuckets).sum
  }

  /** Pure route planning from counted stats — extracted from `linkTopKAuto`
    * so the decision is inspectable; the link path calls exactly this. */
  def planRoutes(stats: Array[(String, Long, Long)], parallelism: Int,
      targetPairsPerCell: Long = 1L << 22, maxDocsPerCell: Int = 1 << 16,
      maxQBuckets: Int = 256, bcastQMax: Long = 512,
      bcastTotalMax: Long = 1L << 17): RoutePlan = {
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
    val para = math.max(1, parallelism)
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
        val db = math.max(dbWork, dbMem)
        // Round 6: a db>1 split has costs the replicated-bytes minimum
        // (g/db ≈ q/d) does not see — the query side is replicated ×db
        // AND re-shuffled (qspread), and every query pays a k-row partial
        // top-k merge exchange. When the memory valve does not force the
        // split, prefer covering the cells with query buckets ALONE if the
        // extra doc-blob replication stays within 4× of the split plan's
        // total replicated rows — true exactly in the small-cells regime
        // where fixed per-exchange overhead dominates (measured at sf0.1:
        // cells≈8/district, the db=4 plan cost a query-replication
        // exchange + a merge shuffle for zero memory benefit). At scale
        // cells ≫ maxQBuckets or the 4× bound fails and the 2-D split
        // stands unchanged. Results are bit-identical for ANY knobs
        // (KgPipelineSpec pins it); only shuffle topology changes.
        val gOnly = math.min(cells, math.min(q, maxQBuckets.toLong))
        val knob =
          if (db > 1 && dbMem <= 1 && gOnly >= cells &&
              gOnly * d <= 4L * (g * d + 2L * db * q))
            CellKnobs(gOnly.toInt, 1)
          else CellKnobs(g, db.toInt)
        Some(pk -> knob)
      }
    }.toMap
    RoutePlan(qCounts, dCounts, bcastPks, shufflePks, knobs)
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
      bcastTotalMax: Long = 1L << 17,
      idf: Option[Dataset[graft.model.IdfRow]] = None,
      wand: Boolean = WandDefault,
      qspread: Boolean = QSpreadDefault,
      stampQueries: Boolean = false): Dataset[LinkHit] = {
    import spark.implicits._
    require(!stampQueries || idf.isDefined,
      "stampQueries needs the fused idf path (idf = Some(...))")
    val plan = planRoutes(countStats(spark, queries, docs),
      spark.sparkContext.defaultParallelism, targetPairsPerCell,
      maxDocsPerCell, maxQBuckets, bcastQMax, bcastTotalMax)
    val qCounts = plan.qCounts
    val bcastPks = plan.bcastPks
    val shufflePks = plan.shufflePks
    val knobs = plan.knobs

    val bShuffle = spark.sparkContext.broadcast(shufflePks)
    val restHits = linkTopK(spark,
      queries.filter(q => bShuffle.value.contains(q.partKey)),
      docs.filter(d => bShuffle.value.contains(d.partKey)),
      topN, qBuckets = 1, dBuckets = 1, knobsByPk = knobs,
      idf = idf.map(_.filter(r => bShuffle.value.contains(r.partKey))),
      wand = wand, qspread = qspread, stampQueries = stampQueries)

    if (bcastPks.isEmpty) restHits
    else {
      val bBcast = spark.sparkContext.broadcast(bcastPks)
      val qB = queries.filter(q => bBcast.value.contains(q.partKey)).collect()
      // Fused idf on the broadcast route: the route's districts' idf tables
      // are collected and broadcast next to the queries, and the streamed
      // doc sides are stamped in-task. Driver memory is bounded by those
      // districts' DISTINCT-term dictionaries — the same structure the
      // pre-fusion attachIdf cogroup buffered per task (and ≪ the doc
      // payload the route exists to avoid shuffling); address-shaped
      // vocabularies saturate, so this is a broadcast-dimension-sized
      // collect, like the queries themselves.
      val idfB = idf.map { rows =>
        val m = new scala.collection.mutable.HashMap[
          String, java.util.HashMap[String, java.lang.Double]]()
        rows.filter(r => bBcast.value.contains(r.partKey)).collect()
          .foreach { r =>
            m.getOrElseUpdate(r.partKey,
              new java.util.HashMap[String, java.lang.Double]())
              .put(r.termKey, r.idf)
          }
        spark.sparkContext.broadcast(m.toMap)
      }
      // Fused query stamping on the broadcast route: the collected queries
      // are stamped DRIVER-side from the same collected per-district idf
      // maps the streamed doc sides use — identical rule, and a partKey
      // absent from the maps stamps against the empty map (every term
      // MISSING_IDF), exactly the stampQueryIdf cogroup's behavior for an
      // idf-less district.
      val qBStamped =
        if (!stampQueries) qB
        else {
          val maps = idfB.get.value
          qB.map(q => DocAnalyser.stampIdf(q,
            maps.getOrElse(q.partKey, EmptyIdfMap)))
        }
      val hitsB = linkTopKBroadcast(spark,
        qBStamped, docs.filter(d => bBcast.value.contains(d.partKey)), topN,
        idfB, wand = wand)
      restHits.union(hitsB)
    }
  }

  /** Broadcast-query variant for hot partitions / huge doc side: the docs side
    * streams with NO shuffle; queries (small) are broadcast grouped by
    * partKey. Emits per-partition partial top-k; final top-k is a tiny
    * shuffle of k*|queries| rows. */
  def linkTopKBroadcast(spark: SparkSession, queries: Array[DocVec],
      docs: Dataset[DocVec], topN: Int,
      idfByPk: Option[Broadcast[Map[String, java.util.HashMap[String, java.lang.Double]]]] = None,
      wand: Boolean = WandDefault): Dataset[LinkHit] = {
    import spark.implicits._
    val byPart = queries.groupBy(_.partKey)
    val bq = spark.sparkContext.broadcast(byPart)
    val partial = docs.mapPartitions { it =>
      locally { // scoring-stage attribution, same hook as scoreCellBlocked
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) { ScoringStageIds.add(tc.stageId()); () }
      }
      val heaps = new scala.collection.mutable.HashMap[Long, TopK]()
      // Per-partKey compiled queries + inverted index over QUERY term hashes
      // (the mirror of scoreCellBlocked's doc postings): each streamed doc
      // only scores the queries it shares ≥1 term text with — exact, see
      // `candidatesOf`'s argument. `masses` parallels `postings` with each
      // entry's maxQtfidf² (WAND, round 5): pass 1 over a doc's hashes
      // accumulates a per-query bound mass, pass 2 scores only queries
      // whose bound can still beat their heap's kth key — the same
      // admissible, bit-identical skip as the shuffle cells. The RoadNum
      // fuzzy fallback posts its mass (and candidacy — a superset: the
      // fallback needs equal road TEXT, which is an R term on both sides,
      // so no new nonzero pair appears) on the query's road-text hash.
      final case class QIdx(qs: Array[Scoring.QuerySide],
          postings: scala.collection.mutable.LongMap[IntVec],
          masses: scala.collection.mutable.LongMap[FloatVec])
      val byPk = new scala.collection.mutable.HashMap[String, QIdx]()
      val qmap = bq.value
      var stamp = 0
      var stamps = new Array[Int](64)
      var ubq = new Array[Float](64)
      val cands = new IntVec
      it.foreach { d =>
        val qidx = byPk.getOrElseUpdate(d.partKey, {
          val qs = qmap.getOrElse(d.partKey, Array.empty)
            .map(new Scoring.QuerySide(_))
          val postings = new scala.collection.mutable.LongMap[IntVec](qs.length * 8)
          val masses = new scala.collection.mutable.LongMap[FloatVec](qs.length * 8)
          def post(key: Long, qi: Int, m: Float): Unit = {
            postings.getOrElseUpdate(key, new IntVec).add(qi)
            masses.getOrElseUpdate(key, new FloatVec).add(m)
          }
          var qi = 0
          while (qi < qs.length) {
            val q = qs(qi)
            val hs = q.hashes
            var i = 0
            while (i < hs.length) {
              val m = q.maxSq(i).toFloat
              post(hs(i).toLong, qi, m)
              if (q.types.charAt(i) == 'N' && q.road != null)
                post(q.road.hashCode.toLong, qi, m)
              i += 1
            }
            qi += 1
          }
          QIdx(qs, postings, masses)
        })
        if (qidx.qs.nonEmpty) {
          if (stamps.length < qidx.qs.length) {
            stamps = new Array[Int](qidx.qs.length)
            ubq = new Array[Float](qidx.qs.length)
          }
          stamp += 1
          val ds = new Scoring.Side(d)
          // Fused idf attach: streamed docs carry zero idfs; stamp from the
          // broadcast per-district map (same rule as the cell path). A
          // missing district stamps against the empty map — every term gets
          // MISSING_IDF, exactly attachIdf's behavior for an idf-less
          // partKey (cannot occur when idf derives from these docs).
          idfByPk.foreach { b =>
            Scoring.stampSideIdfs(ds,
              b.value.getOrElse(d.partKey, EmptyIdfMap))
          }
          // Pass 1: candidates + bound mass for THIS doc.
          cands.n = 0
          val hs = ds.hashes
          var i = 0
          while (i < hs.length) {
            val p = qidx.postings.getOrNull(hs(i).toLong)
            if (p != null) {
              val mv = qidx.masses.getOrNull(hs(i).toLong)
              var j = 0
              while (j < p.n) {
                val qi = p.a(j)
                if (stamps(qi) != stamp) {
                  stamps(qi) = stamp; ubq(qi) = 0f; cands.add(qi)
                }
                ubq(qi) += mv.a(j)
                j += 1
              }
            }
            i += 1
          }
          // Pass 2: score candidates whose bound survives their threshold.
          var ci = 0
          while (ci < cands.n) {
            val qi = cands.a(ci)
            val q = qidx.qs(qi)
            var skip = false
            if (wand && q.minSumQQ > 0.0) {
              val h = heaps.getOrElse(q.docId, null)
              if (h != null) {
                val kk = h.kthKey
                if (kk > 0L) {
                  val t = (kk - 0.5) / 1e6
                  skip = ubq(qi) < t * t * q.minSumQQ / WandSafety
                }
              }
            }
            if (!skip) {
              val s = Scoring.score(q, ds)
              if (s > 0)
                heaps.getOrElseUpdate(q.docId, new TopK(topN)).offer(d.docId, s)
            }
            ci += 1
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

  private val EmptyIdfMap = new java.util.HashMap[String, java.lang.Double]()

  /** Minimal growable int array (postings lists; ArrayBuffer[Int] boxes). */
  private final class IntVec {
    var a = new Array[Int](4); var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) {
        val b = new Array[Int](n * 2); System.arraycopy(a, 0, b, 0, n); a = b
      }
      a(n) = v; n += 1
    }
  }

  /** Float twin of IntVec (per-posting WAND bound masses). */
  private final class FloatVec {
    var a = new Array[Float](4); var n = 0
    def add(v: Float): Unit = {
      if (n == a.length) {
        val b = new Array[Float](n * 2); System.arraycopy(a, 0, b, 0, n); a = b
      }
      a(n) = v; n += 1
    }
  }

  /** Inverted-index postings for a cell's doc sides: term-text hash → doc
    * indices (ascending; duplicates possible when a doc repeats a hash —
    * the BitSet candidate mark dedups). */
  private def buildPostings(dsides: Array[Scoring.Side])
      : scala.collection.mutable.LongMap[IntVec] = {
    val postings = new scala.collection.mutable.LongMap[IntVec](dsides.length * 8)
    var di = 0
    while (di < dsides.length) {
      val hs = dsides(di).hashes
      var i = 0
      while (i < hs.length) {
        postings.getOrElseUpdate(hs(i).toLong, new IntVec).add(di)
        i += 1
      }
      di += 1
    }
    postings
  }

  /** Candidate docs for one query: union of its term hashes' postings, as a
    * BitSet over doc indices. EXACT, not approximate: a doc sharing NO term
    * text with the query scores 0 (every query-term lookup misses; the
    * RoadNum same-road fallback also requires equal road TEXT, which is
    * itself an R term on both sides — `DocAnalyser.analyse` only emits
    * non-empty texts) and similarity-0 hits are dropped by the kernel
    * contract (`Query.addSimiDoc` `Query.java:62`), so skipping non-candidates
    * cannot change the result. Hash collisions only ADD candidates (scoring
    * verifies text equality). Term vectors carry no Province/City/District
    * terms (partKey handles those), so no term is exempt. */
  private def candidatesOf(q: Scoring.QuerySide,
      postings: scala.collection.mutable.LongMap[IntVec],
      nDocs: Int): java.util.BitSet =
    candidatesAndBounds(q, postings, nDocs, null)

  /** candidatesOf + WAND bound mass in one postings pass: `ub(d)` (when
    * non-null) accumulates Σ maxQtfidf_i² over the query terms whose hash
    * posting contains d — a superset of the true matched set (hash ⊇ text
    * equality; duplicate postings only inflate), so the derived bound stays
    * admissible. The RoadNum fuzzy fallback can match WITHOUT the N term's
    * text (same-road, different number), so the N term's mass is ALSO
    * posted along the query's road-text hash — every doc that can reach
    * the fallback shares that R text (see candidatesOf's exactness note). */
  private def candidatesAndBounds(q: Scoring.QuerySide,
      postings: scala.collection.mutable.LongMap[IntVec],
      nDocs: Int, ub: Array[Float]): java.util.BitSet = {
    val cand = new java.util.BitSet(nDocs)
    val hs = q.hashes
    if (ub != null) {
      var i = 0
      while (i < hs.length) {
        val m = q.maxSq(i).toFloat
        val p = postings.getOrNull(hs(i).toLong)
        if (p != null) {
          var j = 0
          while (j < p.n) { cand.set(p.a(j)); ub(p.a(j)) += m; j += 1 }
        }
        if (q.types.charAt(i) == 'N' && q.road != null) {
          val pr = postings.getOrNull(q.road.hashCode.toLong)
          if (pr != null) {
            var j = 0
            while (j < pr.n) { ub(pr.a(j)) += m; j += 1 }
          }
        }
        i += 1
      }
      return cand
    }
    var i = 0
    while (i < hs.length) {
      val p = postings.getOrNull(hs(i).toLong)
      if (p != null) {
        var j = 0
        while (j < p.n) { cand.set(p.a(j)); j += 1 }
      }
      i += 1
    }
    cand
  }

  /** Cache-blocked cell scoring with inverted-index candidate pruning:
    *  - postings (term hash → doc indices) are built once per cell; each
    *    query only scores docs sharing ≥1 term text — exact (see
    *    `candidatesOf`), and on address-shaped data it skips the large
    *    majority of pairs (the O(|q|·|d|) full scan was the kernel's pair
    *    bound; the candidate scan is output-sensitive);
    *  - DOC CHUNKS (sized to stay cache-resident) remain the outer loop with
    *    all queries inner — each doc byte is pulled from DRAM once per chunk
    *    instead of once per query. At 32 cores the naive query-outer order
    *    saturated memory bandwidth (~2x CPU inflation vs 8 cores on
    *    >10k-doc cells). Candidate iteration (BitSet.nextSetBit) preserves
    *    the exact ascending doc order of the full scan, so heap contents —
    *    already order-independent via pinned ties — are bit-identical. */
  private val DocChunk = 1024
  /** WAND safety factor: the per-doc bound mass accumulates in FLOAT (4
    * bytes × cell pairs, inside the task-memory valve); float summation of
    * ≤ ~64 non-negative terms has relative error ≤ 63·2^-24 ≈ 3.8e-6, so
    * inflating by 1e-4 provably restores admissibility. */
  /** Kill switch for A/B measurement (GRAFT_QSPREAD=0) of the query-side
    * rebalance before the ×dBuckets replication; results are bit-identical
    * either way (partitioning never reaches semantics). */
  private[graft] val QSpreadDefault: Boolean =
    sys.env.get("GRAFT_QSPREAD").forall(_ != "0")

  private val WandSafety = 1.0001
  /** Kill switch for A/B measurement (GRAFT_WAND=0); results are
    * bit-identical either way (WandSpec), only CPU changes. */
  private[graft] val WandDefault: Boolean =
    sys.env.get("GRAFT_WAND").forall(_ != "0")

  /** Stage ids (this JVM) whose tasks ran the scoring kernel — bench/test
    * instrumentation so the skew-stress report attributes task time to the
    * ACTUAL scoring stage(s) instead of guessing "the max-taskSum stage of
    * the session" (which warmup, interpret, or a post-timing route
    * recompute can win). Local-mode attribution: driver and executors share
    * the JVM on local[n]; a real cluster would use named accumulators.
    * Callers (Bench.skewStress) clear it right before the timed window. */
  val ScoringStageIds: java.util.Set[Integer] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()

  private[graft] def scoreCellBlocked(qs: Iterator[DocVec],
      dsides: Array[Scoring.Side], topN: Int,
      wand: Boolean = WandDefault,
      wandSkipped: java.util.concurrent.atomic.LongAdder = null)
      : Iterator[LinkHit] = {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) { ScoringStageIds.add(tc.stageId()); () }
    val qsides = qs.map(new Scoring.QuerySide(_)).toArray
    if (qsides.isEmpty) return Iterator.empty
    val postings = buildPostings(dsides)
    val cands = new Array[java.util.BitSet](qsides.length)
    // Per-(query, doc) upper-bound mass Σ maxQtfidf_i² over hash-matched
    // terms, filled in the same postings pass that marks candidates. A
    // doc's bound is then sqrt(ub·safety / minSumQQ) ≥ its true sim
    // (QuerySide.maxSq doc), which the scoring loop tests against the
    // heap's quantized kth key — an admissible, bit-identical skip.
    val ubs = if (wand) new Array[Array[Float]](qsides.length) else null
    var i = 0
    while (i < qsides.length) {
      val ub = if (wand) new Array[Float](dsides.length) else null
      cands(i) = candidatesAndBounds(qsides(i), postings, dsides.length, ub)
      if (wand) ubs(i) = ub
      i += 1
    }
    val heaps = Array.fill(qsides.length)(new TopK(topN))
    // Per-query skip limit on the RAW ub mass (avoids sqrt per doc):
    // skip ⟺ qz(bound) < kthKey ⟺ bound < (kthKey-0.5)/1e6
    //      ⟺ ub < ((kthKey-0.5)/1e6)² · minSumQQ / safety.
    // Recomputed only when the heap's kth key moves.
    val limits = new Array[Double](qsides.length)
    val lastKeys = new Array[Long](qsides.length)
    java.util.Arrays.fill(limits, Double.NegativeInfinity)
    java.util.Arrays.fill(lastKeys, Long.MinValue)
    @inline def limitFor(q: Scoring.QuerySide, kk: Long): Double =
      if (kk <= 0L || q.minSumQQ <= 0.0) Double.NegativeInfinity
      else {
        val t = (kk - 0.5) / 1e6
        t * t * q.minSumQQ / WandSafety
      }
    var c = 0
    while (c < dsides.length) {
      val end = math.min(c + DocChunk, dsides.length)
      var qi = 0
      while (qi < qsides.length) {
        val q = qsides(qi)
        val heap = heaps(qi)
        val ub = if (wand) ubs(qi) else null
        var limit = limits(qi)
        var lastKey = lastKeys(qi)
        var di = cands(qi).nextSetBit(c)
        while (di >= 0 && di < end) {
          if (ub != null && ub(di) < limit) {
            if (wandSkipped != null) wandSkipped.increment()
          } else {
            val s = Scoring.score(q, dsides(di))
            if (s > 0) {
              heap.offer(dsides(di).docId, s)
              val kk = heap.kthKey
              if (kk != lastKey) { lastKey = kk; limit = limitFor(q, kk) }
            }
          }
          di = cands(qi).nextSetBit(di + 1)
        }
        limits(qi) = limit
        lastKeys(qi) = lastKey
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
    // Same id origin as Dict.withDiscoveredTowns (Dict.townIdBase): on a
    // BASE dictionary every district's block is empty, so base ==
    // district_id*10000 and the kg_towns DuckDB oracle's literal
    // `district_id*10000 + row_number - 1` recomputation stays exact; on a
    // GROWN dictionary (iterated canonicalization loop) the base skips past
    // already-merged towns, keeping the two id assigners in lockstep
    // instead of silently diverging.
    val grownBases: Map[Long, Long] = {
      val regions = dict.value.regions
      regions.all.iterator
        .filter(r => r.regionType == RegionTypesTown ||
          r.regionType == RegionTypesVillage)
        .map(_.parentId).toSet.iterator
        .map((did: Long) => did -> Dict.townIdBase(regions, did))
        .filter { case (did, base) => base != did * 10000L }
        .toMap
    }
    val w = Window.partitionBy(col("district_id")).orderBy(col("name"))
    val withBase =
      if (grownBases.isEmpty) // base dict: identical plan to round 4
        candidates.withColumn("id_base", col("district_id") * 10000)
      else {
        import spark.implicits._
        val overrides = grownBases.toSeq.toDF("district_id", "base_override")
        candidates.join(broadcast(overrides), Seq("district_id"), "left")
          .withColumn("id_base",
            coalesce(col("base_override"), col("district_id") * 10000))
          .drop("base_override")
      }
    withBase
      .withColumn("new_region_id",
        col("id_base") + row_number().over(w) - 1)
      .drop("id_base")
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

  /** Bounded top-k keeper. PUBLIC ORDERING CONTRACT (round 3): candidates
    * are ranked by similarity QUANTIZED to 1e-6 (half-up) descending, then
    * docId ascending. Rationale: near-identical docs produce sims that agree
    * to ~1e-9 but differ at ~1e-15, where the order is pure floating-point
    * accumulation noise — the reference's full-double comparator
    * (`SimilarityComputer.java` result sort) is an implementation artifact no
    * independent engine can reproduce (JVM vs DuckDB sums differ at 1e-16),
    * while the quantized order is deterministic AND cross-engine verifiable:
    * the kg_links DuckDB oracle re-derives the exact top-k — membership,
    * ranks, and sims — from the stage tables. Within a 1e-6 band the
    * reference makes no meaningful ordering guarantee. Emitted sims stay
    * full precision. */
  final class TopK(k: Int) {
    private val sims = new Array[Double](k)
    private val keys = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var size = 0
    // Half-up at 1e-6 — matches SQL round(sim, 6) for non-negative sims.
    @inline private def qz(sim: Double): Long =
      math.floor(sim * 1e6 + 0.5).toLong
    def offer(docId: Long, sim: Double): Unit = {
      val key = qz(sim)
      if (size == k) {
        val wk = keys(size - 1); val wi = ids(size - 1)
        if (key < wk || (key == wk && docId >= wi)) return
        size -= 1
      }
      var i = size
      while (i > 0 && (keys(i - 1) < key || (keys(i - 1) == key && ids(i - 1) > docId))) {
        sims(i) = sims(i - 1); keys(i) = keys(i - 1); ids(i) = ids(i - 1)
        i -= 1
      }
      sims(i) = sim; keys(i) = key; ids(i) = docId
      size += 1
    }
    def toHits(queryId: Long): Iterator[LinkHit] = {
      val s = size
      (0 until s).iterator.map(r => LinkHit(queryId, ids(r), sims(r), r + 1))
    }
    /** Current quantized kth-place key, or Long.MinValue while not full —
      * the WAND skip threshold: `offer` REJECTS any candidate whose
      * quantized sim is < this key regardless of docId, so skipping such
      * candidates upstream is bit-identical by the offer contract. */
    def kthKey: Long = if (size < k) Long.MinValue else keys(size - 1)
  }
}
