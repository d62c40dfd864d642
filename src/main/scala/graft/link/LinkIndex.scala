package graft.link

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.model.{DocVec, IdfRow, LinkHit}

/** Pre-partitioned, persisted static side for CONTINUOUS entity linking —
  * the structure that makes a micro-batch's cost independent of corpus size.
  *
  * `linkTopKAuto` re-plans per call: it counts both sides, packs the doc
  * blobs, and shuffles them into scoring cells. In a stream that repeats the
  * full static-corpus pass EVERY micro-batch — at 100 TB the stream would
  * re-shuffle 100 TB per trigger. This index does that work ONCE:
  *
  *  - doc-bucket count per district is a pure function of the STATIC side
  *    (`db = ⌈d / maxDocsPerCell⌉`, the same task-memory valve the batch
  *    planner applies), so cell membership never depends on the batch;
  *  - doc blobs (and, when idf is fused, the district idf blobs) are packed
  *    and hash-partitioned by cell key `(partKey, dbk)` once, then persisted
  *    partitioner-aware;
  *  - each micro-batch replicates its (tiny) QUERY side ×db and cogroups
  *    against the persisted cells **with the index's own partitioner** — a
  *    narrow dependency on the static side: only the queries shuffle, and
  *    corpus passes per batch drop to zero.
  *
  * This is the one place the engine drops to the RDD layer deliberately:
  * a `Dataset` cogroup re-plans its exchange on every action, so persisted
  * partitioning cannot be carried ACROSS queries — the pair-RDD
  * `partitionBy` + same-partitioner `cogroup` contract is exactly the
  * cross-query reuse the streaming path needs. Scoring reuses the batch
  * kernel (`Linker.scoreCellBlocked`, fused idf stamping, quantized TopK),
  * so indexed output is bit-identical to `linkTopKAuto` (LinkIndexSpec).
  *
  * Query buckets are fixed at g=1: micro-batch query sets are small, so
  * per-cell pair work `q·maxDocsPerCell` stays bounded by the batch size and
  * doc blobs need NO ×g replication at all. A batch large enough to break
  * that assumption belongs on the batch path.
  */
final class LinkIndex private (
    val dbByPk: Map[String, Int],
    val cells: RDD[((String, Int), (Int, Array[Byte]))],
    val fused: Boolean) extends Serializable {

  /** Number of persisted cell partitions (for tests/inspection). */
  def numPartitions: Int = cells.partitioner.map(_.numPartitions).getOrElse(0)

  /** Link one (micro-)batch of queries against the indexed corpus. Only the
    * query side shuffles; the static side is read in place.
    *
    * With `stampQueries` (fused index only) the queries may arrive with NO
    * idfs: each cell stamps them from its tag-1 idf blobs via the SAME
    * `DocAnalyser.stampIdf` the batch `stampQueryIdf` cogroup applies — so
    * the stream drops that per-batch idf-table shuffle too, and the only
    * per-trigger movement left is the raw query rows. */
  def link(spark: SparkSession, queries: Dataset[DocVec], topN: Int,
      wand: Boolean = Linker.WandDefault,
      stampQueries: Boolean = false): Dataset[LinkHit] = {
    require(!stampQueries || fused,
      "stampQueries needs a fused index (built with idf = Some(...))")
    import spark.implicits._
    val bdb = spark.sparkContext.broadcast(dbByPk)
    val isFused = fused
    val doStamp = stampQueries
    val qPairs: RDD[((String, Int), DocVec)] = queries.rdd.flatMap { q =>
      (0 until bdb.value.getOrElse(q.partKey, 0))
        .map(dbk => ((q.partKey, dbk), q))
    }
    val partitioner = cells.partitioner.get
    val partial: RDD[LinkHit] = cells.cogroup(qPairs, partitioner)
      .flatMap { case (_, (cellIt, qIt)) =>
        if (qIt.isEmpty || cellIt.isEmpty) Iterator.empty
        else {
          val buf = scala.collection.mutable.ArrayBuffer.empty[Scoring.Side]
          val idfMap =
            if (isFused) new java.util.HashMap[String, java.lang.Double]()
            else null
          cellIt.foreach { case (tag, bytes) =>
            if (tag == 1) IdfBlob.unpackInto(bytes, idfMap)
            else DocBlob.unpackSides(bytes, buf, withIdfs = !isFused)
          }
          if (buf.isEmpty) Iterator.empty
          else {
            if (isFused) {
              var i = 0
              while (i < buf.length) {
                Scoring.stampSideIdfs(buf(i), idfMap); i += 1
              }
            }
            val qDocs =
              if (doStamp)
                qIt.iterator.map(graft.analyse.DocAnalyser.stampIdf(_, idfMap))
              else qIt.iterator
            Linker.scoreCellBlocked(qDocs, buf.toArray, topN, wand = wand)
          }
        }
      }
    val hits = spark.createDataset(partial)
    if (!dbByPk.valuesIterator.exists(_ > 1)) hits
    else hits.groupByKey(_.queryId).flatMapGroups { (qid, partials) =>
      val heap = new Linker.TopK(topN)
      partials.foreach(h => heap.offer(h.docId, h.similarity))
      heap.toHits(qid)
    }
  }

  def unpersist(): Unit = { cells.unpersist(); () }
}

object LinkIndex {

  /** Build (and EAGERLY materialize) the index: one pass over the static
    * docs to count, one pack + partition shuffle, persisted. With `idf`
    * given the doc blobs carry no idfs and the district idf tables ride as
    * tag-1 blobs into every cell of their district — the same fused wire
    * format as the batch path. */
  def build(spark: SparkSession, docs: Dataset[DocVec],
      idf: Option[Dataset[IdfRow]] = None,
      maxDocsPerCell: Int = 1 << 16, blobSize: Int = 256): LinkIndex = {
    val fused = idf.isDefined
    val counts = docs.rdd.map(d => (d.partKey, 1L)).reduceByKey(_ + _)
      .collect()
    val dbByPk: Map[String, Int] = counts.iterator.map { case (pk, d) =>
      pk -> math.max(1L, (d + maxDocsPerCell - 1) / maxDocsPerCell).toInt
    }.toMap
    val bdb = spark.sparkContext.broadcast(dbByPk)
    val docCells: RDD[((String, Int), (Int, Array[Byte]))] =
      docs.rdd.mapPartitions { it =>
        var blobIdx = 0
        DocBlob.packGroups(it, blobSize, withIdfs = !fused).map {
          case (pk, bytes) =>
            blobIdx += 1
            ((pk, blobIdx % bdb.value.getOrElse(pk, 1)), (0, bytes))
        }
      }
    val allCells = idf match {
      case None => docCells
      case Some(rows) =>
        val idfCells = rows.rdd
          .mapPartitions(it => IdfBlob.packGroups(it))
          .flatMap { case (pk, bytes) =>
            (0 until bdb.value.getOrElse(pk, 1))
              .map(dbk => ((pk, dbk), (1, bytes)))
          }
        docCells.union(idfCells)
    }
    val totalCells = dbByPk.valuesIterator.map(_.toLong).sum
    val numParts = math.max(spark.sparkContext.defaultParallelism.toLong,
      math.min(totalCells, 4L * spark.sparkContext.defaultParallelism))
      .toInt
    val cells = allCells
      .partitionBy(new HashPartitioner(math.max(1, numParts)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cells.count() // materialize NOW: the one-time cost the stream amortizes
    new LinkIndex(dbByPk, cells, fused)
  }
}
