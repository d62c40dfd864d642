package graft.dict

import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.GZIPInputStream

import graft.model.{Region, RegionTypes}

/** Immutable region-dictionary context: id→region plus parent→children
  * adjacency. Replaces the reference's driver-side tree + id hash cache
  * (`persist/AddressPersister.java:248-278`, cache at `:155-159`).
  *
  * Built once on the driver, then `spark.sparkContext.broadcast` to executors —
  * ~48k regions is a few MB, far under broadcast limits even with the trie.
  */
final class Regions(val all: IndexedSeq[Region]) extends Serializable {
  val byId: Map[Long, Region] = all.iterator.map(r => r.id -> r).toMap

  /** Children ordered by id — matches the reference's `order by id` child load
    * (`resources/sql-mapper/RegionEntityMapper.xml`), which fixes trie item
    * insertion order and therefore visitor arbitration order. */
  val childrenOf: Map[Long, IndexedSeq[Region]] =
    all.groupBy(_.parentId).map { case (pid, rs) => pid -> rs.sortBy(_.id) }

  def get(id: Long): Region = byId.getOrElse(id, null)
  def children(id: Long): IndexedSeq[Region] =
    childrenOf.getOrElse(id, IndexedSeq.empty)
  def hasChildren(id: Long): Boolean = childrenOf.contains(id)

  /** Root region (country, id=1 in the reference data) — its children are the
    * provinces indexRegions starts from (`index/TermIndexBuilder.java:19-22`). */
  def roots: IndexedSeq[Region] = {
    val country = all.filter(_.regionType == RegionTypes.Country)
    if (country.nonEmpty) country.flatMap(c => children(c.id))
    else all.filter(r => !byId.contains(r.parentId)).sortBy(_.id)
  }
}

object Regions {

  /** Ignore-list noise strings indexed as `TermType.Ignore`
    * (`src/main/resources/spring-config.xml:39-63`). */
  val IgnoreList: Seq[String] = Seq(
    "其它区", "其他地区", "其它地区", "全境", "城区", "城区以内", "城区以外",
    "郊区", "县城内", "内环以内", "开发区", "经济开发区", "经济技术开发区",
    "省直辖", "省直辖市县", "地区", "市区"
  )

  /** Load the packaged administrative-region dictionary (public data extracted
    * from the reference repo's `conf/script/db-init-data.sql`, ~47.7k rows). */
  def loadDefault(): Regions = {
    val in = getClass.getResourceAsStream("/graft/region-dict.tsv.gz")
    require(in != null, "region-dict.tsv.gz missing from classpath")
    val br = new BufferedReader(
      new InputStreamReader(new GZIPInputStream(in), "UTF-8"))
    try {
      val buf = IndexedSeq.newBuilder[Region]
      var line = br.readLine()
      while (line != null) {
        val f = line.split("\t", -1)
        buf += Region(f(0).toLong, f(1).toLong, f(3), f(4), f(2).toInt,
          if (f.length > 5) f(5) else "")
        line = br.readLine()
      }
      new Regions(buf.result())
    } finally br.close()
  }
}
