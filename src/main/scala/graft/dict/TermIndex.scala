package graft.dict

import scala.collection.mutable.ArrayBuffer

import graft.model.{Region, RegionTypes, TermTypes}
import graft.util.Str

/** Trie payload: (term type, optional region). Ignore items carry no region
  * (`index/TermIndexItem.java:10-12`). */
final class IndexItem(val termType: Char, val region: Region) extends Serializable

/** Visitor contract for the deep-most backtracking search
  * (`index/TermIndexVisitor.java:13-43`). */
trait IndexVisitor {
  def startRound(): Unit
  def visit(entry: TrieNode, text: String, pos: Int): Boolean
  def positionAfterAcceptItem: Int
  def endVisit(entry: TrieNode, text: String, pos: Int): Unit
  def endRound(): Unit
}

/** One trie node (`index/TermIndexEntry.java:16-19`). Mutable during build,
  * treated as immutable afterwards (safe to broadcast + share across tasks). */
final class TrieNode(val key: String) extends Serializable {
  private[dict] var itemsBuf: ArrayBuffer[IndexItem] = null
  private[dict] var childrenMap: java.util.HashMap[Character, TrieNode] = null

  def hasItem: Boolean = itemsBuf != null && itemsBuf.nonEmpty
  def items: ArrayBuffer[IndexItem] = itemsBuf
  def children: java.util.HashMap[Character, TrieNode] = childrenMap

  private[dict] def buildIndex(text: String, pos: Int, item: IndexItem): Unit = {
    if (text == null || text.isEmpty || pos < 0 || pos >= text.length) return
    val c = text.charAt(pos)
    if (childrenMap == null) childrenMap = new java.util.HashMap[Character, TrieNode](1)
    var entry = childrenMap.get(c)
    if (entry == null) {
      entry = new TrieNode(Str.head(text, pos + 1))
      childrenMap.put(c, entry)
    }
    if (pos == text.length - 1) {
      if (entry.itemsBuf == null) entry.itemsBuf = new ArrayBuffer[IndexItem](1)
      entry.itemsBuf += item
    } else entry.buildIndex(text, pos + 1, item)
  }
}

/** Character trie over all region names + aliases — the reference's inverted
  * index (`index/TermIndexBuilder.java`), built driver-side and broadcast.
  *
  * Item insertion order per node matches the reference exactly (region-tree
  * DFS in child-id order, names longest-first, auto-aliases after, ignore list
  * last) because visitor arbitration is order-sensitive.
  */
final class TermIndex(regions: Regions, ignoreList: Seq[String]) extends Serializable {
  private val root = new TrieNode("")

  indexRegions(regions.roots)
  ignoreList.foreach(s => root.buildIndex(s, 0, new IndexItem(TermTypes.Ignore, null)))

  /** `TermIndexBuilder.indexRegions` `TermIndexBuilder.java:33-74` including
    * the 街道/镇/乡 auto-alias generation (`:41-68`). */
  private def indexRegions(rs: Seq[Region]): Unit = {
    rs.foreach { region =>
      val tii = new IndexItem(convertRegionType(region), region)
      region.orderedNameAndAlias.foreach(name => root.buildIndex(name, 0, tii))

      var autoAlias = region.name.length <= 5 && region.alias.isEmpty &&
        (region.isTown || region.name.endsWith("街道"))
      if (autoAlias && region.name.length == 5) {
        region.name.charAt(2) match {
          case '路' | '街' | '门' | '镇' | '村' | '区' => autoAlias = false
          case _ =>
        }
      }
      if (autoAlias) {
        val shortName =
          if (region.isTown) Str.head(region.name, region.name.length - 1)
          else Str.head(region.name, region.name.length - 2)
        if (shortName.length >= 2) root.buildIndex(shortName, 0, tii)
        if (region.name.endsWith("街道") || region.name.endsWith("镇"))
          root.buildIndex(shortName + "乡", 0, tii)
        if (region.name.endsWith("街道") || region.name.endsWith("乡"))
          root.buildIndex(shortName + "镇", 0, tii)
      }

      indexRegions(regions.children(region.id))
    }
  }

  /** `TermIndexBuilder.convertRegionType` `TermIndexBuilder.java:86-105`. */
  private def convertRegionType(region: Region): Char = region.regionType match {
    case RegionTypes.Province | RegionTypes.ProvinceLevelCity1 => TermTypes.Province
    case RegionTypes.City | RegionTypes.ProvinceLevelCity2     => TermTypes.City
    case RegionTypes.District | RegionTypes.CityLevelDistrict  => TermTypes.District
    case RegionTypes.PlatformL4                                => TermTypes.Street
    case RegionTypes.Town                                      => TermTypes.Town
    case RegionTypes.Village                                   => TermTypes.Village
    case RegionTypes.Street =>
      if (region.isTown) TermTypes.Town else TermTypes.Street
    case _ => TermTypes.Undefined
  }

  /** Fast pre-check for offset scans: no trie entry starts with this char.
    * deepMostQuery from such an offset cannot match anything. */
  def rootHasChar(c: Char): Boolean =
    root.children != null && root.children.containsKey(c)

  /** Deep-most backtracking search (`TermIndexBuilder.java:107-131`): longest
    * -first DFS descent, visit payload nodes, recurse after accepted items —
    * full enumeration of alternative segmentations. */
  def deepMostQuery(text: String, visitor: IndexVisitor): Unit = {
    if (text == null || text.isEmpty) return
    deepMostQuery(text, 0, visitor)
  }

  def deepMostQuery(text: String, pos: Int, visitor: IndexVisitor): Unit = {
    visitor.startRound()
    deepFirstQueryRound(text, pos, root.children, visitor)
    visitor.endRound()
  }

  private def deepFirstQueryRound(text: String, pos: Int,
      entries: java.util.HashMap[Character, TrieNode], visitor: IndexVisitor): Unit = {
    val entry = entries.get(text.charAt(pos))
    if (entry == null) return
    if (entry.children != null && pos + 1 <= text.length - 1)
      deepFirstQueryRound(text, pos + 1, entry.children, visitor)
    if (entry.hasItem) {
      if (visitor.visit(entry, text, pos)) {
        val p = visitor.positionAfterAcceptItem
        if (p + 1 <= text.length - 1) deepMostQuery(text, p + 1, visitor)
        visitor.endVisit(entry, text, p)
      }
    }
  }

  /** Exact whole-string lookup (`TermIndexBuilder.fullMatch` `:133-144`). */
  def fullMatch(text: String): Seq[IndexItem] = {
    if (text == null || text.isEmpty) return null
    fullMatch(text, 0, root.children)
  }

  @annotation.tailrec
  private def fullMatch(text: String, pos: Int,
      entries: java.util.HashMap[Character, TrieNode]): Seq[IndexItem] = {
    if (entries == null) return null
    val entry = entries.get(text.charAt(pos))
    if (entry == null) return null
    if (pos == text.length - 1) {
      if (entry.itemsBuf == null) null else entry.itemsBuf.toSeq
    } else fullMatch(text, pos + 1, entry.children)
  }
}
