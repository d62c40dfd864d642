package graft.dict

import scala.collection.mutable.ArrayBuffer

import graft.model.{Region, RegionTypes, TermTypes}
import graft.util.Str

/** Trie payload: (term type, optional region). Ignore items carry no region
  * (`index/TermIndexItem.java:10-12`). */
final class IndexItem(val termType: Char, val region: Region) extends Serializable

/** Visitor contract for the deep-most backtracking search
  * (`index/TermIndexVisitor.java:13-43`). Nodes are integer ids into the
  * flattened trie (`TermIndex`). */
trait IndexVisitor {
  def startRound(): Unit
  def visit(node: Int, text: String, pos: Int): Boolean
  def positionAfterAcceptItem: Int
  def endVisit(node: Int, text: String, pos: Int): Unit
  def endRound(): Unit
}

/** Character trie over all region names + aliases — the reference's inverted
  * index (`index/TermIndexBuilder.java`), built driver-side and broadcast.
  *
  * Storage is FLATTENED into parallel arrays (child char/node ranges sorted
  * for binary search, item ranges, key lengths) instead of a ~300k-node
  * object graph with per-node HashMaps: trie traversal is the hot inner loop
  * of interpretation AND of per-offset mention scanning, and pointer chasing
  * through a ~100 MB object graph is memory-bound at high core counts. The
  * flat form is also several times cheaper to broadcast (primitive arrays
  * serialize without per-object overhead).
  *
  * Item insertion order per node matches the reference exactly (region-tree
  * DFS in child-id order, names longest-first, auto-aliases after, ignore
  * list last) because visitor arbitration is order-sensitive.
  */
final class TermIndex(regions: Regions, ignoreList: Seq[String]) extends Serializable {

  // ---- mutable build form (discarded after flatten) -----------------------
  private final class BNode {
    var items: ArrayBuffer[IndexItem] = null
    var children: java.util.TreeMap[Character, BNode] = null
    var keyLen: Int = 0
  }

  // ---- flat form -----------------------------------------------------------
  // node i: children are childChar/childNode[childStart(i) until childStart(i+1)]
  //         (sorted by char); items are itemArr[itemStart(i) until itemStart(i+1)].
  private var childStart: Array[Int] = _
  private var childChar: Array[Char] = _
  private var childNode: Array[Int] = _
  private var itemStart: Array[Int] = _
  private var itemArr: Array[IndexItem] = _
  private var keyLenArr: Array[Int] = _
  private var rootId: Int = 0

  locally {
    val root = new BNode
    def buildIndex(node: BNode, text: String, pos: Int, item: IndexItem): Unit = {
      if (text == null || text.isEmpty || pos < 0 || pos >= text.length) return
      val c = text.charAt(pos)
      if (node.children == null) node.children = new java.util.TreeMap[Character, BNode]
      var entry = node.children.get(c)
      if (entry == null) {
        entry = new BNode
        entry.keyLen = pos + 1
        node.children.put(c, entry)
      }
      if (pos == text.length - 1) {
        if (entry.items == null) entry.items = new ArrayBuffer[IndexItem](1)
        entry.items += item
      } else buildIndex(entry, text, pos + 1, item)
    }

    // `TermIndexBuilder.indexRegions` `TermIndexBuilder.java:33-74` including
    // the 街道/镇/乡 auto-alias generation (`:41-68`).
    def indexRegions(rs: Seq[Region]): Unit = rs.foreach { region =>
      val tii = new IndexItem(convertRegionType(region), region)
      region.orderedNameAndAlias.foreach(name => buildIndex(root, name, 0, tii))
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
        if (shortName.length >= 2) buildIndex(root, shortName, 0, tii)
        if (region.name.endsWith("街道") || region.name.endsWith("镇"))
          buildIndex(root, shortName + "乡", 0, tii)
        if (region.name.endsWith("街道") || region.name.endsWith("乡"))
          buildIndex(root, shortName + "镇", 0, tii)
      }
      indexRegions(regions.children(region.id))
    }

    indexRegions(regions.roots)
    ignoreList.foreach(s => buildIndex(root, s, 0, new IndexItem(TermTypes.Ignore, null)))

    // Flatten (BFS id assignment; children already char-sorted via TreeMap).
    val nodes = new ArrayBuffer[BNode]()
    val queue = new java.util.ArrayDeque[BNode]()
    queue.add(root)
    while (!queue.isEmpty) {
      val n = queue.poll()
      nodes += n
      if (n.children != null) {
        val it = n.children.values().iterator()
        while (it.hasNext) queue.add(it.next())
      }
    }
    val idOf = new java.util.IdentityHashMap[BNode, Integer]()
    var i = 0
    while (i < nodes.length) { idOf.put(nodes(i), i); i += 1 }

    val nN = nodes.length
    childStart = new Array[Int](nN + 1)
    itemStart = new Array[Int](nN + 1)
    keyLenArr = new Array[Int](nN)
    val cChars = new ArrayBuffer[Char]()
    val cNodes = new ArrayBuffer[Int]()
    val itemsB = new ArrayBuffer[IndexItem]()
    i = 0
    while (i < nN) {
      val n = nodes(i)
      childStart(i) = cChars.length
      itemStart(i) = itemsB.length
      keyLenArr(i) = n.keyLen
      if (n.children != null) {
        val it = n.children.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          cChars += e.getKey.charValue()
          cNodes += idOf.get(e.getValue).intValue()
        }
      }
      if (n.items != null) itemsB ++= n.items
      i += 1
    }
    childStart(nN) = cChars.length
    itemStart(nN) = itemsB.length
    childChar = cChars.toArray
    childNode = cNodes.toArray
    itemArr = itemsB.toArray
    rootId = idOf.get(root).intValue()
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

  // ---- flat accessors ------------------------------------------------------
  @inline private def child(node: Int, c: Char): Int = {
    var lo = childStart(node)
    var hi = childStart(node + 1)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val mc = childChar(mid)
      if (mc < c) lo = mid + 1
      else if (mc > c) hi = mid
      else return childNode(mid)
    }
    -1
  }
  @inline def hasItem(node: Int): Boolean = itemStart(node) < itemStart(node + 1)
  @inline def itemsFrom(node: Int): Int = itemStart(node)
  @inline def itemsUntil(node: Int): Int = itemStart(node + 1)
  @inline def item(i: Int): IndexItem = itemArr(i)
  @inline def keyLen(node: Int): Int = keyLenArr(node)
  @inline private def hasChildren(node: Int): Boolean =
    childStart(node) < childStart(node + 1)

  /** Fast pre-check for offset scans: no trie entry starts with this char. */
  def rootHasChar(c: Char): Boolean = child(rootId, c) >= 0

  /** Deep-most backtracking search (`TermIndexBuilder.java:107-131`): longest
    * -first DFS descent, visit payload nodes, recurse after accepted items —
    * full enumeration of alternative segmentations. */
  def deepMostQuery(text: String, visitor: IndexVisitor): Unit = {
    if (text == null || text.isEmpty) return
    deepMostQuery(text, 0, visitor)
  }

  def deepMostQuery(text: String, pos: Int, visitor: IndexVisitor): Unit = {
    visitor.startRound()
    deepFirstQueryRound(text, pos, rootId, visitor)
    visitor.endRound()
  }

  private def deepFirstQueryRound(text: String, pos: Int, parent: Int,
      visitor: IndexVisitor): Unit = {
    val entry = child(parent, text.charAt(pos))
    if (entry < 0) return
    if (hasChildren(entry) && pos + 1 <= text.length - 1)
      deepFirstQueryRound(text, pos + 1, entry, visitor)
    if (hasItem(entry)) {
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
    var node = rootId
    var pos = 0
    while (pos < text.length) {
      node = child(node, text.charAt(pos))
      if (node < 0) return null
      pos += 1
    }
    if (!hasItem(node)) null
    else itemArr.slice(itemStart(node), itemStart(node + 1)).toSeq
  }
}
