package graft.interpret

import scala.collection.mutable.ArrayBuffer

import graft.dict.{IndexItem, IndexVisitor, Regions, TermIndex}
import graft.model.{Region, RegionTypes, TermTypes}

/** Region-extraction visitor — faithful port of the 5-rule candidate
  * arbitration + positional fault tolerance + division state machine
  * (`interpret/RegionInterpreterVisitor.java:61-557`). This is the single most
  * semantics-dense component; it drives triple P/R.
  *
  * Stateful and NOT thread-safe by design (`RegionInterpreterVisitor.java:56`);
  * instantiate one per partition inside `mapPartitions` and `reset()` between
  * rows — zero allocation per match, mirroring the reference's reuse pattern.
  */
final class RegionVisitor(regions: Regions, index: TermIndex) extends IndexVisitor {
  private var currentLevel = 0
  private var deepMostLevel = 0
  private var currentPos = -1
  private var deepMostPos = -1
  private var fullMatchCount = 0
  private var deepMostFullMatchCount = 0
  val deepMostDivision = new MDivision
  private val curDivision = new MDivision
  private val stack = new ArrayBuffer[IndexItem]()

  override def startRound(): Unit = currentLevel += 1

  /** `RegionInterpreterVisitor.visit` `:107-126`. */
  override def visit(entry: Int, text: String, pos: Int): Boolean = {
    val acceptableItem = findAcceptableItem(entry, text, pos)
    if (acceptableItem == null) return false
    val region = acceptableItem.region

    stack += acceptableItem
    if (isFullMatch(entry, region)) fullMatchCount += 1
    currentPos = positioning(region, entry, text, pos)
    updateCurrentDivisionState(region)
    true
  }

  override def positionAfterAcceptItem: Int = currentPos

  /** `RegionInterpreterVisitor.endVisit` `:140-192`. */
  override def endVisit(entry: Int, text: String, pos: Int): Unit = {
    checkDeepMost()

    val tii = stack.remove(stack.length - 1)
    currentPos = pos - index.keyLen(entry)
    val region = tii.region
    if (isFullMatch(entry, region)) fullMatchCount += 1
    if (tii.termType == TermTypes.Ignore) return

    // Scan remaining stack for street/town/village and the least of P/C/D.
    var least: Region = null
    var street: Region = null; var town: Region = null; var village: Region = null
    var i = 0
    while (i < stack.length) {
      val it = stack(i)
      if (it.termType != TermTypes.Ignore) {
        val r = it.region
        r.regionType match {
          case RegionTypes.Street | RegionTypes.PlatformL4 => street = r
          case RegionTypes.Town    => town = r
          case RegionTypes.Village => village = r
          case _ =>
            if (least == null) least = r
            else if (r.regionType > least.regionType) least = r
        }
      }
      i += 1
    }

    if (street == null) curDivision.street = null
    if (town == null) curDivision.setTown(null)
    if (village == null) curDivision.village = null
    if (curDivision.hasStreet || curDivision.hasTown || curDivision.hasVillage) return
    if (least != null) {
      least.regionType match {
        case RegionTypes.Province | RegionTypes.ProvinceLevelCity1 =>
          curDivision.city = null; curDivision.district = null
        case RegionTypes.City | RegionTypes.ProvinceLevelCity2 =>
          curDivision.district = null
        case _ =>
      }
      return
    }
    curDivision.province = null
    curDivision.city = null
    curDivision.district = null
  }

  override def endRound(): Unit = {
    checkDeepMost()
    currentLevel -= 1
  }

  /** Pointer adjustment after ambiguous-char alias match
    * (`RegionInterpreterVisitor.positioning` `:206-225`). */
  private def positioning(acceptedRegion: Region, entry: Int,
      text: String, pos: Int): Int = {
    if (acceptedRegion == null) return pos
    if ((acceptedRegion.regionType == RegionTypes.City ||
         acceptedRegion.regionType == RegionTypes.District ||
         acceptedRegion.regionType == RegionTypes.Street) &&
        !isFullMatch(entry, acceptedRegion) && pos + 1 <= text.length - 1) {
      val c = text.charAt(pos + 1)
      if (c == '市' || c == '县' || c == '区' || c == '镇' || c == '乡') {
        val kids = regions.children(acceptedRegion.id)
        var i = 0
        while (i < kids.length) {
          if (kids(i).name.charAt(0) == c) return pos
          i += 1
        }
        return pos + 1
      }
    }
    pos
  }

  /** 5-rule candidate arbitration
    * (`RegionInterpreterVisitor.findAcceptableItem` `:234-390`). */
  private def findAcceptableItem(entry: Int, text: String, pos: Int): IndexItem = {
    var mostPriority = -1
    var acceptableItem: IndexItem = null
    var idx = index.itemsFrom(entry)
    val untilIdx = index.itemsUntil(entry)
    while (idx < untilIdx) {
      val item = index.item(idx)
      idx += 1
      if (isAcceptableItemType(item.termType)) {
        if (item.termType == TermTypes.Ignore) {
          if (acceptableItem == null) { mostPriority = 4; acceptableItem = item }
        } else {
          val region = item.region
          if (!curDivision.hasProvince) {
            // Never matched anything yet: pick the highest level seen so far.
            if (mostPriority == -1) { mostPriority = region.regionType; acceptableItem = item }
            if (region.regionType < mostPriority) {
              mostPriority = region.regionType; acceptableItem = item
            }
          } else {
            var skip = false
            // High-priority exclusion: street/town alias match followed by a
            // region/road keyword char (万子湖乡/万子湖村 and 均和街/新市镇 cases).
            if (!isFullMatch(entry, region) && pos + 1 <= text.length - 1 &&
                (region.regionType == RegionTypes.Street ||
                 region.regionType == RegionTypes.Town)) {
              text.charAt(pos + 1) match {
                case '区' | '县' | '乡' | '镇' | '村' | '街' | '路' => skip = true
                case '大' =>
                  if (pos + 2 <= text.length - 1) {
                    val c = text.charAt(pos + 2)
                    if (c == '街' || c == '道') skip = true
                  }
                case _ =>
              }
            }
            if (!skip) {
              // 1. Exact next level under the current least region.
              if (region.parentId == curDivision.leastRegion.id) {
                return item
              }
              // 2. One missing level (city or district).
              var continued = false
              if (mostPriority == -1 || mostPriority > 2) {
                val parent = regions.get(region.parentId)
                if (!curDivision.hasCity && curDivision.hasProvince &&
                    region.regionType == RegionTypes.District && parent != null &&
                    curDivision.province.id == parent.parentId) {
                  mostPriority = 2; acceptableItem = item; continued = true
                }
                if (!continued && !curDivision.hasDistrict && curDivision.hasCity &&
                    (region.regionType == RegionTypes.Street ||
                     region.regionType == RegionTypes.Town ||
                     region.regionType == RegionTypes.PlatformL4 ||
                     region.regionType == RegionTypes.Village) && parent != null &&
                    curDivision.city.id == parent.parentId) {
                  mostPriority = 2; acceptableItem = item; continued = true
                }
              }
              // 3. Repeated region mention.
              if (!continued && (mostPriority == -1 || mostPriority > 3)) {
                if ((curDivision.hasProvince && curDivision.province.id == region.id) ||
                    (curDivision.hasCity && curDivision.city.id == region.id) ||
                    (curDivision.hasDistrict && curDivision.district.id == region.id) ||
                    (curDivision.hasStreet && curDivision.street.id == region.id) ||
                    (curDivision.hasTown && curDivision.town.id == region.id) ||
                    (curDivision.hasVillage && curDivision.village.id == region.id)) {
                  mostPriority = 3; acceptableItem = item; continued = true
                }
              }
              // 4. Fault tolerance.
              if (!continued && (mostPriority == -1 || mostPriority > 4)) {
                // 4.1 Province-direct city-level district (新疆→阿拉尔市).
                if (region.regionType == RegionTypes.CityLevelDistrict &&
                    curDivision.hasProvince &&
                    curDivision.province.id == region.parentId) {
                  mostPriority = 4; acceptableItem = item; continued = true
                }
                // 4.2 Wrong city for a full-name-matched district of the same
                // province: overwrite the city.
                if (!continued && region.regionType == RegionTypes.District &&
                    curDivision.hasCity && curDivision.hasProvince &&
                    isFullMatch(entry, region) &&
                    curDivision.city.id != region.parentId) {
                  val city = regions.get(region.parentId)
                  if (city != null && city.parentId == curDivision.province.id) {
                    mostPriority = 4; acceptableItem = item; continued = true
                  }
                }
              }
              // 5. Street/town/village under current city/district.
              if (!continued &&
                  (region.regionType == RegionTypes.Street ||
                   region.regionType == RegionTypes.Town ||
                   region.regionType == RegionTypes.Village ||
                   region.regionType == RegionTypes.PlatformL4)) {
                if (!curDivision.hasDistrict) {
                  var parent = regions.get(region.parentId) // district
                  if (parent != null) parent = regions.get(parent.parentId) // city
                  if (parent != null && curDivision.hasCity &&
                      curDivision.city.id == parent.id) {
                    mostPriority = 5; acceptableItem = item
                  }
                } else if (region.parentId == curDivision.district.id) {
                  mostPriority = 5; acceptableItem = item
                }
              }
            }
          }
        }
      }
    }
    acceptableItem
  }

  /** `RegionInterpreterVisitor.isFullMatch` `:391-399`. */
  private def isFullMatch(entry: Int, region: Region): Boolean = {
    if (region == null) return false
    if (index.keyLen(entry) == region.name.length) return true
    if (region.regionType == RegionTypes.Street && region.name.endsWith("街道") &&
        region.name.length == index.keyLen(entry) + 1) return true
    false
  }

  private def isAcceptableItemType(t: Char): Boolean = t match {
    case TermTypes.Province | TermTypes.City | TermTypes.District |
         TermTypes.Street | TermTypes.Town | TermTypes.Village |
         TermTypes.Ignore => true
    case _ => false
  }

  /** `RegionInterpreterVisitor.updateCurrentDivisionState` `:423-471`. */
  private def updateCurrentDivisionState(region: Region): Unit = {
    if (region == null) return
    if (region.equals(curDivision.province) || region.equals(curDivision.city) ||
        region.equals(curDivision.district) || region.equals(curDivision.street) ||
        region.equals(curDivision.town) || region.equals(curDivision.village)) return

    region.regionType match {
      case RegionTypes.Province | RegionTypes.ProvinceLevelCity1 =>
        curDivision.province = region
        curDivision.city = null
      case RegionTypes.City | RegionTypes.ProvinceLevelCity2 =>
        curDivision.city = region
        if (!curDivision.hasProvince) curDivision.province = regions.get(region.parentId)
      case RegionTypes.CityLevelDistrict =>
        curDivision.city = region
        curDivision.district = region
        if (!curDivision.hasProvince) curDivision.province = regions.get(region.parentId)
      case RegionTypes.District =>
        curDivision.district = region
        // A matched district forces city re-derivation via parent lookups.
        curDivision.city = regions.get(curDivision.district.parentId)
        if (!curDivision.hasProvince)
          curDivision.province = regions.get(curDivision.city.parentId)
      case RegionTypes.Street | RegionTypes.PlatformL4 =>
        if (!curDivision.hasStreet) curDivision.street = region
        if (!curDivision.hasDistrict) curDivision.district = regions.get(region.parentId)
      case RegionTypes.Town =>
        if (!curDivision.hasTown) curDivision.setTown(region)
        if (!curDivision.hasDistrict) curDivision.district = regions.get(region.parentId)
      case RegionTypes.Village =>
        if (!curDivision.hasVillage) curDivision.village = region
        if (!curDivision.hasDistrict) curDivision.district = regions.get(region.parentId)
      case _ =>
    }
  }

  /** `RegionInterpreterVisitor.checkDeepMost` `:472-484`. */
  private def checkDeepMost(): Unit = {
    if (stack.length > deepMostLevel) {
      deepMostLevel = stack.length
      deepMostPos = currentPos
      deepMostFullMatchCount = fullMatchCount
      deepMostDivision.copyFrom(curDivision)
    }
  }

  def hasResult: Boolean = deepMostPos > 0 && deepMostDivision.hasDistrict
  def resultEndPosition: Int = deepMostPos
  def resultMatchCount: Int = deepMostLevel
  def resultFullMatchCount: Int = deepMostFullMatchCount
  def resultDivision: MDivision = deepMostDivision

  def reset(): Unit = {
    currentLevel = 0; deepMostLevel = 0; currentPos = -1; deepMostPos = -1
    fullMatchCount = 0; deepMostFullMatchCount = 0
    deepMostDivision.clearAll()
    curDivision.clearAll()
    stack.clear()
  }
}
