package graft.interpret

import graft.model.{Region, RegionTypes}

/** Mutable 6-level division state (`Division.java:6-11`). The town accessor
  * falls back to street when `street.isTown` (`Division.java:107-111`); setTown
  * routes Street/PlatformL4 values to the street slot (`Division.java:117-133`).
  */
final class MDivision {
  var province: Region = null
  var city: Region = null
  var district: Region = null
  var street: Region = null
  private var townSlot: Region = null
  var village: Region = null

  def hasProvince: Boolean = province != null
  def hasCity: Boolean = city != null
  def hasDistrict: Boolean = district != null
  def hasStreet: Boolean = street != null
  def hasTown: Boolean = town != null
  def hasVillage: Boolean = village != null

  def town: Region = {
    if (townSlot != null) townSlot
    else if (street == null) null
    else if (street.isTown) street
    else null
  }

  def setTown(value: Region): Unit = {
    if (value == null) { townSlot = null; return }
    value.regionType match {
      case RegionTypes.Town => townSlot = value
      case RegionTypes.Street | RegionTypes.PlatformL4 => street = value
      case _ => townSlot = null
    }
  }

  /** `Division.leastRegion()` `Division.java:35-42`. */
  def leastRegion: Region = {
    if (hasVillage) village
    else if (hasTown) town
    else if (hasStreet) street
    else if (hasDistrict) district
    else if (hasCity) city
    else province
  }

  def copyFrom(o: MDivision): Unit = {
    province = o.province; city = o.city; district = o.district
    street = o.street; townSlot = o.townSlot; village = o.village
  }

  def clearAll(): Unit = {
    province = null; city = null; district = null
    street = null; townSlot = null; village = null
  }
}
