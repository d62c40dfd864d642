package graft.analyse

import scala.collection.mutable.ArrayBuffer

import graft.interpret.MutableAddress
import graft.model.{DocVec, TermRow, TermTypes}

/** Document (term-vector) assembly — `SimilarityComputer.analyse`
  * (`SimilarityComputer.java:110-159`): ordered terms Town, Village, Road,
  * RoadNum (with Road backref + numeric value), then Text tokens deduped
  * against all existing term texts (`addTerm` `:692-701`). IDF attachment is a
  * separate join stage (build-time job, see `graft.link.Linker`) — unlike the
  * reference's query-time lazy memoization, a semantics-preserving move since
  * IDF depends only on the partition's doc set (SURVEY.md §3.3).
  */
object DocAnalyser {
  val MissingIdf = 4.0 // `SimilarityComputer.java:77`

  def analyse(docId: Long, partKey: String, addr: MutableAddress): DocVec = {
    val d = addr.division
    val terms = new ArrayBuffer[TermRow](8)
    var town: String = null
    var village: String = null
    var road: String = null
    var roadNum: String = null
    var roadNumValue = 0

    if (d.hasTown) {
      town = d.town.name
      terms += TermRow(TermTypes.Town.toString, town, 0.0, null)
    }
    if (d.hasVillage) {
      village = d.village.name
      terms += TermRow(TermTypes.Village.toString, village, 0.0, null)
    }
    if (addr.road.nonEmpty) {
      road = addr.road
      terms += TermRow(TermTypes.Road.toString, road, 0.0, null)
    }
    if (addr.roadNum.nonEmpty) {
      roadNum = addr.roadNum
      roadNumValue = Segmenter.translateRoadNum(addr.roadNum)
      terms += TermRow(TermTypes.RoadNum.toString, roadNum, 0.0, road)
    }
    if (addr.text.nonEmpty) {
      Segmenter.segment(addr.text).foreach { token =>
        if (token != null && token.nonEmpty && !terms.exists(_.text == token))
          terms += TermRow(TermTypes.Text.toString, token, 0.0, null)
      }
    }
    DocVec(docId, partKey, terms.toSeq, town, village, road, roadNum, roadNumValue)
  }

  /** IDF-table key: RoadNum uses the composite `"<roadText>-<num>"`
    * (`generateIDFCacheEntryKey` `SimilarityComputer.java:180-187`). */
  def idfKey(t: TermRow): String =
    if (t.t == "N") {
      val num = Segmenter.translateRoadNum(t.text)
      (if (t.ref == null) "" else t.ref) + "-" + num
    } else t.text
}
