package graft.analyse

import scala.collection.mutable.ArrayBuffer

import graft.interpret.MutableAddress
import graft.model.{DocVec, TermRow}

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

  def analyse(docId: Long, partKey: String, addr: MutableAddress,
      segmenter: Segmentation = Segmenter): DocVec = {
    val d = addr.division
    val types = new java.lang.StringBuilder(8)
    val texts = new ArrayBuffer[String](8)
    var town: String = null
    var village: String = null
    var road: String = null
    var roadNum: String = null
    var roadNumValue = 0

    if (d.hasTown) {
      town = d.town.name
      types.append('T'); texts += town
    }
    if (d.hasVillage) {
      village = d.village.name
      types.append('V'); texts += village
    }
    if (addr.road.nonEmpty) {
      road = addr.road
      types.append('R'); texts += road
    }
    if (addr.roadNum.nonEmpty) {
      roadNum = addr.roadNum
      roadNumValue = Segmenter.translateRoadNum(addr.roadNum)
      types.append('N'); texts += roadNum
    }
    if (addr.text.nonEmpty) {
      segmenter.segment(addr.text).foreach { token =>
        if (token != null && token.nonEmpty && !texts.contains(token)) {
          types.append('X'); texts += token
        }
      }
    }
    DocVec(docId, partKey, types.toString, texts.toArray,
      new Array[Double](texts.length), town, village, road, roadNum, roadNumValue)
  }

  /** IDF-table key: RoadNum uses the composite `"<roadText>-<num>"`
    * (`generateIDFCacheEntryKey` `SimilarityComputer.java:180-187`). */
  def idfKey(t: TermRow): String =
    if (t.t == "N") {
      val num = Segmenter.translateRoadNum(t.text)
      (if (t.ref == null) "" else t.ref) + "-" + num
    } else t.text

  /** Positional variant over the flat DocVec layout. */
  def idfKeyAt(doc: DocVec, i: Int): String =
    if (doc.termType(i) == 'N') {
      val num = Segmenter.translateRoadNum(doc.texts(i))
      (if (doc.road == null) "" else doc.road) + "-" + num
    } else doc.texts(i)

  /** Return a copy with idf stamped per term from the partition IDF map;
    * missing keys get `MissingIdf` (`SimilarityComputer.java:146-154`). */
  def stampIdf(doc: DocVec,
      idfMap: java.util.HashMap[String, java.lang.Double]): DocVec = {
    val n = doc.nTerms
    val idfs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = idfMap.get(idfKeyAt(doc, i))
      idfs(i) = if (v == null) MissingIdf else v.doubleValue()
      i += 1
    }
    doc.copy(idfs = idfs)
  }
}
