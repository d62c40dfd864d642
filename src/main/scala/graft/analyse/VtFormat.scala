package graft.analyse

import graft.model.DocVec
import graft.util.Str

/** The reference's `.vt` vector-cache line format, kept ONLY as a
  * golden-format compatibility surface (the storage layer is parquet):
  * `955163$R和平里中街|N17号|X天|X元|…` — serialize at
  * `SimilarityComputer.java:331-342`, deserialize at `:350-380`. Street
  * serializes as '4' per `TermType.java:31` (the reference test's stale `S`
  * expectation is documented in SURVEY.md §5). */
object VtFormat {

  def serialize(doc: DocVec): String = {
    val sb = new java.lang.StringBuilder
    sb.append(doc.docId).append('$')
    var i = 0
    while (i < doc.nTerms) {
      if (i > 0) sb.append('|')
      sb.append(doc.termType(i)).append(doc.texts(i))
      i += 1
    }
    sb.toString
  }

  /** Deserialize one line; partKey is not part of the line format (the file
    * name carried it in the reference) and must be supplied. */
  def deserialize(line: String, partKey: String): DocVec = {
    if (line == null || line.trim.isEmpty) return null
    val t1 = line.trim.split("\\$")
    if (t1.length != 2) return null
    val docId = java.lang.Long.parseLong(t1(0))
    val t2 = t1(1).split("\\|")
    val types = new java.lang.StringBuilder(t2.length)
    val texts = Array.newBuilder[String]
    var town: String = null
    var village: String = null
    var road: String = null
    var roadNum: String = null
    var roadNumValue = 0
    t2.foreach { termStr =>
      if (termStr != null && termStr.nonEmpty) {
        val c = termStr.charAt(0)
        val text = Str.substring(termStr, 1)
        types.append(c)
        texts += text
        c match {
          case 'T' => town = text
          case 'V' => village = text
          case 'R' => road = text
          case 'N' =>
            roadNum = text
            roadNumValue = Segmenter.translateRoadNum(text)
          case _ =>
        }
      }
    }
    val textArr = texts.result()
    DocVec(docId, partKey, types.toString, textArr,
      new Array[Double](textArr.length), town, village, road, roadNum, roadNumValue)
  }
}
