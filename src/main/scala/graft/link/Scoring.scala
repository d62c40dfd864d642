package graft.link

import graft.model.{DocVec, TermRow}

/** The custom weighted TF-IDF cosine kernel — exact port of
  * `SimilarityComputer.computeDocSimilarity` (`SimilarityComputer.java:456-550`)
  * and `getBoostValue` (`:198-255`). Per-pair and allocation-light: called
  * row-wise after the partKey equi-join, inside whole-stage-codegen'd typed
  * stages. Accumulation runs in the query's term order — float-determinism is
  * pinned (SURVEY.md §7.4-3).
  */
object Scoring {
  // `SimilarityComputer.java:71-77`
  val BOOST_M = 1.0
  val BOOST_L = 2.0
  val BOOST_XL = 4.0
  val BOOST_S = 0.5
  val BOOST_XS = 0.25

  /** Type-overridden idf (`similarity/Term.getIdf` `Term.java:52-67`):
    * Province/City/District→0, Street→1, others as stored. */
  def effIdf(t: TermRow): Double = t.t match {
    case "1" | "2" | "3" => 0.0
    case "4"             => 1.0
    case _               => t.idf
  }

  /** `SimilarityComputer.getBoostValue` `:198-255`. When forDoc is false,
    * dterm is null by contract. */
  def boost(forDoc: Boolean, qdoc: DocVec, qterm: TermRow, ddoc: DocVec,
      dterm: TermRow): Double = {
    val t = if (forDoc) dterm.t else qterm.t
    t match {
      case "1" | "2" | "3" => BOOST_XL // province/city/district
      case "4"             => BOOST_XS // street
      case "X"             => BOOST_M  // text
      case "T" =>
        if (qdoc.town != null && ddoc.town != null) BOOST_L else BOOST_XS
      case "V" =>
        var value = BOOST_XS
        if (qdoc.village != null && ddoc.village != null && qdoc.town != null) {
          if (qdoc.town == ddoc.town) {
            if (qdoc.village == ddoc.village) value = BOOST_XL else value = BOOST_L
          } else if (ddoc.town != null) {
            value = if (!forDoc) BOOST_L else BOOST_S
          }
        }
        value
      case "R" =>
        var value = BOOST_M
        if (qdoc.town == null || qdoc.village == null) {
          if (qdoc.road != null && ddoc.road != null) value = BOOST_L
        }
        value
      case "N" =>
        var value = BOOST_M
        if (qdoc.town == null || qdoc.village == null) {
          if (qdoc.roadNumValue > 0 && ddoc.roadNumValue > 0 &&
              qdoc.road != null && qdoc.road == ddoc.road) {
            if (qdoc.roadNumValue == ddoc.roadNumValue) value = 3
            else value =
              if (forDoc)
                (1.0 / math.sqrt(math.sqrt(
                  math.abs(qdoc.roadNumValue - ddoc.roadNumValue) + 1.0))) * BOOST_L
              else 3
          }
        }
        value
      case _ => BOOST_M
    }
  }

  /** Pre-built doc-side lookup structure for repeated scoring of one candidate
    * against many queries (or vice versa). Later terms with identical text win,
    * matching `Document.buildMapCache` insertion order (`Document.java:111-117`).
    */
  final class DocSide(val doc: DocVec) {
    val byText: java.util.HashMap[String, TermRow] = {
      val m = new java.util.HashMap[String, TermRow](doc.terms.size)
      doc.terms.foreach(t => m.put(t.text, t))
      m
    }
    val roadNumTerm: TermRow = doc.terms.find(_.t == "N").orNull
  }

  /** Weighted cosine similarity of a query doc vs one candidate doc
    * (`computeDocSimilarity` `:456-550`). Returns 0 when either norm is 0. */
  def score(qdoc: DocVec, dside: DocSide): Double = {
    val ddoc = dside.doc
    // 1. Text-term coord + density pre-pass (`:461-498`).
    var qTextTermCount = 0
    var dTextTermMatchCount = 0
    var matchStart = -1
    var matchEnd = -1
    val dterms = ddoc.terms
    qdoc.terms.foreach { qterm =>
      if (qterm.t == "X") {
        qTextTermCount += 1
        var i = 0
        var broke = false
        while (i < dterms.size && !broke) {
          val term = dterms(i)
          if (term.t == "X" && term.text == qterm.text) {
            dTextTermMatchCount += 1
            if (matchStart == -1) { matchStart = i; matchEnd = i }
            else if (i > matchEnd) matchEnd = i
            else if (i < matchStart) matchStart = i
            broke = true
          }
          i += 1
        }
      }
    }
    var textTermDensity = 1.0
    var textTermCoord = 1.0
    if (qTextTermCount > 0)
      textTermCoord = math.sqrt(dTextTermMatchCount * 1.0 / qTextTermCount) * 0.5 + 0.5
    if (qTextTermCount >= 2 && dTextTermMatchCount >= 2)
      textTermDensity =
        math.sqrt(dTextTermMatchCount * 1.0 / (matchEnd - matchStart + 1)) * 0.5 + 0.5

    // 2. Accumulate over query terms in order (`:507-541`).
    var sumQD = 0.0; var sumQQ = 0.0; var sumDD = 0.0
    qdoc.terms.foreach { qterm =>
      val qboost = boost(forDoc = false, qdoc, qterm, ddoc, null)
      val qtfidf = effIdf(qterm) * qboost
      var dterm = dside.byText.get(qterm.text)
      if (dterm == null && qterm.t == "N") {
        // RoadNum fuzzy fallback: same road, different number (`:513-517`).
        if (ddoc.roadNum != null && ddoc.road != null && qterm.ref != null &&
            ddoc.road == qterm.ref)
          dterm = dside.roadNumTerm
      }
      val dboost =
        if (dterm == null) 0.0 else boost(forDoc = true, qdoc, qterm, ddoc, dterm)
      val coord = if (dterm != null && dterm.t == "X") textTermCoord else 1.0
      val density = if (dterm != null && dterm.t == "X") textTermDensity else 1.0
      val dtfidf =
        (if (dterm != null) effIdf(dterm) else effIdf(qterm)) * dboost * coord * density
      sumQQ += qtfidf * qtfidf
      sumQD += qtfidf * dtfidf
      sumDD += dtfidf * dtfidf
    }
    if (sumDD == 0 || sumQQ == 0) 0.0
    else sumQD / math.sqrt(sumQQ * sumDD)
  }

  def score(qdoc: DocVec, ddoc: DocVec): Double = score(qdoc, new DocSide(ddoc))
}
