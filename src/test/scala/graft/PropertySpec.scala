package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.analyse.Segmenter
import graft.util.Str

/** Property-based invariants (SURVEY.md §5.3). */
class PropertySpec extends AnyFunSuite {
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val cjkChar = Gen.choose(0x4e00, 0x9fa5).map(_.toChar)
  private val mixedChar = Gen.frequency(
    (6, cjkChar),
    (2, Gen.alphaNumChar),
    (1, Gen.oneOf(" ,，。·;；:：、！@$%*^`~=+&'\"|_-\\/".toSeq)),
    (1, Gen.oneOf("路街道镇乡村区县市省号栋单元室甲乙丙十一二三四五六七八九".toSeq)))
  private val mixedText = Gen.listOf(mixedChar).map(_.mkString)

  test("segmentation is lossless: tokens concatenate back to the text") {
    check(Prop.forAll(mixedText) { text =>
      Segmenter.segment(text).mkString == text
    })
  }

  test("translateRoadNum is total on realistic road numbers") {
    val roadNum = for {
      n <- Gen.choose(0, 99999)
      pre <- Gen.oneOf("", "甲", "乙", "丙")
      suf <- Gen.oneOf("", "号", "号院", "号楼", "巷", "弄")
      cjk <- Gen.oneOf("", "十", "十五", "三十", "四十七", "一二三")
      useCjk <- Gen.oneOf(true, false)
    } yield if (useCjk) pre + cjk + suf else pre + n + suf
    check(Prop.forAll(roadNum) { s =>
      Segmenter.translateRoadNum(s) >= 0
    })
  }

  test("ingest field caps bound every stored doc field (rawText untouched)") {
    // `AddressPersister.java:106-115` parity: text<=100, road<=8,
    // roadNum<=10, buildingNum<=20. rawText is deliberately NOT capped
    // (documented divergence: the byte-identical round-trip invariant).
    val interp = GoldenFixtures.interpreter
    val longTail = for {
      tail <- Gen.listOfN(160, cjkChar).map(_.mkString)
    } yield "山东青岛市南区宁夏路118号" + tail
    check(Prop.forAll(longTail) { text =>
      val v = interp.newVisitor()
      val a = interp.interpret(text, v)
      (a == null) || {
        graft.link.Linker.applyIngestCaps(a)
        a.text.length <= 100 && a.road.length <= 8 &&
        a.roadNum.length <= 10 && a.buildingNum.length <= 20 &&
        a.rawText == text
      }
    })
  }

  test("interpret is deterministic and never throws on mixed text") {
    val interp = GoldenFixtures.interpreter
    check(Prop.forAll(mixedText) { text =>
      val v1 = interp.newVisitor()
      val v2 = interp.newVisitor()
      val a = interp.interpret(text, v1)
      val b = interp.interpret(text, v2)
      if (a == null) b == null
      else {
        interp.toInterpreted(0L, a) == interp.toInterpreted(0L, b) &&
        a.rawText == text // raw text is the round-trip invariant: untouched
      }
    })
  }

  test("visitor reuse equals fresh visitor (per-partition reuse safety)") {
    val interp = GoldenFixtures.interpreter
    val shared = interp.newVisitor()
    check(Prop.forAll(Gen.listOfN(3, mixedText)) { texts =>
      texts.forall { text =>
        val fresh = interp.newVisitor()
        val a = interp.interpret(text, shared)
        val b = interp.interpret(text, fresh)
        if (a == null) b == null
        else interp.toInterpreted(0L, a) == interp.toInterpreted(0L, b)
      }
    })
  }

  test("inclusive-end substring laws") {
    val s = Gen.alphaNumStr
    check(Prop.forAll(s, Gen.choose(-2, 12), Gen.choose(-2, 12)) { (t, b, e) =>
      val r = Str.substring(t, b, e)
      // never throws; result is a substring of t; bounds-safe
      r == null || t == null || t.contains(r)
    })
  }

  test("scoring is symmetric-safe: identical doc scores 1.0 against itself") {
    val interp = GoldenFixtures.interpreter
    val visitor = interp.newVisitor()
    val corpus = graft.data.SynthCorpus.corpus(GoldenFixtures.regions, 50, 3, 5L)
    var checked = 0
    corpus.foreach { case (id, text) =>
      val a = interp.interpret(text, visitor)
      if (a != null && a.division.hasCity && a.division.hasDistrict) {
        val doc0 = graft.analyse.DocAnalyser.analyse(id, "pk", a)
        // Stamp non-zero idfs so norms are non-zero.
        val doc = doc0.copy(idfs = Array.fill(doc0.nTerms)(1.5))
        val sim = graft.link.Scoring.score(doc, doc)
        assert(math.abs(sim - 1.0) < 1e-9, s"self-sim $sim for $text")
        checked += 1
      }
    }
    assert(checked > 10)
  }

  test("TopK public ordering contract: quantized-1e-6 sim desc, docId asc") {
    import graft.link.Linker
    // Within 1e-6 the full-precision order is accumulation noise; the
    // contract quantizes (half-up) so the rank order is reproducible by an
    // independent engine (the kg_links DuckDB oracle ranks by
    // round(sim, 6)). Offers arrive in adversarial order.
    val heap = new Linker.TopK(4)
    heap.offer(30L, 0.7000001)  // quantizes to 700000, ties with the next two
    heap.offer(10L, 0.70000049) // 700000 (half-up boundary stays below)
    heap.offer(20L, 0.6999996)  // 700000
    heap.offer(40L, 0.800001)   // 800001 — clear winner
    heap.offer(50L, 0.7000006)  // 700001 — beats the 700000 tie group
    val hits = heap.toHits(1L).toList
    assert(hits.map(_.docId) == List(40L, 50L, 10L, 20L),
      s"got ${hits.map(_.docId)}")
    assert(hits.map(_.rank) == List(1, 2, 3, 4))
    // Full-precision sims are preserved in the output even though ordering
    // quantizes: doc 10's emitted sim is its exact offer value.
    assert(hits.find(_.docId == 10L).get.similarity == 0.70000049)
    // Eviction at capacity also honors the contract: a new doc in the same
    // quantized band with a HIGHER docId than the worst must be rejected...
    heap.offer(60L, 0.70000012)
    assert(heap.toHits(1L).toList.map(_.docId) == List(40L, 50L, 10L, 20L))
    // ...while a lower docId in the band replaces the worst.
    heap.offer(15L, 0.69999961)
    assert(heap.toHits(1L).toList.map(_.docId) == List(40L, 50L, 10L, 15L))
  }
}
