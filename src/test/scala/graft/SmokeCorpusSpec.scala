package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's 168-real-address exploratory corpus
  * (`src/test/resources/test-addresses.txt`, exercised no-crash at
  * `AddressInterpretTest.java:509-551`) run through the full interpret +
  * analyse path: no exceptions, high region-resolution rate, deterministic. */
class SmokeCorpusSpec extends AnyFunSuite {
  import GoldenFixtures._

  private def lines: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/test-addresses.txt")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map(_.trim).filter(_.nonEmpty).toList
    finally src.close()
  }

  test("interpret the real-address smoke corpus: no crashes, high resolution") {
    val visitor = interpreter.newVisitor()
    var total = 0
    var resolved = 0
    var withRoad = 0
    val results = lines.map { text =>
      total += 1
      val addr = interpreter.interpret(text, visitor)
      assert(addr != null, text)
      if (addr.division.hasCity && addr.division.hasDistrict) resolved += 1
      if (addr.road.nonEmpty) withRoad += 1
      // Analyse must also be total.
      val pk = interpreter.partKey(addr)
      if (pk != null) graft.analyse.DocAnalyser.analyse(0L, pk, addr)
      interpreter.toInterpreted(0L, addr)
    }
    assert(total == 168)
    assert(resolved >= 160, s"only $resolved/$total resolved to city+district")
    assert(withRoad > 40, s"only $withRoad road extractions")

    // Deterministic on a second pass with a fresh visitor.
    val v2 = interpreter.newVisitor()
    val second = lines.map { text =>
      interpreter.toInterpreted(0L, interpreter.interpret(text, v2))
    }
    assert(results == second)
  }
}
