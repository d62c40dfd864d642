package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.WlCsv
import graft.link.Linker

/** C5 accuracy regression harness + A14 ingest dedup + A2 WL-CSV scan. */
class AccuracySpec extends AnyFunSuite {
  import GoldenFixtures.{dict => d0}
  private lazy val spark = SparkTestBase.spark

  test("top-1 linking accuracy buckets (0.85 threshold) on labeled pairs") {
    val s = spark
    val bdict = s.sparkContext.broadcast(d0)
    val row = graft.kg.Accuracy.evaluate(s, bdict, n = 1500, nDistricts = 6,
      seed = 77).head()
    val nQueries = row.getAs[Long]("n_queries")
    val hs = row.getAs[Long]("high_ok"); val hf = row.getAs[Long]("high_bad")
    val ls = row.getAs[Long]("low_ok"); val lf = row.getAs[Long]("low_bad")
    val interpFail = row.getAs[Long]("interpret_fail")
    val noCand = row.getAs[Long]("no_candidates")
    assert(nQueries == 1500)
    assert(interpFail + noCand + hs + hf + ls + lf == nQueries,
      s"buckets don't partition: $row")
    assert(hs + hf + ls + lf > 1000, s"too few linked: $row")
    // The gridId label is (district, road): high-sim top-1 hits should be
    // overwhelmingly correct, and high-sim accuracy should beat low-sim.
    val highAcc = row.getAs[Double]("high_acc")
    val matchRate = row.getAs[Double]("match_rate")
    assert(highAcc > 0.9, s"high-sim accuracy $highAcc: $row")
    assert(matchRate > 0.3, s"match rate $matchRate: $row")
    if (ls + lf > 20) assert(highAcc >= row.getAs[Double]("low_acc"), row.toString)
  }

  test("exact ingest dedup keeps min id per text") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "a"), (5L, "a"), (2L, "b"), (9L, "b"), (3L, "c"))
    val out = Linker.dedupCorpus(s, s.createDataset(corpus)).collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("WL quoted-CSV parse (reference regression-data format)") {
    val line = "\"SO1234\",\"山东\",\"青岛\",\"市南区\",\"宁夏路118号\",\"10/23/2016 19:15:30\",\"G42\""
    val row = WlCsv.parse(line)
    assert(row != null)
    assert(row.orderNo == "SO1234")
    assert(row.text == "山东青岛市南区宁夏路118号")
    assert(row.gridId == "G42")
    assert(row.ts.toInstant.toString == "2016-10-23T19:15:30Z")
    assert(WlCsv.parse("not,quoted,line") == null)
    assert(WlCsv.parse("\"only\",\"three\",\"fields\"") == null)
    assert(WlCsv.parse("") == null)

    val s = spark
    import s.implicits._
    val ds = WlCsv.read(s, s.createDataset(Seq(line, "junk", line)))
    assert(ds.count() == 2)
  }
}
