package graft

import org.scalatest.funsuite.AnyFunSuite

/** The kg_towns_loop partial property-oracle (round 5): kg_towns_loop_check
  * is the invariant aggregate DuckDB recomputes from the towns_loop /
  * town_candidates / corpus stage tables — here we pin that every violation
  * count is actually ZERO (the driver compare only proves Spark and DuckDB
  * agree on the counts; this proves the invariants hold). Any nonzero means
  * the closed canonicalization loop emitted a row whose discovered id does
  * not round-trip through the id-assignment window, leaked across districts,
  * landed a Village region in the Town slot (or vice versa), or resolved a
  * surface form that never occurs in the source document.
  */
class TownsLoopCheckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("towns-loop structural invariants hold at sf0.001") {
    val row = SparkEntry.queries("kg_towns_loop_check")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val schema = row.schema.fieldNames
    assert(row.getAs[Long]("n_rows") > 0)
    schema.filter(_ != "n_rows").foreach { f =>
      assert(row.getAs[Long](f) == 0L,
        s"invariant violated: $f = ${row.getAs[Long](f)}")
    }
  }
}
