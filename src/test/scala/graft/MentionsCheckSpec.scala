package graft

import org.scalatest.funsuite.AnyFunSuite

/** The kg_mentions partial property-oracle (round 5): kg_mentions_check is
  * the invariant aggregate DuckDB recomputes from the stage tables — here we
  * pin that every violation count is actually ZERO (the driver compare only
  * proves Spark and DuckDB agree on the counts; this proves the invariants
  * hold). Any nonzero means mention rows stopped being derivable from their
  * source turns or the division edges went inconsistent.
  */
class MentionsCheckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("mention structural invariants hold at sf0.001") {
    val row = SparkEntry.queries("kg_mentions_check")(
      spark, "/root/testdata/sf0.001").collect()(0)
    val schema = row.schema.fieldNames
    assert(row.getAs[Long]("n_mentions") > 0)
    schema.filter(_ != "n_mentions").foreach { f =>
      assert(row.getAs[Long](f) == 0L, s"invariant violated: $f = ${row.getAs[Long](f)}")
    }
  }
}
