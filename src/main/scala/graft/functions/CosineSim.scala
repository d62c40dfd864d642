package graft.functions

import org.apache.spark.sql.{Column, SparkSession}

/** Engine-side surface for the native SQL functions. The expression itself
  * lives in `org.apache.spark.sql.graft` (its input-type/Column plumbing
  * needs `private[sql]` Catalyst APIs); this forwarder keeps call sites in
  * the graft namespace. */
object CosineSim {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSim(a, b)
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.CosineSim.register(spark)
}

/** Native sign-bit hyperplane-LSH bucket key (see `HyperplaneBits`). */
object HyperplaneBits {
  def apply(vec: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.HyperplaneBits(vec, planes)
}

/** Confidence-ordered multi-probe LSH buckets (see `HyperplaneProbes`). */
object HyperplaneProbes {
  def apply(vec: Column, planes: Array[Array[Double]], nProbes: Int): Column =
    org.apache.spark.sql.graft.HyperplaneProbes(vec, planes, nProbes)
}
