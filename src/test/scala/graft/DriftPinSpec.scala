package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift pins + cache-hygiene probe for the rows-only driver queries.
  *
  * kg_links / kg_mentions are rows-only in the driver by justified design
  * (they ARE the stage tables the other kg oracles read — an identity oracle
  * would be circular), so a pinned content hash at sf0.001 catches silent
  * semantic drift between rounds: any change to mention detection, scoring,
  * ranking, or id assignment flips the hash and must be acknowledged here.
  */
class DriftPinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def hashOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(_.toSeq.map {
      case d: Double => f"$d%.9f"
      case x         => String.valueOf(x)
    }.mkString("")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { r => md.update(r.getBytes("UTF-8")); md.update(10.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }

  test("kg_links content hash is pinned at sf0.001") {
    // Re-pinned in round 3: TopK's public tie-break moved to quantized-1e-6
    // sim + docId asc (see Linker.TopK), reordering near-tie ranks.
    assert(hashOf("kg_links") == "88b87962f578cf28daa21f0248660ff0")
  }

  test("kg_mentions content hash is pinned at sf0.001") {
    assert(hashOf("kg_mentions") == "fd7a50e5c9b3f15de55487c5fae83f86")
  }

  // The remaining rows-only driver queries are all deterministic by
  // construction (seeded hyperplanes/centroids, stub codec), so they get
  // the same silent-drift protection: any semantic change must re-pin here.
  test("q16_ann_lsh content hash is pinned at sf0.001") {
    assert(hashOf("q16_ann_lsh") == "913a088ede732564dda9f326c519edf5")
  }

  test("q20_media_features content hash is pinned at sf0.001") {
    assert(hashOf("q20_media_features") == "ed866b3fd7a839ee2d752e188fe9a583")
  }

  test("q22_embed_neardup_lsh content hash is pinned at sf0.001") {
    assert(hashOf("q22_embed_neardup_lsh") == "50955f3bba590b9be138edc5ce27d7f6")
  }

  test("q23_ann_ivf content hash is pinned at sf0.001") {
    assert(hashOf("q23_ann_ivf") == "d314385e12acc54b26759346f076619f")
  }

  test("kg queries leave no persistent RDDs behind (run-scoped caches)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    SparkEntry.queries("kg_triples")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("kg_accuracy")(spark, "/root/testdata/sf0.001").count()
    SparkEntry.queries("kg_links_explain")(spark, "/root/testdata/sf0.001").count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"kg queries leaked ${leaked.size} persistent RDDs: $leaked")
  }
}
