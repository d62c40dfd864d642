package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), Spark-first:
  *
  *  - brute-force cosine top-k: `zip_with`/`aggregate` higher-order functions
  *    compute the dot product inside codegen (no UDF); a window `row_number`
  *    keeps top-k per query. Baseline + correctness oracle.
  *  - random-hyperplane LSH: deterministic literal hyperplanes (seeded) →
  *    sign-bit bucket key; only same-bucket pairs are scored. The 100 TB
  *    path: the bucket join replaces the full crossproduct, turning O(N·Q)
  *    into O(N·Q/2^bits) expected.
  *  - IVF-style coarse quantization sketch: same shape, bucket = argmin over
  *    a broadcast centroid list (left for a later round; LSH covers the
  *    scale path).
  */
object AnnOps {

  /** Cosine similarity between two array<float/double> columns, computed in
    * double precision, 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  /** Brute-force cosine top-k of `queries` against `corpus`.
    * Broadcast the (small) query side — the corpus streams once, no shuffle
    * until the tiny top-k window. Ties pinned by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes: `bits` planes of dimension `dim`,
    * seeded — identical on driver and executors. */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket key for an embedding column: bit b set iff
    * dot(vec, plane_b) > 0. Pure column expressions over literal planes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val vd = transform(vec, x => x.cast("double"))
    planes.zipWithIndex.map { case (p, b) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vd, planeLit, (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: queries only score corpus vectors in the same
    * bucket. Recall < 1 by design; measure against `bruteForceTopK`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      bits: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, bits)
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rank"))
  }
}
