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

  /** Cosine similarity between two array<float> columns, double precision,
    * 0 when either norm is 0 — the native codegen'd Catalyst expression
    * (`graft.functions.CosineSim`). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** The original higher-order-function formulation — kept as the
    * independent semantics witness for the native expression (OpsSpec pins
    * native == HOF to 1e-12). HOFs run the per-element lambda outside
    * codegen, ~20× slower per pair; never used in the hot paths. */
  def cosineHof(a: Column, b: Column): Column = {
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
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] =
    // Canonical generator lives with the expressions so the SQL surface
    // (`hyperplane_bits(v, dim, bits, seed)`) buckets identically.
    org.apache.spark.sql.graft.LshKernel.hyperplanes(dim, bits, seed)

  /** Sign-bit LSH bucket key for an embedding column: bit b set iff
    * dot(vec, plane_b) > 0 — the native codegen'd Catalyst expression
    * (round 2 measured the HOF formulation as the q16/q22 hot-path constant:
    * bits×tables interpreted lambdas per corpus row). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.HyperplaneBits(vec, planes)

  /** The original higher-order-function formulation — kept as the
    * independent semantics witness (OpsSpec pins native == HOF exactly:
    * both accumulate the same doubles in the same order). */
  def lshBucketHof(vec: Column, planes: Array[Array[Double]]): Column = {
    val vd = transform(vec, x => x.cast("double"))
    planes.zipWithIndex.map { case (p, b) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vd, planeLit, (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: queries only score corpus vectors sharing a
    * bucket in at least one hash table. Recall < 1 by design; measured
    * against `bruteForceTopK` by `recallVsBrute` (AnnSpec pins a floor).
    *
    * Recall levers (AND-OR amplification; Leskovec et al., MMDS ch. 3):
    *  - `tables`: L independent hyperplane tables — a pair is a candidate if
    *    it collides in ANY table. Recall 1-(1-p^bits)^L. Cost: corpus rows
    *    replicate ×L through the bucket join (the standard LSH space/compute
    *    trade; at 100 TB this is the knob you budget, and the alternative
    *    IVF layout shares the same join shape).
    *  - `probes`: per table, also probe the hamming-1 buckets flipping the
    *    `probes-1` LEAST-CONFIDENT bits (smallest |dot| — Lv et al.
    *    multi-probe, VLDB 2007): the near-boundary sign bits are the ones a
    *    true neighbor most plausibly landed across. Replicates only the
    *    tiny broadcast QUERY side, corpus untouched.
    * Both leave the scale shape intact: a bucket join, never a cross
    * product. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      bits: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 1, tables: Int = 1): DataFrame = {
    val planes = hyperplanes(dim, bits * tables)
    def tablePlanes(t: Int) = planes.slice(t * bits, (t + 1) * bits)
    // Key = table*2^bits + bucket: one join column across all tables.
    val cKeys = (0 until tables).map { t =>
      lshBucket(col(vecCol), tablePlanes(t)) + lit(t.toLong << bits)
    }
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      explode(array(cKeys: _*)).as("bucket"))
    val qKeys = (0 until tables).map { t =>
      // Confidence-ordered probe buckets, shifted into this table's key
      // space (the transform HOF is fine here: a handful of QUERY rows).
      transform(
        graft.functions.HyperplaneProbes(col(vecCol), tablePlanes(t), probes),
        b => b + lit(t.toLong << bits))
    }
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      explode(flatten(array(qKeys: _*))).as("bucket"))
    val joined = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    // Single table + single probe cannot produce duplicate pairs — skip the
    // dedup shuffle there.
    val scored = if (tables > 1 || probes > 1) joined.distinct() else joined
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** IVF (inverted-file) coarse quantization — the second standard ANN index
    * family next to LSH, same scale shape (a cell join, never a cross
    * product):
    *
    *  - centroids: a DETERMINISTIC hash-ordered sample of the corpus itself
    *    (smallest xxhash64(id) wins) — no Lloyd iterations, because
    *    floating-point mean accumulation is partitioning-order-dependent and
    *    this engine pins bit-identical results under ANY partitioning; a
    *    sampled quantizer trades a little cell balance for that guarantee.
    *  - assignment: argmax cosine to the broadcast centroid table, one pass
    *    per partition (the centroid table is tiny: nCells × dim doubles).
    *  - queries probe their `nProbe` nearest cells; only those cells' corpus
    *    vectors are scored exactly. Expected cost O(N·Q·nProbe/nCells).
    *
    * Recall < 1 by design; measured against `bruteForceTopK` in OpsSpec. */
  /** The deterministic IVF coarse quantizer: a hash-ordered corpus sample
    * (smallest xxhash64(id) wins), L2-normalized, indexed by ascending
    * source id. Exposed so the DuckDB oracle can materialize the exact
    * centroid table `ivfTopK` quantizes against and recompute cell
    * assignment + probing + cosines independently (stage-table pattern). */
  def ivfCentroids(corpus: DataFrame, nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        xxhash64(col(idCol)).as("h"))
      .orderBy(col("h"), col("id")).limit(nCells)
      .select("id", "v").as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((_, v), i) =>
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        (i, if (n == 0) d else d.map(_ / n))
      }
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int,
      nProbe: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = ivfCentroids(corpus, nCells, idCol, vecCol)
    val bc = spark.sparkContext.broadcast(centroids)

    def cellsOf(vec: Array[Float], top: Int): Array[Int] = {
      val cs = bc.value
      // cosine to unit centroids = dot / |vec|; |vec| constant per row, so
      // argmax over dot alone; ties pinned by cell index.
      val dots = cs.map { case (ci, c) =>
        var s = 0.0; var i = 0
        while (i < c.length && i < vec.length) { s += c(i) * vec(i); i += 1 }
        (ci, s)
      }
      dots.sortBy { case (ci, s) => (-s, ci) }.take(top).map(_._1)
    }

    val cTyped = corpus.select(col(idCol).cast("long").as("nid"),
      col(vecCol).as("nvec")).as[(Long, Array[Float])]
    val cCells = cTyped.mapPartitions(_.map { case (id, v) =>
      (id, v, cellsOf(v, 1)(0))
    }).toDF("nid", "nvec", "cell")
    val qTyped = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).as("qvec")).as[(Long, Array[Float])]
    val qCells = qTyped.mapPartitions(_.flatMap { case (id, v) =>
      cellsOf(v, nProbe).map(c => (id, v, c))
    }).toDF("qid", "qvec", "cell")

    val scored = cCells.join(broadcast(qCells), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Top-k recall of an ANN result vs the brute-force result: the fraction of
    * true top-k (qid, nid) pairs the ANN run recovered. */
  def recallVsBrute(ann: DataFrame, brute: DataFrame): Double = {
    val hits = brute.select("qid", "nid")
      .join(ann.select("qid", "nid"), Seq("qid", "nid"), "left_semi").count()
    val total = brute.count()
    if (total == 0) 1.0 else hits.toDouble / total
  }
}
