package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, Spark-first:
  *
  *  - exact: hash-groupBy on content (one shuffle on the hash, map-side
  *    partial aggregation; at 100 TB, group on `xxhash64(text)` so the shuffle
  *    key is 8 bytes, not the document).
  *  - n-gram Jaccard: shingle explode → inverted-index self-join on shingle →
  *    pair-count aggregation. The classic candidate-pair generator; bounded by
  *    restricting one side (query set) or by frequency-capping shingles.
  *  - MinHash + LSH banding: k permutation-hashes per shingle set via
  *    `transform` over a literal seed array (pure column expressions, no UDF),
  *    then band-hash grouping so only same-bucket pairs are compared.
  *  - SimHash: 64-bit sign-aggregated fingerprint; near-dups differ in few
  *    bits.
  *
  * All operators keep the heavy side shuffled at most once and never collect.
  */
object DedupOps {

  /** Exact dedup: keep the smallest id per identical text. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_id"), col("dup_count"), md5(col(textCol)).as("text_md5"))

  /** Character shingles (n-grams) of the raw text as an array column —
    * `transform(sequence(...))` stays inside codegen. */
  def shingles(textCol: Column, n: Int): Column =
    when(length(textCol) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(textCol) - (n - 1)),
        i => textCol.substr(i, lit(n))))

  /** Distinct-shingle explode: (id, shingle) rows. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("sid"),
        explode(array_distinct(shingles(col(textCol), n))).as("shingle"))

  /** n-gram Jaccard similarity of a query subset vs the whole corpus:
    * inverted-index join on shingle, |A∩B| by pair count, |A| and |B| from
    * per-doc distinct counts. Returns (qid, did, round(jaccard, 4)). */
  def ngramJaccard(docs: DataFrame, queryPred: Column, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val rows = shingleRows(docs, idCol, textCol, n)
    val sizes = rows.groupBy(col("sid")).agg(count(lit(1)).as("nsh"))
    val qRows = shingleRows(docs.where(queryPred), idCol, textCol, n)
      .withColumnRenamed("sid", "qid")
    val inter = qRows.join(rows, "shingle")
      .where(col("qid") =!= col("sid"))
      .groupBy(col("qid"), col("sid")).agg(count(lit(1)).as("shared"))
    inter
      .join(sizes.withColumnRenamed("sid", "qid").withColumnRenamed("nsh", "qn"), "qid")
      .join(sizes, "sid")
      .select(col("qid"), col("sid").as("did"),
        round(col("shared").cast("double") / (col("qn") + col("nsh") - col("shared")), 4)
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Deterministic 32-bit mix of a shingle (polynomial rolling hash via crc32
    * — stable, engine-portable only within Spark; dedup queries built on this
    * are rows-only checked). */
  private def shingleHash(c: Column): Column = crc32(c.cast("string"))

  /** MinHash signatures: k universal-hash permutations h_i(x)=(a_i*x+b_i) mod p
    * over distinct shingle hashes, min per permutation. Pure column exprs. */
  def minHashSignature(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    // Mersenne prime 2^31-1 keeps (h mod p) * a + b < 2^62 — no long overflow
    // under ANSI mode.
    val p = 2147483647L
    val rnd = new scala.util.Random(42)
    val params = Seq.fill(k)((math.abs(rnd.nextLong()) % (p - 1) + 1,
      math.abs(rnd.nextLong()) % p))
    val sh = shingleRows(docs, idCol, textCol, n)
      .withColumn("h", pmod(shingleHash(col("shingle")), lit(p)))
    val aggs = params.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(p))).as(s"mh_$i")
    }
    sh.groupBy(col("sid")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band the k-wide signature into `bands` rows-of-
    * `rowsPerBand`, hash each band, group by (band, hash) — docs sharing any
    * band bucket are candidates. Returns distinct (a, b) with a < b. */
  def lshCandidates(signatures: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val bandCols = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val banded = signatures.select(col("sid"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("sid"), col("bk.band"), col("bk.bh"))
    banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
        col("l.sid") < col("r.sid"))
      .select(col("l.sid").as("a"), col("r.sid").as("b"))
      .distinct()
  }

  /** SimHash: 64-bit fingerprint — for each bit, sum +1/-1 weighted by shingle
    * hash bit, take the sign. Implemented with an exploded bit-position join
    * kept fully in codegen (no UDF): 64 aggregations per doc. */
  def simHash(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
      .withColumn("h", xxhash64(col("shingle")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val sums = sh.groupBy(col("sid")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { b =>
      when(col(s"s_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("sid"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
