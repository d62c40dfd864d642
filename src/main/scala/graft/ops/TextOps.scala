package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, all built
  * from codegen'd `org.apache.spark.sql.functions` (no UDFs in the hot path):
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  * Each is a narrow projection — scales embarrassingly with input splits.
  */
object TextOps {

  /** Whitespace + BPE-ish token count: words = runs of non-space; subword
    * tokens approximated as ceil(chars/4) for long words. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = size(split(trim(col(textCol)), "\\s+"))
    docs.withColumn("n_words", when(length(trim(col(textCol))) === 0, 0).otherwise(words))
      .withColumn("n_tokens_est",
        (length(regexp_replace(col(textCol), "\\s+", "")) + lit(3)).divide(4)
          .cast("bigint"))
  }

  /** Quality-scoring signals: length, word stats, punctuation/digit/upper
    * ratios, stopword ratio — the standard pre-training quality heuristics. */
  def qualitySignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t)
    val nWords = size(split(trim(t), "\\s+"))
    val nPunct = len - length(regexp_replace(t, "[\\.,;:!\\?]", ""))
    val nDigit = len - length(regexp_replace(t, "[0-9]", ""))
    val stop = stopwordHits(t)
    docs
      .withColumn("n_len", len.cast("bigint"))
      .withColumn("n_words", nWords.cast("bigint"))
      .withColumn("n_punct", nPunct.cast("bigint"))
      .withColumn("n_digit", nDigit.cast("bigint"))
      .withColumn("stop_hits", stop.cast("bigint"))
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, "\\s+", "")).cast("double") /
          greatest(nWords.cast("double"), lit(1.0)), 4))
  }

  /** Occurrences of ' the '-style English stopword markers — arithmetic that
    * is bit-identical across engines (length difference, no regex). */
  def stopwordHits(t: Column): Column =
    Seq(" the ", " and ", " of ", " to ", " a ").map { w =>
      (length(t) - length(replace(t, lit(w), lit("")))) / w.length
    }.reduce(_ + _)

  /** Deterministic fingerprints: md5 content hash + a 64-bit polynomial
    * rolling hash over the normalized text (xxhash64 of lowercased,
    * space-collapsed content) for near-exact dedup buckets. */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("md5", md5(col(textCol)))
      .withColumn("norm_hash",
        xxhash64(lower(regexp_replace(col(textCol), "\\s+", " "))))

  /** Language-ID heuristic over marker-token hit counts. SQL-expressible so
    * it stays oracle-checkable; real deployments swap in a fastText-style
    * model via the same projection shape. */
  def langIdGuess(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def hits(words: Seq[String]): Column = words.map { w =>
      (length(t) - length(replace(t, lit(" " + w + " "), lit("")))) / (w.length + 2)
    }.reduce(_ + _)
    val en = hits(Seq("the", "and", "of"))
    val de = hits(Seq("der", "und", "die"))
    val es = hits(Seq("el", "los", "que"))
    val fr = hits(Seq("le", "les", "et"))
    docs.withColumn("en_hits", en.cast("bigint"))
      .withColumn("de_hits", de.cast("bigint"))
      .withColumn("es_hits", es.cast("bigint"))
      .withColumn("fr_hits", fr.cast("bigint"))
      .withColumn("lang_guess",
        when(en >= de && en >= es && en >= fr, "en")
          .when(de >= es && de >= fr, "de")
          .when(es >= fr, "es")
          .otherwise("fr"))
  }
}
