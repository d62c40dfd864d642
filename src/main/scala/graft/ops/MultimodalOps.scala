package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal training-data plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in BATCHED per-partition
  * stages (the Scala analog of `mapInPandas`: one decoder instance per
  * partition, rows streamed through it in fixed-size batches).
  *
  * The actual codec work is STUBBED deterministically — no image/audio
  * libraries ship in this container (and none may be added). Everything
  * around the stub is real and tested: schemas, binary payload handling,
  * batch shape, partitioning, and the feature-vector output contract. A
  * deployment swaps `StubCodec` for a JNI/codec-backed implementation with
  * the same signature.
  */
object MultimodalOps {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      content: Array[Byte],
      content_len: Int, // payload size, precomputed so metadata scans skip the blob
      width: Int,
      height: Int,
      sample_rate_hz: Int,
      duration_ms: Int,
      source: String
  )

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      feature: Array[Double],
      n_frames_sampled: Int,
      decode_ms: Long
  )

  /** The codec seam. Deterministic fake: "decoding" hashes payload windows
    * into a fixed-width feature vector; "frame sampling" picks every k-th
    * byte window. Replace with a real decoder in deployment — the pipeline
    * contract (batch-in/batch-out, one instance per partition) is unchanged. */
  trait Codec extends Serializable {
    def decodeToFeatures(content: Array[Byte], dim: Int): Array[Double]
    def sampleFrames(content: Array[Byte], everyN: Int): Array[Array[Byte]]
    /** Re-encode the payload at (w, h). The stub scales the byte budget
      * with the pixel ratio (a real codec decodes, scales, re-encodes —
      * same signature, same batch shape). */
    def resize(content: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte]
  }

  object StubCodec extends Codec {
    /** Portable hash chain (round 5, like q9's minhash params): mod-p
      * arithmetic instead of i64 wraparound, so an independent engine can
      * recompute the chain without Java overflow semantics; feature
      * contributions are dyadic rationals (k/65536 - 0.5) whose double sums
      * are EXACT in any accumulation order — the q20 oracle recomputes the
      * features from the raw payload bytes in DuckDB via modular-inverse
      * prefix sums. */
    val HashP: Long = 2147483647L // 2^31 - 1 (prime)
    val HashSeed: Long = 1125899906842597L % HashP
    def decodeToFeatures(content: Array[Byte], dim: Int): Array[Double] = {
      val out = new Array[Double](dim)
      var h = HashSeed
      var i = 0
      while (i < content.length) {
        h = (h * 31 + (content(i) & 0xff)) % HashP
        out(i % dim) += (h % 65536L) / 65536.0 - 0.5
        i += 1
      }
      out
    }
    def sampleFrames(content: Array[Byte], everyN: Int): Array[Array[Byte]] = {
      val frameSize = 16
      val n = math.max(content.length / frameSize, 1)
      (0 until n by everyN).map { f =>
        content.slice(f * frameSize, math.min((f + 1) * frameSize, content.length))
      }.toArray
    }
    def resize(content: Array[Byte], fromW: Int, fromH: Int,
        toW: Int, toH: Int): Array[Byte] = {
      // Deterministic fake: sample the payload at the pixel-area ratio.
      val ratio = (toW.toLong * toH).toDouble / math.max(fromW.toLong * fromH, 1L)
      val outLen = math.max((content.length * ratio).toInt, 1)
      Array.tabulate(outLen) { i =>
        content(((i.toLong * content.length) / outLen).toInt)
      }
    }
  }

  /** Deterministic synthetic media table (seeded payloads; image/audio/video
    * mix) — distributed generation, no external data. */
  def synthesize(spark: SparkSession, n: Long, seed: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
      val modality = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + rnd.nextInt(192)
      val content = new Array[Byte](len)
      rnd.nextBytes(content)
      MediaRow(i, modality, content, content_len = len,
        width = if (modality != "audio") 16 * (1 + rnd.nextInt(4)) else 0,
        height = if (modality != "audio") 16 * (1 + rnd.nextInt(4)) else 0,
        sample_rate_hz = if (modality != "image") 16000 else 0,
        duration_ms = if (modality != "image") 1000 + rnd.nextInt(9000) else 0,
        source = s"synth-${i % 7}")
    }
  }

  /** Batched feature extraction: one codec per partition, rows processed in
    * `batchSize` groups (the batch boundary is where a real decoder would
    * vectorize). Narrow stage — scales with input splits; shuffle-free. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      codec: Codec, dim: Int, frameEvery: Int,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val t0 = System.nanoTime()
          val frames =
            if (row.modality == "video") codec.sampleFrames(row.content, frameEvery)
            else Array(row.content)
          val feat = new Array[Double](dim)
          frames.foreach { fr =>
            val f = codec.decodeToFeatures(fr, dim)
            var j = 0
            while (j < dim) { feat(j) += f(j); j += 1 }
          }
          // Sum-then-ONE-divide (round 5): per-frame contributions are
          // exactly representable, so the sum is order-independent and the
          // single division is the only rounding step — bit-reproducible by
          // the DuckDB oracle from the same payload bytes.
          var j = 0
          while (j < dim) { feat(j) /= frames.length; j += 1 }
          MediaFeatures(row.media_id, row.modality, feat, frames.length,
            (System.nanoTime() - t0) / 1000000L)
        }
      }
    }
  }

  /** Batched resize of visual media to a bounding box (aspect preserved,
    * never upscaled); audio rows pass through untouched. Same narrow
    * batched-per-partition shape as `extractFeatures` — shuffle-free, so at
    * 100 TB it scales with input splits and the payload bytes stream
    * through each task exactly once. */
  def resizeMedia(spark: SparkSession, media: Dataset[MediaRow], codec: Codec,
      maxW: Int, maxH: Int, batchSize: Int = 64): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          if (row.modality == "audio" || row.width <= 0 || row.height <= 0 ||
              (row.width <= maxW && row.height <= maxH)) row
          else {
            val scale = math.min(maxW.toDouble / row.width,
              maxH.toDouble / row.height)
            val toW = math.max((row.width * scale).toInt, 1)
            val toH = math.max((row.height * scale).toInt, 1)
            val resized =
              codec.resize(row.content, row.width, row.height, toW, toH)
            row.copy(content = resized, content_len = resized.length,
              width = toW, height = toH)
          }
        }
      }
    }
  }

  /** Metadata-only aggregation: reads `content_len` (precomputed at ingest),
    * never the payload — with parquet the binary column prunes entirely at
    * the scan (`ReadSchema` excludes `content`; asserted by PlanSpec). */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        sum(col("content_len").cast("long")).as("total_bytes"),
        avg(col("duration_ms")).as("avg_duration_ms"))
}
