package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.data.WlCsv
import graft.link.Dict

/** File-driven ingest CLI — the reference's `misc/ImportAddress.main` role
  * (external address file → checkpointed job) recast as a spark-submit main:
  *
  *   ImportMain <corpus> <turnsParquet> <outRoot> [topN] [parallelism]
  *
  * `corpus` is a plain text file (one raw address per line; ids are stable
  * line numbers) or a WL quoted-CSV file (`*.csv`, the reference's
  * regression-data format — `misc/RegressionTestImportWLData.java`).
  * `turnsParquet` is the input-hint transcript table. Every stage
  * checkpoints under `outRoot` and re-runs resume from the first missing
  * stage (StageRunner lineage + metrics).
  */
object ImportMain {

  /** Stable line-number ids: zipWithIndex over the file's split order is
    * deterministic for a fixed input file. */
  def corpusFromFile(spark: SparkSession,
      path: String): Dataset[(Long, String)] = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    if (path.endsWith(".csv"))
      WlCsv.read(spark, lines).map(r => r.text)
        .rdd.zipWithIndex().map { case (t, i) => (i, t) }.toDS()
    else
      lines.rdd.zipWithIndex()
        .flatMap { case (t, i) => if (t.trim.isEmpty) None else Some((i, t.trim)) }
        .toDS()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ImportMain <corpus.txt|.csv> <turnsParquet> <outRoot> [topN] [parallelism]")
    val Array(corpusPath, turnsPath, outRoot) = args.take(3)
    val topN = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val parallelism = if (args.length > 4) args(4).toInt else 2 * cpus

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      // Stage resume is keyed by outRoot alone — guard against silently
      // serving a PREVIOUS input's checkpointed stages when the caller
      // reuses an output root with different inputs. The fingerprint covers
      // CONTENT identity (size + mtime, recursive for parquet dirs), not
      // just the path strings: editing an input in place and re-running
      // with the same outRoot must invalidate, not resume.
      def contentId(path: String): String = {
        val p = java.nio.file.Paths.get(path)
        if (java.nio.file.Files.isDirectory(p)) {
          val walk = java.nio.file.Files.walk(p)
          try {
            var n = 0L; var len = 0L; var mt = 0L
            walk.filter(f => java.nio.file.Files.isRegularFile(f)).forEach { f =>
              n += 1
              len += java.nio.file.Files.size(f)
              mt = math.max(mt,
                java.nio.file.Files.getLastModifiedTime(f).toMillis)
            }
            s"dir:$n:$len:$mt"
          } finally walk.close()
        } else if (java.nio.file.Files.exists(p))
          s"file:${java.nio.file.Files.size(p)}:${
            java.nio.file.Files.getLastModifiedTime(p).toMillis}"
        else "missing"
      }
      val fp = s"$corpusPath|$turnsPath|$topN|" +
        s"${contentId(corpusPath)}|${contentId(turnsPath)}"
      val fpPath = java.nio.file.Paths.get(outRoot, "_input_fingerprint")
      if (java.nio.file.Files.exists(fpPath)) {
        val prev = java.nio.file.Files.readString(fpPath)
        require(prev == fp,
          s"outRoot $outRoot holds checkpoints for different inputs ($prev); " +
          "use a fresh outRoot or delete it to re-ingest")
      } else {
        java.nio.file.Files.createDirectories(fpPath.getParent)
        java.nio.file.Files.writeString(fpPath, fp)
      }
      val dict = spark.sparkContext.broadcast(Dict.default())
      val corpus = corpusFromFile(spark, corpusPath)
      val turns = spark.read.parquet(turnsPath).as[graft.model.Turn]
      val triples = KgJob.run(spark, turns, corpus, dict, topN,
        outRoot, runId = "import", parallelism = parallelism)
      println(s"[import] triples=${triples.count()} -> $outRoot")
    } finally spark.stop()
  }
}
