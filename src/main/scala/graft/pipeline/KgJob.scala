package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.kg.{KgPipeline, MentionDoc}
import graft.link.{Dict, Linker}
import graft.model._

/** The checkpointed end-to-end transcript→KG job (north rule shape): every
  * stage materializes a table under `root` and re-runs resume from the first
  * missing stage with per-partition lineage/metrics (`StageRunner`).
  *
  * Partitioning is explicit:
  *  - the transcript side is repartitioned by hash(conv_id) so one
  *    conversation's turns co-locate (and re-runs are layout-stable);
  *  - docs/idf shuffle on partKey (the district key);
  *  - linking uses the grid cogroup (skew-safe, see Linker.linkTopK).
  */
object KgJob {

  def run(spark: SparkSession, turns: Dataset[Turn],
      corpus: Dataset[(Long, String)], dict: Broadcast[Dict], topN: Int,
      root: String, runId: String, parallelism: Int): Dataset[Triple] = {
    import spark.implicits._
    val runner = StageRunner(spark, root, runId)

    // Explicit conv_id-hash repartitioning of the input-hint table.
    val turnsPart = turns.repartition(parallelism, col("conv_id"))

    val docs = runner.stage[DocVec]("docs") {
      Linker.buildDocs(spark, Linker.dedupCorpus(spark, corpus), dict)
    }
    val idf = runner.stage[IdfRow]("idf") {
      Linker.buildIdf(spark, docs)
    }
    val docsIdf = runner.stage[DocVec]("docs_idf") {
      Linker.attachIdf(spark, docs, idf)
    }
    val mentions = runner.stage[MentionDoc]("mentions") {
      KgPipeline.stampQueryIdf(spark,
        KgPipeline.detectMentions(spark, turnsPart, dict), idf)
    }
    val hits = runner.stage[LinkHit]("hits") {
      Linker.linkTopKAuto(spark, mentions.map(_.doc), docsIdf, topN)
    }
    runner.stage[Triple]("triples") {
      KgPipeline.mentionTriples(spark, mentions, dict)
        .union(KgPipeline.linkTriples(spark, mentions, hits))
    }
  }
}
