package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Analytics over the MATERIALIZED knowledge graph (north rule: "graph
  * materialize" is a first-class output, so the engine should also be able
  * to consume its own graph): weighted PageRank over the co-mention entity
  * adjacency ([[KgPipeline.coMentionEdges]]) — the standard "which canonical
  * entities anchor this corpus" centrality that downstream KG consumers
  * (entity ranking, seed selection, graph pruning) run first.
  *
  * The reference has no graph analytics (its graph is the static region
  * tree); this operator is engine-native capability on top of the
  * reference-semantics KG tables.
  */
object GraphOps {

  /** Weighted PageRank on an UNDIRECTED weighted edge list (src, dst,
    * weight) with src < dst (co-mention convention) — each edge transfers
    * mass both ways, proportional to its weight share of the endpoint's
    * total incident weight.
    *
    * rank_{t+1}(v) = (1-d)/N + d · Σ_{u~v} rank_t(u) · w(u,v)/outW(u), a
    * FIXED `iters` iterations (deterministic output, no convergence race).
    * Every node in an edge list has ≥1 incident edge, so there is no
    * dangling mass and total rank stays 1 exactly.
    *
    * Spark shape at 100 TB: the normalized-transition table is computed
    * once (one agg + one join, hash-partitioned on src) and persisted; each
    * iteration is ONE hash join on src (both sides partitioned by the join
    * key, so AQE reuses the exchange) + ONE aggregation on dst with map-side
    * partial combine, then an eager `localCheckpoint` — cutting the plan
    * lineage that would otherwise double per iteration (the same guard as
    * `DedupOps.connectedComponents`). Hot entities (power-law hubs — the
    * co-mention graph's defining skew) cost rows spread across tasks in the
    * dst aggregation, never a per-key array.
    *
    * Output: (doc_id, pagerank) with pagerank rounded to 9 decimals — sums
    * of doubles are accumulation-order-dependent at ~1e-16, and the rounded
    * contract is what lets an independent engine (the DuckDB oracle's
    * chained-CTE recomputation) reproduce the values exactly, the same
    * quantization argument as `Linker.TopK`. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85)
      : DataFrame = {
    val spark = edges.sparkSession
    val ud = edges.select(col("src"), col("dst"),
        col("weight").cast("double").as("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("weight").cast("double").as("w")))
    val nodes = ud.select(col("src").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // bounded: distinct entity ids, one action
    require(n > 0, "pageRank needs a non-empty edge list")
    val outW = ud.groupBy("src").agg(sum("w").as("out_w"))
    val trans = ud.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("out_w")).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    trans.count() // materialize once; every iteration re-reads these blocks
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val inflow = trans.join(ranks, trans("src") === ranks("id"))
        .groupBy(trans("dst").as("nid"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      val next = nodes.join(inflow, nodes("id") === inflow("nid"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true) // cut lineage; also frees the prior plan
      ranks.unpersist()
      ranks = next
      it += 1
    }
    val out = ranks.select(col("id").as("doc_id"),
      round(col("rank"), 9).as("pagerank"))
    // The checkpointed ranks back `out` until the caller materializes it;
    // trans/nodes are release-safe now.
    trans.unpersist(); nodes.unpersist()
    out
  }
}
