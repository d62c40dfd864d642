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
    * partial combine, then an eager `localCheckpoint` that collapses the
    * iteration's ANALYZED plan to a `LogicalRDD` leaf — plain `persist`
    * does NOT do this (cache substitution happens at physical planning
    * only; measured: the analyzed tree re-embeds the full upstream edge
    * lineage per iteration until AQE's plan-string logging alone took
    * minutes at sf0.1). Checkpoint blocks are freed DETERMINISTICALLY via
    * [[org.apache.spark.sql.graft.CheckpointBlocks]] (Dataset.unpersist
    * cannot release them). Hot entities (power-law hubs — the co-mention
    * graph's defining skew) cost rows spread across tasks in the dst
    * aggregation, never a per-key array.
    *
    * Output: (doc_id, pagerank) with pagerank rounded to 9 decimals — sums
    * of doubles are accumulation-order-dependent at ~1e-16, and the rounded
    * contract is what lets an independent engine (the DuckDB oracle's
    * chained-CTE recomputation) reproduce the values exactly, the same
    * quantization argument as `Linker.TopK`.
    *
    * Loan-pattern API: the result rides on iteration-materialized
    * checkpoint blocks, so the caller materializes it inside `use` (write,
    * collect, stash) and EVERYTHING — edge cache, transition table, node
    * list, final ranks — is released on return. A plain DataFrame return
    * would strand the last iteration's blocks in the block manager (the
    * LinkIndex lesson). */
  def pageRank[T](edges: DataFrame, iters: Int, damping: Double = 0.85)
      (use: DataFrame => T): T = {
    val spark = edges.sparkSession
    // The edge list often arrives with an expensive lineage (the co-mention
    // self-join over the full pipeline); it is read twice below (node list,
    // transition table) — cache it for the duration. Everything after this
    // persist runs inside the try: a mid-iteration failure must still
    // restore the session's shuffle-partition setting and release every
    // cache/checkpoint (the leak class the loan pattern exists to prevent).
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    var nodes: DataFrame = null
    var trans: DataFrame = null
    var ranks: DataFrame = null
    try {
      val ud = e.select(col("src"), col("dst"),
          col("weight").cast("double").as("w"))
        .union(e.select(col("dst").as("src"), col("src").as("dst"),
          col("weight").cast("double").as("w")))
      nodes = ud.select(col("src").as("id")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = nodes.count() // bounded: distinct entity ids, one action
      if (n == 0)
        // No edges (e.g. a scale where no rank-1 co-mentions exist): empty
        // result with the right schema — the oracle likewise returns 0 rows.
        return use(e.select(col("src").as("doc_id"),
          lit(0.0).as("pagerank")).where(lit(false)))
      val outW = ud.groupBy("src").agg(sum("w").as("out_w"))
      trans = ud.join(outW, "src")
        .select(col("src"), col("dst"), (col("w") / col("out_w")).as("p"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = trans.count() // materialize once; iterations re-read the blocks
      // Size the ITERATION shuffles to the graph, not the session default:
      // the sessions here pin spark.sql.shuffle.partitions to corpus width
      // with AQE coalescing off (the scoring-cell requirement), so a graph
      // orders of magnitude smaller than the corpus would otherwise pay
      // corpus-width task-launch overhead × stages × iterations (measured:
      // ~6s/iteration on a 6.6k-node graph at 64 partitions). ~50k rows per
      // partition, capped at 4× cluster width for genuinely large graphs;
      // restored in the finally below.
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(1L, math.min(math.max(n, m) / 50000L + 1,
          4L * spark.sparkContext.defaultParallelism)).toString)
      val base = (1.0 - damping) / n
      ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
        .localCheckpoint(true)
      var it = 0
      while (it < iters) {
        val next = trans.join(ranks, trans("src") === ranks("id"))
          .groupBy(trans("dst").as("nid"))
          .agg(sum(col("p") * col("rank")).as("inflow"))
          .join(nodes, nodes("id") === col("nid"), "right")
          .select(col("id"),
            (lit(base) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
              .as("rank"))
          .localCheckpoint(true) // eager: materialized before old blocks go
        org.apache.spark.sql.graft.CheckpointBlocks.release(ranks)
        ranks = next
        it += 1
      }
      use(ranks.select(col("id").as("doc_id"),
        round(col("rank"), 9).as("pagerank")))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      e.unpersist()
      if (nodes != null) { nodes.unpersist(); () }
      if (trans != null) { trans.unpersist(); () }
      // the final iteration's checkpoint blocks
      if (ranks != null) org.apache.spark.sql.graft.CheckpointBlocks.release(ranks)
      ()
    }
  }
}
