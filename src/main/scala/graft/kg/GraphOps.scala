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
    // AQE off for the iteration loop — per-stage re-planning latency is
    // pure overhead on graph-sized exchanges (the labelPropagation lesson:
    // it dominated the round jobs at sf0.1); restored in the finally.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    var nodes: DataFrame = null
    var trans: DataFrame = null
    var ranks: DataFrame = null
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
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
      // restored in the finally below. (Round 6 A/B'd moving this sizing
      // BEFORE the nodes/trans builds — an extra edge-lineage action made it
      // a net loss at sf0.1; kept in the round-5 shape.)
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
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      e.unpersist()
      if (nodes != null) { nodes.unpersist(); () }
      if (trans != null) { trans.unpersist(); () }
      // the final iteration's checkpoint blocks
      if (ranks != null) org.apache.spark.sql.graft.CheckpointBlocks.release(ranks)
      ()
    }
  }

  /** Weighted label propagation (community detection; Raghavan et al.
    * 2007) on the same UNDIRECTED weighted edge list as [[pageRank]]
    * (src < dst, integral co-mention count weights), in the DETERMINISTIC
    * SEMI-SYNCHRONOUS variant (Cordasco & Gargano 2010): fully synchronous
    * updates 2-cycle on any locally bipartite structure (a pair, a star —
    * i.e. almost every real graph), and the classic asynchronous variant
    * is update-order-dependent, which an engine that pins bit-identical
    * results under any partitioning cannot accept. Here each round runs
    * TWO half-steps — even-id nodes update against current labels, then
    * odd-id nodes against the refreshed ones — a deterministic 2-coloring
    * approximation that breaks the synchronous oscillation.
    *
    * label_0(v) = v; an updating node takes the label L maximizing
    * Σ_{u~v, label(u)=L} w(u,v), ties to the SMALLEST label, a FIXED
    * `iters` rounds. Weights are co-mention COUNTS, summed as BIGINT, so
    * every comparison is exact integer arithmetic — unlike PageRank there
    * is no floating-point accumulation and therefore no rounding contract:
    * any engine replaying the rule lands on identical labels (the DuckDB
    * oracle replays all half-steps as chained CTEs).
    *
    * Spark shape at 100 TB: per half-step ONE src-keyed hash join against
    * the persisted symmetrized edge list + ONE (dst, label) aggregation
    * with map-side combine + ONE dst-keyed `max_by` aggregation (argmax-
    * with-min-label via a single struct ordering — no window, no per-key
    * array); hub nodes cost rows spread across tasks; the non-updating
    * parity rides a narrow filter-union. Eager `localCheckpoint` per
    * half-step collapses the analyzed plan (the pageRank lesson: plain
    * persist leaves the full lineage in every AQE re-plan), blocks freed
    * deterministically via [[org.apache.spark.sql.graft.CheckpointBlocks]].
    *
    * Loan-pattern API like [[pageRank]]: materialize inside `use`; all
    * caches and checkpoint blocks are released on return. */
  def labelPropagation[T](edges: DataFrame, iters: Int)
      (use: DataFrame => T): T = {
    val spark = edges.sparkSession
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // AQE's per-stage re-planning adds scheduling latency to every exchange
    // of every round job — pure overhead once the shuffles are already
    // graph-sized (measured: it dominated the 13k-edge rounds at sf0.1).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    var ud: DataFrame = null
    var labels: DataFrame = null
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val eCnt = e.count()
      if (eCnt == 0)
        return use(e.select(col("src").as("doc_id"),
          col("src").as("community")).where(lit(false)))
      // Size round shuffles AND the cached edge layout to the graph, not
      // the corpus-width session default (see pageRank: task-launch
      // overhead × stages × rounds). The symmetrized table is REPARTITIONED
      // down before persisting — each round scans it from two branches, and
      // scanning hundreds of corpus-width cached partitions per round was
      // the measured q40 cost at sf0.1 (a 13k-edge graph cached in 64
      // partitions × 2 scans × 8 half-steps ≈ a thousand no-op tasks).
      val gp = math.max(1L, math.min(2 * eCnt / 50000L + 1,
        4L * spark.sparkContext.defaultParallelism)).toInt
      spark.conf.set("spark.sql.shuffle.partitions", gp.toString)
      val sym = e.select(col("src"), col("dst"),
          col("weight").cast("long").as("w"))
        .union(e.select(col("dst").as("src"), col("src").as("dst"),
          col("weight").cast("long").as("w")))
      ud = sym.repartition(gp).persist(StorageLevel.MEMORY_AND_DISK)
      val m = ud.count() // materialize once; rounds re-read the blocks
      // Every node in an edge list has ≥1 incident edge, so the dst-side
      // aggregation reaches ALL parity-p nodes each half-step — no
      // dangling-node join.
      labels = ud.select(col("src").as("id"), col("src").as("label"))
        .distinct().localCheckpoint(true)
      def halfStep(prev: DataFrame, p: Int): DataFrame = {
        val upd = ud.join(prev, ud("src") === prev("id"))
          .where(pmod(ud("dst"), lit(2)) === p)
          .groupBy(ud("dst").as("nid"), col("label"))
          .agg(sum(col("w")).as("wsum"))
          // argmax(wsum) with ties to the SMALLEST label: one struct-ordered
          // max_by — (wsum, -label) is unique per nid, so max_by is
          // deterministic.
          .groupBy(col("nid").as("id"))
          .agg(max_by(col("label"),
            struct(col("wsum"), (-col("label")).as("neg"))).as("label"))
        prev.where(pmod(col("id"), lit(2)) =!= p).unionByName(upd)
      }
      var it = 0
      while (it < iters) {
        // ONE eager checkpoint per ROUND (not per half-step): the odd
        // half-step composes lazily over the even one — the round's plan
        // stays constant-size over the checkpointed leaf, and the job count
        // halves (job-launch overhead dominated the 6.6k-node graph).
        val next = halfStep(halfStep(labels, 0), 1).localCheckpoint(true)
        org.apache.spark.sql.graft.CheckpointBlocks.release(labels)
        labels = next
        it += 1
      }
      use(labels.select(col("id").as("doc_id"), col("label").as("community")))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      e.unpersist()
      if (ud != null) { ud.unpersist(); () }
      if (labels != null)
        org.apache.spark.sql.graft.CheckpointBlocks.release(labels)
      ()
    }
  }

  /** Per-node triangle count + local clustering coefficient on the
    * canonical (src < dst) undirected edge list — the KG-quality signals a
    * graph consumer computes first (dense co-mention neighborhoods =
    * coherent entity communities; coefficient 0 = star hubs).
    *
    * Scale shape: the classic degree-ordered node-iterator (Schank &
    * Wagner 2005). Edges are ORIENTED from the (degree, id)-smaller
    * endpoint to the larger, so every wedge is enumerated at its
    * lowest-degree corner — Σ d_out² is O(m^1.5) on any graph, where the
    * naive id-ordered join degenerates to a hub's full neighborhood
    * squared (the co-mention graph is power-law; this is the difference
    * between a bounded wedge join and a quadratic hot key). Each triangle
    * is then closed by ONE equi-join against the oriented edge list and
    * counted once; per-node counts are a map-side-combinable aggregation
    * over the three corners. The enumeration strategy is invisible in the
    * output (the triangle SET is orientation-independent), which is what
    * lets the DuckDB oracle use the naive id-ordered 3-way join and still
    * have to agree row-for-row.
    *
    * The DAG references the edge table from MANY branches (degrees, the
    * two wedge sides, the closing join, the final hydration) — with a
    * pipeline-derived edge lineage each branch would re-execute the whole
    * co-mention aggregation (measured: ~30 re-executions, 230-480 s at
    * sf0.1). The shared tables (edges, degrees, oriented) are therefore
    * eagerly `localCheckpoint`ed — each is computed ONCE and every branch
    * reads its blocks — and the shuffles are sized to the graph, not the
    * corpus-width session default (the pageRank lesson). Loan-pattern API
    * like [[pageRank]]: materialize inside `use`; all checkpoint blocks
    * are released on return.
    *
    * Output: (doc_id, degree, triangles, clustering) — clustering =
    * 2·T/(deg·(deg−1)) rounded to 9 (the one division; counts are exact
    * BIGINTs), 0 for degree-1 nodes. */
  def triangleStats[T](edges: DataFrame)(use: DataFrame => T): T = {
    val spark = edges.sparkSession
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // AQE off for the whole operator (round 6): its many graph-sized
    // exchanges (degrees, orientation joins, wedge join, corner agg) each
    // paid AQE's per-stage re-planning latency — pure overhead once the
    // shuffles are already sized to the graph (the labelPropagation lesson).
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val release = org.apache.spark.sql.graft.CheckpointBlocks.release _
    var e: DataFrame = null
    var deg: DataFrame = null
    var oriented: DataFrame = null
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      e = edges.select(col("src"), col("dst")).localCheckpoint(true)
      val m = e.count() // cheap: counts the checkpointed blocks
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(1L, math.min(m / 50000L + 1,
          4L * spark.sparkContext.defaultParallelism)).toString)
      deg = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      // Orient by (deg, id): lo = the smaller endpoint under that order.
      val withDeg = e
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
      oriented = withDeg.select(
        when(struct(col("sdeg"), col("src")) < struct(col("ddeg"), col("dst")),
          struct(col("src").as("lo"), col("dst").as("hi")))
          .otherwise(struct(col("dst").as("lo"), col("src").as("hi")))
          .as("o"))
        .select(col("o.lo").as("lo"), col("o.hi").as("hi"))
        .join(deg.withColumnRenamed("id", "hi").withColumnRenamed("deg", "hdeg"), "hi")
        .localCheckpoint(true)
      // Wedges at the lowest-ranked corner: out-neighbor pairs ordered by
      // (deg, id) so each triangle closes exactly once.
      val w1 = oriented.select(col("lo").as("a"), col("hi").as("b"),
        col("hdeg").as("bdeg"))
      val w2 = oriented.select(col("lo").as("a"), col("hi").as("c"),
        col("hdeg").as("cdeg"))
      val wedges = w1.join(w2, Seq("a"))
        .where(struct(col("bdeg"), col("b")) < struct(col("cdeg"), col("c")))
      val closer = oriented.select(col("lo").as("b"), col("hi").as("c"))
      val tris = wedges.join(closer, Seq("b", "c"))
        .select(col("a"), col("b"), col("c"))
      val corner = tris.select(col("a").as("id"))
        .union(tris.select(col("b").as("id")))
        .union(tris.select(col("c").as("id")))
        .groupBy("id").agg(count(lit(1)).as("triangles"))
      use(deg.join(corner, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("deg").as("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"),
          when(col("deg") < 2, lit(0.0))
            .otherwise(round(
              lit(2.0) * coalesce(col("triangles"), lit(0L)) /
                (col("deg") * (col("deg") - lit(1L))), 9))
            .as("clustering")))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      if (e != null) release(e)
      if (deg != null) release(deg)
      if (oriented != null) release(oriented)
      ()
    }
  }

  /** k-core peeling (Seidman 1983) — dense-subgraph extraction over the
    * materialized graph: repeatedly remove nodes with fewer than `k` alive
    * neighbors; what survives is the k-core (every member has ≥ k
    * neighbors INSIDE the core). The standard noise filter before
    * community/centrality work on a co-occurrence graph.
    *
    * Runs a FIXED `rounds` peeling rounds (the q35/q40 fixed-iteration
    * contract — deterministic output, oracle-replayable as chained CTEs;
    * true k-core = the fixpoint, so the output carries `converged` = did
    * the last round remove nothing, making a non-converged run detectable
    * rather than silently wrong). Per round: one alive-filtered degree
    * aggregation (map-side combinable) over the persisted symmetrized
    * edges — hubs cost rows spread across tasks, never per-key arrays.
    * Returns one row per input node: (doc_id, removed_round = 1-based peel
    * round or 0 if in-core, core_deg = alive-degree at exit, in_core,
    * converged). Loan pattern: shared checkpoints released on return. */
  def kCore[T](edges: DataFrame, k: Int, rounds: Int = 6)
      (use: DataFrame => T): T = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    val release = org.apache.spark.sql.graft.CheckpointBlocks.release _
    // Round 6: the peeling loop gets the same treatment pageRank/
    // labelPropagation already had — AQE off (per-stage re-planning latency
    // on graph-sized exchanges is pure overhead) and every shuffle sized to
    // the graph instead of the corpus-width session default; the symmetrized
    // table is REPARTITIONED down before the eager checkpoint so each
    // round's two alive-joins scan gp graph-sized blocks, not one tiny
    // block per upstream corpus-width partition. Both settings restored in
    // the finally; output bit-identical (partitioning never reaches
    // semantics — the same argument as the q35/q40 sizing).
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val ep = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var sym: DataFrame = null
    val aliveTables = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val eCnt = ep.count() // materializes the edge cache; one bounded action
      val gp = math.max(1L, math.min(2 * eCnt / 50000L + 1,
        4L * spark.sparkContext.defaultParallelism)).toInt
      spark.conf.set("spark.sql.shuffle.partitions", gp.toString)
      sym = ep.select(col("src").as("id"), col("dst").as("nbr"))
        .union(ep.select(col("dst").as("id"), col("src").as("nbr")))
        .repartition(gp)
        .localCheckpoint(true)
      val nodes = sym.select("id").distinct()
      // alive: the ids still in the graph. Only round 0's table is its own
      // checkpoint; later rounds derive alive as a NARROW filter over that
      // round's checkpointed `stamped` leaf (re-scanning gp small blocks is
      // cheaper than a second eager checkpoint job per round).
      var alive = nodes.localCheckpoint(true)
      aliveTables += alive
      val removed = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var lastDeg: DataFrame = null
      var converged = false
      var r = 1
      while (r <= rounds && !converged) {
        val deg = sym
          .join(alive, "id")
          .join(alive.select(col("id").as("nbr")), "nbr")
          .groupBy("id").agg(count(lit(1)).as("core_deg"))
        // Nodes with zero alive neighbors have no deg row: left join + 0.
        val stamped = alive.join(deg, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("core_deg"), lit(0L)).as("core_deg"))
          .localCheckpoint(true)
        aliveTables += stamped
        val peeled = stamped.where(col("core_deg") < k)
          .select(col("id"), lit(r.toLong).as("removed_round"),
            col("core_deg"))
        converged = peeled.isEmpty
        if (!converged) {
          removed += peeled
          alive = stamped.where(col("core_deg") >= k).select("id")
        }
        lastDeg = stamped
        r += 1
      }
      val survivors = lastDeg.where(col("core_deg") >= k)
        .select(col("id"), lit(0L).as("removed_round"), col("core_deg"))
      val out = (removed :+ survivors).reduce(_ union _)
        .select(col("id").as("doc_id"), col("removed_round"),
          col("core_deg"),
          (col("removed_round") === 0L).as("in_core"),
          lit(converged).as("converged"))
      use(out)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      ep.unpersist()
      if (sym != null) release(sym)
      aliveTables.foreach(release)
      ()
    }
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003) — the KG-COMPLETION
    * step a construction pipeline runs over its own materialized graph:
    * score each NON-adjacent pair by Σ_{c ∈ N(a)∩N(b)} 1/ln(deg(c)) —
    * shared rare neighbors are strong evidence for a missing edge, shared
    * hubs are weak evidence — and emit candidates with ≥ `minCommon`
    * common neighbors. Input is an undirected edge list (src, dst),
    * DISTINCT with src < dst (the [[KgPipeline.coMentionEdges]]
    * convention); duplicate or bidirectional rows would inflate degrees.
    *
    * Shape: one neighbor-list self-join keyed by the SHARED vertex c (each
    * c contributes its neighbor pairs — the wedge enumeration), one
    * (a, b) hash agg, one anti-join against the existing edges. Wedge cost
    * is Σ_c deg(c)², which a power-law hub dominates: `maxHubDeg` drops
    * hubs from wedge GENERATION entirely (the df-cap pattern — conservative
    * by construction, and cheap to accept since a hub's 1/ln(deg) evidence
    * is near-zero anyway); the cap must be mirrored by any oracle. Degrees
    * are exact BIGINTs; the 1/ln terms and their sum sit under the
    * round(…,6) contract. Loan pattern: the result is materialized inside
    * `use` and the shared checkpoints are released on return. */
  def adamicAdar[T](edges: DataFrame, minCommon: Int = 2,
      maxHubDeg: Long = Long.MaxValue)(use: DataFrame => T): T = {
    val spark = edges.sparkSession
    val release = org.apache.spark.sql.graft.CheckpointBlocks.release _
    // Round 6: same sizing treatment as the rest of the family — AQE off
    // (re-planning latency per graph-sized exchange) and shuffles sized to
    // the graph, not the corpus-width session default; restored in the
    // finally. The wedge join and (a,b) agg dominate and were running at
    // 64 corpus-width partitions on a 1.2k-edge graph.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    var e: DataFrame = null
    var nbr: DataFrame = null
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      e = edges.select(col("src"), col("dst")).localCheckpoint(true)
      val m = e.count() // cheap: counts the checkpointed blocks
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(1L, math.min(2 * m / 50000L + 1,
          4L * spark.sparkContext.defaultParallelism)).toString)
      val sym = e.select(col("src").as("c"), col("dst").as("n"))
        .union(e.select(col("dst").as("c"), col("src").as("n")))
      val deg = sym.groupBy("c").agg(count(lit(1)).as("cdeg"))
      nbr = sym.join(deg.where(col("cdeg") <= maxHubDeg), "c")
        .localCheckpoint(true)
      val pairs = nbr.select(col("c"), col("n").as("a"), col("cdeg"))
        .join(nbr.select(col("c"), col("n").as("b")), "c")
        .where(col("a") < col("b"))
      val scored = pairs.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_common"),
          round(sum(lit(1.0) / log(col("cdeg").cast("double"))), 6).as("aa"))
      // Existing edges (src < dst convention) are not predictions.
      val out = scored
        .join(e.select(col("src").as("a"), col("dst").as("b")),
          Seq("a", "b"), "left_anti")
        .where(col("n_common") >= minCommon)
      use(out)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      if (e != null) release(e)
      if (nbr != null) release(nbr)
      ()
    }
  }
}
