package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Link-graph ranking — the curation signal web-scale training pipelines
  * derive from the crawl's link structure (OPIC/PageRank-family quality
  * priors in CommonCrawl-derived corpora; Page et al. 1999). The reference
  * has no graph operator (its star schema is joins-only:
  * sql/bq_fact_vitals_star.sql:1-9); this is part of the
  * beyond-the-reference LLM-pipeline family, next to the connected-
  * components clustering in [[Components]].
  *
  * All arithmetic is FIXED-POINT INTEGER so the result is exactly
  * reproducible across engines, partitionings and reruns: ranks live in
  * units of 1e-12 of the total mass (`TotalMass`), contributions divide by
  * out-degree with floor `div`, and the damping step is `(85 * s) div 100`.
  * Long sums of per-edge contributions are associative — no float
  * summation-order nondeterminism — which is what lets a DuckDB oracle
  * replay every iteration bit-for-bit (`SparkEntry.pageRankOracleSql`).
  * Floor rounding loses ≤1 unit per edge per round (≤E·1e-12 of the mass):
  * immaterial for ranking, essential for exactness.
  *
  * Scale shape: each iteration is one equi-join of the out-degree-
  * annotated edge list (E rows, checkpointed once, reused every round)
  * with the rank frame (V rows) on the source id, then one
  * map-side-combining sum by destination — two keyed shuffles, nothing
  * else. Both sides hash-partition on the same key width, so AQE reuses
  * the exchange layout across rounds; on a real cluster the edge list
  * would be bucketed by `src` once and every iteration's join would be
  * shuffle-free on the edge side. Lineage is cut every `checkpointEvery`
  * rounds (`localCheckpoint`, same device as [[Components]]; the measured
  * best cadence is 2 — per-round eager cuts serialize the scheduler,
  * unbounded chains grow AQE re-analysis) so round k plans O(1) deep
  * instead of O(k). No driver-side graph state — V and E stay
  * distributed.
  *
  * Iteration count is FIXED (no convergence probe): deterministic replay
  * and a bounded job DAG matter more at 100 TB than squeezing the last
  * rounds out — 10 damped rounds bound the residual to d^10 ≈ 0.2 of the
  * initial gap, ample for a curation prior.
  */
object Graph {

  /** Total rank mass in fixed-point units (1e12 ≈ "1.0"). Overflow audit:
    * a node's incoming sum is ≤ TotalMass = 1e12; the damping multiply
    * `85 * s` peaks at 8.5e13 ≪ 2^63. */
  val TotalMass = 1000000000000L

  /** Damping factor 0.85 as the integer pair (85, 100). */
  val DampNum = 85L
  val DampDen = 100L

  /** PageRank over a DIRECTED edge list (`src`, `dst` — long ids, UNIQUE
    * rows: callers dedup). Every node appearing as a source or destination is ranked;
    * dangling nodes (no out-edges) are allowed — their mass leaks, the
    * standard simplification when the graph is made symmetric upstream
    * (an undirected graph has no dangling nodes). Returns (`node`,
    * `rank`) with `rank` in 1e-12 mass units.
    */
  def pageRank(edges: DataFrame, iterations: Int = 10,
               checkpointEvery: Int = 2): DataFrame = {
    // out-degree-annotated edges: built once, checkpointed, reused by
    // every round's join (the E-side of each iteration). No defensive
    // distinct() — unique edges are the caller's contract (above), and a
    // redundant E-sized shuffle at 100 TB is exactly the kind of "just in
    // case" work to refuse.
    // materialize the edge list ONCE before fanning it into its two
    // consumers (the degree aggregate and the join): without the cut, the
    // caller's edge-construction subtree (for the purchase graph: an
    // orders⋈lineitem join + distinct + both-directions union) re-executes
    // once per consumer per branch — the round-20 profile showed the 5.5 MB
    // o⋈l exchange map stage running twice inside one build
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    iterate(partitionEdgeFrame(e.join(deg, "src")), iterations, checkpointEvery)
  }

  /** Hash-partition + sort the degree-annotated edge frame by `src` BEFORE
    * checkpointing it. `localCheckpoint` preserves the physical plan's
    * outputPartitioning/outputOrdering in the resulting LogicalRDD, so
    * every iteration's E⋈V join then needs NO exchange and NO sort on the
    * edge side — the committed-bucketed twin's per-round plan economics
    * (shuffle V per round, not E+V), achieved in memory for the plain
    * path. Before this, AQE broadcast the degree join's dim-sized side,
    * the checkpoint inherited the SCAN's partitioning (one file ⇒ one
    * partition), and every round re-exchanged the full edge frame — the
    * round-20 profile showed the 13.9 MB eDeg exchange map stage running
    * twice per round at sf0.1. Join strategy cannot change the
    * fixed-point integer sums, so results are bit-identical.
    */
  private def partitionEdgeFrame(eDeg: DataFrame): DataFrame =
    eDeg.repartition(col("src")).sortWithinPartitions("src")
      .localCheckpoint(true)

  /** The shared fixed-point loop over an already degree-annotated edge
    * frame `(src, dst, outdeg)` — the seam that lets [[pageRankBucketed]]
    * swap the in-memory checkpointed E-side for a committed bucketed scan
    * without touching one arithmetic expression (bit-identical results
    * are the contract; the oracle replays both).
    */
  private def iterate(eDeg: DataFrame, iterations: Int,
                      checkpointEvery: Int): DataFrame = {
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank on an empty edge list")
    val init = TotalMass / n
    val base = (TotalMass - DampNum * TotalMass / DampDen) / n

    var ranks = nodes.withColumn("rank", lit(init))
    for (k <- 1 to iterations) {
      ranks = prRound(eDeg, nodes, base, ranks)
      if (k % checkpointEvery == 0 && k < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** [[pageRank]] over a COMMITTED `bucketBy(src)` edge table — the
    * cluster layout the plain path's doc promises: the degree-annotated
    * edge list lands ONCE as a bucketed+sorted table, and every
    * iteration's E⋈V join then reads it with NO exchange on the edge
    * side (the scan's `HashPartitioning(src)` satisfies the join's
    * distribution; only the V-sized rank frame moves per round — the
    * same split `star_bucketed_disk` makes for the fact⋈dim join). The
    * per-round shuffle footprint drops from E+V to V — at a 100-TB edge
    * list that E-shuffle × 10 rounds is the whole cost of the operator.
    * Results are bit-identical to [[pageRank]] on the same edges (same
    * [[prRound]] fixed-point arithmetic; join strategy cannot change
    * integer sums), so the twin shares its oracle. Build once / iterate
    * many: `reuseExisting = true` skips the commit when the table is
    * already in the catalog (the bench's memoized-fixture shape).
    */
  def pageRankBucketed(spark: SparkSession, edges: DataFrame, outDir: String,
                       iterations: Int = 10, buckets: Int = 8,
                       table: String = "graph_edges_bkt",
                       reuseExisting: Boolean = false): DataFrame =
    iterate(bucketedEdgeTable(spark, edges, outDir, buckets, table,
      reuseExisting), iterations, checkpointEvery = 2)

  /** Commit (or reuse) the degree-annotated `bucketBy(src)+sortBy` edge
    * table and return its scan — the shared E-side of [[pageRankBucketed]]
    * and [[pageRankWarmStartBucketed]]. `reuseExisting` trusts a
    * catalog hit ONLY when the committed table's location is the one this
    * call would write (`outDir/table`): a same-named table committed for a
    * DIFFERENT dir in the same session (the multi-scale sweep pattern)
    * would otherwise be silently iterated, returning ranks for the wrong
    * graph — on mismatch the table is rebuilt in place.
    */
  private def bucketedEdgeTable(spark: SparkSession, edges: DataFrame,
                                outDir: String, buckets: Int, table: String,
                                reuseExisting: Boolean): DataFrame = {
    val loc = s"$outDir/$table"
    def locationMatches: Boolean = {
      val committed = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
      val wanted = graft.streaming.TableFs.fs(loc)
        .makeQualified(new org.apache.hadoop.fs.Path(loc)).toUri
      committed == wanted
    }
    if (!reuseExisting || !spark.catalog.tableExists(table) || !locationMatches) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val e = edges.select(col("src"), col("dst"))
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      // EXTERNAL table under the caller's dir (the runBucketedStar
      // precedent): survives catalog loss without LOCATION_ALREADY_EXISTS
      e.join(deg, "src")
        .write.bucketBy(buckets, "src").sortBy("src")
        .option("path", loc)
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(table)
    }
    spark.table(table)
  }

  /** Commit the SPLIT bucketed layout — the O(delta)-refresh form of the
    * committed edge table (the r19 warmbkt caveat closed): the monolithic
    * `bucketBy(src)` table carries `outdeg` denormalized on every edge
    * row, so ANY delta (which changes out-degrees) forces an O(E)
    * re-commit per refresh. Split instead into
    *  - `<table>_e` — plain `(src, dst)` edges, `bucketBy(src)`:
    *    append-only ([[absorbEdgeDelta]] `insertInto`s delta rows — new
    *    files in the bucketed layout, committed rows never rewritten);
    *  - `<table>_d` — `(src, outdeg)`, `bucketBy(src)` at the SAME
    *    count: V-sized, merged per refresh from its own prior rows plus
    *    the delta's per-src counts (O(V + delta), never O(E)).
    * Both sides hash-partition on `src`, so the per-round
    * `edges ⋈ deg` join is EXCHANGE-FREE ON BOTH SIDES and the rank
    * join keeps the bucketed path's V-only shuffle — same per-round
    * plan economics as [[pageRankBucketed]], same bit-identical
    * [[prRound]] arithmetic, refresh cost now tracking the delta
    * (measured in `GraphScaleProbe`'s splitabsorb section).
    */
  def commitSplitEdgeTables(spark: SparkSession, edges: DataFrame,
                            outDir: String, buckets: Int = 8,
                            table: String = "graph_edges_split"): Unit = {
    val e = edges.select(col("src"), col("dst"))
    spark.sql(s"DROP TABLE IF EXISTS ${table}_e")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_d")
    e.write.bucketBy(buckets, "src").sortBy("src")
      .option("path", s"$outDir/${table}_e")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(s"${table}_e")
    spark.table(s"${table}_e")
      .groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .write.bucketBy(buckets, "src").sortBy("src")
      .option("path", s"$outDir/${table}_d")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(s"${table}_d")
  }

  /** Absorb `deltaEdges` into the split layout at O(delta + V), without
    * the O(E) edge-table rewrite: the delta appends into the bucketed
    * edge table (`insertInto` preserves the bucket spec — each insert
    * lands its own per-bucket files; committed files are untouched,
    * asserted in `GraphSpec`), and the degree table is rebuilt from its
    * own prior rows full-outer-merged with the delta's per-src counts —
    * a V-sized job. Caller contract as everywhere: delta rows are NEW
    * distinct edges (not already committed).
    */
  def absorbEdgeDelta(spark: SparkSession, deltaEdges: DataFrame,
                      table: String = "graph_edges_split"): Unit = {
    deltaEdges.select(col("src"), col("dst"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .insertInto(s"${table}_e")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${table}_d"))
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"${table}_d is not bucketed"))
    val loc = meta.location.getPath
    val deltaDeg = deltaEdges.groupBy(col("src"))
      .agg(count(lit(1)).as("d"))
    // materialize BEFORE the overwrite — the merge reads the table it
    // replaces
    val merged = spark.table(s"${table}_d")
      .join(deltaDeg, Seq("src"), "full_outer")
      .select(col("src"),
        (coalesce(col("outdeg"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .as("outdeg"))
      .localCheckpoint(true)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_d")
    merged.write.bucketBy(buckets, "src").sortBy("src")
      .option("path", loc)
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(s"${table}_d")
  }

  /** [[pageRankWarmStart]] iterating over the SPLIT committed layout:
    * eDeg = `<table>_e ⋈ <table>_d` on `src` — zero exchange on both
    * bucketed sides (plan-asserted) — materialized ONCE per refresh
    * (`localCheckpoint`, the plain path's device) so every round
    * iterates the in-memory frame instead of re-running the E-row merge
    * join per round (measured 1.9× per-round overhead at 20M edges when
    * left lazy — `GraphScaleProbe` splitabsorb). The refresh-time
    * normalization cost is the trade for the O(delta) absorption: the
    * monolithic layout refreshes at O(E) DISK re-commit but scans its
    * denormalized table per round; the split layout refreshes at
    * O(delta) disk + one exchange-free in-memory join. Bit-identical to
    * the plain warm path on the same absorbed edge set (same
    * [[prRound]] integers), so the twin shares the warm oracle.
    */
  def pageRankWarmStartSplit(spark: SparkSession, warmRanks: DataFrame,
                             maxIterations: Int = 10,
                             tolMass: Long = TotalMass / 1000,
                             table: String = "graph_edges_split"): (DataFrame, Int, Long) =
    warmIterate(
      spark.table(s"${table}_e").join(spark.table(s"${table}_d"), "src")
        .localCheckpoint(true),
      warmRanks, maxIterations, tolMass)

  /** [[purchaseRankWarmFrom]] over the split absorbed tables. */
  def purchaseRankWarmFromSplit(spark: SparkSession,
                                committedRanks: DataFrame,
                                warmIterations: Int = 3,
                                table: String = "graph_edges_split"): DataFrame = {
    val (ranks, _, _) = pageRankWarmStartSplit(spark, committedRanks,
      maxIterations = warmIterations, tolMass = 0L, table = table)
    ranks.select(kindDecode: _*)
  }

  /** One power-iteration round (shared by [[pageRank]] and
    * [[pageRankWarmStart]] — the cold path's bit-exact oracle replay
    * depends on these exact expressions). The zero-contribution union
    * keeps receive-nothing nodes (sources that are never a destination)
    * alive at the base rank WITHOUT a second join: one equi-join + one
    * map-side-combining sum per round is the whole shuffle footprint.
    */
  private[graft] def prRound(eDeg: DataFrame, nodes: DataFrame, base: Long,
                             ranks: DataFrame): DataFrame = {
    val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
      .select(eDeg("dst").as("node"),
        call_function("div", col("rank"), col("outdeg")).as("contrib"))
    contribs
      .union(nodes.select(col("node"), lit(0L).as("contrib")))
      .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      .select(col("node"),
        (lit(base) + call_function("div",
          lit(DampNum) * col("s"), lit(DampDen))).as("rank"))
  }

  /** INCREMENTAL PageRank: absorb an edge delta by re-running the same
    * fixed-point iteration from the COMMITTED ranks as warm start, with
    * early exit on residual mass. The damped iteration is a contraction
    * toward a unique fixpoint, so where it starts only changes how many
    * rounds it takes to get there — and after a small delta the committed
    * ranks are already close, so the warm run exits in a fraction of the
    * cold round count (measured in `GraphScaleProbe`: the 10⁻³-mass
    * residual that costs a cold start 8 rounds is reached warm in 2-3 on
    * a 1% edge delta). That round count IS the cost: each round is the
    * full two-shuffle E⋈V pass, so at 100 TB re-ranking on every crawl
    * increment at cold cost would dominate the pipeline.
    *
    * Mechanics: surviving nodes enter at their committed rank, new nodes
    * at the uniform init; each round then runs the identical integer
    * arithmetic as [[pageRank]] ([[prRound]]), so the result lands on the
    * same fixpoint orbit the cold run converges to (`GraphSpec` bounds the
    * L1 gap by the contraction argument: distance ≤ moved·d/(1−d) at
    * exit). The per-round L1 movement (`sum |rank_k − rank_{k−1}|`, exact
    * integer) doubles as the convergence probe — one extra V-sized
    * aggregate per round, the price of adaptivity the fixed-round batch
    * form deliberately refuses. Early exit keeps the job DAG bounded:
    * `maxIterations` caps it regardless of the tolerance.
    *
    * Returns (ranks, roundsRun, finalMovedMass).
    */
  def pageRankWarmStart(edges: DataFrame, warmRanks: DataFrame,
                        maxIterations: Int = 10,
                        tolMass: Long = TotalMass / 1000): (DataFrame, Int, Long) = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    warmIterate(partitionEdgeFrame(e.join(deg, "src")),
      warmRanks, maxIterations, tolMass)
  }

  /** [[pageRankWarmStart]] iterating over the COMMITTED `bucketBy(src)`
    * edge table ([[pageRankBucketed]]'s layout, built or reused here via
    * the same location-validated seam) — the production refresh shape
    * where the two wins COMPOUND: the warm start cuts the ROUND COUNT
    * (2-3 rounds on a small delta instead of the cold 8-10) and the
    * bucketed scan cuts the PER-ROUND shuffle from E+V to V (no exchange
    * on the edge side of any round's E⋈V join). Bit-identical to
    * [[pageRankWarmStart]] on the same edges — same [[prRound]] integer
    * arithmetic, join strategy cannot change integer sums — so the twin
    * shares the warm oracle. Note the delta-absorption lifecycle implies
    * re-committing the edge table per refresh (the delta changes E and
    * the out-degrees); that append-shaped write is O(E) once per refresh
    * vs O(E) shuffle per ROUND saved — the trade documented at
    * BASELINE.md's warm-rank rows.
    */
  def pageRankWarmStartBucketed(spark: SparkSession, edges: DataFrame,
                                outDir: String, warmRanks: DataFrame,
                                maxIterations: Int = 10,
                                tolMass: Long = TotalMass / 1000,
                                buckets: Int = 8,
                                table: String = "graph_edges_bkt",
                                reuseExisting: Boolean = false): (DataFrame, Int, Long) =
    warmIterate(bucketedEdgeTable(spark, edges, outDir, buckets, table,
      reuseExisting), warmRanks, maxIterations, tolMass)

  /** The shared warm fixed-point loop over an already degree-annotated
    * edge frame — the same seam [[iterate]] is for the cold path. */
  private def warmIterate(eDeg: DataFrame, warmRanks: DataFrame,
                          maxIterations: Int,
                          tolMass: Long): (DataFrame, Int, Long) = {
    val nodes = eDeg.select(col("src").as("node"))
      .union(eDeg.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRankWarmStart on an empty edge list")
    val init = TotalMass / n
    val base = (TotalMass - DampNum * TotalMass / DampDen) / n

    // surviving nodes carry their committed rank; new nodes enter uniform.
    // (Departed nodes drop out via the inner node set — their mass is
    // re-normalized by the contraction over the following rounds.)
    var ranks = nodes
      .join(warmRanks.select(col("node"), col("rank").as("__warm")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__warm"), lit(init)).as("rank"))
      .localCheckpoint(true)
    var rounds = 0
    var moved = Long.MaxValue
    while (rounds < maxIterations && moved > tolMass) {
      // eager cut per round: the residual aggregate re-reads both frames,
      // so materializing `next` costs nothing extra and keeps plans O(1)
      val next = prRound(eDeg, nodes, base, ranks).localCheckpoint(true)
      moved = next.join(ranks.select(col("node"), col("rank").as("__prev")),
          Seq("node"))
        .agg(sum(abs(col("rank") - col("__prev")))).head().getLong(0)
      ranks = next
      rounds += 1
    }
    (ranks, rounds, moved)
  }

  /** Triangle census of an undirected graph — the graph-quality metric
    * (clustering structure) curation stacks compute next to degree and
    * rank. Input: distinct undirected edges as (`u` < `v`). Returns ONE
    * row (n_nodes, n_edges, n_triangles).
    *
    * Algorithm: degree orientation (Chiba–Nishizeki / the MapReduce
    * triangle-count standard): every edge points from its lower-RANK
    * endpoint to the higher, rank = deg·2³² + id — a total order, so the
    * oriented graph is a DAG and each triangle has exactly one source
    * node with out-edges to the other two. Wedges pair a node's
    * out-neighbors in rank order; a closing oriented edge completes the
    * triangle. The point at scale: out-degree is bounded by O(√E) under
    * degree orientation, so the wedge join is Σ outdeg² = O(E^1.5) worst
    * case instead of Σ deg² — the hub that would explode the naive wedge
    * count points INTO the hub, not out of it. All joins are scalar
    * equi-joins; rank arithmetic is exact long (deg < 2³¹, id < 2³²).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v")).localCheckpoint(true)
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
    val ranked = e
      .join(deg.select(col("n").as("u"), (col("c") * 4294967296L + col("u")).as("ru")), "u")
      .join(deg.select(col("n").as("v"), (col("c") * 4294967296L + col("v")).as("rv")), "v")
    val oriented = ranked.select(
        when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("s"),
        when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("d"),
        greatest(col("ru"), col("rv")).as("rd"))
      .localCheckpoint(true)
    val wedges = oriented.as("a").join(oriented.as("b"),
        col("a.s") === col("b.s") && col("a.rd") < col("b.rd"))
      .select(col("a.d").as("y"), col("b.d").as("z"))
    val triangles = wedges.join(oriented.select(col("s").as("y"), col("d").as("z")),
      Seq("y", "z"), "left_semi")
    // the deg·2³² + id packing is exact ONLY for id < 2³² and deg < 2³¹;
    // beyond that ranks silently collide (wrong orientation, wrong count).
    // Enforce the bound where it's stated — folded into the node-count
    // aggregate the method already pays for, so the guard is free.
    val hdr = deg.agg(count(lit(1)), min(col("n").cast("long")),
      max(col("n").cast("long")), max(col("c"))).head()
    val nNodes = hdr.getLong(0)
    if (nNodes > 0) { // empty graph: min/max are null, and there is nothing to guard
      val (minId, maxId, maxDeg) = (hdr.getLong(1), hdr.getLong(2), hdr.getLong(3))
      require(minId >= 0 && maxId < 4294967296L,
        s"triangleCount rank packing requires node ids in [0, 2^32), got [$minId, $maxId]")
      require(maxDeg < 2147483648L,
        s"triangleCount rank packing requires degree < 2^31, got max degree $maxDeg")
    }
    val nEdges = e.count()
    triangles.agg(count(lit(1)).as("n_triangles"))
      .select(lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
        col("n_triangles"))
  }

  /** The part co-occurrence (market-basket) graph: two parts are linked
    * iff some order contains both. Non-bipartite by construction — the
    * graph triangles live on. `orderMod` deterministically samples 1/mod
    * of the orders (pushed into the scan on both engines) — co-occurrence
    * graphs densify superlinearly in the order count, so demo queries
    * scope the basket set rather than the pair stage.
    */
  def coPurchaseEdges(spark: SparkSession, dir: String,
                      orderMod: Long = 1): DataFrame = {
    // dedupe the (order, part) incidence before the self-join: repeated
    // lines of one part in one order multiply the pair fan-out for free
    // (the post-join distinct still collapses across ORDERS — that one is
    // the edge semantics and stays)
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
      .filter(pmod(col("l_orderkey"), lit(orderMod)) === 0)
      .distinct()
    l.as("a").join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  /** Item-item co-occurrence recommendations — "orders with X also
    * contain Y", the classic market-basket collaborative filter: score =
    * the number of distinct orders containing both parts, top-`k`
    * co-items per part by (count desc, part asc). The per-part ranking
    * goes through the bounded [[graft.functions.TopKByScore]] aggregate —
    * map-side k-entry heaps, shuffle ≤ k rows per (part × partition) —
    * not a window sort over every scored pair; the co-occurrence count
    * itself is one distinct + one map-side-combining count on the (u, v)
    * key. Counts are exact integers (carried through the Double score
    * losslessly below 2^53), so the oracle replays the ranking verbatim.
    */
  def coPurchaseRecommendations(spark: SparkSession, dir: String,
                                k: Int = 3): DataFrame = {
    val counts = coOccurrenceVotes(spark, dir)
    rankTopKPerPart(
      symmetric(counts, "n"), scoreCol = "n", outCol = "n_orders", k)
  }

  /** Distinct-order votes per (u < v) part pair — a part on several lines
    * of one order must not inflate that order's vote, so the (order, part)
    * incidence is deduped BEFORE the self-join: with distinct inputs the
    * joined (order, u, v) triples are distinct by construction, and the
    * dedup shuffle runs on the O(lines) incidence instead of the O(Σ
    * basket²) pairs frame it used to run after. The count is then one
    * map-side-combining aggregate on the pair key.
    */
  private def coOccurrenceVotes(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    l.as("a").join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
  }

  /** Both directions of a (u, v, score) pair frame as (part, rec, score). */
  private def symmetric(pairs: DataFrame, scoreCol: String): DataFrame =
    pairs.select(col("u").as("part"), col("v").as("rec"), col(scoreCol))
      .union(pairs.select(col("v").as("part"), col("u").as("rec"), col(scoreCol)))

  /** Top-`k` recs per part by (score desc, id asc) through the bounded
    * [[graft.functions.TopKByScore]] aggregate; the long score column is
    * carried losslessly through the Double heap (< 2^53) and emitted
    * under `outCol`.
    */
  private def rankTopKPerPart(sym: DataFrame, scoreCol: String,
                              outCol: String, k: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("part"), col("rec"), col(scoreCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new graft.functions.TopKByScore(k).toColumn.name("topk"))
      .toDF("part", "topk")
      .select(col("part"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("part"), col("e.id").as("rec_part"),
        col("e.score").cast("long").as(outCol),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** [[coPurchaseRecommendations]] with LIFT scoring — raw co-occurrence
    * votes favor whatever is popular everywhere; lift = P(u,v)/(P(u)·P(v))
    * = votes·N / (orders_u · orders_v) normalizes that out, the
    * association-rule-mining standard (and PMI's exponential). Scored in
    * integer MICRO units via the half-up integer division
    * ([[graft.functions.FxMath.roundedDiv]]) so the ranking replays
    * exactly cross-engine. Overflow audit: votes·N·10⁶ ≤ 10⁴·10⁶·10⁶ ≪
    * 2^63. Same bounded [[graft.functions.TopKByScore]] ranking; the
    * per-part order totals join is a dim-sized side AQE broadcasts.
    */
  def coPurchaseLiftRecommendations(spark: SparkSession, dir: String,
                                    k: Int = 3): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val perPart = l.distinct()
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("orders_p"))
    val nOrders = l.select(col("l_orderkey")).distinct().count()
    val lifted = coOccurrenceVotes(spark, dir)
      .join(perPart.select(col("l_partkey").as("u"), col("orders_p").as("ou")), "u")
      .join(perPart.select(col("l_partkey").as("v"), col("orders_p").as("ov")), "v")
      .select(col("u"), col("v"),
        graft.functions.FxMath.roundedDiv(
          col("n") * lit(nOrders) * lit(1000000L),
          col("ou") * col("ov")).as("lift_micro"))
    rankTopKPerPart(symmetric(lifted, "lift_micro"),
      scoreCol = "lift_micro", outCol = "lift_micro", k)
  }

  /** The purchase graph: customer c and supplier s are linked iff some
    * order of c contains a line item supplied by s. Node ids are
    * namespaced into one long space — customers even (`2*custkey`),
    * suppliers odd (`2*suppkey+1`). Made SYMMETRIC (both directions per
    * link) so the bipartite graph has no dangling nodes and rank flows
    * both ways — the co-purchase prominence prior.
    */
  def purchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val links = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    links.union(links.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The registered query: rank the purchase graph, return every node with
    * its kind decoded and its original key — totally ordered downstream by
    * (rank desc, node) for a deterministic top list.
    */
  def purchaseRank(spark: SparkSession, dir: String,
                   iterations: Int = 10): DataFrame =
    pageRank(purchaseEdges(spark, dir), iterations)
      .select(kindDecode: _*)

  /** [[purchaseEdges]] restricted to a deterministic subset of orders —
    * the "committed crawl" the incremental-rank demo warm-starts from.
    * (`o_orderkey % 10 <> 0` keeps ~90% of the links; the delta back to
    * the full graph adds edges AND brand-new nodes, exercising both warm
    * paths.)
    */
  def basePurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(pmod(col("o_orderkey"), lit(10L)) =!= 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val links = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    links.union(links.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The registered INCREMENTAL-rank query: cold-converge the base
    * (90%-of-orders) purchase graph, then absorb the remaining orders'
    * edge delta via [[pageRankWarmStart]] with a FIXED warm budget and
    * `tolMass = 0`. Exactly replayable: early exit at tolMass=0 fires
    * only at the exact integer fixpoint, where further rounds are the
    * identity — so the result is bit-identical to running precisely
    * `warmIterations` rounds, which the DuckDB oracle unrolls. The point
    * being demonstrated (and probed at 40M edges in GraphScaleProbe): a
    * small delta re-ranks in 2-3 warm rounds instead of the cold 8-10.
    */
  def purchaseRankWarm(spark: SparkSession, dir: String,
                       coldIterations: Int = 6,
                       warmIterations: Int = 3): DataFrame =
    purchaseRankWarmFrom(spark, dir,
      pageRank(basePurchaseEdges(spark, dir), coldIterations),
      warmIterations)

  /** The warm-start phase alone, from already-committed base ranks —
    * the production shape: the converged base lives in a table, only
    * the delta absorption runs per refresh. Callers that re-rank
    * repeatedly (and the bench) pass the committed ranks in instead of
    * re-converging the cold base every time.
    */
  def purchaseRankWarmFrom(spark: SparkSession, dir: String,
                           committedRanks: DataFrame,
                           warmIterations: Int = 3): DataFrame = {
    val (ranks, _, _) = pageRankWarmStart(purchaseEdges(spark, dir),
      committedRanks, maxIterations = warmIterations, tolMass = 0L)
    ranks.select(kindDecode: _*)
  }

  /** [[purchaseRankWarmFrom]] over the committed bucketed edge table —
    * both production wins at once (fewer rounds × exchange-free rounds;
    * see [[pageRankWarmStartBucketed]]). Bit-identical to the plain warm
    * path, so it shares the unrolled warm oracle.
    */
  def purchaseRankWarmFromBucketed(spark: SparkSession, dir: String,
                                   outDir: String, committedRanks: DataFrame,
                                   warmIterations: Int = 3,
                                   table: String = "graph_edges_bkt"): DataFrame = {
    val (ranks, _, _) = pageRankWarmStartBucketed(spark,
      purchaseEdges(spark, dir), outDir, committedRanks,
      maxIterations = warmIterations, tolMass = 0L,
      table = table, reuseExisting = true)
    ranks.select(kindDecode: _*)
  }

  /** Decode the even/odd node-id namespace back to (kind, entity_key). */
  private[graft] def kindDecode: Seq[Column] = Seq(
    when(col("node") % 2 === 0, lit("customer"))
      .otherwise(lit("supplier")).as("kind"),
    call_function("div", col("node"), lit(2L)).as("entity_key"),
    col("rank"))
}
