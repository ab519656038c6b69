package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Catalyst-breadth analytical queries over the TPC-H-ish fixture star
  * (SURVEY.md §7 build-plan step 4). These are the bench headliners: wide
  * scans, multi-way joins, hash aggregation, windows, set ops.
  *
  * Scale notes per query are inline; the common rules: filters sit directly
  * on scans (parquet pushdown), projections are minimal (column pruning
  * reaches the footer), aggregates are partial-aggregated. All money sums
  * are rounded at the edge (oracle-hash stability), never mid-plan.
  *
  * Broadcast-hint policy: a `broadcast()` hint bypasses both the size check
  * and AQE, so it appears ONLY on sides that are O(1) or O(dims) in the
  * scale factor — nation, region, 1-row global aggregates, aggregates keyed
  * by a dim column, k-bounded tops. Customer, supplier, part, and any
  * per-key aggregate over them grow linearly with the fact: those joins are
  * left hint-free so AQE broadcasts them at small SF and degrades safely to
  * a shuffle join at 100-TB scale instead of OOMing on a forced build.
  * `HintPolicySpec` walks every analyzed plan and fails on violations.
  */
object Analytics {

  /** Fixed-point sum: per-row scale to an exact integer (the fixture's money
    * columns carry ≤2-6 decimals), sum as long. Exact and order-independent —
    * double sums drift by partial-aggregation order, which flips rounded
    * digits at hash-compare boundaries (and would do so nondeterministically
    * on a 1000-executor cluster too).
    */
  private def fxSum(c: Column, scale: Long): Column =
    sum(round(c * scale).cast("long"))

  // final rounding is integer-exact (FxMath): round(double, k) diverges
  // between engines when the exact rational lands on a half-way boundary
  private def fxTotal(c: Column, scale: Long, decimals: Int): Column =
    graft.functions.FxMath.scaledTotal(fxSum(c, scale), scale, decimals)

  private def fxAvg(c: Column, scale: Long, decimals: Int): Column =
    graft.functions.FxMath.scaledAvg(fxSum(c, scale), count(lit(1)), scale, decimals)

  /** TPC-H Q1 shape: pricing summary — one wide scan, group on 2 low-card
    * keys. Map-side partial agg reduces the shuffle to a handful of rows.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = discPrice * (lit(1) + col("l_tax"))
    // raw-column comparison (not to_date(col) <= …) so the predicate pushes
    // down into the parquet scan; ts < day+1 ≡ date(ts) <= day
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("2001-07-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        fxTotal(col("l_quantity"), 100L, 2).as("sum_qty"),
        fxTotal(col("l_extendedprice"), 100L, 2).as("sum_base_price"),
        fxTotal(discPrice, 10000L, 2).as("sum_disc_price"),
        fxTotal(charge, 1000000L, 2).as("sum_charge"),
        fxAvg(col("l_quantity"), 100L, 4).as("avg_qty"),
        fxAvg(col("l_extendedprice"), 100L, 4).as("avg_price"),
        fxAvg(col("l_discount"), 100L, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q6 shape: forecast-revenue — pure scan with three pushable range
    * predicates and one global aggregate; the whole query is one codegen
    * stage with no shuffle beyond the final 1-row combine.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2001-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(fxTotal(col("l_extendedprice") * col("l_discount"), 10000L, 2).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q3 shape: top-10 unshipped-revenue orders for one market segment.
    * The mktsegment slice of customer is still linear in SF, so it carries
    * no hint — AQE broadcasts it at small SF; the lineitem join shuffles on
    * orderkey — the natural co-partitioning key at 100 TB.
    * Deterministic top-k: revenue desc then orderkey.
    */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    // pushdown-friendly raw comparisons: date(ts) < d ≡ ts < d;
    // date(ts) > d ≡ ts >= d+1
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("2000-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-03-16").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
      .agg(fxTotal(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: revenue by nation for one region+year. Only nation and
    * region carry hints (O(dims)); customer and supplier grow with the fact,
    * so their joins are hint-free — AQE broadcasts them at small SF and
    * falls back to shuffle joins at scale. orders⋈lineitem shuffles on
    * orderkey; the supplier join's co-nation condition closes the loop.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2001-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup,
        li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(fxTotal(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** O3 generalization: top-3 orders per customer by total price — ranking
    * window, one shuffle on the partition key, deterministic tiebreak.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
  }

  /** Analytic window frame: per-user running totals + previous-event gap —
    * cumulative `ROWS UNBOUNDED PRECEDING..CURRENT ROW` frame and `lag`,
    * the non-ranking window family (complements W1/W2's ranking windows).
    * One shuffle on user_id; frames evaluate in a single sorted pass.
    */
  def runningUserTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        count(lit(1)).over(cum).as("n_so_far"),
        round(sum(round(col("value") * 100).cast("long")).over(cum).cast("double")
          / 100.0, 2).as("sum_so_far"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("us_since_prev"))
  }

  /** Exact distinct-count per group (the reference's reconciliation style);
    * the approx variant lives in SparkEntry as a rows-only query.
    */
  def distinctUsersPerType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** §2.7 set op: distinct union of two key domains. */
  def unionIds(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_custkey").as("id"))
      .union(Tables.customer(spark, dir).select(col("c_custkey").as("id")))
      .distinct()

  /** S1/P4: the reference's incremental windowed extract —
    * `effective_ts >= NOW() - INTERVAL '20 minutes'` (reference
    * scheduler/dataflow_flex_body.json:9) anchored on the data's own max
    * timestamp (broadcast 1-row aggregate, the distributed NOW()).
    */
  def extractWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val hi = e.agg(max(col("ts")).as("hi"))
    e.crossJoin(broadcast(hi))
      .filter(col("ts") >= col("hi") - expr("interval 20 minutes"))
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }

  /** Left-semi join (EXISTS): customers that placed at least one order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_custkey", "c_name")
      .join(Tables.orders(spark, dir).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_semi")

  /** Left-anti join (NOT EXISTS): customers with no RECENT orders — the
    * J2 missing-dimension probe in its direct form (reference
    * README.md:641-658 uses LEFT JOIN + IS NULL; left_anti is the same
    * plan without the null-filter detour). The right side is date-bounded
    * so the expected set is NON-empty at every SF: an unbounded
    * anti-join over this data matches nothing, and a 0-row expectation
    * passes under almost any bug (wrong key, swapped sides, dropped
    * input all yield 0 rows).
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select("c_custkey", "c_name")
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")

  /** TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
    * Orders filter pushes to the scan; nation broadcasts (hint), customer
    * joins hint-free (linear in SF — AQE decides); the only big shuffle is
    * lineitem⋈orders on the order key.
    */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2000-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(fxTotal(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Multi-level aggregation via ROLLUP (beyond the reference surface —
    * grouping-sets coverage): order counts and totals by year, priority,
    * with subtotal and grand-total rows.
    */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(year(col("o_orderdate")).as("year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        fxTotal(col("o_totalprice"), 100L, 2).as("total_price"))

  /** CUBE companion to [[ordersRollup]]: all 2^2 grouping sets in one pass.
    * Catalyst plans both through Expand — each input row is replicated once
    * per grouping set before the partial aggregation, so the shuffle still
    * carries only one row per (set, group).
    */
  def ordersCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(year(col("o_orderdate")).as("year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        fxTotal(col("o_totalprice"), 100L, 2).as("total_price"))

  /** GROUPING SETS companion to rollup/cube — the general form: an
    * EXPLICIT set list, here two independent 1-D rollups plus the grand
    * total in ONE pass ((year), (priority), ()) — what would otherwise be
    * three scans unioned. Same Expand planning as cube: the shuffle
    * carries one row per (set, group), and sets that would be dead weight
    * in the 2^n cube lattice are simply not generated.
    */
  def ordersGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      // the set-list expressions must be EXPRESSION-equal to the grouping
      // columns (an alias on one side breaks the match and silently nulls
      // that column in every set), so alias after the aggregate instead
      .groupingSets(
        Seq(Seq(year(col("o_orderdate"))), Seq(col("o_orderpriority")), Seq.empty),
        year(col("o_orderdate")), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        fxTotal(col("o_totalprice"), 100L, 2).as("total_price"))
      .withColumnRenamed("year(o_orderdate)", "year")

  /** TPC-H Q18 shape: large orders (HAVING-filtered aggregate driving a
    * semi join back into the detail). The HAVING-filtered aggregate is
    * selective but still keyed on orderkey (linear in SF), so no hint — AQE
    * broadcasts it at small SF once the runtime size is known; lineitem
    * aggregates partial-agg on orderkey.
    */
  def largeOrders(spark: SparkSession, dir: String, minQty: Double = 300): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val big = li.groupBy(col("l_orderkey"))
      .agg(fxTotal(col("l_quantity"), 100L, 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === big("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("o_orderdate"), col("total_qty"))
  }

  /** TPC-H Q19 shape: disjunction of conjunctive branches — exercises
    * OR-predicate pushdown/evaluation inside one scan (no union of scans).
    */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    // part is linear in SF (and the brand/size filter applies post-join
    // here): no hint — AQE picks broadcast at small SF, SMJ at scale
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 30) &&
          col("l_quantity").between(10, 40)))
      .groupBy(col("p_brand"))
      .agg(fxTotal(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000L, 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Approximate distinct users per type via the engine-owned KMV sketch
    * (SURVEY §7.5 extension) — bounded mergeable state like the native
    * HLL++, but with every step specified arithmetic, so the ESTIMATE
    * itself is exactly replayable in DuckDB (see
    * [[graft.functions.expr.Sketches]] — auditable approximation; the
    * native `approx_count_distinct` black box stays property-gated in
    * PropertySpec as the comparison point). k=1024 ⇒ rsd ≈ 3%; groups
    * under k report exact distinct-hash counts. The deterministic exact
    * companion is [[exactDistinctUsersDaily]].
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.expr.Sketches.kmvDistinct(
        graft.functions.expr.Sketches.mhash61(col("user_id")), 1024)
        .as("approx_users"))

  /** The KMV ESTIMATOR path exercised at every fixture scale: distinct
    * event_ids per type exceed k=256, so the k-th-minimum estimate (not
    * the exact small-set fallback) is what the oracle replays.
    */
  def approxDistinctEventsKmv(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.expr.Sketches.kmvDistinct(
        graft.functions.expr.Sketches.mhash61(col("event_id")), 256)
        .as("approx_events"))

  /** Re-aggregatable sketch rollup — the warehouse pattern BigQuery ships
    * as `HLL_COUNT.INIT / MERGE`: per-DAY distinct-count sketch STATES are
    * materialized once, and any date range's distinct count comes from
    * merging the tiny states instead of rescanning the fact. KMV states
    * merge by "union the k-minimum hash sets, dedup, keep the k smallest"
    * — pure integer set algebra on the replayable mhash61, so the merged
    * ESTIMATE (same `(k−1)·M / h_k` estimator as
    * [[approxDistinctEventsKmv]]) is bit-reproducible in DuckDB.
    *
    * Shape: one distinct on (day, hash), a per-day rank to keep ≤ k
    * hashes (hash-partitioned by day — each day's state is O(k)), then
    * the trailing-7-day merge touches ≤ 7k rows total. The exact distinct
    * over the same window rides along as the error reference. At 100 TB
    * the states ARE the stored rollup table; re-ranging is O(days·k),
    * never a fact rescan.
    */
  def kmvMergedDistinct7d(spark: SparkSession, dir: String,
                          k: Int = 64): DataFrame = {
    import graft.functions.expr.Sketches
    val dayHash = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"),
        Sketches.mhash61(col("user_id")).as("h"),
        col("user_id"))
    val distinctDayHash = dayHash.select("event_date", "h").distinct()
    val perDay = Window.partitionBy(col("event_date")).orderBy(col("h"))
    val states = distinctDayHash
      .withColumn("rn", row_number().over(perDay))
      .filter(col("rn") <= k)
    val cutoff = dayHash.agg(date_sub(max(col("event_date")), 6).as("cut"))
    val window = states.crossJoin(broadcast(cutoff)) // 1-row cutoff
      .filter(col("event_date") >= col("cut"))
    // merge: union of day states, dedup, global k-minimum. The
    // partition-less window is safe HERE by construction: its input is
    // ≤ 7·k rows (the merged states), never data-sized
    val merged = window.select(col("h")).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
    val est = merged
      .agg(max(col("rn")).as("n"),
        min(when(col("rn") === k, col("h"))).as("hk"))
      .select(when(col("n") < k, col("n"))
        .otherwise(round(lit((k - 1).toDouble * Sketches.M.toDouble) / col("hk")
          .cast("double")).cast("long"))
        .as("approx_users_7d"))
    val exact = dayHash.crossJoin(broadcast(cutoff))
      .filter(col("event_date") >= col("cut"))
      .agg(countDistinct(col("user_id")).as("exact_users_7d"))
    est.crossJoin(exact) // two 1-row frames
  }

  /** KMV sketch SET INTERSECTION — the estimator side of "users active on
    * BOTH days" (retention's core question) answered from the same per-day
    * sketch states [[kmvMergedDistinct7d]] merges for union: combine the
    * two days' k-minimum sets, keep the k smallest of the union (a valid
    * KMV of A∪B), and observe which of those survivors sit in BOTH input
    * states — ρ = matches/k is an unbiased Jaccard estimate, so
    * |A∩B| ≈ ρ · |A∪B|_est (Beyer et al., SIGMOD 2007's KMV set algebra).
    * Below-k unions short-circuit to EXACT (every hash retained ⇒ the
    * match count IS the intersection cardinality). Pure integer set
    * algebra on the replayable mhash61 + one double division at the edge
    * — DuckDB replays the estimate bit-for-bit, and the exact intersection
    * rides along as the error reference.
    *
    * Scale shape: states are O(k) per day and the whole comparison
    * touches ≤ 2k rows; at 100 TB the states are the stored rollup and
    * any day-pair's overlap is O(k) set algebra, never a fact rescan.
    */
  def kmvIntersectionLastTwoDays(spark: SparkSession, dir: String,
                                 k: Int = 64): DataFrame = {
    import graft.functions.expr.Sketches
    val dayHash = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"),
        Sketches.mhash61(col("user_id")).as("h"),
        col("user_id"))
    val days = dayHash.agg(max(col("event_date")).as("d2"))
      .withColumn("d1", date_sub(col("d2"), 1)) // 1-row bounds
    val twoDays = dayHash.crossJoin(broadcast(days))
      .filter(col("event_date") === col("d1") || col("event_date") === col("d2"))
    val distinctDayHash = twoDays.select("event_date", "h", "d1").distinct()
    val perDay = Window.partitionBy(col("event_date")).orderBy(col("h"))
    val states = distinctDayHash
      .withColumn("rn", row_number().over(perDay))
      .filter(col("rn") <= k)
      .withColumn("side", when(col("event_date") === col("d1"), lit("a"))
        .otherwise(lit("b")))
    // union sketch: k smallest of Sa ∪ Sb (≤ 2k rows — the partition-less
    // window is safe here by construction, same as the 7d merge)
    val unionK = states.select(col("h")).distinct()
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
      .filter(col("rn") <= k)
    val sides = states.groupBy(col("h"))
      .agg(countDistinct(col("side")).as("nsides"))
    val stats = unionK.join(sides, "h")
      .agg(max(col("rn")).as("n"),
        min(when(col("rn") === k, col("h"))).as("hk"),
        sum(when(col("nsides") === 2, 1L).otherwise(0L)).as("matches"))
    val est = stats.select(
      when(col("n") < k, col("matches")) // union below k ⇒ exact algebra
        .otherwise(round(col("matches").cast("double") / lit(k.toDouble) *
          (lit((k - 1).toDouble * Sketches.M.toDouble) / col("hk").cast("double")))
          .cast("long"))
        .as("approx_both_days"))
    val exact = twoDays.groupBy(col("user_id"))
      .agg(countDistinct(col("event_date")).as("nd"))
      .filter(col("nd") === 2)
      .agg(count(lit(1)).as("exact_both_days"))
    est.crossJoin(exact) // two 1-row frames
  }

  /** Trailing-7-day moving volume per day — a RANGE window frame over the
    * day number (every day sums the week ending on it, gaps handled by
    * value, not row position). Expressed as a RANGE-bucketized self-join of
    * the DAILY rollup ([[RangeJoin.pointInInterval]]: each output day is
    * the interval `[day−6, day]`, each daily count a point) rather than a
    * partition-less `RANGE BETWEEN` window — same sums, but hash-
    * partitionable instead of funnelling through the single partition a
    * global window requires. The heavy lifting either way is the map-side-
    * combining date aggregation below it; the joined side is one row per
    * calendar day, bounded at any data scale.
    */
  def movingWeeklyVolume(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_num",
        datediff(col("event_date"), lit("1970-01-01").cast("date")).cast("long"))
    val windows = daily.select(
      col("event_date"), col("n_events"), col("day_num"),
      (col("day_num") - 6).as("win_start"), col("day_num").as("win_end"))
    val points = daily.select(col("day_num").as("pt_day"), col("n_events").as("pt_n"))
    RangeJoin.pointInInterval(points, "pt_day", windows,
        "win_start", "win_end", bucketWidth = 7L)
      .groupBy(col("event_date"), col("n_events"))
      .agg(sum(col("pt_n")).as("n_events_7d"))
      .select("event_date", "n_events", "n_events_7d")
  }

  /** Gap-based sessionization: a session breaks after `gapMinutes` of user
    * inactivity — the telemetry/clickstream primitive behind engagement and
    * funnel metrics. Two windows over the same (user_id, ts) partitioning —
    * Catalyst plans them in ONE sort+shuffle — then a hash aggregation per
    * session. Everything is integer arithmetic on epoch-µs, so the oracle
    * hash is exact. The streaming analog is mapGroupsWithState with a
    * session timeout (see graft.streaming.Stateful).
    *
    * Boundary: an event EXACTLY `gap` after its predecessor CONTINUES the
    * session (strict `>`), matching the native `session_window`, which
    * merges touching windows — an event at start+gap yields window
    * [start+gap, start+2·gap), adjacent to the open session's close, and
    * Spark's session merge treats touching as overlapping (verified
    * empirically; StreamingSpec pins an exact-gap case on both operators).
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val prev = lag(col("ts_us"), 1).over(w)
    val gapUs = gapMinutes * 60L * 1000000L
    ev
      .withColumn("is_new",
        when(prev.isNull || col("ts_us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
  }

  /** [[sessionize]] through Spark's NATIVE `session_window` aggregation
    * instead of the lag/cumsum window pair: one hash-shuffle on the group
    * key, then per-key session merging inside the aggregate — no
    * two-window analytic pass, and the SAME operator works unchanged on a
    * stream (session_window + watermark is Structured Streaming's native
    * sessionization). Boundary semantics: Spark merges TOUCHING windows —
    * an event at exactly `last + gap` CONTINUES the session (pinned
    * empirically in SessionizeSpec; the oracle's strict `>` gap test
    * mirrors it, same boundary as [[sessionize]]'s lag form — the two
    * operators agree on membership, they differ only in the reported
    * session end). `session_end_us` is the window end
    * (`last event + gap`), the watermark-eviction boundary — not
    * [[sessionize]]'s last-event timestamp.
    */
  def sessionWindowNative(spark: SparkSession, dir: String,
                          gapMinutes: Int = 30): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))

  /** A3 + A6: exact COUNT(DISTINCT) on a derived date grouping — the exact
    * half of the approx/exact distinct pair, split out so it stays
    * cross-engine checkable. Spark plans COUNT(DISTINCT) as a two-phase
    * expand/partial-agg pipeline — no single-point distinct state.
    */
  def exactDistinctUsersDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(countDistinct(col("user_id")).as("exact_users"))

  /** Calendar densification (gap fill) — the time-series prerequisite the
    * warehouse family lacked: per user, one row for EVERY day between that
    * user's first and last activity, zero-filled where nothing happened
    * (reporting over sparse activity needs explicit zero days, e.g. the
    * reference's daily monitoring rollups read wrong without them). The
    * per-group calendar generalizes dim_date's global
    * `explode(sequence(...))` (reference sql/bq_dim_time.sql:14-19, F15).
    *
    * Scale shape: the daily aggregate is map-side-combining on (user, day);
    * spans are an O(users) aggregate; the calendar explode is NARROW over
    * spans (no shuffle — each user's row fans out in place); the final
    * equi-join shuffles on the composite (user, day) key. Fan-out is
    * bounded by span·users, the size of the ANSWER — no operator holds a
    * user's whole calendar in memory except the generated array (span
    * days ≤ tens of thousands, an explicit bound worth noting).
    * `day_max_cents` is carried for [[locfDaily]]; exact integer cents so
    * both the fill and its oracle replay bit-for-bit.
    */
  def gapFillDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        max(round(col("value") * 100).cast("long")).as("day_max_cents"))
    val spans = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    spans.select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_max_cents"))
  }

  /** LOCF (last observation carried forward) over [[gapFillDaily]]'s
    * densified frame: each user's gap days inherit the most recent observed
    * `day_max_cents`. One ranking window per user (running `last` with
    * ignoreNulls over the unbounded-preceding frame) — the same
    * shuffle-on-user shape as [[runningUserTotals]]; no leading nulls by
    * construction because every span starts on an observed day.
    */
  def locfDaily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gapFillDaily(spark, dir)
      .select(col("user_id"), col("day"), col("n_events"),
        last(col("day_max_cents"), ignoreNulls = true).over(w)
          .as("filled_max_cents"))
  }

  /** TPC-H Q22 shape: anti join + scalar-average threshold — wealthy
    * customers (balance above the positive-balance average) who never
    * ordered. The global average joins in as a broadcast 1-row aggregate
    * and the threshold compares CROSS-MULTIPLIED exact integers
    * (bal_cents · n > sum_cents), because an `avg(double)` is
    * partial-aggregation-order dependent and a boundary-adjacent balance
    * could flip between engines. The anti join is a broadcast of the
    * (distinct, small) buyer-key set against customers.
    */
  def wealthyInactiveCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val posAvg = cust.filter(col("c_acctbal") > 0)
      .agg(sum(round(col("c_acctbal") * 100).cast("long")).as("bal_sum"),
        count(lit(1)).as("bal_n"))
    cust
      .crossJoin(broadcast(posAvg))
      .filter(round(col("c_acctbal") * 100).cast("long") * col("bal_n") >
        col("bal_sum"))
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_customers"),
        fxTotal(col("c_acctbal"), 100L, 2).as("total_balance"))
  }

  /** TPC-H Q13 shape: customer order-count DISTRIBUTION — left outer join
    * (customers with zero urgent orders must survive as c_count = 0), one
    * aggregation per customer, then a histogram over the counts. Two hash
    * aggregations; the second's key space is tiny (distinct counts), so the
    * heavy lifting partial-aggregates map-side on c_custkey.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 shape: correlated scalar subquery decorrelated into a join —
    * revenue of small-quantity outliers, where "small" is relative to each
    * part's own average (`l_quantity < 0.5 · avg per part`). The correlated
    * per-part average becomes one hash aggregation joined back against the
    * fact on partkey — hint-free, because its row count equals |part| and
    * grows with the dataset (the standard Q17 plan shuffle-joins it; AQE
    * broadcasts at small SF). The threshold compare is integer-exact
    * (quantities scaled to cents, the 0.5·avg threshold cross-multiplied:
    * 2·qty_cents·n < sum_cents) so the boundary can't flip between engines.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey").as("avg_partkey"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_n"))
    li.join(perPart, col("l_partkey") === col("avg_partkey"))
      // qty_cents/100 < 0.5 * (qty_sum/100)/n  ⇔  2 * qty_cents * n < qty_sum
      // — both sides exact longs, no division anywhere
      .filter(round(col("l_quantity") * 100).cast("long") * 2 * col("qty_n") <
        col("qty_sum"))
      .agg(fxTotal(col("l_extendedprice"), 100L, 2).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 shape: order-priority checking — a correlated EXISTS
    * decorrelated into a left-semi join (equi key + per-row inequality
    * against the outer row's own column). The fixture lacks
    * l_commitdate/l_receiptdate, so "late" is l_shipdate more than 90 days
    * after o_orderdate. The semi join keeps orders duplicate-free with no
    * distinct, and the priority rollup partial-aggregates to 5 rows.
    */
  def latePriorityOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q7 shape: bilateral trade volume between two nations by ship
    * year. Supplier and customer each pre-join their (tiny, filtered)
    * nation row — those inner nation joins keep broadcast hints (O(dims))
    * but the resulting supplier/customer sides are still linear in SF, so
    * they join into the fact hint-free (AQE broadcasts the 2-nation slices
    * at small SF). Lineitem's one shuffle is the orderkey join; the
    * opposite-nation pair predicate is a residual filter. Final agg is
    * 2 pairs × years.
    */
  def nationTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val nat = Tables.nation(spark, dir)
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(pair: _*))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(pair: _*))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
        "l_discount")
    li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(fxTotal(col("l_extendedprice") * (lit(1) - col("l_discount")),
        10000L, 2).as("revenue"))
  }

  /** TPC-H Q8 shape: one nation's market share inside a region's demand for
    * one part type, by order year. The type-filtered part slice joins first
    * (biggest fact cut), the region's customers as a semi join (pure
    * filter, no payload), supplier with its nation name for the numerator
    * indicator — all three hint-free (each is linear in SF; AQE broadcasts
    * them at small SF). Only the nation/region joins inside the dim prep
    * carry hints. The share is a ratio of two integer sums (FxMath) so the
    * boundary digit can't flip between engines.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val prt = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2001-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val volScaled =
      round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(graft.functions.FxMath.ratio(
        sum(when(col("supp_nation") === "NATION_1", volScaled).otherwise(0L)),
        sum(volScaled), 6).as("mkt_share"))
  }

  /** TPC-H Q12 shape: late lines by line status with a priority-split
    * conditional aggregate (shipmode is absent from the fixture;
    * l_linestatus plays the category). One orderkey shuffle join, residual
    * lateness predicate, two CASE sums partial-aggregated to 2 rows.
    */
  def lateLinesByStatus(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus", "l_shipdate")
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q14 shape: promo revenue share for one ship month. The part
    * flag joins into the month-filtered fact hint-free (part is linear in
    * SF; AQE broadcasts it at small SF, keeping the no-fact-shuffle plan —
    * scan → broadcast join → 1-row agg — and swaps to SMJ at scale). The
    * percentage is a ratio of integer sums.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val prt = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    val volScaled =
      round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .agg(
        graft.functions.FxMath.ratio(
          sum(when(col("is_promo"), volScaled).otherwise(0L)) * 100,
          sum(volScaled), 4).as("promo_share_pct"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue — the
    * view + scalar-subquery-max pattern as a 1-row broadcast joined back on
    * exact integer equality (revenue kept in basis points until the final
    * projection, so the max compare can't tie-break differently across
    * engines).
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")),
        10000L).as("rev_scaled"))
    val mx = rev.agg(max(col("rev_scaled")).as("max_rev"))
    // mx is a 1-row global aggregate → hint stays; supplier is linear in
    // SF → hint-free (the max-revenue side feeding the join is ≤ a handful
    // of rows, so the planner/AQE broadcasts whichever side fits)
    rev.join(broadcast(mx), col("rev_scaled") === col("max_rev"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        graft.functions.FxMath.scaledTotal(col("rev_scaled"), 10000L, 2)
          .as("total_revenue"))
  }

  /** TPC-H Q9 shape (product-type profit rollup): a part-name-FILTERED
    * fact joined through supplier→nation and orders, profit summed on the
    * DERIVED (nation, year(o_orderdate)) key. The fixture carries no
    * partsupp, so profit is the discounted-revenue term only (the
    * reference's `ps_supplycost·l_quantity` subtrahend has no data
    * source here); the SHAPE — a selective part filter driving a 4-way
    * join into a derived-key rollup — is Q9's. Only nation (a dim-only
    * leaf) is hinted; part/supplier/orders stay hint-free for AQE per the
    * broadcast policy.
    */
  def nationProfit(spark: SparkSession, dir: String): DataFrame = {
    val prt = Tables.part(spark, dir)
      .filter(col("p_name").contains("red")).select("p_partkey")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(fxTotal(discPrice, 10000L, 2).as("profit"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q11 shape (important stock): a per-key rollup kept only where
    * the group total exceeds a FRACTION of the corpus-wide total — the
    * grouped-HAVING-against-global-scalar-subquery decorrelation: group
    * and global aggregates are two scans of the same fact, the 1-row
    * global side broadcasts (J3), and the threshold compare is
    * cross-multiplied scaled-long INTEGERS (`v·np·4 > tv·5`, i.e. value
    * > 1.25× the average part), never a double — the q17/q22 exactness
    * discipline. No partsupp in the fixture → "value" is lineitem revenue
    * per part rather than `supplycost·availqty`; the AVERAGE-relative
    * threshold plays the reference's `0.0001/SF` role scale-freely (a
    * fixed fraction empties as the part count grows, exactly why the
    * reference divides by SF). At extreme totals promote the compare to
    * decimal(38,0); scaled longs hold to ~10^5 parts × 10^13 value.
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val scaled =
      round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000)
        .cast("long")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice", "l_discount")
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(scaled).as("v"))
    val total = perPart.agg(sum(col("v")).as("tv"), count(lit(1)).as("np"))
    perPart.crossJoin(broadcast(total))
      .filter(col("v") * col("np") * lit(4L) > col("tv") * lit(5L))
      .select(col("l_partkey"),
        graft.functions.FxMath.scaledTotal(col("v"), 10000L, 2).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** TPC-H Q16 shape (supplier-relationship count): DISTINCT-supplier
    * counts per part attribute group, with an exclusion set applied as a
    * NOT-IN anti join BEFORE the distinct aggregate (the reference
    * excludes complaint-flagged suppliers; the fixture analog excludes
    * negative-balance ones — an attribute-derived set, like the
    * original's comment scan). Shape: fact→part attribute join,
    * anti join against a derived key set, then count_distinct — which
    * Spark plans as the two-level expand/aggregate, partial-aggregated on
    * (group, supplier) before the distinct count, so the shuffle carries
    * distinct combinations, not lineitem rows. No partsupp in the
    * fixture: the supplier↔part relationships come from shipped lines.
    */
  def supplierRelationships(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val prt = Tables.part(spark, dir)
      .filter(col("p_size").isin(1, 2, 3, 4, 5))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(prt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (excess-stock suppliers): the nested
    * IN-chain — suppliers selected because THEY have a qualifying
    * relationship to a part that itself qualifies via a correlated
    * aggregate. Fixture adaptation (no partsupp): a supplier qualifies
    * for a name-filtered part when its shipped quantity of that part
    * exceeds 3× the average supplier's share of that part (the
    * reference's `ps_availqty > 0.5 · sum(l_quantity)` correlation
    * re-rooted on shipments — a fixed half-share empties here because
    * ~30 suppliers ship each part, the same scale-dependence q11's
    * fraction had); the supplier list is then a semi-join against the
    * qualifying (supplier, part) set. Decorrelation: per-(part, supplier)
    * and per-part aggregates are two rollups of the same filtered fact,
    * joined on the part key — no correlated re-execution; the threshold
    * is compared in cross-multiplied scaled-long integers
    * (`qty_ps·ns > 3·qty_p`).
    */
  def excessStockSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val prt = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val qtyScaled = round(col("l_quantity") * 100).cast("long")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), qtyScaled.as("qty"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_suppkey", "qty")
    val perPartSupp = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("qty_ps"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("qty_p"),
        countDistinct(col("l_suppkey")).as("ns"))
    val qualifying = perPartSupp.join(perPart, "l_partkey")
      .filter(col("qty_ps") * col("ns") > lit(3L) * col("qty_p"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape: suppliers who were the sole late shipper of a
    * finished order — EXISTS (another supplier shipped in the same order)
    * as a left-semi join, NOT EXISTS (another supplier was also late) as a
    * left-anti join, both on the orderkey with a supplier-inequality
    * residual. "Late" is shipped >90 days after order date (the fixture has
    * no receipt/commit dates). Top-20 by wait count, total order.
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ordF = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lines = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
    val late = lines
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val others = lines.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    late
      .join(others, col("l_orderkey") === col("ok2") &&
        col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(lateOthers, col("l_orderkey") === col("ok3") &&
        col("l_suppkey") =!= col("sk3"), "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      // supplier is linear in SF → hint-free; the aggregated wait counts
      // are the small side anyway and AQE broadcasts whichever fits
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q2 shape: min-per-group decorrelation — the supplier(s) holding
    * the minimum account balance in each region (the fixture has no
    * partsupp, so region plays the part). The correlated
    * `= (SELECT min(...) WHERE same region)` becomes one tiny grouped
    * aggregate broadcast back onto the same pre-joined input; the balance
    * equality is an exact compare of unmodified parquet doubles, so it
    * can't drift between engines.
    */
  def minBalanceSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    val supR = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val mins = supR.groupBy(col("r_name").as("min_region"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    supR.join(broadcast(mins),
        col("r_name") === col("min_region") && col("s_acctbal") === col("min_bal"))
      .select("r_name", "s_suppkey", "s_name", "s_acctbal")
  }

  /** Analytic window-function family over one per-user ordered window:
    * ntile bucketing, percent_rank, cume_dist, nth_value, lead — the
    * ranking/distribution surface beyond row_number (O3) and lag
    * (q_running_total). One hash shuffle on user_id carries all five; the
    * order is totalized with event_id so every function is deterministic.
    * percent_rank/cume_dist are emitted as raw doubles: both engines
    * compute the same (rank−1)/(n−1) and rn/n divisions from identical
    * integer operands, and IEEE division is exactly rounded — bit-identical
    * without any edge rounding (same argument as emb_quantize's max_abs).
    */
  def userWindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
      col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev.select(
      col("user_id"), col("event_id"), col("ts_us"),
      ntile(4).over(w).as("quartile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      nth_value(col("value"), 3).over(w).as("third_value"),
      lead(col("value"), 2).over(w).as("value_after_next"))
  }

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral-analytics "what follows what" view (and the n-gram
    * transition statistic sequence-model pipelines compute over action
    * logs). One lag window per user stream (single shuffle on user_id,
    * totally ordered by (ts, event_id)), then a map-side-combining count
    * per (prev, next) pair; the row-conditional probability is integer-
    * exact ([[graft.functions.FxMath.ratio]]) so the matrix hash-matches
    * across engines. Transitions never cross users; each user's first
    * event has no predecessor and contributes nothing.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = steps.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_n"))
    counts.join(rowTotals, "prev_type") // 5-row side: AQE broadcasts
      .select(col("prev_type"), col("next_type"), col("n"),
        graft.functions.FxMath.ratio(col("n"), col("row_n"), 4).as("p"))
  }

  /** The fixture's closed event-type domain. Pivoting on an EXPLICIT value
    * list matters at scale: `pivot(col)` without values runs a blocking
    * distinct-collect over the whole input before planning; with the list,
    * the pivot is a single pass (partial-aggregated, no extra job).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: one row per day, one count column per event type (the
    * wide/cross-tab form). Nulls from absent cells are coalesced to 0 so
    * the output is a dense grid. Plans as a single hash aggregate over
    * `event_date` — the per-type columns are conditional partial aggregates,
    * same shape as A4's `sum(when(...))`, never a join or second shuffle.
    */
  def dailyTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("event_type"))
      .groupBy(col("event_date"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(wide) { (df, t) =>
      df.withColumn(s"n_$t", coalesce(col(s"`$t`"), lit(0L))).drop(t)
    }
  }

  /** UNPIVOT: the wide cross-tab melted back to long form — one row per
    * (day, type) INCLUDING zero cells, which is exactly what a plain
    * groupBy over the raw events cannot produce. Narrow per-row expansion
    * (each input row fans out to |types| rows), no shuffle beyond the
    * pivot's own aggregate.
    */
  def dailyTypeUnpivot(spark: SparkSession, dir: String): DataFrame =
    dailyTypePivot(spark, dir).unpivot(
      Array(col("event_date")),
      EventTypes.map(t => col(s"n_$t")).toArray,
      "event_type", "n_events")
      .withColumn("event_type", expr("substring(event_type, 3)"))

  /** FULL OUTER join: per-(user, day) click activity reconciled against
    * purchase activity — rows survive from EITHER side (days a user clicked
    * without buying, bought without clicking, or both). The join keys are
    * the grouping keys of both inputs, so each side arrives pre-aggregated
    * (bounded by users × days) and the join shuffles only those rollups,
    * never raw events; counts are 0-coalesced to keep the output dense.
    */
  def clickPurchaseReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def daily(tpe: String, out: String): DataFrame = ev
      .filter(col("event_type") === tpe)
      .groupBy(col("user_id"), to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as(out))
    daily("click", "n_clicks")
      .join(daily("purchase", "n_purchases"), Seq("user_id", "event_date"), "full_outer")
      .select(col("user_id"), col("event_date"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
  }

  /** Ordered-event FUNNEL — the event-analytics staple: how many users
    * progress through `steps` IN TIME ORDER (each step strictly after the
    * one before). Semantics: t₁ = a user's earliest step-1 event; tₖ = the
    * earliest step-k event strictly after tₖ₋₁; a user converts through
    * step k iff tₖ exists.
    *
    * Shape, not a window: each stage is a filtered per-user MIN aggregate
    * (map-side combining, one row per user out) joined to the previous
    * stage's single row per user — shuffles carry O(users) rows however
    * large the event table is, and each stage's filter pushes the
    * event-type predicate into the scan. A per-user sort window would
    * shuffle every event instead.
    */
  def funnel(spark: SparkSession, dir: String,
             steps: Seq[String] = Seq("click", "view", "purchase")): DataFrame = {
    val ev = Tables.events(spark, dir)
    // stage 1: earliest step-1 event per user
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col("event_type") === step).withColumnRenamed("ts", "ts2")
        .join(prev, Seq("user_id"))
        .filter(col("ts2") > col("t"))
        .groupBy(col("user_id")).agg(min(col("ts2")).as("t"))
    }
    stages.zipWithIndex.map { case (s, i) =>
      s.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort RETENTION: users cohorted by first-activity date; for each
    * cohort, the share still active k days later (any event on exactly
    * day +k). Two aggregates and one join, all keyed on user/cohort —
    * the raw event table is touched twice (cohort min, active days),
    * each collapsing map-side to O(users)/O(user-days) before any
    * shuffle. Rates via FxMath integer-exact rounding (hash-stable
    * across engines).
    */
  def retention(spark: SparkSession, dir: String,
                days: Seq[Int] = Seq(1, 7)): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val activeDays = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val joined = cohort.join(activeDays, Seq("user_id"))
      .select(col("cohort_date"), datediff(col("d"), col("cohort_date")).as("k"))
    // distinct user-days guarantee one row per (user, k), so a plain
    // conditional count is an exact user count — no count_distinct needed
    val agg = joined
      .groupBy(col("cohort_date"))
      .agg(
        count(when(col("k") === 0, 1)).as("cohort_size"),
        days.map(k => count(when(col("k") === k, 1)).as(s"retained_d$k")): _*)
    days.foldLeft(agg) { (df, k) =>
      df.withColumn(s"rate_d$k",
        graft.functions.FxMath.ratio(col(s"retained_d$k"), col("cohort_size"), 4))
    }
  }
}
