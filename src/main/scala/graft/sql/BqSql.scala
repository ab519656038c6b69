package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BigQuery-dialect SQL front-end — the missing "submit the reference's SQL
  * as-is" entry point. A reference user's queries are BigQuery SQL
  * (`sql/bq_⁎.sql`, `monitoring/⁎_vw.sql`); this object translates that
  * dialect to Spark SQL and runs it against the engine's registered tables,
  * so every one of the reference's 12 SQL artifacts executes unmodified
  * (BqSqlSpec runs each file verbatim and differentials the results against
  * the native operators).
  *
  * SCOPE — this is a text-level dialect translator for the reference's
  * construct inventory, NOT a general BigQuery parser. Covered (with the
  * reference file that motivates each):
  *
  *  - `CREATE OR REPLACE TABLE/VIEW \`proj.dataset.name\` [PARTITION BY e]
  *    [CLUSTER BY c,...] AS SELECT …` → name is the last path segment;
  *    layout clauses surface as [[Statement]] metadata (honored by
  *    [[materialize]]: `partitionBy` + `sortWithinPartitions`, the parquet
  *    analog of BQ partition+cluster — bq_fact_vitals_star.sql:1-3)
  *  - `QUALIFY ROW_NUMBER() OVER (…) = 1` (bq_fact_vitals.sql:14-17,
  *    last_status_vw.sql:10) → filter-over-window subquery, which the
  *    [[graft.plans.RewriteRankOneToMaxBy]] rule then rewrites to the
  *    max_by aggregate — the SQL surface inherits the engine's fast dedup
  *    plan; general boolean QUALIFY predicates fall back to a `__qualify`
  *    column filter
  *  - `GENERATE_DATE_ARRAY(a,b)` → `sequence(a, b, interval 1 day)` and
  *    `FROM UNNEST(e) AS x` → `FROM (SELECT explode(e) AS x)`
  *    (bq_dim_time.sql:14-18)
  *  - `FORMAT_DATE('%…', d)` → `date_format(d, '…')` via a %-token map;
  *    `EXTRACT(ISOWEEK …)` → `EXTRACT(WEEK …)` (Spark's week IS ISO 8601);
  *    YEAR/QUARTER/MONTH/DAY/DAYOFWEEK pass through (both dialects use
  *    1=Sunday for DAYOFWEEK) (bq_dim_time.sql:3-13)
  *  - `TO_HEX(SHA256(x))` → `sha2(x, 256)` (already lowercase hex —
  *    bq_dim_patient.sql:3); `SAFE_CAST(x AS T)` → `try_cast`;
  *    `SAFE_DIVIDE` → `try_divide`; `INT64` → `BIGINT`
  *    (results_vw.sql:5-6, daily_summary_vw.sql:9)
  *  - `_TABLE_SUFFIX` over a `⁎`-wildcard log table → the `day_partition`
  *    column of the registered base table (the engine's run-log sources
  *    carry the shard date as a column/partition — results_vw.sql:10-11);
  *    `tbl_⁎` names resolve to the base view `tbl`
  *  - `CURRENT_DATE()` → pinnable via `currentDate` (deterministic tests /
  *    reprocessing); defaults to `current_date()`
  *
  * Constructs Spark shares verbatim (JOIN … USING, nested-field dot paths,
  * ANY_VALUE, IF, BETWEEN, CASE, scalar subqueries, ORDER BY in views) pass
  * through untouched.
  */
object BqSql {

  /** One translated statement. `table` is the unqualified output name;
    * `partitionExpr`/`clusterCols` carry the BQ physical-layout DDL as
    * metadata for the writer; `sparkSelect` is runnable Spark SQL.
    */
  case class Statement(table: String, isView: Boolean,
                       partitionExpr: Option[String], clusterCols: Seq[String],
                       sparkSelect: String)

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Index of the first occurrence of `word` at paren-depth 0 outside
    * string literals, at word boundaries; -1 if absent.
    */
  private def topLevelIndexOf(s: String, word: String, from: Int = 0): Int = {
    var depth = 0
    var inStr = false
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && s.regionMatches(true, i, word, 0, word.length) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              (i + word.length >= s.length || !isIdentChar(s.charAt(i + word.length))))
            return i
      }
      i += 1
    }
    -1
  }

  /** Index of the ')' matching the '(' at `open`. */
  private def matchingClose(s: String, open: Int): Int = {
    var depth = 0
    var inStr = false
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parentheses after index $open in: $s")
  }

  private def splitTopLevelArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    for (i <- 0 until s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Replace every call `name(args…)` (any depth, case-insensitive) with
    * `f(args)`; `f` receives the top-level-comma-split argument texts.
    */
  private def rewriteCalls(s0: String, name: String)(f: Seq[String] => String): String = {
    val sb = new StringBuilder(s0)
    var search = 0
    var guard = 0
    while (guard < 10000) {
      guard += 1
      val s = sb.toString
      // find the next word-boundary occurrence of name followed by '('
      var idx = -1
      var i = search
      while (idx < 0 && i >= 0) {
        val cand = indexOfWord(s, name, i)
        if (cand < 0) i = -1
        else {
          var j = cand + name.length
          while (j < s.length && s.charAt(j).isWhitespace) j += 1
          if (j < s.length && s.charAt(j) == '(') idx = cand else i = cand + 1
        }
      }
      if (idx < 0) return sb.toString
      val open = sb.indexOf("(", idx + name.length)
      val close = matchingClose(sb.toString, open)
      val args = splitTopLevelArgs(sb.substring(open + 1, close))
      val repl = f(args)
      sb.replace(idx, close + 1, repl)
      search = idx + repl.length
    }
    sys.error(s"rewriteCalls($name) did not terminate")
  }

  /** First word-boundary occurrence of `word` (case-insensitive, any
    * depth — callers that need depth-0 use [[topLevelIndexOf]]).
    */
  private def indexOfWord(s: String, word: String, from: Int): Int = {
    var i = math.max(0, from)
    while (i >= 0 && i + word.length <= s.length) {
      if (s.regionMatches(true, i, word, 0, word.length) &&
          (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
          (i + word.length >= s.length || !isIdentChar(s.charAt(i + word.length))))
        return i
      i += 1
    }
    -1
  }

  /** `\`proj.dataset.tbl\`` → `tbl`; a trailing `_⁎` wildcard (log-sink
    * sharded tables) resolves to the base name, whose registered view
    * carries the shard date as `day_partition`.
    */
  private def stripQualifiedNames(s: String): String =
    "`([^`]+)`".r.replaceAllIn(s, m => {
      val last = m.group(1).split('.').last
      val base = if (last.endsWith("_*")) last.dropRight(2) else last
      scala.util.matching.Regex.quoteReplacement(base)
    })

  private val FormatDateTokens = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd", "%B" -> "MMMM", "%A" -> "EEEE")

  private def mapFormatDatePattern(bq: String): String =
    FormatDateTokens.foldLeft(bq) { case (acc, (from, to)) => acc.replace(from, to) }

  /** Rewrite the (single, top-level) QUALIFY clause. The dominant
    * `ROW_NUMBER() OVER (…) = 1` pattern becomes the engine's canonical
    * rank-1 filter-over-window (which `RewriteRankOneToMaxBy` turns into a
    * max_by aggregate); any other predicate falls back to a boolean
    * `__qualify` column.
    */
  private def rewriteQualify(s: String): String = {
    val qIdx = topLevelIndexOf(s, "QUALIFY")
    if (qIdx < 0) return s
    val tail = s.substring(qIdx + "QUALIFY".length)
    val obIdx = topLevelIndexOf(tail, "ORDER")
    val (pred, suffix) =
      if (obIdx >= 0) (tail.take(obIdx), tail.drop(obIdx)) else (tail, "")
    val head = s.take(qIdx).trim
    val fromIdx = topLevelIndexOf(head, "FROM")
    require(fromIdx > 0, s"QUALIFY without a top-level FROM in: $s")
    val rankOne = "(?is)^\\s*ROW_NUMBER\\s*\\(\\s*\\)\\s*(OVER\\s*\\(.*\\))\\s*=\\s*1\\s*$".r
    pred match {
      case rankOne(over) =>
        val inner = head.take(fromIdx) + s", ROW_NUMBER() $over AS __qualify_rn " +
          head.drop(fromIdx)
        s"SELECT * EXCEPT (__qualify_rn) FROM ($inner) WHERE __qualify_rn = 1 $suffix"
      case _ =>
        val inner = head.take(fromIdx) + s", (${pred.trim}) AS __qualify " +
          head.drop(fromIdx)
        s"SELECT * EXCEPT (__qualify) FROM ($inner) WHERE __qualify $suffix"
    }
  }

  private def translateSelect(bqSelect: String, currentDate: Option[String]): String = {
    var s = bqSelect
    s = s.replaceAll("(?i)(?<![A-Za-z0-9_])INT64(?![A-Za-z0-9_])", "BIGINT")
    s = s.replaceAll("(?i)(?<![A-Za-z0-9_])_TABLE_SUFFIX(?![A-Za-z0-9_])", "day_partition")
    s = rewriteCalls(s, "SHA256")(a => s"sha2(${a.head}, 256)")
    s = rewriteCalls(s, "TO_HEX")(a => a.head) // only ever wraps the sha — sha2 is hex already
    s = rewriteCalls(s, "SAFE_CAST")(a => s"try_cast(${a.head})")
    s = rewriteCalls(s, "SAFE_DIVIDE")(a => s"try_divide(${a(0)}, ${a(1)})")
    s = rewriteCalls(s, "CURRENT_DATE")(_ =>
      currentDate.map(d => s"DATE '$d'").getOrElse("current_date()"))
    s = rewriteCalls(s, "DATE_SUB") { a =>
      val interval = "(?is)^INTERVAL\\s+(\\d+)\\s+DAY$".r
      a(1).trim match {
        case interval(n) => s"date_sub(${a(0)}, $n)"
        case other => sys.error(s"unsupported DATE_SUB interval: $other")
      }
    }
    s = rewriteCalls(s, "FORMAT_DATE") { a =>
      val pat = a(0).trim.stripPrefix("'").stripSuffix("'")
      s"date_format(${a(1)}, '${mapFormatDatePattern(pat)}')"
    }
    s = rewriteCalls(s, "GENERATE_DATE_ARRAY") { a =>
      // default step is 1 day; a third argument is translated only for the
      // day-granularity form — anything else fails fast like DATE_SUB
      val step = a.drop(2).headOption.map(_.trim) match {
        case None => "interval 1 day"
        case Some(st) =>
          val interval = "(?is)^INTERVAL\\s+(\\d+)\\s+DAY$".r
          st match {
            case interval(n) => s"interval $n day"
            case other => sys.error(s"unsupported GENERATE_DATE_ARRAY step: $other")
          }
      }
      s"sequence(${a(0)}, ${a(1)}, $step)"
    }
    s = s.replaceAll("(?i)EXTRACT\\s*\\(\\s*ISOWEEK\\s+FROM", "EXTRACT(WEEK FROM")
    // FROM UNNEST(e) AS x → FROM (SELECT explode(e) AS x)
    var idx = indexOfWord(s, "UNNEST", 0)
    while (idx >= 0) {
      val open = s.indexOf('(', idx)
      val close = matchingClose(s, open)
      val aliasRe = "(?is)^\\s*AS\\s+([A-Za-z_][A-Za-z0-9_]*)".r
      val after = s.substring(close + 1)
      val (alias, consumed) = aliasRe.findFirstMatchIn(after) match {
        case Some(m) => (m.group(1), m.end)
        case None => sys.error(s"UNNEST without AS alias in: $s")
      }
      s = s.substring(0, idx) +
        s"(SELECT explode(${s.substring(open + 1, close)}) AS $alias)" +
        after.substring(consumed)
      idx = indexOfWord(s, "UNNEST", 0)
    }
    rewriteQualify(s).trim
  }

  /** Translate one BigQuery DDL+query statement. */
  def translate(bqSql: String, currentDate: Option[String] = None): Statement = {
    val stripped = stripQualifiedNames(bqSql.trim.stripSuffix(";"))
    val selIdx = topLevelIndexOf(stripped, "SELECT")
    require(selIdx >= 0, s"no top-level SELECT in: $bqSql")
    // fail fast on out-of-inventory constructs instead of mistranslating:
    // a top-level WITH would land in the discarded header and its CTE
    // definitions would silently vanish from the emitted Spark SQL
    val withIdx = topLevelIndexOf(stripped, "WITH")
    require(withIdx < 0 || withIdx > selIdx,
      s"unsupported construct: top-level WITH CTE (inline the CTE or register it as a view first) in: $bqSql")
    val header = stripped.take(selIdx)
    val body = stripped.drop(selIdx)
    val hdrRe = "(?is)^\\s*CREATE\\s+OR\\s+REPLACE\\s+(TABLE|VIEW)\\s+([A-Za-z0-9_.\\-]+)([\\s\\S]*)$".r
    val (kind, name, layout) = header match {
      case hdrRe(k, n, rest) => (k.toUpperCase, n.split('.').last, rest)
      case _ => ("VIEW", "__anonymous", "") // bare SELECT: run-only
    }
    val partition = "(?is)PARTITION\\s+BY\\s+(.*?)\\s*(?=CLUSTER\\s+BY|AS\\s*$)".r
      .findFirstMatchIn(layout).map(m => translateSelect(m.group(1).trim, currentDate))
    val cluster = "(?is)CLUSTER\\s+BY\\s+(.*?)\\s+AS\\s*$".r
      .findFirstMatchIn(layout).map(m => splitTopLevelArgs(m.group(1))).getOrElse(Seq.empty)
    Statement(name, kind == "VIEW", partition, cluster,
      translateSelect(body, currentDate))
  }

  /** Translate, execute, and register the result under the statement's
    * (unqualified) output name, so downstream reference statements that
    * SELECT from it run unchanged — the view-chain execution model of the
    * reference's monitoring stack.
    */
  def run(spark: SparkSession, bqSql: String,
          currentDate: Option[String] = None): DataFrame = {
    val st = translate(bqSql, currentDate)
    val df = spark.sql(st.sparkSelect)
    df.createOrReplaceTempView(st.table)
    df
  }

  /** [[run]] + honor the BQ physical-layout DDL on a parquet write:
    * `PARTITION BY e` → a derived partition column, `CLUSTER BY c…` →
    * `sortWithinPartitions` (row-group min/max locality) — the same mapping
    * the native pipeline uses for the star fact.
    */
  def materialize(spark: SparkSession, bqSql: String, outDir: String,
                  currentDate: Option[String] = None): DataFrame = {
    val st = translate(bqSql, currentDate)
    val df = spark.sql(st.sparkSelect)
    val writer = st.partitionExpr match {
      case Some(e) =>
        val withPart = df.withColumn("__part_key", org.apache.spark.sql.functions.expr(e))
        val laidOut =
          if (st.clusterCols.isEmpty) withPart
          else withPart.sortWithinPartitions(
            st.clusterCols.map(org.apache.spark.sql.functions.col): _*)
        laidOut.write.partitionBy("__part_key")
      case None => df.write
    }
    writer.mode("overwrite").parquet(s"$outDir/${st.table}")
    df.createOrReplaceTempView(st.table)
    df
  }
}
