package graft

/** Test-only JDBC WIRE STAND-IN for the reference's Postgres source: a
  * registered `java.sql.Driver` (`jdbc:graftpg:<derby-db>`) that accepts
  * the engine's POSTGRES-DIALECT SQL — the exact text
  * `Extract.jdbcWindowed(..., Dialect.postgres)` pushes down — translates
  * precisely the two Postgres constructs the dialect renders
  * (`EXTRACT(EPOCH FROM <expr>)`, `to_timestamp(<epoch literal>)`) into
  * their Derby equivalents, and delegates everything else verbatim to an
  * embedded Derby connection through a dynamic proxy. Every statement
  * text is recorded, so the spec can assert that what crossed the "wire"
  * was the Postgres fragment (not a pre-translated form) and that
  * Spark's partition-range predicates arrived database-side.
  *
  * What this proves: the `Dialect.postgres` fragment EXECUTES end-to-end
  * through Spark's real JDBC machinery (schema probe, per-partition
  * range queries, fetchsize path) against a wire-level endpoint — the
  * round-trip Derby already gets, now for the Postgres rendering. What
  * it cannot prove: a live Postgres server's own parser/types (the
  * translation layer is scoped to exactly the two constructs, and
  * anything else Postgres-specific would fail loudly in Derby).
  */
object PgWireStandIn {
  val UrlPrefix = "jdbc:graftpg:"

  /** Every SQL text prepared through the stand-in, as received (the
    * Postgres-dialect form, pre-translation). */
  val statements = new java.util.concurrent.CopyOnWriteArrayList[String]()

  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      java.sql.DriverManager.registerDriver(new StandInDriver)
      registered = true
    }
  }

  private val ExtractEpoch =
    """(?i)EXTRACT\s*\(\s*EPOCH\s+FROM\s+([A-Za-z_][A-Za-z0-9_.]*)\s*\)""".r
  private val ToTimestamp = """(?i)to_timestamp\s*\(\s*(\d+)\s*\)""".r

  /** Translate the two Postgres constructs to Derby; leave every other
    * byte untouched. Epochs render as JVM-default-zone wall-clock
    * literals — the same convention `java.sql.Timestamp` used when the
    * rows were inserted, so window edges land exactly (the Derby dialect
    * in Extract makes the same choice through its zone parameter).
    */
  private[graft] def translate(sql: String): String = {
    val s1 = ExtractEpoch.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        "{fn TIMESTAMPDIFF(SQL_TSI_SECOND, " +
          s"TIMESTAMP('1970-01-01 00:00:00'), ${m.group(1)})}"))
    ToTimestamp.replaceAllIn(s1, m => {
      val wall = java.time.LocalDateTime
        .ofInstant(java.time.Instant.ofEpochSecond(m.group(1).toLong),
          java.time.ZoneId.systemDefault())
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
      java.util.regex.Matcher.quoteReplacement(s"TIMESTAMP('$wall')")
    })
  }

  /** Wrap a real Derby connection: intercept every `prepareStatement` /
    * `createStatement.execute*` SQL text, record + translate it, and
    * delegate. A dynamic proxy keeps the wrapper complete against the
    * whole java.sql.Connection surface without 50 boilerplate overrides.
    */
  private[graft] def wrap(real: java.sql.Connection): java.sql.Connection =
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array(classOf[java.sql.Connection]),
      (_, method, args0) => {
        val args = Option(args0).getOrElse(Array.empty[AnyRef])
        val mapped =
          if ((method.getName == "prepareStatement" ||
              method.getName == "prepareCall" ||
              method.getName == "nativeSQL") && args.nonEmpty &&
              args(0).isInstanceOf[String]) {
            val sql = args(0).asInstanceOf[String]
            statements.add(sql)
            args.updated(0, translate(sql): AnyRef)
          } else args
        try method.invoke(real, mapped: _*)
        catch {
          case e: java.lang.reflect.InvocationTargetException =>
            throw e.getCause
        }
      }).asInstanceOf[java.sql.Connection]
}

/** The registered driver: `jdbc:graftpg:<suffix>` connects the embedded
  * Derby `jdbc:derby:<suffix>` and wraps it (see [[PgWireStandIn]]). */
final class StandInDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(PgWireStandIn.UrlPrefix)
  override def connect(url: String,
                       info: java.util.Properties): java.sql.Connection =
    if (!acceptsURL(url)) null
    else PgWireStandIn.wrap(java.sql.DriverManager.getConnection(
      "jdbc:derby:" + url.stripPrefix(PgWireStandIn.UrlPrefix), info))
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getLogger("graftpg")
}
