package graft.etl

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager, PreparedStatement, Statement}

/** A DIALECT-SHIM JDBC driver: accepts `jdbc:postgresql:shim:<dir>` /
  * `jdbc:sqlserver:shim:<dir>` URLs, stores everything in embedded
  * Derby, and TRANSLATES each dialect's DDL idioms into Derby's while
  * recording every literal SQL statement it saw.
  *
  * Why this exists: [[JdbcWarehouse]] selects dialect-sensitive DDL by
  * URL scheme (`renameTableSql`, `createEmptyLikeSql`), matching the
  * reference's Postgres / SQL Server deployments
  * (reference database.py:28-60), but the environment has no network
  * and ships no Postgres/SQL Server/H2 jars — so those branches had
  * only ever been string-asserted, never EXECUTED. Behind this shim
  * the full warehouse path (Spark JDBC sink included, which picks its
  * real PostgresDialect/MsSqlServerDialect off the URL) runs
  * end-to-end with real storage semantics, and the recorded statement
  * log proves the dialect branch emitted exactly its syntax, in order.
  *
  * The translation layer is deliberately tiny and DDL-scoped: renames,
  * the one CTAS form per dialect, the existence-probe LIMIT, and the
  * dialects' type names inside CREATE TABLE — data flows through
  * prepared statements untouched.
  */
object ShimJdbc {

  /** (dialect, original-sql) for every literal statement executed. */
  val recorded = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  def recordedFor(dialect: String): Seq[String] = {
    val it = recorded.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) { val (d, s) = it.next(); if (d == dialect) b += s }
    b.result()
  }

  private[etl] val prefixes = Map(
    "jdbc:postgresql:shim:" -> "postgresql",
    "jdbc:sqlserver:shim:" -> "sqlserver")

  private val pgRename = "(?is)^\\s*ALTER\\s+TABLE\\s+(\\S+)\\s+RENAME\\s+TO\\s+(\\S+)\\s*$".r
  private val msRename = "(?is)^\\s*EXEC\\s+sp_rename\\s+'([^']+)'\\s*,\\s*'([^']+)'\\s*$".r
  private val msSelectInto =
    "(?is)^\\s*SELECT\\s+\\*\\s+INTO\\s+(\\S+)\\s+FROM\\s+(\\S+)\\s+WHERE\\s+1\\s*=\\s*0\\s*$".r

  private[etl] def translate(dialect: String, sql: String): String = {
    val s = sql.trim
    def types(t0: String): String =
      // type-name mapping only inside DDL, so data statements can never
      // be corrupted by a column VALUE containing a type word
      if (!t0.toUpperCase.startsWith("CREATE TABLE")) t0
      else t0.replaceAll("(?i)\\bFLOAT8\\b", "DOUBLE")
        .replaceAll("(?i)\\bFLOAT4\\b", "REAL")
        .replaceAll("(?i)\\bTEXT\\b", "VARCHAR(4000)")
        .replaceAll("(?i)\\bBYTEA\\b", "BLOB")
        .replaceAll("(?i)\\bNVARCHAR\\(MAX\\)", "VARCHAR(4000)")
        .replaceAll("(?i)\\bDATETIME\\b", "TIMESTAMP")
        .replaceAll("(?i)\\bBIT\\b", "BOOLEAN")
    dialect match {
      case "postgresql" => s match {
        case pgRename(a, b) => s"RENAME TABLE $a TO $b"
        case _ => types(
          s.replaceAll("(?i)\\s+LIMIT\\s+(\\d+)\\s*$", " FETCH FIRST $1 ROWS ONLY"))
      }
      case "sqlserver" => s match {
        case msRename(a, b)     => s"RENAME TABLE $a TO $b"
        case msSelectInto(t, f) => s"CREATE TABLE $t AS SELECT * FROM $f WITH NO DATA"
        case _ => types(
          s.replaceAll("(?i)\\s+LIMIT\\s+(\\d+)\\s*$", " FETCH FIRST $1 ROWS ONLY"))
      }
      case other => throw new IllegalArgumentException(s"unknown shim dialect $other")
    }
  }

  /** Derby's missing-object SQLStates re-expressed as the shimmed
    * dialect's vocabulary: Spark 4's JdbcUtils.tableExists only treats
    * a probe failure as "absent" when the DIALECT classifies it
    * (PostgresDialect wants SQLState 42P01, MsSqlServerDialect wants
    * vendor code 208) — Derby's 42X05 would surface as a real error
    * and fail the write instead of triggering create-on-first-write.
    */
  private def mapException(dialect: String, t: Throwable): Throwable = t match {
    case e: java.sql.SQLException if e.getSQLState != null &&
        Set("42X05", "42Y55", "X0X05").contains(e.getSQLState) =>
      dialect match {
        case "postgresql" => new java.sql.SQLException(e.getMessage, "42P01", e)
        case _            => new java.sql.SQLException(e.getMessage, "S0002", 208, e)
      }
    case other => other
  }

  /** Dynamic proxy that passes everything through to `target`, rewrites
    * the SQL argument of statement-bearing methods, records it, and
    * re-wraps returned Statement/PreparedStatement/DatabaseMetaData
    * objects so nested calls stay shimmed.
    */
  private[etl] def shimProxy[T](iface: Class[T], target: AnyRef, dialect: String): T = {
    val handler = new InvocationHandler {
      override def invoke(proxy: AnyRef, method: Method, args0: Array[AnyRef]): AnyRef = {
        val args = if (args0 == null) Array.empty[AnyRef] else args0
        val sqlBearing = Set("createStatement", "prepareStatement", "prepareCall",
          "execute", "executeQuery", "executeUpdate", "executeLargeUpdate", "addBatch")
        val newArgs =
          if (sqlBearing(method.getName) && args.nonEmpty && args(0).isInstanceOf[String]) {
            val sql = args(0).asInstanceOf[String]
            recorded.add((dialect, sql))
            val out = args.clone(); out(0) = translate(dialect, sql); out
          } else args
        val result =
          try method.invoke(target, newArgs: _*)
          catch {
            case e: java.lang.reflect.InvocationTargetException =>
              throw mapException(dialect, e.getCause)
          }
        result match {
          case ps: PreparedStatement => shimProxy(classOf[PreparedStatement], ps, dialect)
          case st: Statement         => shimProxy(classOf[Statement], st, dialect)
          case md: DatabaseMetaData  => shimProxy(classOf[DatabaseMetaData], md, dialect)
          case other                 => other
        }
      }
    }
    iface.cast(Proxy.newProxyInstance(iface.getClassLoader, Array(iface), handler))
  }

  /** Register once per JVM (DriverManager dedups by instance, not class). */
  lazy val register: Unit = DriverManager.registerDriver(new ShimDriver)
}

/** TOP-LEVEL (not nested in the object): Spark's DriverRegistry
  * round-trips the driver through its canonical class name and
  * Class.forName — a nested class's canonical name (dots, not \$)
  * does not load.
  */
class ShimDriver extends Driver {
  import ShimJdbc._
  override def acceptsURL(url: String): Boolean =
    url != null && prefixes.keys.exists(url.startsWith)
  override def connect(url: String, info: java.util.Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: null, not throw
    val (pfx, dialect) = prefixes.find { case (p, _) => url.startsWith(p) }.get
    val dir = url.stripPrefix(pfx)
    val real = DriverManager.getConnection(s"jdbc:derby:$dir;create=true")
    shimProxy(classOf[Connection], real, dialect)
  }
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
