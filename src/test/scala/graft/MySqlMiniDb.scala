package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import scala.collection.mutable

/** A strict in-memory MySQL-DIALECT JDBC endpoint for JdbcSinkSpec (r14
  * verdict "Next round #5": exercise the reference's actual multi-row
  * `INSERT … VALUES (…), (…) ON DUPLICATE KEY UPDATE hash=VALUES(hash)`
  * statement shape, as SQLAlchemy renders it — no MySQL server or H2 jar
  * exists in the offline environment, so the dialect is replayed against
  * this double instead).
  *
  * NOT a database: it accepts EXACTLY ONE statement shape — the literal
  * MySQL upsert `Sinks.jdbcUpsertMySqlNoop` emits, with backtick-quoted
  * columns and the VALUES(key) no-op re-assignment update — and throws
  * SQLSyntaxErrorException on anything else, so a drift in the generated
  * SQL fails the spec instead of being absorbed by a lenient parser.
  * Affected-rows follow the documented MySQL contract for a multi-row ON
  * DUPLICATE KEY UPDATE: the statement returns the SUM over rows of 1 per
  * row inserted and 0 per duplicate key whose update left the row
  * unchanged (VALUES(key) re-assigns the incoming key over an equal
  * stored key, so it always does); 2-per-row would mean the update
  * changed values (unreachable when the dup key is the updated column).
  *
  * Tables are created via [[createTable]] (the spec owns DDL); the
  * JDBC surface (Driver/Connection/PreparedStatement) is implemented as
  * reflective proxies exposing only the calls the sink closure makes —
  * any other JDBC method fails loudly with UnsupportedOperationException. */
object MySqlMiniDb {

  final class MiniTable(val cols: Seq[String], val uniqueCol: String) {
    val rows = mutable.LinkedHashMap.empty[AnyRef, Array[AnyRef]]
    var commits = 0
  }

  private val tables = new java.util.concurrent.ConcurrentHashMap[String, MiniTable]()

  def createTable(name: String, cols: Seq[String], uniqueCol: String): MiniTable = {
    require(cols.contains(uniqueCol), s"unique col $uniqueCol not in $cols")
    val t = new MiniTable(cols, uniqueCol)
    tables.put(name, t)
    t
  }

  def table(name: String): MiniTable = {
    val t = tables.get(name)
    require(t != null, s"mysqlmini: no such table $name")
    t
  }

  val UrlPrefix = "jdbc:mysqlmini:"

  // The ONE accepted statement shape (whitespace-exact except the column
  // list and row count), mirroring Sinks.jdbcUpsertMySqlNoop's generator —
  // which in turn mirrors what SQLAlchemy renders for the reference's
  // insert(...).values(records).on_duplicate_key_update(hash=inserted.hash):
  // one MULTI-ROW insert per batch with a VALUES(col) re-assignment update.
  private val UpsertRe =
    """INSERT INTO (\w+) \(((?:`[^`]+`(?:, )?)+)\) VALUES ((?:\((?:\?(?:, )?)+\)(?:, )?)+) ON DUPLICATE KEY UPDATE `([^`]+)`=VALUES\(`([^`]+)`\)""".r

  private def proxy[T](clazz: Class[T])(
      handler: PartialFunction[(String, Seq[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val key = (m.getName, Option(args).map(_.toSeq).getOrElse(Seq.empty))
          if (handler.isDefinedAt(key)) handler(key)
          else if (m.getName == "toString") s"mysqlmini-${clazz.getSimpleName}"
          else throw new UnsupportedOperationException(
            s"mysqlmini: JDBC call ${clazz.getSimpleName}.${m.getName} not part of the exercised surface")
        }
      }).asInstanceOf[T]

  private def newStatement(sql: String): java.sql.PreparedStatement = {
    val m = UpsertRe.findFirstMatchIn(sql).getOrElse(
      throw new java.sql.SQLSyntaxErrorException(
        s"mysqlmini: statement is not the reference upsert shape: $sql"))
    val t = table(m.group(1))
    val cols = m.group(2).split(", ").toSeq.map(_.stripPrefix("`").stripSuffix("`"))
    val tuples = m.group(3).split("\\), ?").toSeq
    val perRow = tuples.map(_.count(_ == '?'))
    if (cols != t.cols) throw new java.sql.SQLSyntaxErrorException(
      s"mysqlmini: column list $cols != table columns ${t.cols}")
    if (perRow.exists(_ != cols.size)) throw new java.sql.SQLSyntaxErrorException(
      s"mysqlmini: per-row placeholder counts $perRow for ${cols.size} columns")
    if (m.group(4) != m.group(5) || m.group(4) != t.uniqueCol)
      throw new java.sql.SQLSyntaxErrorException(
        s"mysqlmini: update clause `${m.group(4)}`=VALUES(`${m.group(5)}`) is not the unique-key re-assignment")
    val nRows = tuples.size
    val keyIdx = cols.indexOf(t.uniqueCol)
    val params = new Array[AnyRef](nRows * cols.size)
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setObject", Seq(i: Integer, v)) =>
        params(i - 1) = v; null
      case ("setTimestamp", Seq(i: Integer, v)) =>
        params(i - 1) = v; null
      case ("executeUpdate", Seq()) =>
        // MySQL multi-row affected-rows: sum of 1 per inserted row, 0 per
        // duplicate whose VALUES(key)-re-assignment changed nothing.
        var affected = 0
        t.synchronized {
          (0 until nRows).foreach { ri =>
            val row = params.slice(ri * cols.size, (ri + 1) * cols.size)
            val key = row(keyIdx)
            require(key != null, "mysqlmini: NULL unique key")
            if (!t.rows.contains(key)) { t.rows(key) = row; affected += 1 }
          }
        }
        Integer.valueOf(affected)
      case ("close", Seq()) => null
    }
  }

  private def newConnection(): java.sql.Connection =
    proxy(classOf[java.sql.Connection]) {
      case ("setAutoCommit", Seq(_)) => null
      case ("rollback", Seq()) => null // failure path: nothing staged outside executeUpdate
      case ("prepareStatement", Seq(sql: String)) => newStatement(sql)
      case ("commit", Seq()) =>
        tables.values().forEach(t => t.synchronized { t.commits += 1 })
        null
      case ("close", Seq()) => null
    }

  private val driver: java.sql.Driver = proxy(classOf[java.sql.Driver]) {
    case ("acceptsURL", Seq(url: String)) =>
      java.lang.Boolean.valueOf(url.startsWith(UrlPrefix))
    case ("connect", Seq(url: String, _)) =>
      if (url.startsWith(UrlPrefix)) newConnection() else null
    case ("getMajorVersion", Seq()) => Integer.valueOf(1)
    case ("getMinorVersion", Seq()) => Integer.valueOf(0)
    case ("jdbcCompliant", Seq()) => java.lang.Boolean.FALSE
  }

  /** Idempotent DriverManager registration (object init is per-JVM). */
  lazy val registered: Boolean = {
    java.sql.DriverManager.registerDriver(driver)
    true
  }
}
