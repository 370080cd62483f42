package graft.psql

import org.apache.spark.sql.{DataFrame, SparkSession}
import SqlScanner.{matchesWord, nextCode, scan}

/** DuckDB session variables — `SET VARIABLE name = <expr>` /
  * `RESET VARIABLE name` / `getvariable('name')` (DuckDB ≥ 1.1; the
  * reference pins 1.4, so its statement surface includes them).
  *
  * Semantics per the published DuckDB contract: the expression evaluates
  * EAGERLY at SET time (any scalar expression, including subqueries over
  * tables); `getvariable` of an unset variable is NULL, never an error.
  * A variable's value is constant for the duration of a statement, so —
  * unlike sequences — BIND-TIME literal inlining is exactly the engine
  * semantics, and `getvariable` works anywhere, FROM-queries included.
  *
  * Only scalar values are supported (string/number/boolean/date/
  * timestamp/decimal); doubles inline as `cast('<repr>' as double)`
  * because Spark parses bare decimal literals as DECIMAL. PREPARE bodies
  * and macro definitions are exempt from inlining (their text evaluates
  * at EXECUTE/call time). The local oracle (DuckDB 1.0) predates the
  * feature, so gate rows state the documented-equivalent inlined form.
  */
object SessionVariables {

  // Keyed by SparkSession (the Macros.scala / PreparedStatements.scala
  // pattern): DuckDB scopes variables per connection, and two sessions in
  // one JVM must not share state. WeakHashMap: a dropped session's
  // variables are GC-collectable, not a leak.
  private val registries =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, Any]]())

  private def vars(spark: SparkSession): java.util.concurrent.ConcurrentHashMap[String, Any] =
    registries.synchronized {
      var r = registries.get(spark)
      if (r == null) {
        r = new java.util.concurrent.ConcurrentHashMap[String, Any]()
        registries.put(spark, r)
      }
      r
    }

  /** `SET VARIABLE name = <expr>`; pos points at `variable`. */
  private[psql] def set(spark: SparkSession, stmt: String, pos: Int): DataFrame = {
    val sc = scan(stmt)
    val p = nextCode(stmt, sc, pos + "variable".length)
    val (name, after) = DmlStatements.identifierAt(stmt, p)
    var v = nextCode(stmt, sc, after)
    require(v >= 0 && (stmt.charAt(v) == '=' || matchesWord(stmt, v, "to")),
      s"SET VARIABLE must be `SET VARIABLE $name = <expr>`")
    v = if (stmt.charAt(v) == '=') v + 1 else v + 2
    val expr = stmt.substring(v).trim
    require(expr.nonEmpty, "SET VARIABLE: missing value expression")
    val rows = Psql(spark).sql(s"select ($expr) as __graft_var").limit(2).collect()
    require(rows.length == 1,
      s"SET VARIABLE $name: the expression must evaluate to exactly one row")
    val value = rows(0).get(0)
    literal(value) // reject non-scalar types NOW, not at first use
    vars(spark).put(key(name), value)
    spark.emptyDataFrame
  }

  /** `RESET VARIABLE name`; pos points at `variable`. Unset is a no-op
    * (DuckDB's RESET of an unknown variable does not error).
    */
  private[psql] def reset(spark: SparkSession, stmt: String, pos: Int): DataFrame = {
    val sc = scan(stmt)
    val p = nextCode(stmt, sc, pos + "variable".length)
    val (name, after) = DmlStatements.identifierAt(stmt, p)
    require(stmt.substring(after).trim.isEmpty,
      s"RESET VARIABLE: trailing '${stmt.substring(after).trim}'")
    vars(spark).remove(key(name))
    spark.emptyDataFrame
  }

  /** Replace each `getvariable('name')` occurrence with the value's
    * literal (NULL when unset — DuckDB's contract).
    */
  def inline(spark: SparkSession, stmt: String): String = {
    // cheap containment pre-check: the scan below is per-statement work
    if (!stmt.toLowerCase(java.util.Locale.ROOT).contains("getvariable")) return stmt
    val sc = scan(stmt)
    // PREPARE check at the first CODE position, not char 0 — leading
    // whitespace/comments must not defeat the EXECUTE-time-binding
    // exemption (r14 advice: `  PREPARE p AS …` was inlined at definition)
    val first = nextCode(stmt, sc, 0)
    if (first >= 0 && matchesWord(stmt, first, "prepare")) return stmt
    if (SequenceStatements.isMacroDef(stmt)) return stmt
    val sb = new StringBuilder
    var i = 0
    var last = 0
    while (i < stmt.length) {
      if (sc.code(i) && matchesWord(stmt, i, "getvariable")) {
        val p = nextCode(stmt, sc, i + "getvariable".length)
        require(p >= 0 && stmt.charAt(p) == '(',
          "getvariable needs a ('name') argument")
        var q = p + 1
        while (q < stmt.length && Character.isWhitespace(stmt.charAt(q))) q += 1
        require(q < stmt.length && stmt.charAt(q) == '\'',
          "getvariable: the variable name must be a plain string literal " +
            "(bind-time inlining has no value for computed names)")
        var r = q + 1
        while (r < stmt.length && stmt.charAt(r) != '\'') r += 1
        var close = r + 1
        while (close < stmt.length && Character.isWhitespace(stmt.charAt(close))) close += 1
        require(r < stmt.length && close < stmt.length && stmt.charAt(close) == ')',
          "getvariable: only the `getvariable('name')` form with a plain " +
            "string literal is inlinable at bind time")
        val name = stmt.substring(q + 1, r)
        sb.append(stmt.substring(last, i))
        sb.append(Option(vars(spark).get(key(name))).map(literal).getOrElse("null"))
        i = close + 1
        last = i
      } else i += 1
    }
    if (last == 0) stmt else { sb.append(stmt.substring(last)); sb.toString }
  }

  /** Spark SQL literal for a stored scalar; throws on unsupported types. */
  private def literal(v: Any): String = v match {
    case null                 => "null"
    case s: String            => "'" + s.replace("'", "''") + "'"
    case b: java.lang.Boolean => b.toString
    case i: java.lang.Integer => i.toString
    case l: java.lang.Long    => l.toString + "L"
    case s: java.lang.Short   => s.toString
    case b: java.lang.Byte    => b.toString
    case d: java.lang.Double  => s"cast('${java.lang.Double.toString(d)}' as double)"
    case f: java.lang.Float   => s"cast('${java.lang.Float.toString(f)}' as float)"
    case bd: java.math.BigDecimal =>
      s"cast('$bd' as decimal(${math.max(bd.precision, bd.scale)},${bd.scale}))"
    case d: java.sql.Date     => s"date '$d'"
    case t: java.sql.Timestamp =>
      s"timestamp '${t.toString}'"
    case other => throw new IllegalArgumentException(
      s"SET VARIABLE holds scalar values only — got ${other.getClass.getSimpleName} " +
        "(store complex values in a temp view instead)")
  }

  private def key(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  /** Test hook. */
  private[psql] def clear(spark: SparkSession): Unit = vars(spark).clear()
}
