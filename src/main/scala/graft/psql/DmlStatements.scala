package graft.psql

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import SqlScanner.{matchesWord, nextCode, scan, topLevelKeyword}

/** DuckDB statement-level DML — `DELETE FROM t [WHERE …]` and
  * `UPDATE t SET c = e[, …] [WHERE …]` — lowered to copy-on-write over
  * managed warehouse tables.
  *
  * The reference delegates every statement to DuckDB (`README.md:3,91`),
  * whose dialect executes DML on any table; Spark's parquet v1 tables
  * refuse DELETE/UPDATE outright, so without this pass the two most
  * analytics-realistic DML forms a reference user could type would fail.
  * Lowering:
  *
  *  - the surviving/updated content is computed as a normal PSQL pipeline
  *    over the target, so every dialect feature (`::` casts, DuckDB
  *    functions, macros) works inside WHERE / SET expressions — and
  *    SET values are cast back to the column's declared type through the
  *    same `cast(… AS t)` spelling the rewriter lowers to [[
  *    graft.functions.GraftCast]], keeping DuckDB's assignment-rounding
  *    semantics for integer columns;
  *  - the new content is materialized to a shadow table FIRST (Spark
  *    refuses to overwrite a table its own scan is reading — the b06
  *    upsert rationale, [[graft.operators.Bucketing.upsert]]),
  *  - then swapped in: drop target, `ALTER TABLE … RENAME`. If the
  *    process dies between the two the data survives in `<t>__graft_cow`.
  *
  * Returns DuckDB's exact result shape: a single `Count` BIGINT row with
  * the number of affected rows (probed on 1.0.0). NULL WHERE conditions
  * follow SQL three-valued logic as DuckDB does: DELETE keeps the row,
  * UPDATE leaves it unmodified (probed).
  *
  * Scale shape: one filter/projection scan + one columnar write — no
  * shuffle anywhere; the affected-count pass is a second scan that prunes
  * to the predicate columns. Copy-on-write rewrites the whole table — the
  * right default for bulk analytics DML; a partition-pruned selective
  * rewrite (touch only affected partition dirs) would layer on
  * [[graft.operators.Bucketing]]'s partitioned layout the way b04
  * compaction does.
  *
  * Fails loudly on: non-MANAGED targets (temp views, external tables —
  * rewriting files under a shared location would corrupt state the
  * catalog does not own), join forms (`DELETE … USING`, `UPDATE … FROM`),
  * and SET columns absent from the target.
  */
object DmlStatements {

  /** Run stmt if it is a DELETE/UPDATE statement; None otherwise. */
  def run(spark: SparkSession, stmt0: String): Option[DataFrame] = {
    val stmt = stmt0.trim.stripSuffix(";").trim
    if (matchesWord(stmt, 0, "delete")) Some(delete(spark, stmt))
    else if (matchesWord(stmt, 0, "update")) Some(update(spark, stmt))
    else None
  }

  private val identRe = "[A-Za-z_][A-Za-z0-9_]*".r

  private def delete(spark: SparkSession, stmt: String): DataFrame = {
    val sc = scan(stmt)
    val fromIdx = nextCode(stmt, sc, "delete".length)
    require(fromIdx >= 0 && matchesWord(stmt, fromIdx, "from"),
      "DELETE must be `DELETE FROM <table> [WHERE <cond>]`")
    require(topLevelKeyword(stmt, sc, Seq("using")).isEmpty,
      "DELETE … USING is not supported — express the join condition with " +
        "`WHERE key IN (FROM other |> select key)` instead")
    val (table, after) = identifierAt(stmt, fromIdx + 4)
    val wherePos = topLevelKeyword(stmt, sc, Seq("where")).headOption
    wherePos.foreach(p => require(p >= after, s"malformed DELETE near '$table'"))
    val cond = wherePos.map(p => stmt.substring(p + "where".length).trim)
    checkTarget(spark, table)
    val psql = Psql(spark)
    val (affected, next) = cond match {
      case Some(c) =>
        val n = psql.sql(
          s"from $table |> where coalesce(($c), false) |> select count(*) as n")
          .collect()(0).getLong(0)
        (n, psql.sql(s"from $table |> where not coalesce(($c), false)"))
      case None =>
        (spark.table(table).count(), spark.table(table).limit(0))
    }
    cowSwap(spark, table, next)
    countDf(spark, affected)
  }

  private def update(spark: SparkSession, stmt: String): DataFrame = {
    val sc = scan(stmt)
    require(topLevelKeyword(stmt, sc, Seq("from")).isEmpty,
      "UPDATE … FROM is not supported — precompute the join into a staging " +
        "table and UPDATE with a correlated `IN`/scalar subquery instead")
    val (table, after) = identifierAt(stmt, "update".length)
    val setPos = topLevelKeyword(stmt, sc, Seq("set")).find(_ >= after)
      .getOrElse(throw new IllegalArgumentException(
        "UPDATE must be `UPDATE <table> SET col = expr[, …] [WHERE <cond>]`"))
    val wherePos = topLevelKeyword(stmt, sc, Seq("where")).find(_ > setPos)
    val setText = stmt.substring(setPos + "set".length, wherePos.getOrElse(stmt.length))
    val cond = wherePos.map(p => stmt.substring(p + "where".length).trim)
    checkTarget(spark, table)
    val fields = spark.table(table).schema.fields
    val assigns: Seq[(String, String)] = splitTopCommas(setText).map(_.trim)
      .filter(_.nonEmpty).map { part =>
        val psc = scan(part)
        var eq = -1
        var i = 0
        while (eq < 0 && i < part.length) {
          if (psc.topLevel(i) && part.charAt(i) == '=') eq = i else i += 1
        }
        require(eq > 0, s"malformed SET assignment '$part'")
        val lhs = part.substring(0, eq).trim
        require(identRe.pattern.matcher(lhs).matches(),
          s"SET target must be a bare column name, got '$lhs'")
        (lhs, part.substring(eq + 1).trim)
      }
    val unknown = assigns.map(_._1)
      .filterNot(a => fields.exists(_.name.equalsIgnoreCase(a)))
    require(unknown.isEmpty,
      s"UPDATE $table: SET columns not in table: ${unknown.mkString(", ")}")
    val dup = assigns.groupBy(_._1.toLowerCase).collect { case (k, v) if v.size > 1 => k }
    require(dup.isEmpty, s"UPDATE $table: column assigned twice: ${dup.mkString(", ")}")
    val byCol = assigns.map { case (c, e) => c.toLowerCase -> e }.toMap
    val condSql = cond.map(c => s"coalesce(($c), false)").getOrElse("true")
    // assigned columns keep their declared type: the cast spelling routes
    // through rewriteCasts → GraftCast for integer/boolean targets, so
    // `SET int_col = 2.5` rounds the way DuckDB's assignment cast does
    val selList = fields.map { f =>
      byCol.get(f.name.toLowerCase) match {
        case Some(e) =>
          s"cast((case when $condSql then ($e) else ${f.name} end) as ${f.dataType.sql}) as ${f.name}"
        case None => f.name
      }
    }
    val psql = Psql(spark)
    val affected = cond match {
      case Some(c) =>
        psql.sql(s"from $table |> where coalesce(($c), false) |> select count(*) as n")
          .collect()(0).getLong(0)
      case None => spark.table(table).count()
    }
    val next = psql.sql(s"from $table |> select ${selList.mkString(", ")}")
    cowSwap(spark, table, next)
    countDf(spark, affected)
  }

  /** Parse a (plain) identifier starting at/after i0; returns (name, end). */
  private def identifierAt(stmt: String, i0: Int): (String, Int) = {
    var i = i0
    while (i < stmt.length && Character.isWhitespace(stmt.charAt(i))) i += 1
    var j = i
    while (j < stmt.length && (Character.isLetterOrDigit(stmt.charAt(j)) ||
      stmt.charAt(j) == '_' || stmt.charAt(j) == '.')) j += 1
    require(j > i, s"expected a table name at offset $i0")
    (stmt.substring(i, j), j)
  }

  private def checkTarget(spark: SparkSession, name: String): Unit = {
    require(spark.catalog.tableExists(name), s"DML target '$name' does not exist")
    val t = spark.catalog.getTable(name)
    require(t.tableType == "MANAGED",
      s"DML target '$name' is ${t.tableType} — the copy-on-write lowering " +
        "rewrites the table's files, which is only safe for MANAGED warehouse " +
        "tables (CTAS/saveAsTable). Materialize the view into a table first.")
  }

  /** Materialize `next` into a shadow table, then swap it in. */
  private def cowSwap(spark: SparkSession, table: String, next: DataFrame): Unit = {
    val tmp = table + "__graft_cow"
    graft.operators.Bucketing.dropTableAndLocation(spark, tmp)
    next.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(tmp)
    graft.operators.Bucketing.dropTableAndLocation(spark, table)
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  private def countDf(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    Seq(n).toDF("Count")
  }

  private def splitTopCommas(s: String): Seq[String] = {
    val sc = scan(s)
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (sc.topLevel(i) && s.charAt(i) == ',') { parts += s.substring(start, i); start = i + 1 }
      i += 1
    }
    parts += s.substring(start)
    parts.toSeq
  }
}
