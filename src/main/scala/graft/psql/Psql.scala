package graft.psql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry point: `Psql(spark).sql(psqlQuery)`.
  *
  * Mirrors the reference's API of "submit PSQL text wherever SQL is
  * accepted" (ywelsch/duckdb-psql `src/psql_extension.cpp:51-90`): input with
  * pipe tokens is rewritten; anything else passes through to `spark.sql`
  * verbatim (pass-through contract, `src/psql_extension.cpp:76-79`), except
  * bare FROM-first queries which are normalized so DuckDB-style `from t`
  * works too.
  *
  * File-path relations (`from 'data.csv'`, reference `README.md:8`) are
  * resolved by registering a temp view per distinct path; format is chosen by
  * extension (csv / parquet / json), with CSV using header + schema
  * inference like DuckDB's sniffer. Remote http(s) URLs are fetched to a
  * local temp file once per session (the reference delegates this to
  * DuckDB's httpfs extension).
  */
class Psql(val spark: SparkSession) {

  def sql(query: String): DataFrame = {
    val t = query.trim
    // DuckDB `SUMMARIZE <table or query>`: column-statistics profile of the
    // relation — mapped to Dataset.summary() over the summarized relation
    if (SqlScanner.matchesWord(t, 0, "summarize")) {
      val inner = Psql.preprocess(spark, t.substring("summarize".length).trim.stripSuffix(";"))
      val src =
        if (inner.isEmpty) throw new IllegalArgumentException("SUMMARIZE needs a table or query")
        else if (SqlScanner.matchesWord(inner, 0, "select") || inner.startsWith("(")) spark.sql(inner)
        else spark.table(inner)
      return src.summary()
    }
    // DuckDB `UNION [ALL] BY NAME` has no Spark SQL text form: lift it into
    // a Catalyst byName Union plan (sides parsed recursively as PSQL)
    Psql.byNamePlan(spark, query, s => spark.sql(s).queryExecution.logical) match {
      case Some(plan) =>
        return org.apache.spark.sql.graftbridge.ColumnBridge.dataFrame(spark, plan)
      case None => ()
    }
    val finalSql = Psql.preprocess(spark, query)
    spark.sql(finalSql)
  }

  /** The pure string rewrite (no execution) — exposed for tests/EXPLAIN. */
  def rewriteOnly(query: String): String = Psql.rewriteOnly(query)
}

object Psql {
  def apply(spark: SparkSession): Psql = new Psql(spark)

  /** Full front-end preprocessing: multi-statement guard → pipe/block
    * rewrite → quoted-path relation registration. Shared by the library
    * entry point ([[Psql.sql]]) and the parser injection
    * ([[PsqlSparkExtension]]).
    */
  private[psql] def preprocess(spark: SparkSession, query: String): String = {
    rejectMultiStatement(query)
    val rewritten = rewriteOnly(query)
    val (finalSql, paths) = PathRelations.extractPaths(rewritten)
    paths.foreach { case (view, path) => PathRelations.register(spark, view, path) }
    finalSql
  }

  private[psql] def rewriteOnly(query: String): String = {
    if (PsqlRewriter.isPsql(query)) PsqlRewriter.rewrite(query)
    else {
      val t = query.trim
      // normalize bare FROM-first queries (with or without a plain-paren
      // CTE prefix) and COPY sinks (DuckDB-isms) even without pipes
      if (t.nonEmpty &&
          (SqlScanner.matchesWord(t, 0, "from") || PsqlRewriter.isFromFirstWith(t) ||
            PsqlRewriter.isCopy(t)))
        PsqlRewriter.rewrite(t)
      else t
    }
  }

  /** Lift a top-level `UNION [ALL|DISTINCT] BY NAME` (DuckDB dialect; no
    * Spark SQL text form) into `Union(byName = true, allowMissingCol =
    * true)` — missing columns null-fill, like DuckDB. Plain UNION BY NAME
    * deduplicates, so it wraps in Distinct. Sides are full PSQL and parse
    * through `parse` (recursing for by-name chains).
    */
  private[psql] def byNamePlan(
      spark: SparkSession,
      query: String,
      parse: String => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Distinct, Union}
    PsqlRewriter.splitUnionByName(query).map { case (left, isAll, right) =>
      def side(s: String) =
        byNamePlan(spark, s, parse).getOrElse(parse(preprocess(spark, s)))
      val u = Union(Seq(side(left), side(right)), byName = true, allowMissingCol = true)
      if (isAll) u else Distinct(u)
    }
  }

  /** The reference silently keeps only `statements[0]` of a multi-statement
    * script (`src/psql_extension.cpp:85-89`) — a footgun SURVEY §7 says to
    * handle explicitly. We reject instead: a top-level `;` with content after
    * it is an error (a trailing semicolon stays legal, `psql.test:22-23`).
    */
  private def rejectMultiStatement(query: String): Unit = {
    val sc = SqlScanner.scan(query)
    var i = 0
    while (i < query.length) {
      if (sc.topLevel(i) && query.charAt(i) == ';') {
        val next = SqlScanner.nextCode(query, sc, i + 1)
        if (next >= 0 && query.charAt(next) != ';')
          throw new IllegalArgumentException(
            "multi-statement input is not supported: submit one PSQL statement at a time " +
              s"(found a second statement starting at offset $next)")
      }
      i += 1
    }
  }
}

/** Quoted-path FROM/JOIN sources → temp views backed by DataFrameReader. */
object PathRelations {

  /** Replace top-level-or-nested `FROM '<path>'` / `JOIN '<path>'` string
    * literals in rewritten SQL with deterministic view names; returns the
    * new SQL plus (viewName, path) pairs to register.
    */
  def extractPaths(sqlText: String): (String, Seq[(String, String)]) = {
    val sc = SqlScanner.scan(sqlText)
    val sb = new StringBuilder
    val found = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < sqlText.length) {
      var consumed = false
      if (sc.code(i) && (SqlScanner.matchesWord(sqlText, i, "from") || SqlScanner.matchesWord(sqlText, i, "join"))) {
        val kwLen = 4
        val j = SqlScanner.nextCode(sqlText, sc, i + kwLen)
        if (j >= 0 && sqlText.charAt(j) == '\'') {
          // find end of the literal ('' escape)
          var k = j + 1
          var end = -1
          while (k < sqlText.length && end < 0) {
            if (sqlText.charAt(k) == '\'') {
              if (k + 1 < sqlText.length && sqlText.charAt(k + 1) == '\'') k += 2
              else end = k
            } else k += 1
          }
          if (end > 0) {
            val path = sqlText.substring(j + 1, end).replace("''", "'")
            val view = viewNameFor(path)
            found.getOrElseUpdate(view, path)
            sb.append(sqlText.substring(i, i + kwLen)).append(' ').append(view)
            i = end + 1
            consumed = true
          }
        }
      }
      if (!consumed) { sb.append(sqlText.charAt(i)); i += 1 }
    }
    (sb.toString, found.toSeq)
  }

  def viewNameFor(path: String): String =
    "psql_src_" + Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(path)).toLowerCase

  def register(spark: SparkSession, view: String, path0: String): Unit = {
    if (spark.catalog.tableExists(view)) return
    val path = if (path0.matches("(?i)^https?://.*")) fetchToLocal(path0) else path0
    val lower = path.toLowerCase
    val df =
      if (lower.endsWith(".parquet") || lower.endsWith(".pq")) spark.read.parquet(path)
      else if (lower.endsWith(".orc")) spark.read.orc(path)
      else if (lower.endsWith(".json") || lower.endsWith(".jsonl") || lower.endsWith(".ndjson")) spark.read.json(path)
      else if (lower.endsWith(".tsv"))
        spark.read.option("header", true).option("inferSchema", true).option("sep", "\t").csv(path)
      else // default: CSV with header + inference, like DuckDB's sniffer
        spark.read.option("header", true).option("inferSchema", true)
          .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]")
          .csv(path)
    df.createOrReplaceTempView(view)
  }

  /** One-shot HTTP(S) fetch to a session-lifetime temp file (the analog of
    * the reference relying on DuckDB httpfs, `test/sql/psql.test:48-55`).
    */
  private def fetchToLocal(url: String): String = {
    val suffix = url.reverse.takeWhile(_ != '.').reverse match {
      case s if s.length <= 8 => "." + s
      case _                  => ".dat"
    }
    val tmp = java.io.File.createTempFile("psql_http_", suffix)
    tmp.deleteOnExit()
    val in = new java.net.URI(url).toURL.openStream()
    try java.nio.file.Files.copy(in, tmp.toPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.getAbsolutePath
  }
}
