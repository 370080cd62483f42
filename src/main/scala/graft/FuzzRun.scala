package graft

import org.apache.spark.sql.SparkSession
import graft.psql.Psql

/** Differential-fuzz executor: reads `<outDir>/queries.json` (written by
  * `tools/fuzz.py`) with entries `{"name": …, "psql": …}`, runs each
  * pipeline through the PSQL front-end, and writes `<outDir>/out/<name>
  * .parquet` (or `<name>.error` with the message). The python side then runs
  * the reference's own nested-FROM rewrite of the same text in DuckDB and
  * hash-compares — fuzzing the whole front-end+engine stack, not just the
  * fixed inventory.
  */
object FuzzRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    // auxiliary deterministic views for the asof/positional fuzz shapes —
    // tools/fuzz.py creates the SAME views in DuckDB, so both engines join
    // against identical relations (right sides need unique (key, time) rows
    // for asof-payload determinism and a total order for positional zip)
    locally {
      import org.apache.spark.sql.functions._
      spark.table("events").where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("purchase_value"))
        .withColumnRenamed("ts", "pts")
        .createOrReplaceTempView("purchases_f")
      spark.table("orders").select("o_orderkey")
        .orderBy(col("o_orderkey").desc).limit(100)
        .createOrReplaceTempView("pos_r")
    }
    val psql = Psql(spark)
    // minimal JSON parsing (name/psql string fields, no nesting)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(outDir, "queries.json")), "UTF-8")
    // match the (name, psql) pair without anchoring on the closing brace:
    // entries may carry extra fields (duck_psql for families where the
    // DuckDB side needs an equivalent formulation instead of the same text)
    val entry = """"name"\s*:\s*"([^"]+)"\s*,\s*"psql"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    val queries = entry.findAllMatchIn(text).map { m =>
      (m.group(1), m.group(2).replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\"))
    }.toList
    queries.foreach { case (name, q) =>
      val target = java.nio.file.Paths.get(outDir, "out", name + ".parquet").toString
      // statement-script entries: statements separated by a `;;` line run
      // in order (DDL/DML execute eagerly inside sql()); the LAST
      // statement's result is the comparable output
      try {
        val stmts = q.split("\n;;\n").map(_.trim).filter(_.nonEmpty)
        stmts.init.foreach(psql.sql)
        psql.sql(stmts.last).coalesce(1).write.mode("overwrite").parquet(target)
      } catch {
        case e: Throwable =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir, "out"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, "out", name + ".error"),
            String.valueOf(e.getMessage).getBytes("UTF-8"))
      }
    }
    println(s"fuzz: executed ${queries.size} queries")
    spark.stop()
  }
}
