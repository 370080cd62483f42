package graft

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.warehouse.dir", "/tmp/probe_wh_" + System.nanoTime())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tryIt(label: String)(f: => Unit): Unit =
      try { f; println(s"PROBE $label: OK") }
      catch { case e: Throwable => println(s"PROBE $label: FAIL ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.take(2).mkString(" | ")}") }

    tryIt("create-default") {
      spark.sql("CREATE TABLE pt1 (i INT, v STRING DEFAULT 'x') USING parquet")
      spark.sql("INSERT INTO pt1 (i) VALUES (1)")
      spark.sql("SELECT * FROM pt1").show()
    }
    tryIt("create-notnull") {
      spark.sql("CREATE TABLE pt2 (i INT NOT NULL, v STRING) USING parquet")
      spark.sql("INSERT INTO pt2 VALUES (1, 'a')")
    }
    tryIt("notnull-violation") {
      spark.sql("INSERT INTO pt2 VALUES (NULL, 'b')")
      spark.sql("SELECT * FROM pt2").show()
    }
    tryIt("create-pk") {
      spark.sql("CREATE TABLE pt3 (i INT PRIMARY KEY, v STRING) USING parquet")
    }
    tryIt("create-check") {
      spark.sql("CREATE TABLE pt4 (i INT CHECK (i > 0), v STRING) USING parquet")
    }
    tryIt("create-unique") {
      spark.sql("CREATE TABLE pt5 (i INT UNIQUE, v STRING) USING parquet")
    }
    tryIt("tblproperties") {
      spark.sql("CREATE TABLE pt6 (i INT, v STRING) USING parquet TBLPROPERTIES ('graft.pk'='i')")
      spark.sql("SHOW TBLPROPERTIES pt6").show(false)
      println(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("pt6")).properties)
    }
    tryIt("alter-setprops") {
      spark.sql("ALTER TABLE pt6 SET TBLPROPERTIES ('graft.pk'='i,v')")
    }
    spark.stop()
  }
}
