package graft

import org.apache.spark.sql.SparkSession

// scratch drive (deleted after verification)
object GuardCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val psql = graft.psql.Psql(spark)
    spark.sql("SELECT CAST(id AS INT) AS i, CAST(id * 2 AS INT) AS j FROM range(5)")
      .createOrReplaceTempView("t1")
    val df = psql.sql("from t1 |> select i union by name from t1 |> select i, j")
    df.show(20)
    println(df.queryExecution.logical.treeString)
  }
}
