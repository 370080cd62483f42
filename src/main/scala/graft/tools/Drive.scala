package graft.tools

import org.apache.spark.sql.SparkSession

// scratch end-to-end drive (verify skill) — delete after use
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val psql = graft.psql.Psql(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lineitem")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("orders")

    println("[drive] union by name:")
    psql.sql("from lineitem |> select l_orderkey, l_quantity |> limit 3 union by name " +
      "from lineitem |> select l_quantity, l_orderkey |> limit 3").show()
    println("[drive] CTE head + pipe tail:")
    psql.sql("with big as (select * from orders where o_totalprice > 100000) " +
      "from big |> select o_orderpriority, count() as n group by o_orderpriority |> order by n desc |> limit 3").show()
    println("[drive] explain by-name plan:")
    psql.sql("from lineitem |> select l_orderkey union by name from orders |> select o_orderkey as l_orderkey")
      .explain("formatted")
    spark.stop()
  }
}
