package graft.psql

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.apache.spark.sql.SparkSession

/** HTTP(S) scan path end-to-end: the reference's README demo and test corpus
  * scan LIVE urls (`/root/reference/test/sql/psql.test:47-55`,
  * `README.md:8`), delegating the fetch to DuckDB's httpfs. Our analog is
  * [[PathRelations]] fetching http(s) paths to a session-lifetime temp file
  * before handing them to the DataFrameReader. This spec serves the
  * reference's own example CSVs from a loopback [[HttpServer]] and runs the
  * FULL README pipeline — remote scan, remote join and `version()` — through
  * both the library entry point and the injected parser, golden-checked
  * against `README.md:41-50`.
  */
class PsqlHttpScanSpec extends SparkSpec {

  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val f = new java.io.File("/root/reference/example", ex.getRequestURI.getPath.stripPrefix("/"))
        if (f.isFile && f.getParentFile.getName == "example") {
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          ex.getResponseHeaders.add("Content-Type", "text/csv")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        } else ex.sendResponseHeaders(404, -1)
        ex.close()
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def readmePipeline(inv: String, cus: String): String =
    s"""from '$inv' |>
       |where invoice_date >= date '1970-01-16' |>
       |select
       |  *,
       |  0.8 as transaction_fees,
       |  total - transaction_fees as income |>
       |where income > 1 |>
       |select
       |  customer_id,
       |  avg(total),
       |  sum(income) as sum_income,
       |  count() as ct
       |  group by customer_id |>
       |order by sum_income desc |>
       |limit 10 |>
       |as invoices
       |  join '$cus'
       |    as customers
       |  on invoices.customer_id = customers.customer_id |>
       |select
       |  customer_id,
       |  last_name || ', ' || first_name as name,
       |  sum_income,
       |  version() as db_version""".stripMargin

  // README.md:41-50 golden rows (db_version is engine-specific by design)
  private val golden = Seq(
    (6L, "Holý, Helena", 43.83),
    (7L, "Gruber, Astrid", 36.83),
    (24L, "Ralston, Frank", 37.83),
    (25L, "Stevens, Victor", 36.83),
    (26L, "Cunningham, Richard", 41.83),
    (28L, "Barnett, Julia", 37.83),
    (37L, "Zimmermann, Fynn", 37.83),
    (45L, "Kovács, Ladislav", 39.83),
    (46L, "O'Reilly, Hugh", 39.83),
    (57L, "Rojas, Luis", 40.83))

  private def check(rows: Array[org.apache.spark.sql.Row]): Unit = {
    val got = rows.map(r => (r.get(0).toString.toLong, r.getString(1),
      math.rint(BigDecimal(r.get(2).toString).toDouble * 100) / 100)).sortBy(_._1).toSeq
    assert(got == golden, got.mkString("\n"))
    assert(rows.forall(_.getString(3) == Psql.versionString))
  }

  test("README pipeline over live HTTP urls matches the golden result (psql.test:47-55)") {
    val q = readmePipeline(
      s"http://127.0.0.1:$port/invoices.csv", s"http://127.0.0.1:$port/customers.csv")
    check(Psql(spark).sql(q).collect())
  }

  test("HTTP scan works through the injected parser (spark.sql)") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new PsqlSparkExtension)
        .getOrCreate()
      val q = readmePipeline(
        s"http://127.0.0.1:$port/invoices.csv", s"http://127.0.0.1:$port/customers.csv")
      check(s.sql(q).collect())
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
