package graft.psql

import org.apache.spark.sql.{DataFrame, Dataset}

/** PSQL composability on `Dataset` (SURVEY §1.3): apply pipe stages directly
  * to a DataFrame, so library users can mix DataFrame code with PSQL stage
  * fragments:
  *
  * {{{
  * import graft.psql.implicits._
  * df.pipe("where l_quantity > 40")
  *   .pipe("select l_returnflag, count() as n group by l_returnflag")
  *   .pipe("order by n desc |> limit 5")
  * }}}
  *
  * Each call registers the frame under a unique temp view and runs
  * `from <view> |> stages…` through the normal rewriter, so stage semantics
  * (QUALIFY, count(), shims, multiple stages per call) are identical to
  * `Psql.sql`.
  */
object implicits {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  implicit final class PsqlDatasetOps[T](private val ds: Dataset[T]) {
    def pipe(stages: String): DataFrame = {
      val view = s"__psql_pipe_${counter.incrementAndGet()}"
      ds.createOrReplaceTempView(view)
      try Psql(ds.sparkSession).sql(s"from $view |> $stages")
      finally
        // Dataset construction analyzes eagerly, so the resolved plan no
        // longer needs the catalog entry — drop it to keep long-lived
        // sessions from accumulating views
        ds.sparkSession.catalog.dropTempView(view)
    }
  }
}
