package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine floating-point output discipline shared by the operator
  * family: oracle-checked doubles must land on the identical bits in Spark
  * and DuckDB, which holds for IEEE basic ops (± · / sqrt are correctly
  * rounded everywhere) but NOT for `round(x, n)` — Spark rounds the exact
  * binary value via BigDecimal HALF_UP while DuckDB rounds through a scaled
  * multiply, and they disagree on boundary-adjacent values (observed live on
  * a15's rolling means). `floor(x·10⁶ + 0.5)/10⁶` uses exact ops only, so
  * both engines compute the identical grid point; the SQL mirror is the
  * same expression verbatim.
  */
object Fp {

  /** 6-decimal output grid from IEEE-exact mul/add/floor/div. */
  def grid6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** DuckDB-side mirror of [[grid6]] for oracle builders. */
  def grid6Sql(expr: String): String =
    s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"
}
