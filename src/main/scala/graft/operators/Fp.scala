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

  /** Cross-engine-stable STRING rendering of a double at 6 decimals.
    * Neither engine's native double→string agrees above 1e7 (Java flips to
    * scientific notation; below that, `%.6f` still diverges above ~4e9
    * because Java pads the shortest-repr with zeros while C-family printf
    * expands the exact binary value). This renders through BIGINT
    * integer/fraction parts computed with IEEE-exact ops only (abs, floor,
    * −, ·, +) — identical input bits therefore produce identical integers,
    * and BIGINT→string is trivially identical — so the contract PROVABLY
    * holds for all |x| < 1e15 (integer part exact below 2^53, far under
    * BIGINT range). Beyond 1e15, and for NaN/±Inf, explicit fallbacks
    * (`%.6e` / literals) keep the rendering total; the `%.6e` band matches
    * cross-engine except for exactly-representable round-to-7-digit ties,
    * which is the documented residual risk of the astronomical range.
    */
  def fmt6(c: Column): Column = {
    val d = c.cast("double")
    val a = abs(d)
    val ip0 = floor(a)
    val fr0 = floor((a - ip0) * lit(1000000.0) + lit(0.5))
    val carry = fr0 >= lit(1000000.0)
    val ip = (ip0 + when(carry, lit(1.0)).otherwise(lit(0.0))).cast("bigint")
    val fr = when(carry, lit(0L)).otherwise(fr0.cast("bigint"))
    when(d.isNull, lit(null).cast("string"))
      .when(isnan(d), lit("NaN"))
      .when(d === lit(Double.PositiveInfinity), lit("Infinity"))
      .when(d === lit(Double.NegativeInfinity), lit("-Infinity"))
      .when(a >= lit(1e15), format_string("%.6e", d))
      .otherwise(concat(when(d < 0, lit("-")).otherwise(lit("")),
        ip.cast("string"), lit("."), lpad(fr.cast("string"), 6, "0")))
  }

  /** DuckDB-side mirror of [[fmt6]] for oracle builders — the identical
    * exact-IEEE integer/fraction split, stated in SQL.
    */
  def fmt6Sql(expr: String): String = {
    val x = s"($expr)::DOUBLE"
    val a = s"abs($x)"
    val fr0 = s"floor(($a - floor($a)) * 1000000.0 + 0.5)"
    s"""CASE WHEN $x IS NULL THEN NULL
       | WHEN isnan($x) THEN 'NaN'
       | WHEN $x = 'infinity'::DOUBLE THEN 'Infinity'
       | WHEN $x = '-infinity'::DOUBLE THEN '-Infinity'
       | WHEN $a >= 1e15 THEN printf('%.6e', $x)
       | ELSE concat(CASE WHEN $x < 0 THEN '-' ELSE '' END,
       |   CAST(CAST(floor($a) + CASE WHEN $fr0 >= 1000000.0 THEN 1.0 ELSE 0.0 END AS BIGINT) AS VARCHAR),
       |   '.',
       |   lpad(CAST(CAST(CASE WHEN $fr0 >= 1000000.0 THEN 0.0 ELSE $fr0 END AS BIGINT) AS VARCHAR), 6, '0'))
       | END""".stripMargin.replace("\n", " ")
  }
}
