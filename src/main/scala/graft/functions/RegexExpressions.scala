package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `regexp_replace` semantics, both of which diverge from Spark's:
  *
  *   - the 3-arg form replaces the FIRST match only (probed:
  *     `regexp_replace('aaa','a','b')` = 'baa'); Spark's is always global
  *     — a silent wrong answer for every ported query with >1 match.
  *   - the replacement syntax is RE2-style: `\1` is a group ref, `$2` is
  *     a LITERAL dollar-two (probed) — exactly inverted from Java, so the
  *     replacement translates at runtime (`\N` → `$N`, `$` → `\$`,
  *     `\\` → literal backslash), cached per distinct value.
  *
  * The rewriter routes `regexp_replace(s, re, rep)` here with
  * global=false and the `…, 'g')` form with global=true (i/s/m flags
  * become inline `(?ism)` pattern prefixes at rewrite time). Pattern and
  * translated replacement are cached across rows like Spark's own
  * RegExpReplace; evaluation is CodegenFallback — this is a porting-parity
  * operator, not a 100 TB hot-path kernel (those use the codegen'd
  * Spark-native global form).
  */
case class GraftRegexpReplace(subject: Expression, regexp: Expression,
    rep: Expression, global: Boolean)
  extends TernaryExpression with CodegenFallback {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "regexp_replace arguments must all be strings, got " +
        children.map(_.dataType.catalogString).mkString(", "))
  override def dataType: DataType = StringType
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(subject = f, regexp = s, rep = t)

  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: java.util.regex.Pattern = _
  @transient private var lastRep: UTF8String = _
  @transient private var javaRep: String = _

  private def toJavaReplacement(r: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (Character.isDigit(n)) out.append('$').append(n)
        else if (n == '\\') out.append("\\\\")
        else out.append(n)
        i += 2
      } else if (c == '$') { out.append("\\$"); i += 1 }
      else if (c == '\\') { out.append("\\\\"); i += 1 }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  override protected def nullSafeEval(s: Any, r: Any, p: Any): Any = {
    val re = r.asInstanceOf[UTF8String]
    if (lastRegex == null || !re.equals(lastRegex)) {
      lastRegex = re.clone()
      pattern = java.util.regex.Pattern.compile(re.toString)
    }
    val rp = p.asInstanceOf[UTF8String]
    if (lastRep == null || !rp.equals(lastRep)) {
      lastRep = rp.clone()
      javaRep = toJavaReplacement(rp.toString)
    }
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    UTF8String.fromString(
      if (global) m.replaceAll(javaRep) else m.replaceFirst(javaRep))
  }
}
