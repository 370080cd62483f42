package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for DuckDB-semantics casts ([[GraftCast]]). Static
  * methods so the expression can call them through StaticInvoke — the
  * call inlines into whole-stage codegen; no per-row closure.
  *
  * DuckDB 1.0 integer-cast semantics, probed directly (each rule below
  * is a probe result, not an assumption):
  *   - DOUBLE/FLOAT → int: round HALF TO EVEN (2.5::DOUBLE → 2,
  *     3.5 → 4, -2.5 → -2); NaN/±inf/out-of-range error (NULL under TRY).
  *     Spark's Cast TRUNCATES toward zero — a silent wrong answer for
  *     every fractional value ≥ .5.
  *   - DECIMAL → int: round HALF AWAY FROM ZERO (2.5 → 3, -2.5 → -3).
  *   - VARCHAR → int: whitespace-trimmed; optional +/- sign; decimal
  *     digits with `_` separators BETWEEN digits ('1_000' → 1000);
  *     unsigned 0x/0X hex and 0b/0B binary forms ('0x1A' → 26,
  *     '0b101' → 5, '-0x10' is an error); otherwise the DECIMAL-string
  *     route: parse as a decimal number ('3.9', '1e3', '.5', '5.') and
  *     round half away from zero ('3.9' → 4, '.5' → 1). Spark returns
  *     NULL (or errors under ANSI) for every fractional/hex/binary/
  *     underscore form.
  *   - VARCHAR → boolean: NO trimming (' true ' errors where '  42  '
  *     → 42 succeeds); case-insensitive members {true, false, t, f,
  *     1, 0} only ('yes'/'y' error — Spark accepts them).
  *   - numeric → boolean: nonzero → true (Spark agrees; delegated).
  *
  * Strict casts throw (DuckDB Conversion Error ≙ Spark ANSI cast
  * error); TRY variants return null.
  */
object GraftCastUtil {
  private def fail(what: String, target: String): Nothing =
    throw new ArithmeticException(
      s"graft_cast: could not cast $what to $target (DuckDB semantics)")

  /** DOUBLE/FLOAT → integral: rint (half-even), bounds-checked. */
  def rintLong(d: Double, lo: Long, hi: Long, tryMode: Boolean,
      target: UTF8String): java.lang.Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) {
      if (tryMode) return null else fail(s"DOUBLE $d", target.toString)
    }
    val r = Math.rint(d)
    // compare in double space: (double)Long.MaxValue rounds UP to 2^63,
    // so `r > hi.toDouble` correctly rejects the 2^63 boundary itself
    if (r < lo.toDouble || r > hi.toDouble ||
        (hi == Long.MaxValue && r >= 9.223372036854776e18)) {
      if (tryMode) return null else fail(s"DOUBLE $d", target.toString)
    }
    java.lang.Long.valueOf(r.toLong)
  }

  /** VARCHAR → integral, DuckDB grammar (see object doc). */
  def stringToLong(s: UTF8String, lo: Long, hi: Long, tryMode: Boolean,
      target: UTF8String): java.lang.Long = {
    def bad(): java.lang.Long =
      if (tryMode) null else fail(s"STRING '${s.toString}'", target.toString)
    val t = s.toString.trim
    if (t.isEmpty) return bad()
    // unsigned hex / binary prefixes (sign not allowed with a prefix)
    val radix =
      if (t.length > 2 && t.charAt(0) == '0' &&
        (t.charAt(1) == 'x' || t.charAt(1) == 'X')) 16
      else if (t.length > 2 && t.charAt(0) == '0' &&
        (t.charAt(1) == 'b' || t.charAt(1) == 'B')) 2
      else 10
    try {
      val v: java.math.BigDecimal =
        if (radix != 10) {
          // `_` separators strictly BETWEEN digits ('0x_1A', '0xFF_' are
          // errors in DuckDB, same rule as the radix-10 grammar)
          val raw = t.substring(2)
          val dre = if (radix == 16) "[0-9A-Fa-f](?:_?[0-9A-Fa-f])*"
                    else "[01](?:_?[01])*"
          if (!raw.matches(dre)) return bad()
          new java.math.BigDecimal(new java.math.BigInteger(raw.replace("_", ""), radix))
        } else {
          // `_` digit separators are legal between digits only, in the
          // integer, fractional, AND exponent parts ('1_000.5', '1.2e1_0')
          if (t.contains("_") && !t.matches(
            "[+-]?(?:[0-9](?:_?[0-9])*(?:\\.(?:[0-9](?:_?[0-9])*)?)?|\\.[0-9](?:_?[0-9])*)(?:[eE][+-]?[0-9](?:_?[0-9])*)?"))
            return bad()
          new java.math.BigDecimal(t.replace("_", ""))
        }
      // reject/short-circuit BEFORE setScale: a huge-exponent input like
      // '1e2000000000' ('1e-2000000000') would otherwise materialize a
      // billions-of-digits BigInteger (compute 10^2e9) inside setScale
      // just to fail (round to 0) — CPU/memory blowup on malformed data
      // where DuckDB simply errors
      val intDigits = v.precision() - v.scale() // count of integer digits
      if (intDigits > 19) return bad() // can't fit any 64-bit target
      val rounded =
        if (intDigits < 0) java.math.BigDecimal.ZERO // |v| < 0.1 → 0
        else v.setScale(0, java.math.RoundingMode.HALF_UP) // away from zero
      if (rounded.compareTo(java.math.BigDecimal.valueOf(lo)) < 0 ||
          rounded.compareTo(java.math.BigDecimal.valueOf(hi)) > 0) bad()
      else java.lang.Long.valueOf(rounded.longValueExact())
    } catch {
      case _: NumberFormatException => bad()
      case _: ArithmeticException   => bad()
    }
  }

  /** VARCHAR → boolean: exact member set, case-insensitive, NO trim. */
  def stringToBoolean(s: UTF8String, tryMode: Boolean): java.lang.Boolean = {
    val t = s.toString.toLowerCase(java.util.Locale.ROOT)
    t match {
      case "true" | "t" | "1"  => java.lang.Boolean.TRUE
      case "false" | "f" | "0" => java.lang.Boolean.FALSE
      case _ =>
        if (tryMode) null
        else fail(s"STRING '${s.toString}'", "BOOLEAN")
    }
  }
}

/** DuckDB-semantics CAST / TRY_CAST to integral and boolean targets.
  * The PSQL rewriter routes `CAST(e AS <int type|boolean>)` and
  * `TRY_CAST(...)` here; the source type is only known at analysis, so
  * dispatch happens on `child.dataType` once resolved ([[GraftSubscript]]
  * mechanics) and DELEGATES to the chosen tree:
  *   - fractional double/float → [[GraftCastUtil.rintLong]] (half-even),
  *   - decimal → Round(child, 0) then Cast (Spark Round is HALF_UP =
  *     away-from-zero, exactly DuckDB's decimal rule),
  *   - string → [[GraftCastUtil.stringToLong]] / stringToBoolean,
  *   - anything else (integral, boolean, date …) → plain Cast, TRY mode
  *     when tryMode — behavior there already agrees cross-engine.
  */
case class GraftCast(child: Expression, targetName: String, tryMode: Boolean)
  extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))

  private val target: (DataType, Long, Long) =
    targetName.toLowerCase(java.util.Locale.ROOT) match {
      case "tinyint" | "int1"                    => (ByteType, Byte.MinValue.toLong, Byte.MaxValue.toLong)
      case "smallint" | "int2" | "short"         => (ShortType, Short.MinValue.toLong, Short.MaxValue.toLong)
      case "int" | "int4" | "integer" | "signed" => (IntegerType, Int.MinValue.toLong, Int.MaxValue.toLong)
      case "bigint" | "int8" | "long"            => (LongType, Long.MinValue, Long.MaxValue)
      case "bool" | "boolean"                    => (BooleanType, 0L, 0L)
      case other => throw new IllegalArgumentException(
        s"graft_cast target must be an integer or boolean type, got '$other'")
    }

  private def evalMode: EvalMode.Value =
    if (tryMode) EvalMode.TRY else EvalMode.fromSQLConf(org.apache.spark.sql.internal.SQLConf.get)

  private lazy val delegate: Expression = {
    val (dt, lo, hi) = target
    val tryLit = Literal(tryMode)
    val nameLit = Literal(UTF8String.fromString(targetName.toUpperCase(java.util.Locale.ROOT)), StringType)
    (child.dataType, dt) match {
      case (StringType, BooleanType) =>
        StaticInvoke(GraftCastUtil.getClass, BooleanType, "stringToBoolean",
          Seq(child, tryLit), Seq(StringType, BooleanType),
          returnNullable = true)
      case (StringType, _) =>
        Cast(StaticInvoke(GraftCastUtil.getClass, LongType, "stringToLong",
          Seq(child, Literal(lo), Literal(hi), tryLit, nameLit),
          Seq(StringType, LongType, LongType, BooleanType, StringType),
          returnNullable = true), dt, None, EvalMode.LEGACY)
      case (FloatType | DoubleType, t) if t != BooleanType =>
        Cast(StaticInvoke(GraftCastUtil.getClass, LongType, "rintLong",
          Seq(Cast(child, DoubleType), Literal(lo), Literal(hi), tryLit, nameLit),
          Seq(DoubleType, LongType, LongType, BooleanType, StringType),
          returnNullable = true), dt, None, EvalMode.LEGACY)
      case (_: DecimalType, t) if t != BooleanType =>
        // Spark Round = HALF_UP (away from zero) — DuckDB's decimal rule;
        // the width cast then runs in TRY/session mode for overflow
        Cast(Round(child, Literal(0)), dt, None, evalMode)
      case _ =>
        Cast(child, dt, None, evalMode)
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | FloatType | DoubleType | BooleanType | DateType |
         TimestampType | _: DecimalType | ByteType | ShortType |
         IntegerType | LongType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cast source type ${other.catalogString} is not castable to $targetName")
  }
  override def dataType: DataType = target._1
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = delegate.genCode(ctx)
    ev.copy(code = d.code, isNull = d.isNull, value = d.value)
  }
}
