package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB bracket subscripts with ENGINE-SIDE type dispatch.
  *
  * The PSQL rewriter turns `x[i]` / `x[a:b]` into calls to these
  * expressions; the base's type is only known at analysis, so the
  * rewrite cannot pick between array semantics (element_at / slice) and
  * DuckDB's STRING subscripts (`'abcde'[2]` = 'b', `[2:4]` = 'bcd') — this
  * expression dispatches on `base.dataType` once resolved and DELEGATES
  * both eval and codegen to the chosen built-in tree, so the array/map hot
  * path stays exactly the ElementAt/Slice codegen it was before strings
  * were supported.
  *
  * Probed DuckDB 1.0 string semantics (all reproduced):
  *   - `s[i]`: 1-based; negative counts from the end; 0 and out-of-range
  *     give '' (empty string, NOT null); NULL index gives NULL.
  *   - `s[a:b]`: both ends INCLUSIVE, open ends allowed, negative ends
  *     count from the end (`[3:-1]` = 'cde'), out-of-range clamps
  *     (`[-9:2]` = 'ab'), inverted gives '' (`[4:2]`), NULL bound gives
  *     NULL (hence the explicit IsNull guard — a bare If would fall into
  *     its else branch on a null predicate and return '' instead).
  */
case class GraftSubscript(base: Expression, idx: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(base, idx)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(base = c(0), idx = c(1))

  private lazy val delegate: Expression = base.dataType match {
    case StringType =>
      val i = Cast(idx, IntegerType)
      If(EqualTo(i, Literal(0)),
        Literal(UTF8String.fromString(""), StringType),
        Substring(base, i, Literal(1)))
    case _ => ElementAt(base, idx)
  }

  override def checkInputDataTypes(): TypeCheckResult = base.dataType match {
    case StringType | _: ArrayType | _: MapType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subscript base must be string, array, or map, got ${other.catalogString}")
  }
  override def dataType: DataType = delegate.dataType
  override def nullable: Boolean = delegate.nullable
  override def foldable: Boolean = delegate.foldable
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = delegate.genCode(ctx)
    ev.copy(code = d.code, isNull = d.isNull, value = d.value)
  }
}

/** DuckDB `len(x)` / `array_length(x)` — polymorphic over strings,
  * binary, and lists, returning BIGINT (probed; Spark's length/size
  * return INT, so the delegate casts — output-type parity is what the
  * type-faithful oracle hashes). Maps are NOT accepted (DuckDB 1.0
  * len(map) is a binder error too). */
case class GraftLen(child: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))

  private lazy val delegate: Expression = child.dataType match {
    case StringType | BinaryType => Cast(Length(child), LongType)
    case _: ArrayType            => Cast(Size(child), LongType)
    case other => throw new IllegalStateException(
      s"len on unchecked type ${other.catalogString}")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"len argument must be string, binary, or array, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = delegate.nullable
  override def foldable: Boolean = delegate.foldable
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = delegate.genCode(ctx)
    ev.copy(code = d.code, isNull = d.isNull, value = d.value)
  }
}

/** DuckDB `generate_series(a, b[, s])` — INCLUSIVE bounds (like Spark's
  * `sequence`) but with DuckDB's empty-on-direction-mismatch semantics:
  * `generate_series(1, 0)` is an EMPTY list where Spark `sequence(1, 0, 1)`
  * THROWS "illegal sequence boundaries". Integral inputs normalize to
  * BIGINT (DuckDB's output type); date/timestamp/interval series delegate
  * to Sequence untouched (their direction semantics already agree).
  * Dispatch and delegation mechanics as [[GraftSubscript]].
  *
  * `exclusive = true` is DuckDB's sibling `range(a, b[, s])` — the stop
  * bound is EXCLUDED (probed on DuckDB 1.0: `range(5)` = [0..4],
  * `range(2,5)` = [2,3,4], `range(5,2,-1)` = [5,4,3], `range(2,2)` = [],
  * `range(1,5,0)` = [], NULL bound/step → NULL, output BIGINT[]). For
  * integral inputs the exclusive stop is re-expressed as an inclusive
  *  bound at `stop - signum(step)` — integer series can never land
  * between the two — so the hot path stays one pure codegen'd Sequence.
  * Temporal series (date/timestamp + interval step) instead drop a
  * trailing element equal to `stop` via ArrayRemove (a monotonic
  * sequence can only contain `stop` as its last element); note DuckDB
  * emits TIMESTAMP[] for date ranges where Spark's Sequence keeps
  * DATE[] — same instants, different physical type (documented
  * divergence, same as the inclusive form). */
case class GraftSeries(start: Expression, stop: Expression, step: Expression,
    exclusive: Boolean = false)
  extends Expression {
  override def children: Seq[Expression] = Seq(start, stop, step)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(start = c(0), stop = c(1), step = c(2))

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _                                             => false
  }

  private lazy val delegate: Expression = (start.dataType, stop.dataType) match {
    case (a, b) if integral(a) && integral(b) =>
      val a = Cast(start, LongType)
      val b0 = Cast(stop, LongType)
      val st = Cast(step, LongType)
      // exclusive (range): largest reachable element is < stop, so the
      // equivalent inclusive bound is stop-1 for ascent, stop+1 for
      // descent; step 0 falls through both direction guards to [].
      // stop-1/stop+1 would WRAP at the Long extremes (range(x,
      // Long.MinValue) ascending → inclusive bound Long.MaxValue — a
      // huge/erroring Sequence instead of []); those boundary stops can
      // only ever mean an empty result, so short-circuit them before
      // the arithmetic runs
      val b = if (!exclusive) b0
        else If(GreaterThan(st, Literal(0L)),
          Subtract(b0, Literal(1L)), Add(b0, Literal(1L)))
      val boundOk = if (!exclusive) Literal(true)
        else Not(Or(
          And(GreaterThan(st, Literal(0L)), EqualTo(b0, Literal(Long.MinValue))),
          And(LessThan(st, Literal(0L)), EqualTo(b0, Literal(Long.MaxValue)))))
      val directionOk = And(boundOk, Or(
        And(GreaterThan(st, Literal(0L)), LessThanOrEqual(a, b)),
        And(LessThan(st, Literal(0L)), GreaterThanOrEqual(a, b))))
      // NULL bound/step → NULL result (DuckDB and Spark sequence agree).
      // Without the explicit guard, a NULL directionOk predicate would fall
      // into If's false branch and silently yield [] instead of NULL.
      val anyNull = Or(Or(IsNull(a), IsNull(b0)), IsNull(st))
      If(anyNull, Literal.create(null, ArrayType(LongType)),
        If(directionOk, new Sequence(a, b, Some(st), None),
          Literal.create(Array.empty[Long], ArrayType(LongType))))
    case _ if exclusive =>
      ArrayRemove(new Sequence(start, stop, Some(step), None), stop)
    case _ => new Sequence(start, stop, Some(step), None)
  }

  override def dataType: DataType = delegate.dataType
  override def nullable: Boolean = delegate.nullable
  override def foldable: Boolean = delegate.foldable
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = delegate.genCode(ctx)
    ev.copy(code = d.code, isNull = d.isNull, value = d.value)
  }
}

/** `x[a:b]` — open ends are encoded STRUCTURALLY (None), selected by
  * function NAME at registration (graft_slice / graft_slice_from /
  * graft_slice_to): a null-literal sentinel would be ambiguous once
  * constant folding turns a genuinely-null bound expression into the same
  * literal. A null RUNTIME bound yields NULL, as DuckDB does. Array
  * formulas are byte-identical to the former text-level rewrite, so
  * existing plans and the q79 gate row are unchanged. */
case class GraftSlice(base: Expression, loOpt: Option[Expression],
    hiOpt: Option[Expression]) extends Expression {
  override def children: Seq[Expression] = Seq(base) ++ loOpt ++ hiOpt
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = {
    var k = 1
    val nl = loOpt.map { _ => val e = c(k); k += 1; e }
    val nh = hiOpt.map { _ => val e = c(k); k += 1; e }
    copy(base = c(0), loOpt = nl, hiOpt = nh)
  }

  private lazy val delegate: Expression = base.dataType match {
    case StringType =>
      val len = Length(base)
      val a0: Expression = loOpt.map(Cast(_, IntegerType)).getOrElse(Literal(1))
      val b0: Expression = hiOpt.map(Cast(_, IntegerType)).getOrElse(len)
      val a1 = If(LessThan(a0, Literal(0)), Add(Add(len, a0), Literal(1)), a0)
      val b1 = If(LessThan(b0, Literal(0)), Add(Add(len, b0), Literal(1)), b0)
      val a2 = Greatest(Seq(a1, Literal(1)))
      val b2 = Least(Seq(b1, len))
      val sliced = If(GreaterThanOrEqual(b2, a2),
        Substring(base, a2, Add(Subtract(b2, a2), Literal(1))),
        Literal(UTF8String.fromString(""), StringType))
      // null guard on the PRE-clamp bounds: Greatest/Least skip nulls, so
      // a2/b2 would silently absorb a null runtime bound
      If(Or(IsNull(a0), IsNull(b0)), Literal(null, StringType), sliced)
    case _: ArrayType => (loOpt, hiOpt) match {
      case (None, None)         => base
      case (None, Some(hi))     => Slice(base, Literal(1), Cast(hi, IntegerType))
      case (Some(lo), None)     =>
        Slice(base, lo,
          Greatest(Seq(Add(Subtract(Size(base), lo), Literal(1)), Literal(0))))
      case (Some(lo), Some(hi)) =>
        Slice(base, lo, Greatest(Seq(Add(Subtract(hi, lo), Literal(1)), Literal(0))))
    }
    case other => throw new IllegalStateException(
      s"graft_slice on unchecked type ${other.catalogString}")
  }

  override def checkInputDataTypes(): TypeCheckResult = base.dataType match {
    case StringType | _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"slice base must be string or array, got ${other.catalogString}")
  }
  override def dataType: DataType = delegate.dataType
  override def nullable: Boolean = delegate.nullable
  override def foldable: Boolean = delegate.foldable
  override def eval(input: InternalRow): Any = delegate.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = delegate.genCode(ctx)
    ev.copy(code = d.code, isNull = d.isNull, value = d.value)
  }
}
