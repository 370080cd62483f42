package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Shared parse-once kernel: the generated class and the interpreted path
  * both materialize the sketch from its serialized form exactly once per
  * JVM-side instance (mutable codegen state / transient lazy val), so the
  * per-row work is just the k hash probes.
  */
object BloomKernel {
  def parse(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}

/** `might_contain(h)` over a fixed, pre-built Bloom filter — the map-side
  * prune behind [[graft.operators.TrainingPipeline.decontaminateBloom]].
  * Guarantees: no false negatives ever (a member is always reported), so a
  * downstream exact verify of the survivors restores exact semantics; false
  * positives only cost verify work, bounded by the filter's fpp.
  *
  * The filter rides the plan as serialized bytes (same shipping story as
  * Spark's own runtime bloom join filters): executors get it once per task
  * broadcast, and codegen parses it once per generated-class instance into
  * mutable state — zero per-row deserialization. Size the filter at build
  * time (expectedItems/fpp), not data size: 1M keys at 1% fpp ≈ 1.2 MB.
  *
  * Holds bytes as an `IndexedSeq` so two expressions built from the same
  * filter are `semanticEquals` (an `Array` field compares by reference and
  * defeats subexpression elimination, cf. TopCentroidsExpr).
  */
case class BloomMightContainExpr(child: Expression, filterBytes: IndexedSeq[Byte])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val filter: BloomFilter = BloomKernel.parse(filterBytes.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // default case-class rendering dumps every filter byte into explain output
  override def toString: String = s"$prettyName($child, <${filterBytes.length}B sketch>)"
  override def sql: String = s"$prettyName(${child.sql})"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", filterBytes.toArray, "byte[]")
    val filterVar = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloom",
      v => s"$v = graft.functions.BloomKernel.parse($bytesRef);")
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $filterVar.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Build a Bloom filter over the LONG values of `keyCol` in `df` — one
    * aggregation pass; the sketch (not the data) comes back to the driver,
    * with size fixed by (expectedItems, fpp) regardless of row count.
    */
  def buildLongFilter(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      expectedItems: Long,
      fpp: Double): BloomFilter =
    df.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** `might_contain` Column over a pre-built filter (bigint keys). */
  def mightContainLong(filter: BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(key), bos.toByteArray.toIndexedSeq))
  }
}
