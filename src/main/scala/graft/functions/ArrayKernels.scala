package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

// (Md5Prefix60 below also references StringType/BinaryType via their
// fully-qualified names to keep this import list minimal.)

/** Merge-walk intersection count over two SORTED, DISTINCT long arrays
  * — the set-similarity verification kernel behind
  * [[SortedIntersectCount]]. Callable from generated Java (top-level
  * object = static forwarder), no per-row allocation. */
object SortedIntersectAlgo {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** `sorted_intersect_count(array<long>, array<long>) -> int`:
  * |a ∩ b| for arrays that are sorted ascending and duplicate-free
  * (the `sort_array(collect_list(...))` over a distinct relation
  * shape). Value-identical to `size(array_intersect(a, b))` under that
  * precondition, but a single merge walk instead of a per-row hash-set
  * build + output-array materialization — the verification inner loop
  * of prefix-filter / set-similarity joins runs per CANDIDATE PAIR, so
  * the kernel must not allocate. Same static-kernel codegen pattern as
  * [[JaroWinkler]] / [[CommonPrefixLen]]. Callers own the sortedness
  * precondition (enforced where the arrays are built, not re-checked
  * per row). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private val longArray = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    Integer.valueOf(SortedIntersectAlgo.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectAlgo.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayKernels {
  /** Column wrapper: merge-walk |a ∩ b| over sorted distinct long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** First 60 bits of the MD5 digest as a long — the digest-direct
  * kernel behind [[Md5Prefix60]]. One thread-local MessageDigest,
  * reused per task thread; no hex render. */
object Md5PrefixAlgo {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def hash60(bytes: Array[Byte]): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(bytes)
    // first 15 hex chars of the digest = bytes 0-6 plus the high
    // nibble of byte 7, read big-endian — a 60-bit value, always
    // non-negative, exactly what conv(substring(md5(x),1,15),16,10)
    // parses back out of the hex string
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }
}

/** `md5_prefix60(string|binary) -> long`: the engine-wide
  * cross-engine-reproducible 60-bit hash
  * (`conv(substring(md5(c), 1, 15), 16, 10)::long`), computed straight
  * from the digest bytes. The SQL formulation renders a 32-char hex
  * string, substrings it, and base-converts 15 hex digits through
  * `conv`'s string parser — four allocations and two string walks per
  * hashed token, in the inner loop of every shingle/signature/split
  * query. Value-identical by construction (hex chars 1-15 ARE digest
  * bytes 0-7's high 60 bits); the DuckDB oracle keeps the hex
  * formulation. Same static-kernel codegen pattern as [[JaroWinkler]]. */
case class Md5Prefix60(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string or binary argument, got " +
          other.catalogString)
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix60"

  private def isString = child.dataType ==
    org.apache.spark.sql.types.StringType

  override def nullSafeEval(a: Any): Any = java.lang.Long.valueOf(
    Md5PrefixAlgo.hash60(
      if (isString)
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      else a.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      if (isString)
        s"${ev.value} = graft.functions.Md5PrefixAlgo.hash60($a.getBytes());"
      else
        s"${ev.value} = graft.functions.Md5PrefixAlgo.hash60($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
