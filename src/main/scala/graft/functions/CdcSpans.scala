package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_spans(string) -> array<struct<st:int, en:int>>`: content-defined
  * chunk spans (1-based, inclusive) from one pass over the text's bytes.
  *
  * Boundary rule (the FastCDC-family shape): a chunk ends at every
  * position `p >= W` where the rolling fingerprint of the trailing
  * `W = 8` bytes — here the windowed byte sum, the simplest genuine
  * rolling hash; Rabin/gear swap in without changing the loop — hits
  * `0 mod 17`; the final position always closes the last chunk. Chunk
  * identity is therefore INVARIANT under insertions elsewhere in the
  * document, the property fixed-size chunking lacks.
  *
  * This expression exists for performance, not semantics: the
  * declarative formulation (explode one row per character, rolling-sum
  * window per doc, lag over boundary positions, re-join to the text —
  * exactly what the DuckDB oracle still runs) shuffles |corpus-chars|
  * rows to compute what is a strictly per-row sequential scan. Chunking
  * has no cross-row dataflow, so a scalar expression is the right
  * altitude: one pass per document inside whole-stage codegen, then
  * only ~|text|/17 span rows ever leave the scan. Byte == character
  * here: the corpus is ASCII (the oracle's per-char `ascii(substring)`
  * agrees with the byte view); for general UTF-8 both sides would
  * window over bytes.
  */
case class CdcSpans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("st", IntegerType, nullable = false),
      StructField("en", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cdc_spans"

  override def nullSafeEval(input: Any): Any =
    CdcSpans.spans(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcSpans.spans($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcSpans {
  private final val Window = 8
  private final val Mod = 17

  /** One pass: rolling trailing-8 byte sum, boundary where sum % 17 == 0
    * (positions >= 8), forced final boundary at n. 1-based inclusive
    * spans that tile [1, n] exactly. Empty text -> no spans. */
  def spans(text: UTF8String): ArrayData = {
    val n = text.numBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var winsum = 0
    var last = 0 // last boundary position (0 = none yet)
    var i = 1 // 1-based
    while (i <= n) {
      winsum += text.getByte(i - 1) & 0xff
      if (i > Window) winsum -= text.getByte(i - 1 - Window) & 0xff
      if (i >= Window && winsum % Mod == 0) {
        out += InternalRow(last + 1, i)
        last = i
      }
      i += 1
    }
    if (last < n) out += InternalRow(last + 1, n)
    new GenericArrayData(out.toArray[Any])
  }

  /** Column wrapper: content-defined chunk spans. */
  def cdcSpans(text: Column): Column =
    ColumnBridge.column(CdcSpans(ColumnBridge.expression(text)))
}
