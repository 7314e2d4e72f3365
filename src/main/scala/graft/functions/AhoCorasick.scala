package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Classic Aho-Corasick multi-pattern automaton over UTF-8 bytes.
  *
  * Built once on the driver from the (literal) pattern list and shipped
  * to executors as a codegen reference object, so the corpus scan is a
  * SINGLE pass counting every pattern simultaneously — versus the P
  * separate regex/`replace` passes the naive plan runs (the swap-in the
  * `q_blocklist_filter` Scaladoc promises; at 100 TB the difference is
  * P full corpus reads vs one). Byte-level matching is exact for any
  * byte strings: UTF-8 is self-synchronizing, so an ASCII pattern can
  * never false-match inside a multi-byte sequence.
  *
  * Semantics: counts EVERY occurrence of every pattern, including
  * overlapping occurrences and patterns nested inside other patterns
  * (the dictionary-suffix-link construction) — i.e. for each pattern p
  * the count of positions i with text[i, i+|p|) == p.
  *
  * Sizing: the dense byte-indexed goto table is O(totalPatternBytes ×
  * 256) ints — kilobytes for word blocklists; a production million-term
  * list would switch the same automaton to sparse transitions, the scan
  * loop is unchanged.
  */
final class AhoCorasickAutomaton(val patterns: Array[String])
    extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  private val numPatterns = patterns.length

  // Dense automaton: state -> 256 next-states, plus per-state list of
  // pattern ids ending there (own output ++ dictionary-suffix outputs,
  // folded during the BFS so the scan loop never chases fail links).
  private val (gotoTab: Array[Int], outTab: Array[Array[Int]]) = {
    val patBytes = patterns.map(_.getBytes("UTF-8"))
    val maxStates = 1 + patBytes.map(_.length).sum
    val next = Array.fill(maxStates * 256)(-1)
    val ownOut = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    var p = 0
    while (p < numPatterns) {
      var s = 0
      val bs = patBytes(p)
      var i = 0
      while (i < bs.length) {
        val c = bs(i) & 0xff
        if (next(s * 256 + c) == -1) {
          next(s * 256 + c) = nStates
          nStates += 1
        }
        s = next(s * 256 + c)
        i += 1
      }
      ownOut(s) ::= p
      p += 1
    }
    val fail = new Array[Int](nStates)
    val out = new Array[Array[Int]](nStates)
    out(0) = ownOut(0).toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val t = next(c)
      if (t == -1) next(c) = 0
      else { fail(t) = 0; queue.enqueue(t) }
      c += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = (ownOut(s) ++ out(fail(s)).toList).toArray
      var c2 = 0
      while (c2 < 256) {
        val t = next(s * 256 + c2)
        if (t == -1) {
          // dense goto: missing edge inherits the fail state's edge
          next(s * 256 + c2) = next(fail(s) * 256 + c2)
        } else {
          fail(t) = next(fail(s) * 256 + c2)
          queue.enqueue(t)
        }
        c2 += 1
      }
    }
    (next, out)
  }

  /** One pass over the bytes; returns per-pattern occurrence counts
    * aligned with the constructor's pattern order. */
  def countAll(text: UTF8String): Array[Int] = {
    val counts = new Array[Int](numPatterns)
    val n = text.numBytes
    var state = 0
    var i = 0
    while (i < n) {
      state = gotoTab(state * 256 + (text.getByte(i) & 0xff))
      val hits = outTab(state)
      var h = 0
      while (h < hits.length) { counts(hits(h)) += 1; h += 1 }
      i += 1
    }
    counts
  }
}

/** `multi_pattern_count(string) -> array<int>`: per-pattern occurrence
  * counts from one Aho-Corasick scan, inside whole-stage codegen. The
  * automaton is a codegen reference object (built once, not per row);
  * the generated call is a static-shaped virtual dispatch identical to
  * how Spark's own regexp expressions reference their compiled Pattern.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val automaton =
    new AhoCorasickAutomaton(patterns.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "multi_pattern_count"

  override def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(automaton.countAll(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasickAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData
         |  .toArrayData($ac.countAll($c));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasick {
  /** Column wrapper: one-pass multi-pattern occurrence counts. */
  def multiPatternCount(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCount(
      ColumnBridge.expression(text), patterns))
}
