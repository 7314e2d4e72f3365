package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity kernel, callable from both the interpreted
  * eval path and generated Java (top-level Scala objects emit static
  * forwarders, so codegen references
  * `graft.functions.JaroWinklerAlgo.similarity(...)` directly).
  *
  * Definition parity (the DuckDB oracle's `jaro_winkler_similarity`,
  * the standard Winkler variant; validated pairwise against it over the
  * whole part-name fixture in StringSimilaritySpec):
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0);
  *   - transpositions = aligned-mismatch count / 2, FLOORED to an
  *     integer (the rapidfuzz convention DuckDB inherits — the classic
  *     real-valued mism/2 was algebraically reverse-engineered out of
  *     the observed divergence and disconfirmed over 80k pairs);
  *   - prefix boost `+ l·0.1·(1−jaro)` for the common prefix l ≤ 4,
  *     applied only when jaro exceeds the 0.7 boost threshold.
  */
object JaroWinklerAlgo {

  /** Entry point for the expression. ASCII inputs (numBytes ==
    * numChars) run a zero-copy CONCRETE byte kernel — no String
    * materialization in the blocked join's inner loop, and no lambda
    * indirection either (a Function1-parameterized kernel measured
    * ~15% SLOWER than the String path it replaced; the two loops are
    * duplicated on purpose to stay monomorphic for the JIT). Anything
    * non-ASCII falls back to the char kernel for correct comparison. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    if (a.numBytes == a.numChars && b.numBytes == b.numChars)
      jaroWinklerBytes(a, b)
    else jaroWinkler(a.toString, b.toString)

  def jaroWinkler(s: String, t: String): Double = {
    val j = jaro(s, t)
    if (j > 0.7) {
      val max = math.min(4, math.min(s.length, t.length))
      var l = 0
      while (l < max && s.charAt(l) == t.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  private def jaroWinklerBytes(s: UTF8String, t: UTF8String): Double = {
    val j = jaroBytes(s, t)
    if (j > 0.7) {
      val max = math.min(4, math.min(s.numBytes, t.numBytes))
      var l = 0
      while (l < max && s.getByte(l) == t.getByte(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  def jaro(s: String, t: String): Double = {
    val la = s.length
    val lb = t.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val sM = new Array[Boolean](la)
    val tM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var k = math.max(0, i - window)
      var found = false
      while (k <= hi && !found) {
        if (!tM(k) && t.charAt(k) == s.charAt(i)) {
          sM(i) = true; tM(k) = true; m += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var j = 0
    i = 0
    while (i < la) {
      if (sM(i)) {
        while (!tM(j)) j += 1
        if (s.charAt(i) != t.charAt(j)) mismatches += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val transpositions = mismatches / 2 // floored — see object doc
    (md / la + md / lb + (md - transpositions) / md) / 3.0
  }

  /** Byte-for-byte copy of [[jaro]] over UTF8String bytes (ASCII-only
    * inputs; the caller guarantees numBytes == numChars). */
  private def jaroBytes(s: UTF8String, t: UTF8String): Double = {
    val la = s.numBytes
    val lb = t.numBytes
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val sM = new Array[Boolean](la)
    val tM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var k = math.max(0, i - window)
      var found = false
      while (k <= hi && !found) {
        if (!tM(k) && t.getByte(k) == s.getByte(i)) {
          sM(i) = true; tM(k) = true; m += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var j = 0
    i = 0
    while (i < la) {
      if (sM(i)) {
        while (!tM(j)) j += 1
        if (s.getByte(i) != t.getByte(j)) mismatches += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val transpositions = mismatches / 2 // floored — see object doc
    (md / la + md / lb + (md - transpositions) / md) / 3.0
  }
}

/** `jaro_winkler(string, string) -> double` as a native Catalyst
  * expression: the entity-resolution kernel (fuzzy name matching)
  * Spark lacks as a builtin — `levenshtein` exists, the
  * prefix-weighted ratio classically used for name dedup does not.
  * Same design rationale as [[CosineSimilarity]]: the kernel runs in
  * the inner loop of a blocked self-join, so it must stay inside the
  * WholeStageCodegen span instead of boxing through a Scala UDF; the
  * generated code is a static call into [[JaroWinklerAlgo]], the
  * pattern Spark's own string expressions use for nontrivial kernels.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerAlgo.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Byte-level longest-common-prefix kernel behind [[CommonPrefixLen]].
  * Counts leading equal CODE POINTS (the unit SQL `substring(s, k, 1)`
  * compares), capped at `cap`: two UTF-8 strings share a code point
  * prefix iff they share its byte encoding, so one byte-compare loop
  * finds the mismatch and a second bounded walk counts the complete
  * code points inside the common byte prefix — no per-position
  * substring allocation. */
object CommonPrefixAlgo {
  def lcp(a: UTF8String, b: UTF8String, cap: Int): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    // count code points that END within the common byte prefix [0, i)
    var cnt = 0
    var j = 0
    while (j < i && cnt < cap) {
      val c = ab(j) & 0xFF
      val len =
        if (c < 0x80) 1 else if (c < 0xE0) 2 else if (c < 0xF0) 3 else 4
      if (j + len <= i) { cnt += 1; j += len }
      else j = i // mismatch mid-code-point: that code point is unequal
    }
    cnt
  }
}

/** `common_prefix_len(string, string)` capped at `cap` code points, as
  * a native codegen expression: the suffix-array LCP kernel. The SQL
  * formulation (count k in 1..cap with substring(s_a,1,k) =
  * substring(s_b,1,k), k bounded by both lengths) allocates cap
  * substring pairs per row — O(cap²) char traffic; this is one byte
  * loop, value-identical (prefix k equal ⟺ code points 1..k all
  * equal ⟺ byte encodings equal). Same static-kernel codegen pattern
  * as [[JaroWinkler]]. */
case class CommonPrefixLen(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "common_prefix_len"

  override def nullSafeEval(a: Any, b: Any): Any =
    Integer.valueOf(CommonPrefixAlgo.lcp(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixAlgo.lcp($a, $b, $cap);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column wrapper: Jaro-Winkler similarity of two string columns. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: leading-code-point match count, capped at `cap`. */
  def commonPrefixLen(a: Column, b: Column, cap: Int): Column =
    ColumnBridge.column(CommonPrefixLen(
      ColumnBridge.expression(a), ColumnBridge.expression(b), cap))
}
