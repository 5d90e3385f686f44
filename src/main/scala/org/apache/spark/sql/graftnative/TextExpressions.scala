package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-shingling — the corpus-side hot path of every minhash /
  * jaccard / decontamination operator. Output is IDENTICAL to the
  * higher-order-function formulation
  * `when(size(toks) >= k, transform(sequence(1, size(toks)-k+1),
  *   i => concat_ws(" ", slice(toks, i, k)))).otherwise(array())`
  * with `toks = split(text, " ")` (equivalence pinned in ScaleOpsSpec),
  * but the HOF chain is `CodegenFallback`: Spark evaluates the lambda,
  * `split`, `slice` and `concat_ws` through interpreted `eval` trees per
  * row — allocation-heavy, megamorphic, and the dominant cost of the
  * signature stage (observed via thread dumps pinning tasks inside
  * `StringSplit.nullSafeEval`).
  *
  * This expression exploits that joining k consecutive space-split
  * tokens with " " reconstructs the ORIGINAL BYTES: every shingle is a
  * substring of the input between two token boundaries. One byte scan
  * finds the boundaries (0x20 never occurs inside a UTF-8 multibyte
  * sequence), and each shingle is a zero-copy slice of the row's byte
  * array — O(len + shingles), no regex, no per-token strings, fully
  * inside whole-stage codegen.
  *
  * Null/short-input semantics mirror the HOF form: a NULL text or a text
  * with fewer than k tokens yields an EMPTY array (the `when` guard's
  * `otherwise` branch — a null condition also falls through to it), so
  * the expression itself is never NULL.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShingles.emptyArray()
    else WordShingles.compute(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${childGen.isNull}
        |  ? org.apache.spark.sql.graftnative.WordShingles.emptyArray()
        |  : org.apache.spark.sql.graftnative.WordShingles.compute(${childGen.value}, $k);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val EMPTY: ArrayData = new GenericArrayData(new Array[AnyRef](0))

  /** Shared immutable empty result (also referenced from generated code). */
  def emptyArray(): ArrayData = EMPTY

  /** One-pass shingling over the string's bytes; see class doc. Called
    * per row from both generated and interpreted paths.
    */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val b = text.getBytes
    val len = b.length
    var spaces = 0
    var i = 0
    while (i < len) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < k) return EMPTY
    // token j spans [starts(j), ends(j)); separators are single bytes
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var ti = 0
    var st = 0
    i = 0
    while (i < len) {
      if (b(i) == 0x20) { starts(ti) = st; ends(ti) = i; ti += 1; st = i + 1 }
      i += 1
    }
    starts(ti) = st
    ends(ti) = len
    val out = new Array[AnyRef](nTok - k + 1)
    var j = 0
    while (j <= nTok - k) {
      out(j) = UTF8String.fromBytes(b, starts(j), ends(j + k - 1) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native polynomial rolling hash — the document-fingerprint hot path.
  * Output is IDENTICAL to the higher-order-function formulation
  * `aggregate(transform(split(text, ""), c => ascii(c)), 7L,
  *   (acc, c) => (acc*31 + c) % 2147483647)` (equivalence pinned in
  * ScaleOpsSpec), but the HOF chain materializes a per-CHARACTER string
  * array and folds it through interpreted lambda eval; this expression
  * is one codegen'd code-point walk. `split(text, "")` yields [''] for
  * the empty string (ascii 0 → one fold step), mirrored here; a NULL
  * text is NULL like any null-intolerant expression.
  */
case class PolyRollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(v: Any): Any =
    PolyRollingHash.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftnative.PolyRollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyRollingHash {
  private final val Mod = 2147483647L

  def compute(text: UTF8String): Long = {
    val s = text.toString
    if (s.isEmpty) return (7L * 31L) % Mod // split('','') = [''], ascii('') = 0
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

object TextExpressions {
  /** Column-level API: native word k-shingles of a text column (see
    * [[WordShingles]]).
    */
  def word_shingles(text: Column, k: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), k))

  /** Column-level API: native polynomial rolling hash (see
    * [[PolyRollingHash]]).
    */
  def rolling_hash(text: Column): Column =
    ExpressionUtils.column(PolyRollingHash(ExpressionUtils.expression(text)))
}
