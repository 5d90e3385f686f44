package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Product-quantization kernels with REFERENCE-OBJECT codebooks — the
  * round-11 replacement for the inline-literal PQ formulation that hit
  * the JVM codegen wall (Janino `InternalCompilerException` once the
  * encode projection inlined ~74k literal doubles at pq_k=128; measured
  * in the round-10 1M-vector probe, STRESS_ANN_r10). The codebook, the
  * per-(centroid, cell) encode offsets, and the per-query ADC lookup
  * tables ride the plan as `ctx.addReferenceObj` arrays — shipped once
  * per task through the codegen references array, exactly how Spark's
  * own large-object expressions (and [[LshBucketsFloat]]) do it — so
  * generated-code SIZE is constant in the centroid count and production
  * codebooks (k = 128, 256, ...) compile and run inside whole-stage
  * codegen.
  *
  * Arithmetic is BIT-IDENTICAL to the literal formulation it replaces
  * (pinned in PqExpressionsSpec against a literal-column reconstruction):
  * sequential left-to-right double folds for every dot product, the same
  * `(dot / nv) − off − halfNorm` subtraction order, first-maximum
  * argmax under Spark's double total order (`==` short-circuit, then
  * `java.lang.Double.compare` — NaN greatest, −0.0 = 0.0), and the ADC
  * sum accumulated left-to-right starting FROM the first term (not from
  * 0.0, which would flip a −0.0 first entry).
  */
object PqExpressions {

  /** Column API: PQ code of one subspace (see [[PqSubspaceCode]]).
    * `cbFlat` is k×sub row-major; `offFlat` is cells×k row-major —
    * TRANSPOSED so one row's argmax walks the offsets for its cell
    * SEQUENTIALLY (the (ki, cell) layout strides `cells` doubles per
    * centroid: ~8k cache-line misses per row over a multi-MB table at
    * production book shapes, measured 10×+ slower at m=32·k=256) —
    * (empty + cells=0 + cId=None for the raw non-residual form);
    * `halfNorms` the per-centroid ‖c‖²/2 terms.
    */
  def subspaceCode(emb: Column, nv: Column, cId: Option[Column],
      cbFlat: Array[Float], offFlat: Array[Double], halfNorms: Array[Double],
      start: Int, sub: Int, k: Int, cells: Int): Column =
    ExpressionUtils.column(PqSubspaceCode(
      ExpressionUtils.expression(emb), ExpressionUtils.expression(nv),
      cId.map(ExpressionUtils.expression),
      cbFlat, offFlat, halfNorms, start, sub, k, cells))

  /** Column API: per-query ADC score Σ_m LUT[m][code_m] (+ q̂·c(cell) when
    * `qCellDots` is non-empty — the residual form's extra term). `lutFlat`
    * is m×k row-major.
    */
  def adcScore(codes: Seq[Column], cId: Option[Column],
      lutFlat: Array[Double], qCellDots: Array[Double]): Column =
    ExpressionUtils.column(PqAdcLutScore(
      codes.map(ExpressionUtils.expression),
      cId.map(ExpressionUtils.expression), lutFlat, qCellDots))
}

/** PQ encode of ONE subspace: code = argmax over the k centroids of
  * `dot(x[start..start+sub), c_ki) / nv − off[ki][cId] − ‖c_ki‖²/2`,
  * first-maximum tie-break — one fused pass replacing k separate
  * dot-product columns plus `array_position(…, array_max(…))`. The raw
  * (non-residual) form passes `cells = 0` / `cId = None` and skips the
  * offset subtraction entirely (preserving the literal path's exact
  * operation order rather than subtracting a 0.0).
  *
  * NULL result when the embedding, nv, or cId is null, the embedding is
  * shorter than `start + sub`, or a needed element is null — matching
  * the literal formulation, where a null/short slice nulls every score
  * and `array_position(scores, null)` is null.
  */
case class PqSubspaceCode(embedding: Expression, nv: Expression,
    cId: Option[Expression], cbFlat: Array[Float], offFlat: Array[Double],
    halfNorms: Array[Double], start: Int, sub: Int, k: Int, cells: Int)
  extends Expression {
  require(cbFlat.length == k * sub, "codebook shape mismatch")
  require(halfNorms.length == k, "halfNorms shape mismatch")
  require((cells == 0 && cId.isEmpty && offFlat.isEmpty) ||
    (cells > 0 && cId.nonEmpty && offFlat.length == k * cells),
    "offset table / cId arity mismatch")

  override def children: Seq[Expression] = Seq(embedding, nv) ++ cId.toSeq
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val e = embedding.eval(input)
    if (e == null) return null
    val nvV = nv.eval(input)
    if (nvV == null) return null
    val cidV = cId match {
      case Some(c) =>
        val v = c.eval(input)
        if (v == null) return null
        v.asInstanceOf[Int]
      case None => 0
    }
    val arr = e.asInstanceOf[ArrayData]
    if (arr.numElements() < start + sub) return null
    var i = 0
    while (i < sub) {
      if (arr.isNullAt(start + i)) return null
      i += 1
    }
    val n = nvV.asInstanceOf[Double]
    var best = 0.0
    var bi = -1
    var ki = 0
    while (ki < k) {
      var acc = 0.0
      i = 0
      while (i < sub) {
        acc += arr.getFloat(start + i).toDouble * cbFlat(ki * sub + i).toDouble
        i += 1
      }
      var s = acc / n
      if (cells > 0) s -= offFlat(cidV * k + ki)
      s -= halfNorms(ki)
      // Spark double total order: == short-circuit (−0.0 = 0.0), then
      // Double.compare (NaN greatest); strict > keeps the FIRST maximum
      if (bi < 0 || (!(s == best) && java.lang.Double.compare(s, best) > 0)) {
        best = s
        bi = ki
      }
      ki += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val embGen = embedding.genCode(ctx)
    val nvGen = nv.genCode(ctx)
    val cidGen = cId.map(_.genCode(ctx))
    val cb = ctx.addReferenceObj("pqCb", cbFlat, "float[]")
    val off = if (cells > 0) ctx.addReferenceObj("pqOff", offFlat, "double[]") else ""
    val hn = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[]")
    val arr = ctx.freshName("arr")
    val nvV = ctx.freshName("nv")
    val cid = ctx.freshName("cid")
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val ki = ctx.freshName("ki")
    val acc = ctx.freshName("acc")
    val s = ctx.freshName("s")
    val best = ctx.freshName("best")
    val bi = ctx.freshName("bi")
    val cidCode = cidGen.map(g =>
      s"""
         |${g.code}
         |if (${g.isNull}) { ${ev.isNull} = true; }
         |else { $cid = ${g.value}; }
       """.stripMargin).getOrElse("")
    val offTerm = if (cells > 0) s"$s -= $off[$cid * $k + $ki];" else ""
    val code =
      code"""
        |${embGen.code}
        |${nvGen.code}
        |boolean ${ev.isNull} = ${embGen.isNull} || ${nvGen.isNull};
        |int ${ev.value} = -1;
        |int $cid = 0;
        |if (!${ev.isNull}) {
        |  $cidCode
        |}
        |if (!${ev.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${embGen.value};
        |  double $nvV = ${nvGen.value};
        |  boolean $ok = ($arr.numElements() >= ${start + sub});
        |  for (int $i = 0; $ok && $i < $sub; $i++) {
        |    if ($arr.isNullAt($start + $i)) $ok = false;
        |  }
        |  if (!$ok) { ${ev.isNull} = true; }
        |  else {
        |    double $best = 0.0;
        |    int $bi = -1;
        |    for (int $ki = 0; $ki < $k; $ki++) {
        |      double $acc = 0.0;
        |      for (int $i = 0; $i < $sub; $i++) {
        |        $acc += ((double) $arr.getFloat($start + $i))
        |          * ((double) $cb[$ki * $sub + $i]);
        |      }
        |      double $s = $acc / $nvV;
        |      $offTerm
        |      $s -= $hn[$ki];
        |      if ($bi < 0 ||
        |          (!($s == $best) && java.lang.Double.compare($s, $best) > 0)) {
        |        $best = $s;
        |        $bi = $ki;
        |      }
        |    }
        |    ${ev.value} = $bi;
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(embedding = newChildren(0), nv = newChildren(1),
      cId = if (cId.isEmpty) None else Some(newChildren(2)))
}

/** Per-query ADC score over stored PQ codes:
  * `Σ_m LUT[m][code_m] (+ qCellDots[cId])` — one expression, m + 1 array
  * lookups, the LUT a reference object instead of m literal arrays. The
  * sum is a left-to-right fold STARTING from the m=0 term (bit-equal to
  * the literal `reduce(_ + _)`); the cell-dot term, when present, adds
  * last — the residual form's q̂·c(cell) correction.
  *
  * NULL when any code or the cId is null (null-poisoned sum, as in the
  * literal `element_at` chain). An out-of-range code also returns NULL —
  * unreachable by construction (codes come from [[PqSubspaceCode]] over
  * the same k), guarded rather than read out of bounds.
  */
case class PqAdcLutScore(codes: Seq[Expression], cId: Option[Expression],
    lutFlat: Array[Double], qCellDots: Array[Double])
  extends Expression {
  private val m = codes.length
  private val k = lutFlat.length / m
  require(m > 0 && lutFlat.length == m * k, "LUT shape mismatch")
  require(qCellDots.isEmpty == cId.isEmpty, "cell-dot / cId arity mismatch")

  override def children: Seq[Expression] = codes ++ cId.toSeq
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val c = codes(mi).eval(input)
      if (c == null) return null
      val code = c.asInstanceOf[Int]
      if (code < 0 || code >= k) return null
      val term = lutFlat(mi * k + code)
      acc = if (mi == 0) term else acc + term
      mi += 1
    }
    cId match {
      case Some(ce) =>
        val v = ce.eval(input)
        if (v == null) return null
        val cid = v.asInstanceOf[Int]
        if (cid < 0 || cid >= qCellDots.length) return null
        acc + qCellDots(cid)
      case None => acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lut = ctx.addReferenceObj("pqLut", lutFlat, "double[]")
    val qcd = if (qCellDots.nonEmpty)
      ctx.addReferenceObj("pqQCellDots", qCellDots, "double[]") else ""
    val acc = ctx.freshName("acc")
    val codeGens = codes.map(_.genCode(ctx))
    val cidGen = cId.map(_.genCode(ctx))
    val codeSteps = codeGens.zipWithIndex.map { case (g, mi) =>
      val term = s"$lut[${mi * k} + ${g.value}]"
      s"""
         |if (!${ev.isNull}) {
         |  ${g.code}
         |  if (${g.isNull} || ${g.value} < 0 || ${g.value} >= $k) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${if (mi == 0) s"$acc = $term;" else s"$acc += $term;"}
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    val cellStep = cidGen.map(g =>
      s"""
         |if (!${ev.isNull}) {
         |  ${g.code}
         |  if (${g.isNull} || ${g.value} < 0 || ${g.value} >= ${qCellDots.length}) {
         |    ${ev.isNull} = true;
         |  } else {
         |    $acc += $qcd[${g.value}];
         |  }
         |}
       """.stripMargin).getOrElse("")
    val code =
      code"""
        |boolean ${ev.isNull} = false;
        |double $acc = 0.0;
        |$codeSteps
        |$cellStep
        |double ${ev.value} = $acc;
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren.take(m),
      cId = if (cId.isEmpty) None else Some(newChildren(m)))
}
