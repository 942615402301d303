package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically right but
  * interpreted: per pair it allocates a zipped array and walks it through
  * the higher-order-function machinery. [[DotProduct]] is the same
  * left-to-right double accumulation as a single codegen'd loop over the
  * two `ArrayData` — the difference is ~20× on the all-pairs similarity
  * joins. Bit-identical to the HOF fold for EQUAL-LENGTH inputs; on
  * ragged inputs the semantics intentionally diverge: zip_with null-pads
  * the shorter side (so the fold returns null), while DotProduct
  * truncates to min(len) and returns a number — the truncation is
  * load-bearing for [[graft.extra.Similarity]].planeLit, whose literal
  * hyperplanes are padded to MaxDim.
  *
  * Registered as SQL function `graft_dot` (see [[GraftFunctions]]) so the
  * Column API (`call_function`) and plain SQL both reach it.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  // nullable even when inputs aren't: null ELEMENTS null the result
  // (and codegen needs a mutable isNull slot for that path)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Null ELEMENTS poison the result (null out), matching the
    * `aggregate(zip_with(...))` higher-order fold this replaces.
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getX = if (elemIsFloat(left)) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $y.getFloat($i)"
        else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helpers reachable from generated Java (top-level object →
  * static forwarders).
  */
object VectorOps {
  /** Half-up 6-dp rounding, bit-identical to SQL `round(x, 6)` on
    * doubles (BigDecimal.valueOf semantics via Scala's apply).
    */
  def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}

/** Product-quantization code assignment as ONE loop-emitting codegen
  * expression: for each of `m` subspaces, the index (0-based, smallest
  * index wins ties) of the nearest codebook centroid by squared L2 —
  * each subspace distance ROUNDED to 6 dp before the argmin so the
  * comparison is engine-reproducible (the DuckDB oracle replays it
  * row_number-style).
  *
  * Why an Expression and not composed functions: the unrolled
  * struct-least form generated O(m·k·sub) Java statements — at m=8,
  * k=16, sub=8 the fused stage blew janino's 64 KB method limit
  * ("Code grows beyond 64 KB" in sort_addToSorter), the failure is
  * not cached, and every execution paid a multi-second compile attempt
  * before falling back to interpreted row-at-a-time evaluation.
  * Loops make the generated code CONSTANT-SIZE in m·k·sub, so any
  * codebook geometry (dim 1024, k 256) compiles.
  *
  * `cents` is the flattened k×(m·sub) codebook (row j at offset
  * j·m·sub), shipped once per task via `addReferenceObj` — never
  * inlined into source text.
  */
case class PqEncode(child: Expression, cents: Array[Double], k: Int,
    m: Int, sub: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got ${other.catalogString}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = m * sub
    if (x.numElements() < dim) return null
    val isF = elemIsFloat // hoisted: a per-ELEMENT dataType match made
    // the interpreted path pathological (1e9 matches at 1M rows)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var d2 = 0.0
        var d = 0
        while (d < sub) {
          val i = s * sub + d
          if (x.isNullAt(i)) return null
          val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
          val diff = xv - cents(j * dim + i)
          d2 += diff * diff
          d += 1
        }
        d2 = VectorOps.rnd6(d2)
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      codes.map(Int.box))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cRef = ctx.addReferenceObj("pqCents", cents, "double[]")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2"); val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes")
      val dim = m * sub
      val getX = if (elemIsFloat) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      s"""
         |if ($x.numElements() < $dim) { ${ev.isNull} = true; } else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $k; $j++) {
         |      double $d2 = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        int $i = $s * $sub + $d;
         |        if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |        double $diff = $getX - $cRef[$j * $dim + $i];
         |        $d2 += $diff * $diff;
         |      }
         |      if (${ev.isNull}) break;
         |      $d2 = graft.functions.VectorOps.rnd6($d2);
         |      if ($d2 < $bestD) { $bestD = $d2; $best = $j; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |        .fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual PQ code assignment: codes quantize `v − coarse[list_id]`
  * instead of the raw vector — the standard IVF-PQ refinement
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * §IV.B; FAISS `IndexIVFPQ` encodes residuals by default). On
  * CLUSTERED corpora — the realistic embedding regime — raw-vector PQ
  * collapses every member of a tight cluster to the SAME byte codes
  * (the codes see only the dominant centroid component, never the
  * within-cluster offset), so ADC cannot rank inside a cluster and
  * recall floors at random-pick (AnnSmoke clustered mode measured
  * 0.013 at 1M vectors). Subtracting the coarse centroid first makes
  * the codes span exactly the within-list geometry ADC needs.
  *
  * Same constant-size loop-codegen shape as [[PqEncode]] (janino-safe
  * at any geometry), with one extra subtraction per dimension against
  * a second reference array. `coarse` is the flattened C×dim coarse
  * codebook indexed BY POSITION — residual mode re-indexes coarse cids
  * to 0..C-1 at build time so `list_id` is a direct offset. An
  * out-of-range list_id yields null (nothing to subtract), surfacing
  * as an unscored row rather than a wrong code.
  */
case class PqEncodeResidual(left: Expression, right: Expression,
    coarse: Array[Double], cents: Array[Double], k: Int, m: Int,
    sub: Int) extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), LongType | IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode_residual expects (array<float|double>, long), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def numCoarse: Int = coarse.length / (m * sub)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val lp = b match {
      case l: java.lang.Long => l.toInt
      case i: java.lang.Integer => i.toInt
      case l: Long => l.toInt
      case i: Int => i
    }
    val dim = m * sub
    if (x.numElements() < dim || lp < 0 || lp >= numCoarse) return null
    val isF = elemIsFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var d2 = 0.0
        var d = 0
        while (d < sub) {
          val i = s * sub + d
          if (x.isNullAt(i)) return null
          val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
          val diff = (xv - coarse(lp * dim + i)) - cents(j * dim + i)
          d2 += diff * diff
          d += 1
        }
        d2 = VectorOps.rnd6(d2)
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      codes.map(Int.box))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, lid) => {
      val coRef = ctx.addReferenceObj("coarseCents", coarse, "double[]")
      val cRef = ctx.addReferenceObj("pqCents", cents, "double[]")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2"); val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val codes = ctx.freshName("codes"); val lp = ctx.freshName("lp")
      val dim = m * sub
      val getX = if (elemIsFloat) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      s"""
         |int $lp = (int) $lid;
         |if ($x.numElements() < $dim || $lp < 0 || $lp >= $numCoarse) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $k; $j++) {
         |      double $d2 = 0.0;
         |      for (int $d = 0; $d < $sub; $d++) {
         |        int $i = $s * $sub + $d;
         |        if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |        double $diff = ($getX - $coRef[$lp * $dim + $i])
         |          - $cRef[$j * $dim + $i];
         |        $d2 += $diff * $diff;
         |      }
         |      if (${ev.isNull}) break;
         |      $d2 = graft.functions.VectorOps.rnd6($d2);
         |      if ($d2 < $bestD) { $bestD = $d2; $best = $j; }
         |    }
         |    $codes[$s] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |        .fromPrimitiveArray($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment as ONE loop-emitting codegen expression:
  * the id of the codebook centroid with the highest ROUNDED (6 dp)
  * cosine to the row vector, smallest centroid id on ties — exactly the
  * struct-max that `greatest(struct(ccos, -cid)…)` computed, but in
  * constant-size generated code. The unrolled greatest-chain over 64
  * centroids (each arm a dot + round) was the second janino 64 KB
  * casualty: the IVF-PQ index BUILD fell back to interpreted execution
  * and took 25× longer than the compiled form at 1M vectors.
  *
  * The row's squared norm is computed in-loop (same left-to-right
  * accumulation as [[DotProduct]] self-dot), so the expression needs
  * only the vector child; `cents`/`cnrms`/`cids` ship via
  * `addReferenceObj`, never as source literals.
  */
case class NearestCentroid(child: Expression, cents: Array[Double],
    cnrms: Array[Double], cids: Array[Long], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float|double>, got " +
            other.catalogString)
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    val isF = elemIsFloat
    var vn = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
      vn += xv * xv
      i += 1
    }
    val sq = math.sqrt(vn)
    var bestCid = 0L
    var bestCos = Double.MinValue
    var first = true
    var j = 0
    while (j < cids.length) {
      var dp = 0.0
      var d = 0
      while (d < n) {
        val xv = if (isF) x.getFloat(d).toDouble else x.getDouble(d)
        dp += xv * cents(j * dim + d)
        d += 1
      }
      val cos = VectorOps.rnd6(dp / (sq * math.sqrt(cnrms(j))))
      if (first || cos > bestCos ||
          (cos == bestCos && cids(j) < bestCid)) {
        bestCos = cos; bestCid = cids(j); first = false
      }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cRef = ctx.addReferenceObj("ncCents", cents, "double[]")
      val nRef = ctx.addReferenceObj("ncNrms", cnrms, "double[]")
      val idRef = ctx.addReferenceObj("ncIds", cids, "long[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val n = ctx.freshName("n")
      val vn = ctx.freshName("vn"); val dp = ctx.freshName("dp")
      val cos = ctx.freshName("cos"); val sq = ctx.freshName("sq")
      val bestCid = ctx.freshName("bestCid")
      val bestCos = ctx.freshName("bestCos")
      val first = ctx.freshName("first")
      val getXi = if (elemIsFloat) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      val getXd = if (elemIsFloat) s"(double) $x.getFloat($d)"
        else s"$x.getDouble($d)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $dim);
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $vn += $getXi * $getXi;
         |}
         |if (!${ev.isNull}) {
         |  double $sq = java.lang.Math.sqrt($vn);
         |  long $bestCid = 0L; double $bestCos = -Double.MAX_VALUE;
         |  boolean $first = true;
         |  for (int $j = 0; $j < ${cids.length}; $j++) {
         |    double $dp = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dp += $getXd * $cRef[$j * $dim + $d];
         |    }
         |    double $cos = graft.functions.VectorOps.rnd6(
         |      $dp / ($sq * java.lang.Math.sqrt($nRef[$j])));
         |    if ($first || $cos > $bestCos ||
         |        ($cos == $bestCos && $idRef[$j] < $bestCid)) {
         |      $bestCos = $cos; $bestCid = $idRef[$j]; $first = false;
         |    }
         |  }
         |  ${ev.value} = $bestCid;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Max rounded cosine of the row vector against a FIXED reference
  * vector set, as one loop-emitting codegen expression — the
  * [[NearestCentroid]] loop returning the best COSINE instead of the
  * best id. The semantic-decontamination probe: the reference set is
  * the (tiny by construction) benchmark embedding table, shipped via
  * `addReferenceObj`, and the corpus side stays a pure projection —
  * no join, no shuffle, constant-size generated code regardless of
  * reference count (the unrolled `greatest` chain alternative is the
  * janino 64 KB casualty [[NearestCentroid]] documents). Rounding to
  * 6 dp BEFORE any comparison is the cross-engine determinism
  * discipline every cosine in this codebase follows.
  */
case class MaxCosine(child: Expression, cents: Array[Double],
    cnrms: Array[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_cosine expects array<float|double>, got " +
            other.catalogString)
    }

  private def numRefs: Int = cnrms.length

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    // a row vector of the wrong dimension is a DIFFERENT EMBEDDING
    // MODEL's output, not a shorter opinion — truncated arithmetic
    // would return a plausible-looking, meaningless cosine and a
    // silent wrong verdict. NULL marks it un-scorable (the [[PqEncode]]
    // dim-mismatch discipline).
    if (x.numElements() != dim) return null
    val n = dim
    val isF = elemIsFloat
    var vn = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val xv = if (isF) x.getFloat(i).toDouble else x.getDouble(i)
      vn += xv * xv
      i += 1
    }
    val sq = math.sqrt(vn)
    var bestCos = Double.MinValue
    var j = 0
    while (j < numRefs) {
      var dp = 0.0
      var d = 0
      while (d < n) {
        val xv = if (isF) x.getFloat(d).toDouble else x.getDouble(d)
        dp += xv * cents(j * dim + d)
        d += 1
      }
      val cos = VectorOps.rnd6(dp / (sq * math.sqrt(cnrms(j))))
      if (cos > bestCos) bestCos = cos
      j += 1
    }
    bestCos
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cRef = ctx.addReferenceObj("mcCents", cents, "double[]")
      val nRef = ctx.addReferenceObj("mcNrms", cnrms, "double[]")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val n = ctx.freshName("n")
      val vn = ctx.freshName("vn"); val dp = ctx.freshName("dp")
      val cos = ctx.freshName("cos"); val sq = ctx.freshName("sq")
      val bestCos = ctx.freshName("bestCos")
      val getXi = if (elemIsFloat) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      val getXd = if (elemIsFloat) s"(double) $x.getFloat($d)"
        else s"$x.getDouble($d)"
      s"""
         |// wrong-dimension vector = different model's output: NULL,
         |// never truncated arithmetic (see nullSafeEval)
         |if ($x.numElements() != $dim) { ${ev.isNull} = true; }
         |int $n = $dim;
         |double $vn = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $vn += $getXi * $getXi;
         |}
         |if (!${ev.isNull}) {
         |  double $sq = java.lang.Math.sqrt($vn);
         |  double $bestCos = -Double.MAX_VALUE;
         |  for (int $j = 0; $j < $numRefs; $j++) {
         |    double $dp = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dp += $getXd * $cRef[$j * $dim + $d];
         |    }
         |    double $cos = graft.functions.VectorOps.rnd6(
         |      $dp / ($sq * java.lang.Math.sqrt($nRef[$j])));
         |    if ($cos > $bestCos) $bestCos = $cos;
         |  }
         |  ${ev.value} = $bestCos;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration + Column-API surface for the custom expressions. */
object GraftFunctions {

  /** Idempotent per-session registration of all graft SQL functions. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Dot product of two float/double array columns (codegen'd). */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Squared L2 norm via self-dot. */
  def norm2(v: Column): Column = dot_product(v, v)

  /** PQ code assignment against a flattened k×dim codebook (codegen'd
    * constant-size loops — see [[PqEncode]]).
    */
  def pq_encode(v: Column, cents: Array[Double], k: Int, m: Int,
      sub: Int): Column =
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(v), cents, k, m, sub))

  /** Residual PQ code assignment: quantizes `v − coarse[list_id]`
    * against a flattened k×dim codebook (codegen'd constant-size
    * loops — see [[PqEncodeResidual]]). `coarse` is the flattened
    * C×dim coarse codebook indexed by position = list_id.
    */
  def pq_encode_residual(v: Column, listId: Column,
      coarse: Array[Double], cents: Array[Double], k: Int, m: Int,
      sub: Int): Column =
    GraftColumnBridge.column(PqEncodeResidual(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(listId),
      coarse, cents, k, m, sub))

  /** Nearest-centroid id by rounded cosine (codegen'd constant-size
    * loops — see [[NearestCentroid]]).
    */
  def nearest_centroid(v: Column, cents: Array[Double],
      cnrms: Array[Double], cids: Array[Long], dim: Int): Column =
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(v), cents, cnrms, cids, dim))

  /** Max rounded cosine against a fixed reference vector set
    * (codegen'd constant-size loops — see [[MaxCosine]]).
    */
  def max_cosine(v: Column, cents: Array[Double],
      cnrms: Array[Double], dim: Int): Column =
    GraftColumnBridge.column(MaxCosine(
      GraftColumnBridge.expression(v), cents, cnrms, dim))
}
