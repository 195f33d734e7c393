package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native one-pass product-quantization codes: output(mm) = the PQ code of
  * subvector mm — exactly the value the former per-subspace column
  * formulation computed as
  * {{{
  *   array_max(array((0 until ksub).map(j => struct(
  *     dot_product(slice(v, mm*dsub+1, dsub), lit(c_j)) - ||c_j||²/2,
  *     lit(j))))).getField("code")
  * }}}
  * with the same sequential-double dot accumulation, the same min-length
  * slice contract, the same ties-to-higher-code argmax, and the same
  * null-element contract (a null inside a compared slice nulls every
  * candidate score, so the struct max falls through to the highest code)
  * — AnnSpec's from-index ≡ direct equivalence and the 64-d replay
  * oracles pin the bit-identity.
  *
  * Why (round-11, the [[SrpBandKeys]] escalation ladder): at 64-d the
  * column form is m=8 small expressions and stays inside whole-stage
  * codegen; at 768-d it is m=96 × ksub=16 = 1536 generated dot loops in
  * ONE projection — Janino dies with an InternalCompilerException (method
  * size), killing the index build outright (measured on the 250 k × 768-d
  * annscale probe). This kernel holds the codebook as per-plan primitive
  * arrays (one broadcast-sized reference object, ~100 KB at 96×16×8) and
  * walks the row once per (subspace, candidate) in a tight double loop.
  *
  * The codebook ships WITH the expression (a foldable array<double>
  * literal in SQL form, a Seq in the case class) — executors need no
  * side-channel state, the same contract as a broadcast literal.
  */
case class PqCodes(child: Expression, flat: Seq[Double], m: Int, dsub: Int,
    ksub: Int) extends UnaryExpression {

  require(flat.length == m * ksub * dsub,
    s"pq_codes codebook length ${flat.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  @transient private lazy val packed = PqCodes.pack(flat, m, dsub, ksub)

  override protected def nullSafeEval(v: Any): Any =
    PqCodes.codes(v.asInstanceOf[ArrayData], packed, m, dsub, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqPacked", packed,
      classOf[PqCodes.Packed].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqCodes.codes($c, $ref, $m, $dsub, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqCodes].getName, "pq_codes")

  /** Registry builder: (vec, flatCodebook, m, dsub, ksub) — the codebook
    * arrives as a foldable array<double> literal (typedLit). */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 5, "pq_codes expects exactly 5 arguments")
    def int(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    val flat = args(1).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq
    PqCodes(args(0), flat, int(args(2)), int(args(3)), int(args(4)))
  }

  /** Unpacked primitive codebook + precomputed half squared norms. */
  final class Packed(val cent: Array[Array[Array[Double]]],
      val half: Array[Array[Double]]) extends Serializable

  def pack(flat: Seq[Double], m: Int, dsub: Int, ksub: Int): Packed = {
    val a = flat.toArray
    val cent = Array.tabulate(m)(mm => Array.tabulate(ksub)(j =>
      java.util.Arrays.copyOfRange(a, (mm * ksub + j) * dsub,
        (mm * ksub + j + 1) * dsub)))
    val half = Array.tabulate(m)(mm => Array.tabulate(ksub)(j =>
      cent(mm)(j).map(x => x * x).sum / 2.0))
    new Packed(cent, half)
  }

  /** One-pass code vector; called from both eval and generated code. */
  def codes(v: ArrayData, p: Packed, m: Int, dsub: Int, ksub: Int): ArrayData = {
    val len = v.numElements()
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val off = mm * dsub
      val n = math.min(dsub, math.max(0, len - off))
      // Null-element contract of the column form: a null in the compared
      // slice nulls EVERY candidate's score, and the struct max over
      // all-null scores resolves by the code field → highest code.
      var hasNull = false
      var d = 0
      while (d < n && !hasNull) {
        if (v.isNullAt(off + d)) hasNull = true
        d += 1
      }
      if (hasNull) out(mm) = ksub - 1
      else {
        var best = Double.NegativeInfinity
        var bestJ = 0
        var j = 0
        while (j < ksub) {
          val c = p.cent(mm)(j)
          var dot = 0.0
          var i = 0
          while (i < n) { dot += v.getFloat(off + i).toDouble * c(i); i += 1 }
          val s = dot - p.half(mm)(j)
          if (s >= best) { best = s; bestJ = j } // >= : ties to higher code
          j += 1
        }
        out(mm) = bestJ
      }
      mm += 1
    }
    new GenericArrayData(out)
  }
}

/** Native nearest-centroid assignment: argmax over centroid dot products,
  * ties to the higher centroid id — exactly
  * `array_max(array(struct(dot_product(v, lit(c)), lit(cid)))).getField("cid")`
  * (AnnOps.assignExpr), whose generated form at k≈√(n/1000) lists × 768-d
  * approaches the same Janino method-size wall [[PqCodes]] hits. Centroid
  * ids are the POSITIONS in the flat matrix — the caller passes centroids
  * sorted by cid (AnnModel.centroids is). Null-element contract: a null
  * in the compared prefix nulls every dot, so the max resolves to the
  * highest cid. */
case class NearestCentroid(child: Expression, flat: Seq[Double], k: Int,
    dims: Int) extends UnaryExpression {

  require(flat.length == k * dims,
    s"nearest_centroid matrix length ${flat.length} != k*dims = ${k * dims}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cent: Array[Array[Double]] = {
    val a = flat.toArray
    Array.tabulate(k)(i =>
      java.util.Arrays.copyOfRange(a, i * dims, (i + 1) * dims))
  }

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroid.assign(v.asInstanceOf[ArrayData], cent, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cent, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NearestCentroid.assign($c, $ref, $dims)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroid = copy(child = newChild)
}

object NearestCentroid {

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NearestCentroid].getName, "nearest_centroid")

  /** Registry builder: (vec, flatCentroids, k, dims). */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 4, "nearest_centroid expects exactly 4 arguments")
    def int(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    val flat = args(1).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq
    NearestCentroid(args(0), flat, int(args(2)), int(args(3)))
  }

  def assign(v: ArrayData, cent: Array[Array[Double]], dims: Int): Int = {
    var best = Double.NegativeInfinity
    var bestI = 0
    var i = 0
    while (i < cent.length) {
      val c = cent(i)
      val n = math.min(c.length, v.numElements())
      var dot = 0.0
      var d = 0
      var isNull = false
      while (d < n && !isNull) {
        if (v.isNullAt(d)) isNull = true
        else { dot += v.getFloat(d).toDouble * c(d); d += 1 }
      }
      if (isNull) {
        // Every candidate shares the row's nulls → all dots null → the
        // struct max resolves by cid → highest id wins.
        return cent.length - 1
      }
      if (dot >= best) { best = dot; bestI = i }
      i += 1
    }
    bestI
  }
}

/** Query-side ADC lookup table as a NATIVE kernel (round-13, batched
  * multi-query serve): output[mm*ksub + j] = q_mm · codebook(mm)(j) —
  * exactly the driver-side `AnnOps.adcLut` table the single-query serve
  * collects, computed per QUERY ROW so a batch of queries never touches
  * the driver (the two per-query driver actions VERDICT r12 flagged).
  * Bit-identity with the driver table: identical i-ascending sequential
  * double accumulation over each codebook entry (AnnSpec pins batched ≡
  * single-query serve row-for-row). Kernel, not a column form: at 768-d
  * the expression spelling is m=96 × ksub=16 generated dot loops in one
  * projection — the exact Janino method-size wall [[PqCodes]] documents.
  */
case class PqAdcLut(child: Expression, flat: Seq[Double], m: Int, dsub: Int,
    ksub: Int) extends UnaryExpression {

  require(flat.length == m * ksub * dsub,
    s"pq_adc_lut codebook length ${flat.length} != m*ksub*dsub = ${m * ksub * dsub}")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_lut expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_lut"

  @transient private lazy val packed = PqCodes.pack(flat, m, dsub, ksub)

  override protected def nullSafeEval(v: Any): Any =
    PqAdcLut.lut(v.asInstanceOf[ArrayData], packed, m, dsub, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqPacked", packed,
      classOf[PqCodes.Packed].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqAdcLut.lut($c, $ref, $m, $dsub, $ksub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcLut =
    copy(child = newChild)
}

object PqAdcLut {

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqAdcLut].getName, "pq_adc_lut")

  /** Registry builder: (qvec, flatCodebook, m, dsub, ksub). */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 5, "pq_adc_lut expects exactly 5 arguments")
    def int(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    val flat = args(1).eval().asInstanceOf[ArrayData].toDoubleArray().toSeq
    PqAdcLut(args(0), flat, int(args(2)), int(args(3)), int(args(4)))
  }

  /** Null-ELEMENT contract (explicit, code review round-13): a null slot
    * in the query vector contributes 0 to every LUT entry of its
    * subspace — stated rather than inherited from ArrayData.getFloat's
    * silent 0 on null slots. Well-formed embeddings (the kernel's input
    * contract; the single-query driver path crashes outright on a null
    * element) never hit it. */
  def lut(q: ArrayData, p: PqCodes.Packed, m: Int, dsub: Int,
      ksub: Int): ArrayData = {
    val qlen = q.numElements()
    val out = new Array[Double](m * ksub)
    var mm = 0
    while (mm < m) {
      val off = mm * dsub
      var j = 0
      while (j < ksub) {
        val c = p.cent(mm)(j)
        val n = math.min(c.length, math.max(0, qlen - off))
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (!q.isNullAt(off + i))
            dot += c(i) * q.getFloat(off + i).toDouble
          i += 1
        }
        out(mm * ksub + j) = dot
        j += 1
      }
      mm += 1
    }
    new GenericArrayData(out)
  }
}

/** ADC score from a stored code vector and a per-query LUT column:
  * Σ_mm lut[mm*ksub + codes[mm]] with the same left-to-right double
  * accumulation as the `element_at(...)` reduce chain the single-query
  * serve builds — bit-identical scores (AnnSpec pins it). One kernel call
  * instead of an m-term generated chain (the 768-d width wall). */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(org.apache.spark.sql.types.DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdc.score(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData],
      m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, l) => s"graft.functions.PqAdc.score($c, $l, $m, $ksub)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}

object PqAdc {

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqAdc].getName, "pq_adc")

  /** Registry builder: (codes, lut, m, ksub). */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 4, "pq_adc expects exactly 4 arguments")
    def int(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    PqAdc(args(0), args(1), int(args(2)), int(args(3)))
  }

  def score(codes: ArrayData, lut: ArrayData, m: Int, ksub: Int): Double = {
    var s = 0.0
    var mm = 0
    while (mm < m) {
      s += lut.getDouble(mm * ksub + codes.getInt(mm))
      mm += 1
    }
    s
  }
}
