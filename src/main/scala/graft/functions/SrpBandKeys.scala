package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native one-pass SRP-LSH band signature: output(b) = the packed sign
  * bits of `bitsPerBand` hyperplane dot products for band b — exactly the
  * value the former column formulation computed as
  * {{{
  *   (0 until bitsPerBand).map(i => when(dot_product(v, plane_i) > 0,
  *     1L << i).otherwise(0L)).reduce(_ + _)
  * }}}
  * per band, with the same deterministic splitmix64 hyperplanes and the
  * same sequential-double accumulation order, so bucket keys are
  * BIT-IDENTICAL to the round-4..7 column path (AnnSpec's recall floors
  * pin this).
  *
  * Why (round-8, the [[SimHash64]] escalation ladder): the column form
  * materializes nBits separate dot_product calls over nBits typedLit
  * plane arrays inside one projection. At 64-d that stays inside
  * whole-stage codegen; at 768-d the generated method blows past the JIT
  * limits and the whole projection falls back to interpreted eval —
  * measured 76 s for 20 000 rows (≈ 0.5 M MAC/s/core, boxed-element
  * territory) where the arithmetic is ~1 G MACs. This kernel hoists the
  * plane matrix into a per-(planes, dims) primitive cache and walks the
  * row once per plane in a tight double loop: the same 20 k×768 signature
  * pass runs in under a second, and the LSH reroute path stays viable at
  * realistic embedding widths.
  *
  * `dims` is the DECLARED corpus width: planes are `dims` long and rows
  * are folded over min(dims, row length), matching the dot_product
  * min-length contract of the column form. Null array → null.
  */
case class SrpBandKeys(child: Expression, nBits: Int, bands: Int, dims: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_band_keys expects array<float>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  override protected def nullSafeEval(v: Any): Any =
    SrpBandKeys.sign(v.asInstanceOf[ArrayData], nBits, bands, dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SrpBandKeys.sign($c, $nBits, $bands, $dims)")

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)
}

object SrpBandKeys {

  val info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[SrpBandKeys].getName, "srp_band_keys")

  /** Registry builder: (vec, nBits, bands, dims) with foldable int args. */
  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 4, "srp_band_keys expects exactly 4 arguments")
    def int(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    SrpBandKeys(args(0), int(args(1)), int(args(2)), int(args(3)))
  }

  /** splitmix64 scramble of (plane, dim) — identical to the former
    * AnnOps.planeComponent (AnnOps now delegates here). */
  def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    z.toDouble / Long.MaxValue.toDouble
  }

  /** Plane matrix cache: tiny (nPlanes × dims doubles, e.g. 72×1024 =
    * 0.6 MB) and immutable; computed once per executor JVM per shape. */
  private val planeCache =
    new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planesFor(nPlanes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dims), { _ =>
      Array.tabulate(nPlanes)(p => Array.tabulate(dims)(d =>
        planeComponent(p, d)))
    })

  /** One-pass signature; called from both eval and generated code. */
  def sign(v: ArrayData, nBits: Int, bands: Int, dims: Int): ArrayData = {
    val planes = planesFor(nBits, dims)
    val bitsPerBand = nBits / bands
    val n = math.min(dims, v.numElements())
    // Null-element contract of the column form: a null element made every
    // plane dot NULL, so `when(dot > 0)` left every bit 0 — all-zero keys.
    var nc = 0
    while (nc < n) {
      if (v.isNullAt(nc)) return new GenericArrayData(new Array[Long](bands))
      nc += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        val p = planes(b * bitsPerBand + i)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getFloat(d).toDouble * p(d); d += 1 }
        if (dot > 0d) key |= 1L << i
        i += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}
