package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Coarse-quantizer assignment for IVF ANN: maps an embedding vector to
  * the id of its nearest centroid (squared euclidean, ties → lowest
  * centroid id). The centroid codebook is tiny (`nClusters` rows — the
  * quantizer every IVF implementation broadcasts), so it rides along as
  * plain Java arrays inside the expression and the assignment becomes a
  * pure per-row map: no N×C expanded join, no shuffle, no window — the
  * previous formulation shuffled |corpus|·nClusters rows through a
  * row_number window just to take a per-row argmin.
  *
  * Numerics are bit-compatible with the SQL/HOF form the DuckDB oracle
  * uses: ‖v−c‖² = v·v − 2·(v·c) + c·c where every dot product is a
  * sequential left-to-right fold in double (`c·c` is pre-folded the
  * same way at construction). Iterating centroids in ascending-id order
  * with a strict `<` comparison reproduces `row_number() ORDER BY cdist
  * ASC, cluster ASC = 1` exactly.
  */
case class NearestCentroid(child: Expression, ids: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.catalogString}")
  }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** c·c per centroid, folded left-to-right like every other dot. */
  private val selfDots: Array[Double] = cents.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], isFloat, ids, cents, selfDots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("ncCents", cents, "double[][]")
    val ccRef = ctx.addReferenceObj("ncSelfDots", selfDots, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCentroid.compute(" +
        s"$v, $isFloat, $idsRef, $centsRef, $ccRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** Registry builder: `nearest_centroid(vec, idsLiteral, centsLiteral)`
    * — the codebook arrives as foldable literals (typedLit), evaluated
    * once here and baked into the expression as primitive arrays. */
  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "nearest_centroid(vec, ids: array<bigint> literal, cents: array<array<double>> literal)")
    def litArray(e: Expression, what: String): ArrayData = {
      require(e.foldable, s"nearest_centroid $what must be a literal")
      e.eval(null) match {
        case a: ArrayData => a
        case other => throw new IllegalArgumentException(
          s"nearest_centroid $what must be an array literal, got $other")
      }
    }
    val ids = litArray(children(1), "ids").toLongArray()
    val cents = {
      val outer = litArray(children(2), "cents")
      (0 until outer.numElements())
        .map(i => outer.getArray(i).toDoubleArray()).toArray
    }
    require(ids.length == cents.length,
      "nearest_centroid: ids and cents must have equal length")
    require(ids.sameElements(ids.sorted),
      "nearest_centroid: ids must be sorted ascending (tie-break contract)")
    require(cents.map(_.length).distinct.length <= 1,
      "nearest_centroid: all centroids must share one dimension")
    NearestCentroid(children.head, ids, cents)
  }

  /** Primitive argmin kernel, called from generated code.
    * `ids` MUST be sorted ascending (the builder enforces it). */
  def compute(vArr: ArrayData, isFloat: Boolean, ids: Array[Long],
      cents: Array[Array[Double]], selfDots: Array[Double]): Long = {
    val n = vArr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) vArr.getFloat(i).toDouble else vArr.getDouble(i)
      i += 1
    }
    // a dimension mismatch must fail loudly, not truncate the dot
    // product into a silently-wrong assignment
    if (cents.length > 0 && cents(0).length != n)
      throw new IllegalArgumentException(
        s"nearest_centroid: input vector has $n dims, codebook has ${cents(0).length}")
    var vv = 0.0
    i = 0
    while (i < n) { vv += v(i) * v(i); i += 1 }
    var best = Double.PositiveInfinity
    var bestId = -1L
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dotVc = 0.0
      var j = 0
      while (j < n) { dotVc += v(j) * cent(j); j += 1 }
      val d = vv - 2.0 * dotVc + selfDots(c)
      if (d < best) { best = d; bestId = ids(c) }
      c += 1
    }
    bestId
  }
}
