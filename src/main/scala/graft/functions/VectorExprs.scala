package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Row-local vector primitives for the ANN operators.
  *
  * The centroid table of an IVF quantizer is BOUNDED (nCentroids ≤ a few
  * thousand), so nearest-centroid assignment must not be a join: the
  * centroids are collected once and embedded in the expression, and the
  * argmax runs inside the corpus scan — at 100 TB the assignment pass is
  * a single map stage with no exchange, vs the r2 crossJoin+window shape
  * that shuffled and SORTED corpus×nCentroids rows.
  */
object VectorHelper {

  /** Argmax-dot centroid id for v (unit vectors ⇒ argmax cosine).
    * `cents`/`ids` are parallel arrays sorted by id ascending; ties on
    * the score keep the FIRST (= smallest id), matching the old window
    * ordering (score desc, centroid_id asc). Dot products accumulate
    * left-to-right — the same FP order as the `aggregate` Column fold,
    * so scores are bit-identical to the join formulation. */
  def nearestCentroid(v: Array[Double], cents: Array[Array[Double]],
                      ids: Array[Int]): Int = {
    var bestScore = Double.NegativeInfinity
    var bestId = -1
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(v.length, c.length)
      var s = 0.0
      var d = 0
      while (d < n) { s += v(d) * c(d); d += 1 }
      if (s > bestScore) { bestScore = s; bestId = ids(i) }
      i += 1
    }
    bestId
  }
}

/** array<double> → int nearest-centroid id (see [[VectorHelper]]).
  *
  * Centroids/ids are held as immutable `IndexedSeq`s, NOT arrays: case-class
  * equality on Array fields is reference-based, so two semantically
  * identical expressions would never compare equal — defeating Catalyst
  * plan canonicalization / common-subexpression elimination — and `copy`
  * in withNewChildInternal would share mutable arrays across plan copies.
  * The primitive arrays the tight loop needs are derived once, lazily. */
case class NearestCentroidExpr(child: Expression,
                               centroids: IndexedSeq[IndexedSeq[Double]],
                               ids: IndexedSeq[Int]) extends UnaryExpression {
  @transient private lazy val centArr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Int] = ids.toArray
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    VectorHelper.nearestCentroid(
      input.asInstanceOf[ArrayData].toDoubleArray(), centArr, idArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("centroids", centArr, "double[][]")
    val iref = ctx.addReferenceObj("centroidIds", idArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHelper.nearestCentroid($c.toDoubleArray(), $cref, $iref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

object VectorExprs {
  def nearestCentroid(v: Column, centroids: Array[Array[Double]],
                      ids: Array[Int]): Column =
    GraftExpressionBridge.column(
      NearestCentroidExpr(GraftExpressionBridge.expression(v),
        centroids.map(_.toIndexedSeq).toIndexedSeq, ids.toIndexedSeq))
}
