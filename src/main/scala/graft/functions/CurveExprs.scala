package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve kernels shared by the interpreted and codegen
  * paths of [[Hilbert2D]] and by test oracles. Algorithm: the standard
  * iterative Hilbert mapping (Wikipedia, "Hilbert curve — Mapping
  * algorithms"): per bit level, classify the quadrant, accumulate its
  * contribution, rotate/reflect the frame. The reference engine has no
  * layout-clustering operator (cdc-redshift writes append-only stage
  * tables); this backs the multi-dimensional clustering extension in
  * [[graft.ext.ZOrder]].
  */
object Curves {

  /** Hilbert distance of grid cell (x, y) on a 2^order × 2^order grid.
    * Inputs are masked to the grid (callers scale into range first);
    * result is in [0, 4^order). Pure long arithmetic — called from
    * generated Java via the object's static forwarder.
    */
  def hilbert2D(xIn: Long, yIn: Long, order: Int): Long = {
    val n = 1L << order
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the remaining square (the xy2d form rotates within n)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[hilbert2D]]: the (x, y) cell at distance d. Used by
    * the spec to prove bijectivity and the unit-step adjacency property
    * (consecutive d are grid neighbors — the locality guarantee the
    * layout clustering rides on).
    */
  def hilbertInverse(dIn: Long, order: Int): (Long, Long) = {
    val n = 1L << order
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      // rotate the built sub-square (the d2xy form rotates within s)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert2d(x, y, order)` — Hilbert distance of the cell, as a native
  * codegen expression so curve computation stays inside whole-stage
  * codegen (one static call per row, no boxing).
  */
case class Hilbert2D(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert2d"

  override def nullSafeEval(a: Any, b: Any): Any =
    Curves.hilbert2D(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Curves.hilbert2D($a, $b, $order);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert2D =
    copy(left = newLeft, right = newRight)
}
