package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.core.Geometry

/** Point-in-polygon where the polygon comes from a column
  * (array<double>, interleaved lon,lat) — the exact-residual predicate of
  * the cell-prejoin + PIP spatial join (SURVEY.md §2.3 J3). */
case class PipContainsCol(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(lon: Any, lat: Any, poly: Any): Any = {
    val arr = poly.asInstanceOf[ArrayData].toDoubleArray()
    Geometry.contains(arr,
      lon.asInstanceOf[Number].doubleValue(), lat.asInstanceOf[Number].doubleValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat, poly) =>
      s"${ev.value} = graft.core.Geometry.contains($poly.toDoubleArray(), $lon, $lat);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PipContainsCol = copy(f, s, t)
  override def prettyName: String = "pip_contains_col"
}

object PipContainsCol {
  def register(spark: org.apache.spark.sql.SparkSession, name: String = "pip_contains_col"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => PipContainsCol(exprs(0), exprs(1), exprs(2)), "built-in")
}

/** PIP against a broadcast polygon dictionary: the candidate rows carry
  * only (lon, lat, poly_id); polygon vertices live once per executor in
  * the torrent broadcast instead of being replicated into every cover-cell
  * row (which would make the cover broadcast O(cells x vertices)). */
case class PipLookup(
    first: Expression, second: Expression, third: Expression,
    polys: org.apache.spark.broadcast.Broadcast[Map[Long, Array[Double]]])
    extends TernaryExpression {
  override def dataType: DataType = BooleanType

  /** Codegen + interpreted entry point (public so generated Java can call it). */
  def test(lon: Double, lat: Double, polyId: Long): Boolean =
    polys.value.get(polyId) match {
      case Some(arr) => Geometry.contains(arr, lon, lat)
      case None => false
    }

  override def nullSafeEval(lon: Any, lat: Any, polyId: Any): Any =
    test(lon.asInstanceOf[Number].doubleValue(), lat.asInstanceOf[Number].doubleValue(),
      polyId.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle rides along as a reference object; the lookup
    // stays a virtual call but the surrounding stage remains codegen'd
    val ref = ctx.addReferenceObj("pipLookup", this, classOf[PipLookup].getName)
    nullSafeCodeGen(ctx, ev, (lon, lat, id) =>
      s"${ev.value} = $ref.test($lon, $lat, $id);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PipLookup = copy(f, s, t)
  override def prettyName: String = "pip_lookup"
}
