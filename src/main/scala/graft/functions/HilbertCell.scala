package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Hilbert-curve cell id of (lon, lat) at a plan-time level — the
  * S2-style locality index as a codegen'd Catalyst expression. Range
  * partitioning on this column keeps partitions spatially compact
  * (core/Hilbert.scala), the property the north rule's "explicit
  * range-partitioned shuffle" leans on for dense-geometry joins. */
case class HilbertCell(left: Expression, right: Expression, level: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(level >= 1 && level <= 30)
  override def dataType: DataType = LongType
  // analyzer-inserted casts keep interpreted eval and codegen consistent
  // for non-double lon/lat inputs (int/float columns)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)

  /** Codegen + interpreted kernel (public so generated Java can call it). */
  def cell(lon: Double, lat: Double): Long = graft.core.Hilbert.cellId(lon, lat, level)

  override def nullSafeEval(lon: Any, lat: Any): Any =
    cell(lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertCell", this, classOf[HilbertCell].getName)
    nullSafeCodeGen(ctx, ev, (lon, lat) => s"${ev.value} = $ref.cell($lon, $lat);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertCell =
    copy(left = l, right = r)
  override def prettyName: String = s"hilbert_cell_$level"
}

object HilbertCell {
  def register(spark: org.apache.spark.sql.SparkSession, name: String, level: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => HilbertCell(exprs(0), exprs(1), level), "built-in")
}
