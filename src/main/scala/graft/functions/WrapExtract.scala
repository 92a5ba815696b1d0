package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-trips a text through the engine's html wrap + extract path
  * (graft.synth.Pages.htmlOf / extractText): the per-url byte-identical
  * extracted-text invariant (BASELINE.json input_hint) surfaces as
  * sha256(wrap_extract(text, url)) == sha256(text). */
case class WrapExtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(text: Any, url: Any): Any = {
    val t = text.asInstanceOf[UTF8String].toString
    val u = url.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      graft.synth.Pages.extractText(graft.synth.Pages.htmlOf(t, u)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WrapExtract =
    copy(l, r)
  override def prettyName: String = "wrap_extract"
}

object WrapExtract {
  def register(spark: org.apache.spark.sql.SparkSession, name: String = "wrap_extract"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => WrapExtract(exprs(0), exprs(1)), "built-in")
}
