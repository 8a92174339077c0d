package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the extraction engine (SURVEY §4.2:
  * preference (b) — custom `Expression` over UDF): the whole per-row
  * pipeline and the repetition truncator as SQL-callable functions.
  * CodegenFallback is appropriate here: the work per row is large enough
  * that codegen of the call site is irrelevant, while `Expression`
  * (vs a Scala UDF) avoids Encoder round-trips and keeps null semantics
  * in the optimizer's view.
  */
case class ExtractMarkdown(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"extract_markdown requires BINARY input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    UTF8String.fromString(graft.extract.Extractor.extract("", bytes).markdown)
  }
  override protected def withNewChildInternal(newChild: Expression): ExtractMarkdown =
    copy(child = newChild)
  override def prettyName: String = "extract_markdown"
}

/** W5 truncate_repetitions as a scalar string function. */
case class TruncateRepetitions(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"truncate_repetitions requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.post.Postprocess.truncateRepetitions(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): TruncateRepetitions =
    copy(child = newChild)
  override def prettyName: String = "truncate_repetitions"
}

object GraftFunctions {
  private def unary(name: String, mk: Expression => Expression)(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${exprs.length}")
    mk(exprs.head)
  }

  /** Idempotent session registration of the SQL surface. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("extract_markdown",
      unary("extract_markdown", ExtractMarkdown(_)), "built-in")
    reg.createOrReplaceTempFunction("truncate_repetitions",
      unary("truncate_repetitions", TruncateRepetitions(_)), "built-in")
  }
}
