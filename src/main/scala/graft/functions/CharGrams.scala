package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string, first-occurrence order —
  * semantically `array_distinct(transform(sequence(1, length(s)-n+1),
  * i -> substring(s, i, n)))` (and the DuckDB dual in
  * [[PortableText.duckGrams3]]), but one tight JVM loop with a hash
  * set instead of three interpreted HOF passes materializing a
  * sequence array, a transformed array, and a distinct array per row.
  * The HOF chain alone cost ~2 s over 1000 documents at sf0.1.
  *
  * `CodegenFallback`: the loop body is already JVM-native; falling out
  * of whole-stage codegen for this one projection costs far less than
  * the HOF interpretation it replaces.
  */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_grams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i + n <= s.length) { seen.add(s.substring(i, i + n)); i += 1 }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  /** Register `graft_grams(str, n)` (n must be a foldable int). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "graft_grams"),
      (exprs: Seq[Expression]) => CharGrams(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]))
}
