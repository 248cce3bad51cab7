package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k affine-rehash minhashes of a token-hash array — natively:
  * `mh[j] = min over x in th of ((2j+3)·x + 5j+7) mod p`, identical
  * arithmetic to the HOF fragment it replaces
  * (`transform(sequence(0,k-1), j -> array_min(transform(th, …)))`)
  * and to the DuckDB dual [[PortableText.duckMinHashes]].
  *
  * The HOF spelling interprets k·|th| lambda calls per row; on the
  * dedup path (every document, k=8) that was the dominant cost of
  * minhash band assignment (~4 s of a 12 s clustering query at sf0.1).
  * One fused JVM loop does the same k·|th| multiply-adds in
  * milliseconds. All arithmetic stays below 2^63: x < p ≈ 1e9,
  * coefficient < 2k+3, so (2j+3)·x + 5j+7 < 2e10.
  */
case class MinHashes(child: Expression, k: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhashes"

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val a = 2L * j + 3L
      val b = 5L * j + 7L
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = (a * th.getLong(i) + b) % PortableText.P
        if (h < best) best = h
        i += 1
      }
      // empty th -> MaxValue sentinel, matching array_min(NULL-free
      // empty array) would be null in the HOF; callers always feed
      // non-empty token sets (documents have text), keep it total.
      out(j) = if (n == 0) 0L else best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}

object MinHashes {
  /** Build from SQL-registry arguments with plan-time validation. */
  def fromArgs(exprs: Seq[Expression]): MinHashes = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"graft_minhashes(th, k): $why")
    if (exprs.length != 2)
      fail(s"takes exactly 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable) fail("k must be a literal")
    val k = exprs(1).eval(null) match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long =>
        if (l < 1 || l > 1024) fail(s"k out of range: $l"); l.intValue
      case null => fail("k must not be NULL")
      case other => fail(s"k must be an integer literal, got ${other.getClass.getSimpleName}")
    }
    if (k < 1) fail(s"k must be positive, got $k")
    MinHashes(exprs.head, k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_minhashes"),
      new ExpressionInfo(classOf[MinHashes].getName, "graft_minhashes"),
      fromArgs _)
}
