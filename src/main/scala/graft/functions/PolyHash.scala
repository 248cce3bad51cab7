package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial string hash
  * (SURVEY §6): `h = fold(chars)(h * 31 + code) mod 1e9+7`.
  *
  * Semantically identical (for BMP text) to the declarative fragment
  * `aggregate(split(s, ''), 0L, (a, c) -> (a*31 + ascii(c)) % p)` and
  * to the DuckDB dual in [[PortableText]] — but where the HOF version
  * allocates a per-character array and interprets a lambda per element,
  * this compiles to a tight generated-Java loop inside whole-stage
  * codegen. On the 100 TB dedup path (every document hashed, every
  * token hashed k times for minhash) that interpreter overhead is the
  * dominant cost; this is preference path (b) from the build contract:
  * a custom `Expression` with `doGenCode`, not a UDF.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.String s = $c.toString();
         |long h = 0L;
         |int n = s.length();
         |for (int i = 0; i < n; i++) {
         |  h = (h * 31L + (long) s.charAt(i)) % ${PolyHash.P}L;
         |}
         |${ev.value} = h;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val P: Long = PortableText.P

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31L + s.charAt(i)) % P; i += 1 }
    h
  }

  /** Register `graft_polyhash` in the session's function registry so it
    * is callable from SQL fragments and inside HOF lambdas. Idempotent;
    * called by every operator that uses it (robust even when the
    * session is created by a driver that knows nothing about
    * SparkSessionExtensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head))
}
