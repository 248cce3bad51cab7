package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharEntropy, CharGrams, MinHashes, PolyHash, PqCodes, SimHash64, VecDot, Winnow, WordGrams}

/** Canonical extension injection point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` makes ALL graft
  * functions available in every session of a cluster deployment.
  * (Operators also self-register defensively for sessions created
  * without extensions — e.g. the test driver's.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Builders are the validated fromArgs factories — arity/literal
    // misuse fails analysis with the function signature in the message.
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "graft_grams"),
      (exprs: Seq[Expression]) => CharGrams.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_vecdot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vecdot"),
      (exprs: Seq[Expression]) => VecDot.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhashes"),
      new ExpressionInfo(classOf[MinHashes].getName, "graft_minhashes"),
      (exprs: Seq[Expression]) => MinHashes.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHash64.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_wordgrams"),
      new ExpressionInfo(classOf[WordGrams].getName, "graft_wordgrams"),
      (exprs: Seq[Expression]) => WordGrams.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_pqcodes"),
      new ExpressionInfo(classOf[PqCodes].getName, "graft_pqcodes"),
      (exprs: Seq[Expression]) => PqCodes.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (exprs: Seq[Expression]) => Winnow.fromArgs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_charentropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_charentropy"),
      (exprs: Seq[Expression]) => CharEntropy.fromArgs(exprs)))
  }
}
