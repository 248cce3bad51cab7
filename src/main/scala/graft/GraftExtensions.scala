package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PolyHash

/** Canonical extension injection point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` makes the graft
  * functions available in every session of a cluster deployment.
  * (Operators also self-register defensively via [[PolyHash.register]]
  * for sessions created without extensions — e.g. the test driver's.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
}
