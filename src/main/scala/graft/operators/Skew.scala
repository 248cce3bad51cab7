package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §5). AQE's skew-join handles most
  * cases at runtime; explicit salting remains the tool when one join
  * key dominates so heavily that even split shuffle blocks hot-spot a
  * single executor (the classic "one symbol is 40% of the tape"
  * tick-data shape).
  */
object Skew {

  /** Salted equi-join: the fact side derives a deterministic salt from
    * `saltSource` (any well-distributed column — tick_id, event_id),
    * the dimension side is exploded ×`salts`. The hot key's rows now
    * land on `salts` reducers instead of one. Result set is identical
    * to the plain join (verified in the spec); cost is |dim|·salts,
    * which is why `dim` must be the small side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
