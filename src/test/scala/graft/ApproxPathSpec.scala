package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Lakehouse

/** The 100 TB approximate twins of the exact profile operators, with
  * measured error bounds against the exact answers on real test data.
  * The exact forms stay in `queries` for oracle parity (SURVEY §6);
  * these specs prove the documented swap ("at 100 TB this becomes
  * approx_*, same plan shape") actually holds the accuracy a profile
  * consumer needs.
  */
class ApproxPathSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("approx_count_distinct tracks exact NDV within the configured rsd") {
    val events = Tables.events(spark, d)
    val exact = Lakehouse.ndvProfile(events, Seq("user_id", "event_type"))
      .select("ndv_user_id", "ndv_event_type").as[(Long, Long)].head()
    val approx = events.agg(
      approx_count_distinct($"user_id", 0.02).as("a_user"),
      approx_count_distinct($"event_type", 0.02).as("a_type"))
      .as[(Long, Long)].head()
    // HLL++ rsd 2% -> allow 3 sigma = 6%
    assert(math.abs(approx._1 - exact._1).toDouble / exact._1 <= 0.06)
    assert(approx._2 == exact._2) // tiny cardinality is exact in HLL++
  }

  test("approx percentile thresholds sit within one rank-accuracy step of exact") {
    val events = Tables.events(spark, d)
    val n = events.count()
    val acc = 1000 // rank error <= n / acc
    val (exact92, exact995) = events.agg(
      expr("percentile(value, 0.92)"), expr("percentile(value, 0.995)"))
      .as[(Double, Double)].head()
    val (a92, a995) = events.agg(
      expr(s"percentile_approx(value, 0.92, $acc)"),
      expr(s"percentile_approx(value, 0.995, $acc)"))
      .as[(Double, Double)].head()
    // Convert rank tolerance to a value tolerance empirically: count
    // of values between the exact and approx thresholds must be
    // within the guaranteed rank error.
    def rankDelta(lo: Double, hi: Double): Long =
      events.filter($"value" > math.min(lo, hi) && $"value" <= math.max(lo, hi))
        .count()
    assert(rankDelta(exact92, a92) <= n / acc + 1)
    assert(rankDelta(exact995, a995) <= n / acc + 1)
  }
}
