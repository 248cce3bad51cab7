package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Registry-wide plan-invariant gate (r14 verdict #8 — the
  * fleet-level generalization of the per-operator H proofs): every
  * `SparkEntry.queries` plan is built against the smallest real
  * corpus and checked for the invariants that hold at ANY scale:
  *
  *  1. NO CartesianProduct anywhere — a cartesian that touches data
  *     is never the right plan at 100 TB (bounded literal cross
  *     products compile to BroadcastNestedLoopJoin over 1-row/driver
  *     frames, which is allowed);
  *  2. every parquet scan of an sfDir table PRUNES columns — a scan
  *     whose ReadSchema is the full table width reads bytes the
  *     query never uses (column pruning is the first 100 TB lever);
  *     keys that genuinely consume every column of a table carry an
  *     explicit allowlist entry with the reason.
  *
  * Building a plan executes any plan-time jobs the query runs
  * (censuses, GD fits, streaming sinks, audit tables) — that is the
  * registry's real construction path, on the 1k-row corpus. Failures
  * accumulate and report together so one sweep shows the whole
  * fleet. */
class FleetPlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** keys whose returned frame legitimately scans EVERY column of an
    * sfDir table (the op's contract is the full row). */
  private val fullWidthOk: Map[String, String] = Map(
    "q_quality_scan" -> "per-column null scan audits every column",
    "q_ingest_roundtrip" -> "round-trips the full tick row by design",
    "q_media_features" -> "synthetic media lake, not an sfDir scan",
    "q_erasure" -> "GDPR erasure rewrites whole rows",
    "q_topk_per_group" -> ("the op's contract is top-k ROWS per " +
      "group — the full part row is the payload (oracle SELECTs " +
      "every column)"),
    "q_multi_join" -> ("region (2 cols) and nation (3 cols) are " +
      "bounded dims whose every column the join+name filter consumes"),
    "q_ann_filtered" -> ("embeddings is 3 cols and the query uses " +
      "all 3: label is the filter, vec_id the key, embedding the " +
      "query payload"),
    "q_pca_project" -> ("output carries (vec_id, label, scores) — " +
      "all 3 embedding-table columns are consumed"),
    "q_recon_anomaly" -> ("same 3-column consumption as " +
      "q_pca_project (label rides into the anomaly report)"))

  private def tableWidths(): Map[String, Int] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").map { t =>
      t -> spark.read.parquet(s"$d/$t.parquet").schema.length
    }.toMap

  test("all registry plans: no CartesianProduct; every sfDir parquet " +
      "scan prunes columns (explicit allowlist otherwise)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val widths = tableWidths()
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val keys = SparkEntry.queries.keys.toSeq.sorted
    keys.foreach { name =>
      val before = CkptGc.snapshot(spark)
      try {
        val df = SparkEntry.queries(name)(spark, d)
        // pre-AQE physical plan: collect() traverses it fully
        // (AdaptiveSparkPlanExec hides children from collect on the
        // executed side until finalization)
        val plan: SparkPlan = df.queryExecution.sparkPlan
        if (plan.toString.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct in plan"
        plan.collect { case scan: FileSourceScanExec => scan }
          .foreach { scan =>
            val paths = scan.relation.location.rootPaths.map(_.toString)
            paths.collectFirst {
              case p if p.contains("/testdata/sf") =>
                widths.find { case (t, _) =>
                  p.endsWith(s"$t.parquet")
                }
            }.flatten.foreach { case (table, width) =>
              val read = scan.requiredSchema.length
              if (read >= width && !fullWidthOk.contains(name))
                failures += (s"$name: full-width scan of $table " +
                  s"($read/$width cols) — prune or allowlist")
            }
          }
      } catch {
        case scala.util.control.NonFatal(e) =>
          failures += s"$name: plan build FAILED: ${e.getMessage}"
      } finally CkptGc.sweep(spark, before)
    }
    assert(failures.isEmpty,
      s"${failures.size} plan-invariant failures:\n" +
        failures.mkString("\n"))
    // the sweep really covered the fleet
    assert(keys.size >= 297, s"only ${keys.size} keys swept")
  }
}
