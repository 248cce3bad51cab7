package graft

import java.nio.file.Files
import graft.streaming.Streaming
import graft.streaming.Streaming.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Durability: keyed dedup state must survive a query restart from
  * its checkpoint — the property that makes streaming dedup usable in
  * production (the live endpoint restarts; the reference's polling
  * loop has no such guarantee).
  */
object CheckpointRecoverySpec {
  // foreachBatch sink targets; static so executors/driver share them
  val seen = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
  val nearDup = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
}

class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("dedup state survives a stop/restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Doc]
    // memory sink does not support recovery; foreachBatch does
    def start() = Streaming.dedupExact(in.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streaming.DedupDecision], _: Long) =>
        batch.collect().foreach(d =>
          CheckpointRecoverySpec.seen.put(d.doc_id, d.isDuplicate))
      }
      .start()

    val q1 = start()
    try {
      in.addData(Doc(1L, "hello"), Doc(2L, "world"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(CheckpointRecoverySpec.seen.get(1L) == false)

    // restart against the SAME checkpoint; keyed state must be restored
    val q2 = start()
    try {
      in.addData(Doc(3L, "hello")) // duplicate of a pre-restart doc
      q2.processAllAvailable()
      assert(CheckpointRecoverySpec.seen.get(3L) == true,
        "post-restart duplicate must be flagged from recovered state")
    } finally q2.stop()
  }

  test("near-dup bucket state survives a stop/restart from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt_nd").toString
    val in = MemoryStream[(Long, String)]
    def start() = Streaming.nearDupBandFlags(
        in.toDF().toDF("doc_id", "text")
          .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[_], _: Long) =>
        Streaming.nearDupVerdicts(batch.toDF())
          .as[(Long, Boolean)].collect()
          .foreach { case (id, d) => CheckpointRecoverySpec.nearDup.put(id, d) }
        ()
      }.start()

    val base = "the quick brown fox jumps over the lazy dog again and again"
    val q1 = start()
    try {
      in.addData((1L, base),
        (2L, "an unrelated document about winter mountain storms"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(CheckpointRecoverySpec.nearDup.get(1L) == false)

    val q2 = start()
    try {
      in.addData((3L, base)) // near-dups a PRE-restart doc's buckets
      q2.processAllAvailable()
      assert(CheckpointRecoverySpec.nearDup.get(3L) == true,
        "post-restart near-dup must be flagged from recovered bucket state")
    } finally q2.stop()
  }
}
