package graft

import java.nio.file.Files
import graft.sources.CsvTickIngest
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class IngestMultimodalSpec extends SparkSpec {

  test("CsvTickIngest reads the Dukascopy CSV format, prunes Volume, tags symbol") {
    val dir = Files.createTempDirectory("graft_csv")
    val sym = Files.createDirectory(dir.resolve("EURUSD"))
    Files.writeString(sym.resolve("part1.csv"),
      "DateTime,Bid,Ask,Volume\n" +
        "20240101 07:55:01.123,1.1001,1.1003,2.5\n" +
        "20240101 07:55:02.456,1.1002,1.1004,1.0\n")
    val df = CsvTickIngest.read(spark, dir.toString + "/*/*.csv")
    val rows = df.collect()
    assert(rows.length == 2)
    assert(df.columns.toSeq == Seq("ts", "bid", "ask", "symbol"))
    assert(rows.forall(_.getAs[String]("symbol") == "EURUSD"))
    assert(rows.head.getAs[java.sql.Timestamp]("ts").toString
      .startsWith("2024-01-01 07:55:01"))

    // round-trip: partitioned write preserves content and layout
    val out = dir.resolve("gold").toString
    CsvTickIngest.write(df, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.select("symbol").distinct().collect().head.getString(0) == "EURUSD")
    assert(Files.exists(java.nio.file.Paths.get(out, "symbol=EURUSD", "year=2024")))
  }

  test("multimodal feature extraction is deterministic over binary payloads") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 30)
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
    assert(feats.forall(f => f.brightness >= 0 && f.brightness <= 255))
  }

  test("frame sampling emits k linspace frames per video row only") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(media, 4)
    val perId = frames.collect().groupBy(_.media_id)
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(perId.keySet == videoIds)
    assert(perId.values.forall(_.length <= 4))
    // frame indices are within range and start at 0
    assert(frames.collect().forall(f => f.frame_idx >= 0))
  }
}
