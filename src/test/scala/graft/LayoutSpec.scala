package graft

import java.nio.file.Files
import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: unit vectors, locality, and bounds") {
    val out = Seq((1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    // a-bits land at even positions, b-bits at odd: (1,0)->1, (0,1)->2,
    // (3,0)->0b0101=5, (0,3)->0b1010=10, (3,3)->0b1111=15
    assert(out == Seq(1L, 2L, 5L, 10L, 15L))
  }

  test("z-order layout prunes 2-D box predicates where a linear sort " +
      "reads every file") {
    // 64x64 grid, one row per cell; 16 files per layout.
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val dir = Files.createTempDirectory("graft_layout").toString
    val zPath = s"$dir/zorder"
    val linPath = s"$dir/linear"
    Layout.zOrderWrite(grid, zPath, "x", "y", nFiles = 16, bits = 6)
    Layout.linearWrite(grid, linPath, "x", nFiles = 16)

    val zBoxes = Layout.fileBoxes(spark, zPath, "x", "y")
    val linBoxes = Layout.fileBoxes(spark, linPath, "x", "y")
    assert(zBoxes.count() == 16 && linBoxes.count() == 16)

    // Predicate: full x range, narrow y band (y in [8, 15]) — the
    // query shape a single-column sort cannot skip for.
    val zTouched = Layout.filesTouched(zBoxes, 0, 63, 8, 15)
    val linTouched = Layout.filesTouched(linBoxes, 0, 63, 8, 15)
    // linear-by-x: every file spans all y values -> reads all 16
    assert(linTouched == 16L, s"linear layout touched $linTouched")
    // z-order: files are ~square tiles -> only the tiles meeting the
    // band are read
    assert(zTouched <= 8L, s"z-order layout touched $zTouched")

    // Layout is physical only: logical content identical.
    assert(spark.read.parquet(zPath).orderBy("x", "y").collect().toSeq ==
      grid.orderBy("x", "y").collect().toSeq)
  }
}
