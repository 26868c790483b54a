package graft

import org.apache.spark.sql.functions._

import graft.functions.SpatialExpressions
import graft.sources.Bucketing

/** Mathematical contract of the Hilbert index and the clustered
  * layout built on it. */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("hilbertIndex is a bijection with unit-distance steps (bits=4)") {
    // the signature property that distinguishes a true Hilbert walk
    // from any other space-filling order: consecutive d values are
    // GRID-ADJACENT (|dx|+|dy| = 1), and d covers 0..255 exactly once
    val grid = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val rows = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        SpatialExpressions.hilbertIndex(col("x"), col("y"), 4).as("h"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).sorted.toSeq == (0L until 256L))
    val byD = rows.toMap
    for (d <- 0L until 255L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbertIndex first quadrant matches the canonical 2x2 walk") {
    // bits=1: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3
    val out = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(SpatialExpressions.hilbertIndex(col("x"), col("y"), 1))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 1L, 2L, 3L))
  }

  test("hilbertIndex masks out-of-range and propagates null") {
    val out = Seq((Some(16L), Some(3L)), (None, Some(1L)))
      .toDF("x", "y")
      .select(SpatialExpressions.hilbertIndex(col("x"), col("y"), 4).as("h"),
        SpatialExpressions.hilbertIndex(col("x") % 16, col("y"), 4).as("hm"))
      .collect()
    assert(out(0).getLong(0) == out(0).getLong(1)) // 16 & 15 == 0
    assert(out(1).isNullAt(0))
  }

  test("writeHilbert layout prunes on both dimensions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        (col("doc_id") % 256).as("bucket2"))
    Bucketing.writeHilbert(docs, "/tmp/graft_test_hilbert", "n_chars",
      "bucket2", bits = 16, nFiles = 8)
    val d1 = Bucketing.zoneMapSkipStats(spark, "/tmp/graft_test_hilbert",
      "n_chars", 100L, 150L).collect()(0)
    val d2 = Bucketing.zoneMapSkipStats(spark, "/tmp/graft_test_hilbert",
      "bucket2", 0L, 31L).collect()(0)
    // a 1-D sort would zero one of these; the Hilbert layout must
    // skip at least one file on EACH dimension's selective box
    assert(d1.getLong(2) > 0, "no files skipped on n_chars")
    assert(d2.getLong(2) > 0, "no files skipped on bucket2")
  }
}
