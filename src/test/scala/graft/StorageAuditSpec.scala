package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Drift, StorageAudit}

/** Hand-computed fixtures for the storage-layout advisors
  * (encoding / sortedness / file skew), the LSH banding planner, and
  * the two-proportion power analysis. */
class StorageAuditSpec extends SparkSpec {
  import spark.implicits._

  test("encodingAudit: runs, cardinality, recommendation") {
    // v: A A A A B B B B C C -> 3 runs, avg 10/3; w: constant -> rle
    val vs = Seq("A", "A", "A", "A", "B", "B", "B", "B", "C", "C")
    val df = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, v, "k") }
      .toDF("id", "v", "w")
    val out = StorageAudit.encodingAudit(df, "id", Seq("v", "w"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = out("v")
    assert(v.getLong(1) == 10 && v.getLong(2) == 3 && v.getLong(3) == 3)
    assert(math.abs(v.getDouble(4) - 3.333333) < 1e-6)
    assert(v.getString(6) == "plain") // avg run < 4, ratio 0.3 > 0.01
    val w = out("w")
    assert(w.getLong(2) == 1 && w.getLong(3) == 1)
    assert(w.getDouble(4) == 10.0 && w.getString(6) == "rle")
  }

  test("encodingAudit: null runs count like value runs (null-safe eq)") {
    // A null null A -> boundaries at 0-1 and 2-3 only: 3 runs
    val df = Seq((0L, Some("A")), (1L, None), (2L, None), (3L, Some("A")))
      .toDF("id", "v")
    val r = StorageAudit.encodingAudit(df, "id", Seq("v")).collect()(0)
    assert(r.getLong(3) == 3)
    assert(r.getLong(2) == 1) // distinct ignores nulls, like the oracle
  }

  test("sortednessAudit: fraction of non-decreasing adjacent pairs") {
    val df = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0), (3L, 2.0), (4L, 5.0))
      .toDF("id", "v")
    val r = StorageAudit.sortednessAudit(df, "id", "v").collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 0 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 0.75)
  }

  test("sortednessAudit: null-sided pairs excluded but reported") {
    val df = Seq((0L, Some(1.0)), (1L, None), (2L, Some(3.0)))
      .toDF("id", "v")
    val r = StorageAudit.sortednessAudit(df, "id", "v").collect()(0)
    assert(r.getLong(0) == 0 && r.getLong(1) == 2)
    assert(r.isNullAt(3)) // zero usable pairs -> NULL, not 0/0
  }

  test("fileSkew: per-file counts, straggler factor, small files") {
    val dir = "/tmp/graft_test_fileskew"
    Seq.range(0, 9).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    Seq.range(0, 2).toDF("x").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq(0).toDF("x").coalesce(1).write.mode("append").parquet(dir)
    val r = StorageAudit.fileSkew(spark, dir).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 12)
    assert(r.getLong(2) == 1 && r.getLong(3) == 9)
    assert(r.getDouble(4) == 4.0)
    assert(r.getDouble(5) == 2.25)     // 9 / 4
    assert(r.getLong(6) == 1)          // only the 1-row file is < 2.0
  }

  test("lshBandPlan: divisor splits, S-curve values, unique argmin") {
    val out = Dedup.lshBandPlan(spark, nPerms = 16, threshold = 0.8)
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
    out.foreach(r => assert(r.getInt(0) * r.getInt(1) == 16))
    // b=1, r=16: P(cand | 0.8) = 0.8^16
    val single = out.find(_.getInt(0) == 1).get
    assert(math.abs(single.getDouble(3) - math.pow(0.8, 16)) < 1e-6)
    // s* for b=16, r=1: (1/16)^1 = 0.0625
    val flat = out.find(_.getInt(0) == 16).get
    assert(flat.getDouble(2) == 0.0625)
    assert(out.count(_.getBoolean(7)) == 1)
    val rec = out.find(_.getBoolean(7)).get
    assert(rec.getDouble(6) == out.map(_.getDouble(6)).min)
  }

  test("powerAnalysis: sample size formula and degenerate groups") {
    val rows =
      Seq.fill(5)(("a", 1)) ++ Seq.fill(5)(("a", 0)) ++ // p1 = 0.5
        Seq.fill(4)(("zero", 0)) ++                     // p1 = 0  -> NULL
        Seq.fill(3)(("one", 1))                         // p1 = 1  -> NULL
    val df = rows.toDF("g", "s")
    val out = Drift.powerAnalysis(df, "g", col("s") === 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    val p1 = 0.5; val p2 = 0.525; val pbar = (p1 + p2) / 2
    val expected = math.ceil(math.pow(
      1.9599639845400545 * math.sqrt(2 * pbar * (1 - pbar)) +
        0.8416212335729143 *
          math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) /
      math.pow(p2 - p1, 2)).toLong
    assert(a.getLong(5) == expected)
    assert(!a.getBoolean(6)) // 10 rows nowhere near powered
    assert(out("zero").isNullAt(5) && out("zero").isNullAt(6))
    assert(out("one").isNullAt(5))
  }
}
