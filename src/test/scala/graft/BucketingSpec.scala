package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: zero-exchange plan pins + row parity
  * with the plain shuffled join. */
class BucketingSpec extends SparkSpec {

  private val base = "/tmp/graft_buckets_spec"

  private def shuffles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // finalize AQE
    new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      .collectWithSubqueries(df.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.nodeName
      }
  }

  test("bucketed join: no exchange, rows identical to the plain join") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Bucketing.writeBucketed(orders, "bspec_orders", s"$base/orders",
      "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "bspec_lineitem", s"$base/lineitem",
      "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bspec_orders",
          "o_orderkey", "bspec_lineitem", "l_orderkey")
        .select("o_orderkey", "l_linenumber", "l_quantity")
      assert(shuffles(joined).isEmpty,
        "bucketed join must not shuffle either side")
      val plain = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "l_linenumber", "l_quantity")
      assert(joined.count() === plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupBy on the bucket key: no exchange (scan is pre-distributed)") {
    val agg = spark.table("bspec_lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(shuffles(agg).isEmpty, "bucketed groupBy must not shuffle")
    // parity with the shuffled aggregate
    val plain = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(agg.exceptAll(plain).isEmpty && plain.exceptAll(agg).isEmpty)
  }

  test("non-power-of-two bucket count rejected") {
    val df = spark.range(4).toDF("id")
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "bspec_bad", s"$base/bad", "id", 6)
    }
  }

  test("partitionAudit: rows and file counts per partition directory") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    val path = s"$base/layout_audit"
    Bucketing.writePartitionedBy(df, path, "p")
    val got = Bucketing.partitionAudit(spark, path, "p")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 5L, 1L), ("b", 3L, 1L), ("c", 1L, 1L)))
  }
}
