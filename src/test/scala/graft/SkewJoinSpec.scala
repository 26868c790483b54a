package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join equals plain join on skewed data") {
    // fact: one hot key (90%) + tail
    val fact = spark.range(10000).select(
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 7))
        .as("key"),
      $"id".as("payload"))
    val dim = Seq(("hot", 1), ("k0", 2), ("k3", 3)).toDF("key", "dim_val")

    val plain = fact.join(dim, Seq("key")).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("dim_val").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "key", saltFactor = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("dim_val").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === plain)

    val saltedLeft = SkewJoin.saltedEquiJoin(fact, dim, "key",
      saltFactor = 8, joinType = "left").count()
    assert(saltedLeft === fact.count()) // left join preserves fact rows
  }

  test("row salt is deterministic across evaluations") {
    val fact = spark.range(1000).select(concat(lit("k"), $"id").as("key"), $"id".as("v"))
    val a = fact.withColumn("s", SkewJoin.rowSalt(fact, 16)).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    val b = fact.repartition(7).withColumn("s", SkewJoin.rowSalt(fact, 16)).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(a === b)
  }
}
