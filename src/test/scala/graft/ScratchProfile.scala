package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-profiler for optimization work (test scope, not
  * shipped; run via Test/runMain graft.ScratchProfile). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        (col("doc_id") % 256).as("bucket2"))
    for (i <- 1 to 3) {
      t(s"iter$i writeHilbert current")(
        graft.sources.Bucketing.writeHilbert(docs, "/tmp/scratch_h1",
          "n_chars", "bucket2", bits = 16, nFiles = 8))
      t(s"iter$i writeHilbert pre-exchange")(
        docs.withColumn("__h", graft.functions.SpatialExpressions
            .hilbertIndex(col("n_chars"), col("bucket2"), 16))
          .repartition(col("__h"))
          .repartitionByRange(8, col("__h"))
          .sortWithinPartitions(col("__h"))
          .drop("__h")
          .write.mode("overwrite").parquet("/tmp/scratch_h2"))
    }
    spark.stop()
  }
}
