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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    graft.functions.TextExpressions.register(spark)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    import graft.functions.TextExpressions
    for (i <- 1 to 3) {
      t(s"iter$i md5-expr only")(noop(docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          TextExpressions.winnowMd5(col("text"), 8, 4).as("fps"))))
      t(s"iter$i + explode")(noop(docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          explode(TextExpressions.winnowMd5(col("text"), 8, 4)).as("fp"))))
      t(s"iter$i + orderBy")(noop(docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          explode(TextExpressions.winnowMd5(col("text"), 8, 4)).as("fp"))
        .orderBy("doc_id", "fp")))
      t(s"iter$i + repart + orderBy")(noop(docs.where(col("text").isNotNull)
        .select(col("doc_id"),
          explode(TextExpressions.winnowMd5(col("text"), 8, 4)).as("fp"))
        .repartition(col("doc_id"))
        .orderBy("doc_id", "fp")))
    }
    spark.stop()
  }
}
