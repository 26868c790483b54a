package graft
import org.apache.spark.sql.SparkSession
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    // same env contract as graft.Bench (SPARK_GRAFT_SF_DIR / _CPUS)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.contains("GRAFT_EXPLAIN")
    for (n <- names; i <- 1 to (if (explain) 1 else 3)) {
      if (explain) {
        println(s"[timeq] ===== $n =====");
        SparkEntry.queries(n)(spark, d).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).write.mode("overwrite").format("noop").save()
        println(f"[timeq] $n iter$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
