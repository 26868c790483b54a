package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supplementary measurements (noop-sink isolation per the guide's
  * §1.4) that the frozen [[Bench]] harness does not expose: the
  * headline seq-validation throughput split into its two component
  * jobs, each timed separately over the SAME materialized table and
  * methodology (best-of-4, noop sink). Numbers quoted in
  * OPTIMIZATION_r06.md come from here; BENCH.json never reads them. */
object BenchExtra {
  def exec(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def time[A](body: => A): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Uniqueness, ValidationPass}
    import graft.sources.SeqTableGen
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val base = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp")
    val path = s"$base/graft_bench_seq_$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      SeqTableGen.generate(spark, n).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val cons = ValidationPass.seqConstraints(
      SeqTableGen.Vocab, SeqTableGen.Sources)
    def best(label: String)(body: => Unit): Unit = {
      val secs = (1 to 4).map(i => time(body))
      println(f"[benchextra] $label best=${secs.min}%.3f s all=" +
        secs.map(s => f"$s%.2f").mkString(","))
    }
    spark.sparkContext.setJobDescription("seqViolations only")
    best("seq_violations")(exec(ValidationPass.seqViolations(df, cons)))
    spark.sparkContext.setJobDescription("duplicatesSimple only")
    best("duplicates")(exec(Uniqueness.duplicatesSimple(df, "doc_id")))
    spark.stop()
  }
}
