package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling harness — the sandbox proxy for the north
  * rule's "N and 4N executors with throughput scaling efficiency ≥ 0.8"
  * criterion (BASELINE.md): the identical validation job runs on the
  * identical input at local[N] and local[4N] (sequential SparkSessions in
  * one JVM; contexts fully stopped between runs), and efficiency =
  * (throughput_4N / throughput_N) / 4.
  *
  * The job is the full sequence-validation suite (five constraints +
  * uniqueness aggregate) over `rows` generated rows partitioned 4N ways
  * in both runs, so both parallelism levels see identical physical splits
  * and the only variable is executor-thread count.
  *
  * Usage: runMain graft.Scaling [rows] [n] — prints one JSON line.
  */
object Scaling {

  def run(master: String, shufflePartitions: Int, rows: Long, parts: Int): Double = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(s"graft-scaling-$master")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // nested-column vectorized parquet reader is OFF by default and
      // costs ~3x on array<int> scans (BENCH.md)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      import graft.operators.{Uniqueness, ValidationPass}
      import graft.sources.SeqTableGen
      // materialize the identical input once (parquet, `parts` files)
      val path = s"/tmp/graft_scaling_${rows}_$parts"
      if (!new java.io.File(s"$path/_SUCCESS").exists())
        SeqTableGen.generate(spark, rows, numPartitions = parts)
          .write.mode("overwrite").parquet(path)

      // warm-up (JIT + codegen cache) on a small generated slice —
      // NOT parquet.limit(n): GlobalLimit funnels the whole read through
      // one partition and costs more than the benchmark itself
      val warm = SeqTableGen.generate(spark, 100000, numPartitions = parts)
      Bench.exec(ValidationPass.seqViolations(
        warm, ValidationPass.seqConstraints(SeqTableGen.Vocab, SeqTableGen.Sources)))

      val df = spark.read.parquet(path)
      // best-of-3 inside the session: the first iteration eats JIT and
      // page-cache warmup; min time is the least-noise estimate of the
      // machine's true capability at this parallelism
      val secs = (1 to 3).map { _ =>
        Bench.time {
          Bench.exec(ValidationPass.seqViolations(
            df, ValidationPass.seqConstraints(SeqTableGen.Vocab, SeqTableGen.Sources)))
          Bench.exec(Uniqueness.duplicatesSimple(df, "doc_id"))
        }
      }.min
      rows / secs
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val n4 = 4 * n
    val parts = n4 * 4 // identical physical layout at both levels
    def load(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Locale.ROOT: a comma-decimal JVM locale would break the parsed line
    def fmt(p: String, v: Double): String =
      String.format(java.util.Locale.ROOT, p, Double.box(v))
    val loadStart = load()
    // the sandbox host carries variable external load — alternate the
    // two levels and take best-of-reps per level so a noisy window
    // penalizes both sides equally; the 1-min load is sampled before
    // each session so every sample is adjudicable on its own (the
    // established protocol: only runs with idle start AND end count)
    val samples = (1 to reps).flatMap { i =>
      Seq(
        ("n",  load(), run(s"local[$n]", n4, rows, parts)),
        ("4n", load(), run(s"local[$n4]", n4, rows, parts)))
    }
    val tN = samples.collect { case ("n", _, v) => v }.max
    val t4N = samples.collect { case ("4n", _, v) => v }.max
    val eff = (t4N / tN) / 4.0
    val all = samples.map { case (k, l, v) =>
      s"""["$k",${fmt("%.0f", v)},${fmt("%.2f", l)}]""" }.mkString("[", ",", "]")
    println(
      s"""{"metric":"scaling_efficiency","rows":$rows,"n":$n,"n4":$n4,""" +
      s""""throughput_n":${fmt("%.0f", tN)},"throughput_4n":${fmt("%.0f", t4N)},""" +
      s""""efficiency":${fmt("%.3f", eff)},"samples":$all,""" +
      s""""samples_format":["level","rows_per_sec","load_avg_1m_pre"],""" +
      s""""load_avg_1m":${fmt("%.2f", loadStart)},"load_avg_1m_end":${fmt("%.2f", load())}}""")
  }
}
