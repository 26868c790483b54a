package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Curation-funnel observability — the "data funnel" table every
  * pipeline run must log (rows and token mass surviving each gate):
  * input → length gate → quality gate → … → written.
  *
  * The naive spelling is one `count()` job per stage — k extra corpus
  * scans. This one rides Spark's `CollectMetrics` (`observe`): each
  * stage's (n_rows, mass) accumulates as METRICS of the single final
  * pass, so the funnel costs ZERO additional scans or shuffles —
  * whatever action the caller runs anyway (the write, the count)
  * produces every stage's numbers as a side effect. The same mechanism
  * [[ValidationPass]] uses to fuse its per-column null counts.
  *
  * Usage:
  * {{{
  *   val f = Funnel(docs, massCol = Some("n_chars"))
  *     .stage("len_gate", _.where(col("n_chars") >= 100))
  *     .stage("quality", TextAnalysis.applyQualityFilter(_, "text"))
  *   f.df.write.parquet(out)   // ONE pass; gates apply in order
  *   val report = f.report()   // (stage, n_rows, mass) incl. "input"
  * }}}
  *
  * `report()` follows Spark's Observation semantics: it BLOCKS until
  * the first action on [[df]] completes — run (or schedule) the action
  * BEFORE calling it, or the call never returns. It never fabricates
  * zeros: the numbers always come from a real executed pass. */
final class Funnel private (
    val df: DataFrame, massCol: Option[String],
    stages: Vector[(String, Observation)]) {

  private def metricCols(): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    massCol.map(c => coalesce(sum(col(c).cast("long")), lit(0L)))
      .getOrElse(lit(null).cast("long")).as("mass"))

  /** Append a gate; its survivor counts become metrics of the one pass. */
  def stage(name: String, gate: DataFrame => DataFrame): Funnel = {
    require(!stages.exists(_._1 == name), s"duplicate stage name: $name")
    val obs = Observation(s"funnel_$name")
    new Funnel(gate(df).observe(obs, metricCols().head, metricCols().tail: _*),
      massCol, stages :+ (name -> obs))
  }

  /** (stage, n_rows, mass) in pipeline order, "input" first. BLOCKS
    * until an action on [[df]] completes (Observation.get semantics) —
    * call after the pipeline's own write/count. */
  def report(): Seq[(String, Long, Option[Long])] =
    stages.map { case (name, obs) =>
      val m = obs.get // waits for the first completed action
      (name, m("n_rows").asInstanceOf[Long],
        Option(m("mass")).map(_.asInstanceOf[Long]))
    }

  /** The report as a small DataFrame (for sinks/tests). */
  def reportDf(): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    report().map { case (s, n, m) => (s, n, m.getOrElse(-1L)) }
      .toDF("stage", "n_rows", "mass")
  }
}

object Funnel {
  /** Start a funnel at `input`; the implicit first stage is "input"
    * (metrics of the unfiltered frame). `massCol` adds a token/char
    * mass column to every stage's metrics. */
  def apply(input: DataFrame, massCol: Option[String] = None): Funnel =
    new Funnel(input, massCol, Vector.empty).stage("input", identity)
}
