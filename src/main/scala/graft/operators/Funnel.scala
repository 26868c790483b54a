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

  /** Pipeline-stage conservation audit — the "no rows silently
    * dropped or duplicated" invariant a funnel's COUNTS alone cannot
    * prove (a gate that drops one doc and duplicates another conserves
    * n_rows): input must equal the disjoint union of its output
    * `parts` (kept ⊎ rejected, train ⊎ val ⊎ test, shard₀ ⊎ … ⊎
    * shardₙ) on three measures at once — row count, mass, and an
    * order-independent id digest (bit_xor of a multiplicative hash,
    * overflow-free at any row count and exactly replicable in SQL; a
    * row landing in two parts XORs its id in twice and cancels, so
    * the digest catches duplication that counts plus sums can miss).
    *
    * One narrow (id, mass) scan per frame via a tagged union into ONE
    * aggregate — never a per-stage rescan. Output: one row per stage
    * (input first, parts in argument order, zero-rows for empty parts
    * — "no silent caps") plus a `~residual` row holding input − Σ
    * parts per measure; conservation holds iff every residual is 0.
    * The O(stages) aggregate is collected and re-emitted so the
    * result frame never re-scans the inputs. */
  def conservation(input: DataFrame, parts: Seq[(String, DataFrame)],
                   idCol: String,
                   massCol: Option[String] = None): DataFrame = {
    require(parts.nonEmpty, "conservation needs at least one part")
    val names = "input" +: parts.map(_._1)
    require(names.distinct.length == names.length &&
      !names.contains("~residual"), "stage names must be unique")
    val spark = input.sparkSession
    def narrow(name: String, f: DataFrame): DataFrame = {
      val mass = massCol
        .map(c => coalesce(col(c).cast("long"), lit(0L)))
        .getOrElse(lit(0L))
      f.select(lit(name).as("stage"),
        (pmod(col(idCol).cast("long"), lit(1000000007L)) *
          lit(2654435761L) % lit(1000000007L)).as("__h"),
        mass.as("__m"))
    }
    val tagged = (("input", input) +: parts).map { case (n, f) =>
      narrow(n, f)
    }.reduce(_ unionByName _)
    val got = tagged.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__m")).as("mass"),
        expr("bit_xor(__h)").as("digest"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val stages = names.map(n => (n, got.getOrElse(n, (0L, 0L, 0L))))
    val (inN, inM, inD) = stages.head._2
    val partTotals = stages.tail.map(_._2)
    val residual = ("~residual",
      (inN - partTotals.map(_._1).sum,
        inM - partTotals.map(_._2).sum,
        partTotals.map(_._3).foldLeft(inD)(_ ^ _)))
    import spark.implicits._
    (stages :+ residual)
      .map { case (s, (n, m, d)) => (s, n, m, d) }
      .toDF("stage", "n_rows", "mass", "digest")
  }
}
