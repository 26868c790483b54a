package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.norm.Normalize
import graft.operators.ValidationPass
import graft.sources.SeqTableGen

/** Property tests (SURVEY.md §5c): normalization idempotence, sentinel
  * totality, violation-count invariance under repartition. Raw ScalaCheck
  * generators sampled with fixed seeds (the scalatest bridge artifact is
  * not in the offline cache). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  val anyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("", " ", "  ", "none", "None", "nan", "NaN", "NAN", "N/A", "n/a", "NA"),
    Gen.asciiPrintableStr)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("normalization is idempotent: norm(norm(x)) == norm(x)") {
    samples(Gen.listOfN(30, anyString), 20).filter(_.nonEmpty).foreach { xs =>
      val df = xs.toDF("v")
      val once = df.select(Normalize.normalizeNullLike(col("v")).as("v"))
      val twice = once.select(Normalize.normalizeNullLike(col("v")).as("v"))
      assert(once.collect().map(_.getString(0)).toSeq ===
        twice.collect().map(_.getString(0)).toSeq, s"input: $xs")
    }
  }

  test("normalized values are never missing (sentinel fills all holes)") {
    samples(Gen.listOfN(30, Gen.option(anyString)), 20).filter(_.nonEmpty).foreach { xs =>
      val df = xs.toDF("v")
      val n = df.select(Normalize.normalizeNullLike(col("v")).as("v"))
        .where(Normalize.missingMask(col("v"))).count()
      assert(n === 0L, s"input: $xs")
    }
  }

  test("salted two-phase offender cap equals the single-window top-cap") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      nRules <- Gen.choose(1, 4)
      n <- Gen.choose(1, 120)
      cap <- Gen.choose(1, 15)
      salts <- Gen.oneOf(1, 2, 7, 32)
    } yield (nRules, n, cap, salts)
    samples(gen, 12).foreach { case (nRules, n, cap, salts) =>
      // distinct first_keys within a rule (the production invariant: one
      // cell per rule per row ⇒ distinct values have distinct min keys)
      val rows = (0 until n).map { i =>
        (s"R${i % nRules}", s"v$i", (i % 5 + 1).toLong, i.toLong)
      }
      val grouped = rows.toDF("rule_id", "offending_value", "n_cells", "first_key")
      val two = ValidationPass.cappedOffenders(grouped, cap, salts)
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy(col("rule_id")).orderBy(col("first_key"))
      val one = grouped.withColumn("r", row_number().over(w))
        .where(col("r") <= cap).drop("r")
        .collect().map(_.toSeq).toSet
      assert(two === one, s"nRules=$nRules n=$n cap=$cap salts=$salts")
    }
  }

  test("violation counts are invariant under repartitioning") {
    val base = SeqTableGen.generate(spark, 5000)
    val constraints = ValidationPass.seqConstraints(SeqTableGen.Vocab, SeqTableGen.Sources)
    def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      ValidationPass.seqViolations(df, constraints)
        .groupBy("rule_id").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = counts(base)
    samples(Gen.choose(1, 13), 6).foreach { parts =>
      assert(counts(base.repartition(parts)) === expected, s"parts=$parts")
    }
  }
}
