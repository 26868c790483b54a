package graft

import org.apache.spark.sql.functions._

import graft.functions.ShingleExpression
import graft.operators.Decontamination

/** Token-level benchmark decontamination: gram extraction semantics and
  * the corpus-vs-benchmark overlap report. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("tokenGrams: sorted distinct window hashes; short docs empty") {
    val df = Seq(
      (1L, Seq(1, 2, 3, 4)),       // 2 windows, distinct
      (2L, Seq(1, 2, 3, 1, 2, 3)), // windows {123,231,312,123} → 3 distinct
      (3L, Seq(7, 7)),             // shorter than n → no grams
      (4L, Seq.empty[Int]))
      .toDF("id", "tokens")
    val r = df.select($"id", ShingleExpression.tokenGrams($"tokens", 3).as("g"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(r(1L).length === 2)
    assert(r(2L).length === 3)
    assert(r(3L).isEmpty && r(4L).isEmpty)
    assert(r(1L) === r(1L).sorted && r(2L) === r(2L).sorted)
    // order sensitivity: [1,2,3] and [3,2,1] windows must differ
    val rev = Seq((9L, Seq(3, 2, 1))).toDF("id", "tokens")
      .select(ShingleExpression.tokenGrams($"tokens", 3)).head.getSeq[Long](0)
    assert(rev.intersect(r(1L)).isEmpty)
  }

  test("contaminated: planted leak found with exact counts, clean docs pass") {
    val corpus = Seq(
      (1L, Seq(10, 11, 12, 13, 14)),  // shares grams with bench doc A
      (2L, Seq(20, 21, 22, 23)),      // clean
      (3L, Seq(11, 12, 13, 99, 98)),  // one bench gram (11,12,13)
      (4L, Seq(30, 30, 30, 30)))      // clean, repeated token
      .toDF("doc_id", "tokens")
    val bench = Seq(
      Tuple1(Seq(10, 11, 12, 13)),    // doc A: grams (10,11,12),(11,12,13)
      Tuple1(Seq(50, 51, 52)))
      .toDF("tokens")
    val rep = Decontamination.contaminated(
        corpus, "doc_id", "tokens", bench, "tokens", n = 3)
      .orderBy("doc_id").collect()
    assert(rep.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val byId = rep.map(r => r.getLong(0) ->
      ((r.getInt(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byId(1L) === ((3, 2L, 0.666667))) // 3 distinct grams, 2 leaked
    assert(byId(3L) === ((3, 1L, 0.333333)))
  }

  test("removeContaminated drops exactly the flagged docs") {
    val corpus = Seq(
      (1L, Seq(10, 11, 12, 13, 14)),
      (2L, Seq(20, 21, 22, 23)))
      .toDF("doc_id", "tokens")
    val bench = Seq(Tuple1(Seq(10, 11, 12))).toDF("tokens")
    val kept = Decontamination.removeContaminated(
        corpus, "doc_id", "tokens", bench, "tokens", n = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(2L))
  }

  test("minMatches threshold: single-gram overlap below threshold passes") {
    val corpus = Seq((3L, Seq(11, 12, 13, 99, 98))).toDF("doc_id", "tokens")
    val bench = Seq(Tuple1(Seq(11, 12, 13))).toDF("tokens")
    val rep = Decontamination.contaminated(
      corpus, "doc_id", "tokens", bench, "tokens", n = 3, minMatches = 2L)
    assert(rep.count() === 0L)
  }

  test("span scrub: cross-doc repeated spans cut, within-doc repeats kept") {
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, Seq(1, 2, 3, 9, 8)),       // shares (1,2,3) with doc 2
      (2L, Seq(7, 1, 2, 3, 6)),       // shares (1,2,3) with doc 1
      (3L, Seq(5, 5, 5, 5, 5, 4)),    // within-doc repetition only → kept
      (4L, Seq(10, 11)))              // shorter than n → untouched
      .toDF("doc_id", "tokens")
    val got = Dedup.removeDuplicatedSpans(corpus, "doc_id", "tokens", n = 3)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(got(1L) === Seq(9, 8))        // positions 0-2 covered
    assert(got(2L) === Seq(7, 6))        // positions 1-3 covered
    assert(got(3L) === Seq(5, 5, 5, 5, 5, 4)) // single doc: not duplicated
    assert(got(4L) === Seq(10, 11))
  }

  test("benchmark side broadcasts; corpus side has no pre-join exchange") {
    val corpus = Seq((1L, Seq(1, 2, 3))).toDF("doc_id", "tokens")
    val bench = Seq(Tuple1(Seq(1, 2, 3))).toDF("tokens")
    val plan = Decontamination.contaminated(
        corpus, "doc_id", "tokens", bench, "tokens", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the only exchanges allowed: the broadcast itself and the tiny
    // post-join per-doc aggregate — never a corpus-side hash exchange
    // BEFORE the join (the corpus must stream scan→explode→probe)
    val beforeJoin = plan.substring(plan.indexOf("BroadcastHashJoin"))
    assert(!beforeJoin.split("BroadcastExchange").head.contains("hashpartitioning"))
  }
}
