package graft

import org.apache.spark.sql.functions._

import graft.operators.{LineDedup, SnapshotDiff, TextAnalysis}

/** Corpus-curation operators added in round 4: TF-IDF keyword
  * extraction, within-doc repetition removal, snapshot diff. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---------- TF-IDF ----------

  test("tfIdfTopTerms: hand-computed scores, rank order, tie-break on word") {
    // N = 3 docs; "common" in all 3 (idf = ln(1) = 0), "ab"/"ba" tie
    val docs = Seq(
      (1L, "common rare rare ab ba"),
      (2L, "common mid"),
      (3L, "common mid")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Int, String, Double)].collect()
    val ln3 = math.log(3.0)
    val ln15 = math.log(1.5)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array(
      (1L, 1, "rare", r6(2 * ln3)), // tf 2 × ln(3/1)
      (1L, 2, "ab", r6(ln3)),       // ties with "ba": word asc wins
      (2L, 1, "mid", r6(ln15)),     // ln(3/2)
      (2L, 2, "common", 0.0),       // idf 0: in every doc
      (3L, 1, "mid", r6(ln15)),
      (3L, 2, "common", 0.0)))
  }

  test("tfIdfTopTerms: minDocFreq prunes hapax terms") {
    val docs = Seq((1L, "solo shared"), (2L, "shared")).toDF("doc_id", "text")
    val terms = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 5,
        minDocFreq = 2L)
      .select("word").as[String].collect().toSet
    assert(terms === Set("shared")) // "solo" (df=1) never scored
  }

  // ---------- within-doc repetition removal ----------

  test("dedupLinesWithinDoc keeps first occurrence and original order") {
    val docs = Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "x\ny"),
      (3L, "z\nz\nz")).toDF("doc_id", "text")
    val out = LineDedup.dedupLinesWithinDoc(docs, "text")
      .orderBy("doc_id").select("doc_id", "text", "n_dropped")
      .as[(Long, String, Long)].collect()
    assert(out === Array(
      (1L, "a\nb\nc", 2L),
      (2L, "x\ny", 0L),
      (3L, "z", 2L)))
  }

  test("repeatedLineFraction: 0 for unique, 2/3 for a triple, regex-safe delim") {
    val docs = Seq((1L, "a.b.a"), (2L, "u.v")).toDF("doc_id", "text")
    // '.' would be a regex wildcard if unquoted — the fraction must see
    // 3 units, not per-char splits
    val out = docs.select($"doc_id",
        round(LineDedup.repeatedLineFraction($"text", delim = "."), 6).as("f"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(out === Array((1L, 0.333333), (2L, 0.0)))
  }

  test("dedupLinesWithinDoc is a pure projection: zero exchanges") {
    val docs = Seq((1L, "a\nb\na")).toDF("doc_id", "text")
    val plan = LineDedup.dedupLinesWithinDoc(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ---------- snapshot diff ----------

  val oldSnap = Seq(
    (1L, "same"), (2L, "before"), (3L, "gone")).toDF("doc_id", "text")
  val newSnap = Seq(
    (1L, "same"), (2L, "after"), (4L, "fresh")).toDF("doc_id", "text")

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val out = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(out === Array(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"), (4L, "added")))
    // exact mode (raw-column compare) agrees with the hash mode here
    val exact = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text"),
        exact = true)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(exact === out)
  }

  test("snapshot summary counts and changedRows delta set") {
    val counts = SnapshotDiff.summary(oldSnap, newSnap, "doc_id", Seq("text"))
      .as[(String, Long)].collect().toMap
    assert(counts === Map(
      "unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
    val delta = SnapshotDiff.changedRows(oldSnap, newSnap, "doc_id", Seq("text"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(delta === Array((2L, "after"), (4L, "fresh"))) // the refresh set
  }

  test("snapshot diff joins narrow (key, hash) frames — payload never shuffles") {
    val plan = SnapshotDiff.diff(oldSnap, newSnap, "doc_id", Seq("text"))
      .queryExecution.executedPlan.toString
    // every exchange row is (key, xxhash64) — the text column must be
    // projected away before any Exchange
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.forall(l => !l.contains("text")), plan)
  }

  test("multi-column compare: change in ANY compared column flips status") {
    val o = Seq((1L, "t", "en")).toDF("doc_id", "text", "lang")
    val n = Seq((1L, "t", "de")).toDF("doc_id", "text", "lang")
    val st = SnapshotDiff.diff(o, n, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect()
    assert(st === Array((1L, "changed")))
  }
}
