package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, LineDedup, Mixing, Similarity, SnapshotDiff, TextAnalysis}

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

  test("partition digests: order/layout-invariant, mergeable, xor-blind-spot covered") {
    val rows = Seq((1L, "p0", "a"), (2L, "p0", "b"), (3L, "p1", "c"),
      (4L, "p1", "d"), (5L, "p1", "e")).toDF("doc_id", "part", "text")
    val h = SnapshotDiff.rowHash("doc_id", Seq("text"))
    val dig = SnapshotDiff.partitionDigests(rows, "part", h)
      .orderBy("part").collect()
    // digest must not see row order, partitioning, or file layout
    val shuffled = SnapshotDiff.partitionDigests(
      rows.orderBy(desc("doc_id")).repartition(7), "part", h)
      .orderBy("part").collect()
    assert(dig === shuffled)
    // mergeable: sub-partition digests roll up (xor of xors, sums mod m)
    val lo = SnapshotDiff.partitionDigests(
      rows.where($"doc_id" <= 3), "part", h).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val hi = SnapshotDiff.partitionDigests(
      rows.where($"doc_id" > 3), "part", h).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val m = BigInt(2305843009213693951L)
    dig.foreach { r =>
      val (nl, xl, sl) = lo.getOrElse(r.getString(0), (0L, 0L, 0L))
      val (nh, xh, sh) = hi.getOrElse(r.getString(0), (0L, 0L, 0L))
      assert(r.getLong(1) === nl + nh)
      assert(r.getLong(2) === (xl ^ xh))
      assert(BigInt(r.getLong(3)) === (BigInt(sl) + BigInt(sh)).mod(m))
    }
    // XOR blind spot: even multiplicity cancels (h⊕h = 0) — count+sum
    // must still flag the change. Inject the value itself as the hash
    // so the cancelling sets are craftable.
    val vOld = Seq(("p", 2L), ("p", 2L), ("p", 8L), ("p", 8L)).toDF("part", "v")
    val vNew = Seq(("p", 4L), ("p", 4L), ("p", 14L), ("p", 14L)).toDF("part", "v")
    val dOld = SnapshotDiff.partitionDigests(vOld, "part", $"v")
    val dNew = SnapshotDiff.partitionDigests(vNew, "part", $"v")
    assert(dOld.head().getLong(2) === dNew.head().getLong(2)) // xor ties (0)
    assert(dOld.head().getLong(1) === dNew.head().getLong(1)) // count ties
    val st = SnapshotDiff.changedPartitions(dOld, dNew).head()
    assert(st.getString(1) === "changed") // sum_mod breaks the tie
  }

  test("changedPartitions classifies partitions; digest-equal means skip") {
    val oldR = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"),
      (4L, "c", "w")).toDF("doc_id", "part", "text")
    val newR = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "Z"),
      (5L, "d", "q")).toDF("doc_id", "part", "text")
    val h = SnapshotDiff.rowHash("doc_id", Seq("text"))
    val out = SnapshotDiff.changedPartitions(
        SnapshotDiff.partitionDigests(oldR, "part", h),
        SnapshotDiff.partitionDigests(newR, "part", h))
      .orderBy("part").as[(String, String, Long, Long)].collect()
    assert(out === Array(
      ("a", "unchanged", 2L, 2L), ("b", "changed", 1L, 1L),
      ("c", "removed", 1L, 0L), ("d", "added", 0L, 1L)))
  }

  test("lengthBucketStats: hand-computed buckets, invalid rows surfaced") {
    import graft.operators.Packing
    val docs = Seq[java.lang.Long](1L, 1L, 3L, 4L, 7L, 8L, 100L, 0L, null)
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "len")
    val out = Packing.lengthBucketStats(docs, "len", batchSize = 2)
      .as[(Int, Long, Long, Long, Long, Long, Long, Double, Long)]
      .collect()
    assert(out === Array(
      (-1, 0L, 0L, 2L, 0L, 0L, 0L, 0.0, 1L),      // 0 + null, surfaced
      (0, 1L, 1L, 2L, 2L, 1L, 2L, 1.0, 1L),       // lens 1,1
      (1, 2L, 3L, 1L, 3L, 3L, 3L, 1.0, 1L),       // len 3
      (2, 4L, 7L, 2L, 11L, 7L, 14L, 0.785714, 1L), // lens 4,7
      (3, 8L, 15L, 1L, 8L, 8L, 8L, 1.0, 1L),      // len 8
      (6, 64L, 127L, 1L, 100L, 100L, 100L, 1.0, 1L))) // len 100
    // bucketed padding beats pad-to-global-max on this fixture
    val paddedBucketed = out.map(r => r._7).sum
    val globalMax = 100L * 7L // 7 valid docs padded to 100
    assert(paddedBucketed < globalMax)
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

  test("hash diff distinguishes null patterns: a value moving across columns is 'changed'") {
    // xxhash64 skips nulls — without the interleaved null flags,
    // (x, null) and (null, x) would collide and read 'unchanged'
    val o = Seq((1L, Some("x"), Option.empty[String]),
      (2L, Option.empty[String], Option.empty[String]))
      .toDF("doc_id", "a", "b")
    val n = Seq((1L, Option.empty[String], Some("x")),
      (2L, Option.empty[String], Option.empty[String]))
      .toDF("doc_id", "a", "b")
    val st = SnapshotDiff.diff(o, n, "doc_id", Seq("a", "b"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(st === Array((1L, "changed"), (2L, "unchanged")))
  }

  // ---------- DSIR importance weights ----------

  // raw: two "webby" docs, one "target-like" doc; target favors "wiki"
  val dsirRaw = Seq(
    (1L, "spam spam click"),
    (2L, "wiki facts"),
    (3L, "click spam")).toDF("doc_id", "text")
  val dsirTarget = Seq("wiki facts", "wiki knowledge")
    .toDF("text")

  test("dsirLogWeights: hand-computed word-mode weights") {
    // raw counts: spam 3, click 2, wiki 1, facts 1 → N_R=7, V=4
    // target counts: wiki 2, facts 1, knowledge 1 → N_T=4
    def lw(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (4.0 + 4.0)) - math.log((cr + 1.0) / (7.0 + 4.0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Curation.dsirLogWeights(dsirRaw, "doc_id", "text",
        dsirTarget, "text", hashed = false)
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(out === Array(
      (1L, r6(2 * lw(0, 3) + lw(0, 2))),          // spam spam click
      (2L, r6(lw(2, 1) + lw(1, 1))),              // wiki facts
      (3L, r6(lw(0, 2) + lw(0, 3)))))             // click spam
    // the target-like doc must rank first
    assert(out.maxBy(_._2)._1 === 2L)
  }

  test("dsirLogWeights hashed mode: same ranking, bounded broadcast table") {
    // 64k buckets ≫ 5 distinct words → no collisions → identical
    // ORDERING to word mode (weights differ: V = nBuckets)
    val hashed = Curation.dsirLogWeights(dsirRaw, "doc_id", "text",
        dsirTarget, "text", nBuckets = 65536, hashed = true)
    val hOrder = hashed.orderBy(desc("dsir_weight"), col("doc_id"))
      .select("doc_id").as[Long].collect()
    val wOrder = Curation.dsirLogWeights(dsirRaw, "doc_id", "text",
        dsirTarget, "text", hashed = false)
      .orderBy(desc("dsir_weight"), col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(hOrder === wOrder)
    // the nBuckets-bounded weight table must broadcast in hashed mode
    val plan = hashed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dsirSelect keeps the top-k payload rows") {
    val sel = Curation.dsirSelect(dsirRaw, "doc_id", "text",
        dsirTarget, "text", k = 1, hashed = false)
      .as[(Long, String)].collect()
    assert(sel === Array((2L, "wiki facts")))
  }

  // ---------- SemDeDup ----------

  def vecDf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("semDedup drops the higher-id exact duplicate, keeps distinct vectors") {
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    val e3 = Seq(0.0f, 0.0f, 1.0f, 0.0f)
    val corpus = vecDf(1L -> e1, 2L -> e2, 3L -> e3, 10L -> e1, 11L -> e2)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 3, threshold = 0.999)
      .select("vec_id").orderBy("vec_id").as[Long].collect()
    assert(out === Array(1L, 2L, 3L)) // 10, 11 are copies of 1, 2
  }

  test("semDedup survivor keeps full row; near-but-below-threshold pair kept") {
    val a = Seq(1.0f, 0.0f, 0.1f, 0.0f)
    val b = Seq(1.0f, 0.1f, 0.0f, 0.0f) // cos(a,b) ≈ 0.990 < 0.999
    val corpus = vecDf(1L -> a, 2L -> b)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 1, threshold = 0.999)
      .orderBy("vec_id").as[(Long, Seq[Float])].collect()
    assert(out.map(_._1) === Array(1L, 2L))
    assert(out(1)._2 === b) // payload column intact
    // tighter world: same pair IS a duplicate at τ=0.98
    val tight = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 1, threshold = 0.98)
      .select("vec_id").as[Long].collect()
    assert(tight === Array(1L))
  }

  test("semDedup bounds a degenerate cell: dense near-identical clump") {
    // 2000 DISTINCT near-identical vectors (the exact shape k-means
    // degenerates on — round-4 VERDICT "What's wrong" #1): without the
    // oversized-cell defense this is 2M pairwise cosines in one task;
    // with it the pivot pass resolves the clump in O(n)
    val eps = 1e-7f
    val clump = (0L until 2000L).map(i =>
      i -> Seq(1.0f, eps * i, 0.0f, 0.0f))
    val far = Seq(5000L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      5001L -> Seq(0.0f, 0.0f, 1.0f, 0.0f))
    val corpus = vecDf(clump ++ far: _*)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 2, threshold = 0.999, maxCellSize = 50)
      .select("vec_id").orderBy("vec_id").as[Long].collect()
    // every clump pair has cosine ≈ 1 - O(eps²) ≥ 0.999: only the
    // min-id member survives; the two far vectors are untouched
    assert(out === Array(0L, 5000L, 5001L))
    // metrics pin: after the defense NO pairwise cell exceeds the cap —
    // no single join task receives a super-linear pair share
    val index = Similarity.buildIvf(corpus, "vec_id", "embedding",
      nCentroids = 2, refineIters = 1)
    val maxPool = Similarity.semDedupCellStats(index, "vec_id", "embedding",
        threshold = 0.999, maxCellSize = 50)
      .agg(max(col("n_vectors"))).head().getLong(0)
    assert(maxPool <= 50L)
  }

  test("semDedup bounds a degenerate cell: massive exact-duplicate group") {
    // 800 exact copies collapse in ONE window pass (semantics-exact:
    // the min-id rep is a valid witness for anything a copy witnessed)
    val copies = (0L until 800L).map(i => i -> Seq(0.6f, 0.8f, 0.0f, 0.0f))
    val others = Seq(9000L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      9001L -> Seq(0.0f, 0.0f, 0.0f, 1.0f))
    val corpus = vecDf(copies ++ others: _*)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 2, threshold = 0.999, maxCellSize = 50)
      .select("vec_id").orderBy("vec_id").as[Long].collect()
    assert(out === Array(0L, 9000L, 9001L))
    val index = Similarity.buildIvf(corpus, "vec_id", "embedding",
      nCentroids = 2, refineIters = 1)
    val maxPool = Similarity.semDedupCellStats(index, "vec_id", "embedding",
        threshold = 0.999, maxCellSize = 50)
      .agg(max(col("n_vectors"))).head().getLong(0)
    assert(maxPool <= 50L)
  }

  test("semDedup oversized cell: identical ZERO vectors are kept (cos=0<τ)") {
    // cos(0⃗, 0⃗) = 0, so the pairwise semantics KEEP identical zero
    // vectors — the exact-collapse pass must not treat them as dups
    val zeros = (0L until 5L).map(i => i -> Seq(0.0f, 0.0f, 0.0f, 0.0f))
    val others = Seq(100L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      101L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      102L -> Seq(0.0f, 0.0f, 1.0f, 0.0f))
    val corpus = vecDf(zeros ++ others: _*)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 1, threshold = 0.999, maxCellSize = 3)
      .select("vec_id").orderBy("vec_id").as[Long].collect()
    assert(out === Array(0L, 1L, 2L, 3L, 4L, 100L, 101L, 102L))
  }

  test("semDedup pivot pass: pivot-dropped row still witnesses a residual row") {
    // chain p—b—c at 0°/2.5°/5°: cos(p,b)=cos(b,c)=cos2.5°≈0.99905 ≥ τ
    // but cos(p,c)=cos5°≈0.99619 < τ. In a stuck sub-cell the pivot p
    // drops b directly; c's ONLY smaller-id witness is b — c must still
    // drop (b rides the pairwise pool as a witness-only row)
    def at(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = vecDf(1L -> at(0.0), 2L -> at(2.5), 3L -> at(5.0))
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
        nCentroids = 1, threshold = 0.999, maxCellSize = 2)
      .select("vec_id").orderBy("vec_id").as[Long].collect()
    assert(out === Array(1L))
    // and the witness rows are visible in the cell stats, not hidden
    val index = Similarity.buildIvf(corpus, "vec_id", "embedding",
      nCentroids = 1, refineIters = 1)
    val stats = Similarity.semDedupCellStats(index, "vec_id", "embedding",
        threshold = 0.999, maxCellSize = 2)
      .agg(max(col("n_vectors")), sum(col("n_witnesses"))).head()
    assert(stats.getLong(0) <= 2L)
    assert(stats.getLong(1) >= 1L)
  }

  // ---------- composed curation gates ----------

  test("CurationGates.funneled: same survivors as apply; stage counts monotone") {
    import graft.operators.CurationGates
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text", "n_chars")
    val seen = docs.where($"doc_id" < 100)
    val bench = docs.where($"doc_id" % 97 === 0)
      .select(filter(split(lower(trim($"text")), "\\s+"),
        w => w =!= "").as("tokens"))
    val f = CurationGates.funneled(docs, seen,
      blockedHosts = Seq("h3.example.com"), bench = Some(bench))
    val funnelIds = f.df.select("doc_id").as[Long].collect().sorted
    val applyIds = CurationGates(docs, seen,
      blockedHosts = Seq("h3.example.com"), bench = Some(bench))
      .select("doc_id").as[Long].collect().sorted
    assert(funnelIds === applyIds)
    val rep = f.report() // blocks until the collect above completed
    assert(rep.head._1 === "input" && rep.head._2 === 500L)
    // every gate only removes rows and mass, never adds
    rep.sliding(2).foreach { case Seq((_, n1, m1), (s2, n2, m2)) =>
      assert(n2 <= n1, s"stage $s2 grew rows: $n1 -> $n2")
      assert(m2.get <= m1.get, s"stage $s2 grew mass")
    }
    assert(rep.last._2 === funnelIds.length.toLong)
    // the funnel costs zero extra scans: stage metrics came from the ONE
    // action above (report() would hang otherwise), and the extract
    // stage is lossless on rows
    assert(rep.find(_._1 == "extract").get._2 === 500L)
  }

  // ---------- main-content extraction ----------

  test("mainContent: hand-built page keeps the article, drops boilerplate") {
    val article = "The quick brown fox jumps over the lazy dog while " +
      "the inquisitive cat watches from a very comfortable windowsill nearby."
    assert(article.length >= 80) // fixture sanity: passes the length gate
    val page =
      "<html><head><title>T</title><script>if (1 < 2) nav();</script>" +
      "<style>p{a:1}</style></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
      "<a href=\"/c\">Contact</a></nav>" +
      "<div>We use cookies. <a href=\"/ok\">Accept</a></div>" +
      "<h1>Headline</h1>" +
      s"<p>$article</p>" +
      "<p>An article block mentioning a <b>bold</b> &amp; " +
      "<a href=\"/ref\">reference link</a> inside mostly prose text that " +
      "comfortably exceeds the eighty character gate.</p>" +
      "<footer><a href=\"/tos\">Terms of Service</a> " +
      "<a href=\"/priv\">Privacy Policy</a> (c) Example</footer>" +
      "</body></html>"
    val out = Seq(Tuple1(page)).toDF("html")
      .select(TextAnalysis.mainContent($"html").as("main"))
      .as[String].head()
    // both prose paragraphs survive (the second carries one short link —
    // density well under 1/3 — and decodes &amp;); nav, cookie banner,
    // headline and footer are all gone
    assert(out === article + " " +
      "An article block mentioning a bold & reference link inside " +
      "mostly prose text that comfortably exceeds the eighty character gate.")
    assert(!out.contains("Home") && !out.contains("cookies") &&
      !out.contains("Headline") && !out.contains("Privacy"))
  }

  test("mainContent: link-dense long block drops, thresholds are tunable") {
    // a LONG block that is almost entirely anchor text (link farm) must
    // fail the density gate even though it passes the length gate
    val farm = "<div>" + (1 to 20).map(i =>
      s"""<a href="/$i">assorted catalog entry number $i</a>""").mkString(" ") +
      "</div>"
    val out = Seq(Tuple1(s"<html><body>$farm</body></html>")).toDF("html")
      .select(TextAnalysis.mainContent($"html").as("main"))
      .as[String].head()
    assert(out === "")
    // loosened density bound (1/1) lets the same block through
    val loose = Seq(Tuple1(s"<html><body>$farm</body></html>")).toDF("html")
      .select(TextAnalysis.mainContent($"html",
        maxLinkNumer = 1, maxLinkDenom = 1).as("main"))
      .as[String].head()
    assert(loose.contains("catalog entry number 7"))
    // inline tags (<span>, <b>, <a>) never split a block — only the
    // block-level list does, and its `\b` stops prefix false matches
    // (`p` against `<param>`): the whole paragraph scores as ONE block
    val inline = "<html><body><p>" + ("word " * 30).trim +
      " <span>inner</span> <param name=\"x\"> tail words</p></body></html>"
    val inlineOut = Seq(Tuple1(inline)).toDF("html")
      .select(TextAnalysis.mainContent($"html").as("m"))
      .as[String].head()
    assert(inlineOut.contains("inner") && inlineOut.contains("tail words"))
  }

  // ---------- Gopher char-level repetition signals ----------

  def repSignals(text: String, topN: Int, dupN: Int): (Double, Double) = {
    graft.functions.TextExpressions.register(spark)
    val r = Seq(Tuple1(text)).toDF("text")
      .select(graft.functions.TextExpressions
        .repetitionSignals($"text", topN, dupN).as("r"))
      .select($"r.top_ngram_char_frac", $"r.dup_ngram_char_frac")
      .as[(Double, Double)].head()
    r
  }

  test("repetitionSignals: hand-computed top-2-gram and dup-3-gram masses") {
    // words [a,bb,a,bb,a] lens [1,2,1,2,1] denom 7
    // 2-grams: "a bb"×2 (cl 3), "bb a"×2 (cl 3) → top 6/7
    // 3-grams: "a bb a"×2 (cl 4), "bb a bb"×1 → dup 8/7 (>1: overlap)
    val (top, dup) = repSignals("a bb a bb a", 2, 3)
    assert(math.abs(top - 6.0 / 7) < 1e-12)
    assert(math.abs(dup - 8.0 / 7) < 1e-12)
  }

  test("repetitionSignals: all-distinct text, count-tie breaks to larger mass") {
    // "q w ee": all 2-grams count 1 → top = largest char mass 3/4; no dups
    val (top, dup) = repSignals("q w ee", 2, 3)
    assert(math.abs(top - 3.0 / 4) < 1e-12)
    assert(dup === 0.0)
  }

  test("repetitionSignals: short and empty inputs yield zeros") {
    assert(repSignals("solo", 2, 3) === ((0.0, 0.0)))
    assert(repSignals("", 2, 3) === ((0.0, 0.0)))
    assert(repSignals("   ", 2, 3) === ((0.0, 0.0)))
  }

  // ---------- token-balanced sharding ----------

  test("balancedShards: contiguous ranges, one-doc imbalance bound, shared offsets") {
    import graft.operators.Packing
    val docs = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L))
      .toDF("doc_id", "cost")
    val out = Packing.balancedShards(docs, "doc_id", "cost", nShards = 2)
      .orderBy("doc_id")
      .select("doc_id", "shard_id").as[(Long, Int)].collect()
    assert(out === Array((1L, 0), (2L, 0), (3L, 1), (4L, 1)))
    // a giant doc lands whole in one shard; balance still bounded by it
    val skewed = Seq((1L, 100L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("doc_id", "cost")
    val sizes = Packing.shardSizes(
        Packing.balancedShards(skewed, "doc_id", "cost", nShards = 4), "cost")
      .as[(Int, Long, Long)].collect()
    assert(sizes.map(_._3).sum === 104L)
    assert(sizes.head === ((0, 1L, 100L))) // the giant alone in shard 0
    // precomputed offsets path runs the prefix sum once and agrees
    val offs = Packing.globalOffsets(docs, "doc_id", "cost")
    val shared = Packing.balancedShards(docs, "doc_id", "cost", 2, Some(offs))
      .orderBy("doc_id").select("doc_id", "shard_id")
      .as[(Long, Int)].collect()
    Packing.releaseOffsets(offs)
    assert(shared === out)
  }

  // ---------- quantile difficulty buckets ----------

  test("quantileBuckets: exact quartiles on 1..8, approx agrees, no ntile sort") {
    val df = (1 to 8).map(i => (i.toLong, i)).toDF("id", "score")
    val exact = Mixing.quantileBuckets(df, "score", nBuckets = 4, exact = true)
      .orderBy("id").select("score", "bucket").as[(Int, Int)].collect()
    // thresholds 2.75 / 4.5 / 6.25 → pairs per bucket
    assert(exact === Array((1, 0), (2, 0), (3, 1), (4, 1),
      (5, 2), (6, 2), (7, 3), (8, 3)))
    val approx = Mixing.quantileBuckets(df, "score", nBuckets = 4)
      .orderBy("id").select("bucket").as[Int].collect()
    assert(approx === exact.map(_._2)) // sketch is exact at tiny n
    // assignment stage is a projection: no exchange after the agg pass
    val plan = Mixing.quantileBuckets(df, "score", 4, exact = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("balancedShards and quantileBuckets tolerate empty input") {
    import graft.operators.Packing
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "cost")
    assert(Packing.balancedShards(empty, "doc_id", "cost", 4).count() === 0)
    val emptyScore = Seq.empty[(Long, Int)].toDF("id", "score")
    assert(Mixing.quantileBuckets(emptyScore, "score", 4).count() === 0)
  }

  // ---------- temperature mixing ----------

  test("temperatureFractions: T=1 natural mix, T→∞ flattens, tail lifted") {
    val counts = Map("big" -> 900L, "small" -> 100L)
    // T = 1: ratio n/n = 1 for every source → keep everything
    assert(Mixing.temperatureFractions(counts, 1.0)
      === Map("big" -> 1.0, "small" -> 1.0))
    // T = 2: f ∝ sqrt(n)/n = 1/sqrt(n) → small keeps ALL, big keeps
    // sqrt(100/900) = 1/3 of its rows
    val t2 = Mixing.temperatureFractions(counts, 2.0)
    assert(t2("small") === 1.0)
    assert(math.abs(t2("big") - 1.0 / 3.0) < 1e-12)
    // zero-count sources drop out; empty input stays empty
    assert(!Mixing.temperatureFractions(counts + ("gone" -> 0L), 2.0)
      .contains("gone"))
    assert(Mixing.temperatureFractions(Map.empty, 2.0).isEmpty)
  }

  test("sampleByTemperature realizes the tempered mix deterministically") {
    val docs = (0L until 1000L).map(i =>
      (i, if (i < 900) "big" else "small")).toDF("doc_id", "source")
    val kept = Mixing.sampleByTemperature(docs, "doc_id", "source",
        temperature = 2.0, granularity = 1000, hashKey = false)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("small") === 100L) // tail keeps everything
    // big keeps ids with id % 1000 < round(1000/3) = 333 → ids 0..332
    assert(kept("big") === 333L)
    // deterministic: a second run selects the identical rows
    val ids1 = Mixing.sampleByTemperature(docs, "doc_id", "source", 2.0,
      1000, hashKey = false).select("doc_id").as[Long].collect().sorted
    val ids2 = Mixing.sampleByTemperature(docs, "doc_id", "source", 2.0,
      1000, hashKey = false).select("doc_id").as[Long].collect().sorted
    assert(ids1 === ids2)
  }

  test("sampleByTemperature: non-string sources and NULL group tempered, not dropped") {
    // int source column (round-4 ADVICE: getString(0) threw
    // ClassCastException) with a NULL-source population that must be
    // tempered like any other group, never silently dropped
    val docs = (0L until 1000L).map { i =>
      (i, if (i < 900) Some(1) else if (i < 950) Some(2) else None)
    }.toDF("doc_id", "source")
    val kept = Mixing.sampleByTemperature(docs, "doc_id", "source",
        temperature = 2.0, granularity = 1000, hashKey = false)
      .groupBy("source").count()
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getLong(1))
      .toMap
    // counts 900/50/50 at T=2: f ∝ 1/sqrt(n) → both 50-row groups keep
    // all; the 900 group keeps round(sqrt(50/900)*1000) = 236 buckets
    assert(kept(2) === 50L)
    assert(kept(-1) === 50L) // the NULL group survived in full
    assert(kept(1) === 236L)
  }

  test("weightedSample modulo draw is overflow-safe and exact for huge ids") {
    // ids beyond 2^32 made the direct (k * 2654435761 + seed) product
    // overflow Long (ANSI throws; legacy wrapped) — the split-multiplier
    // spelling must equal exact BigInt arithmetic mod 2^32
    val m = BigInt(4294967296L)
    val seed = 7L
    val ids = Seq(Long.MaxValue, Long.MaxValue - 12345L, 4000000000L,
      987654321098L, 3L, 42L, 5000000001L, 1234567890123456789L)
    val docs = ids.map(i => (i, 1L)).toDF("id", "w")
    def u(k: Long): Double =
      (((BigInt(k) * 2654435761L + seed).mod(m)).toDouble + 0.5) / 4294967296.0
    // w = 1 for all rows → key = ln(u): top-k are the largest draws
    val expected = ids.sortBy(i => (-u(i), i)).take(3).sorted
    val got = Mixing.weightedSample(docs, "id", "w", k = 3, seed = seed,
        hashKey = false)
      .select("id").as[Long].collect().sorted
    assert(got === expected.toArray)
  }

  test("modulo-mode guards: non-numeric keys raise instead of dropping every row") {
    val strDocs = Seq(("doc-1", "web"), ("doc-2", "web")).toDF("id", "source")
    val exSample = intercept[Exception] {
      Mixing.sampleByWeights(strDocs, "id", "source", Map("web" -> 1.0),
        hashKey = false).count()
    }
    assert(exSample.getMessage.contains("not numeric") ||
      Option(exSample.getCause).exists(_.getMessage.contains("not numeric")))
    val exEs = intercept[Exception] {
      Mixing.weightedSample(strDocs.withColumn("w", lit(1L)), "id", "w",
        k = 1, hashKey = false).count()
    }
    assert(exEs.getMessage.contains("not numeric") ||
      Option(exEs.getCause).exists(_.getMessage.contains("not numeric")))
    // hash mode takes string keys fine
    assert(Mixing.weightedSample(strDocs.withColumn("w", lit(1L)), "id", "w",
      k = 1).count() === 1)
  }

  test("tokenBudget ranks null scores WORST, never budget-first") {
    import graft.operators.Selection
    val docs = Seq(
      (1L, 10L, Some(0.9)), (2L, 10L, Some(0.5)),
      (3L, 10L, Option.empty[Double])) // unscored must lose
      .toDF("doc_id", "cost", "score")
    val kept = Selection.tokenBudget(docs, "doc_id", "cost",
        col("score"), budget = 15L)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L)) // 0.9 then 0.5; null never selected
  }

  // ---------- weighted sampling (Efraimidis–Spirakis) ----------

  test("weightedSample: weight dominance, determinism, zero-weight exclusion") {
    // one row with overwhelming weight must always be in a k=2 sample
    val docs = Seq((1L, 1L), (2L, 1000000L), (3L, 1L), (4L, 0L), (5L, -2L))
      .toDF("id", "w")
    val got = Mixing.weightedSample(docs, "id", "w", k = 2, seed = 42L)
      .select("id").as[Long].collect().sorted
    assert(got.length === 2 && got.contains(2L))
    assert(!got.contains(4L) && !got.contains(5L)) // w <= 0 never wins
    // same seed same sample; different seed may differ but same size
    val again = Mixing.weightedSample(docs, "id", "w", k = 2, seed = 42L)
      .select("id").as[Long].collect().sorted
    assert(again === got)
    // k beyond the positive-weight population returns exactly it
    val all = Mixing.weightedSample(docs, "id", "w", k = 10, seed = 1L)
      .select("id").as[Long].collect().sorted
    assert(all === Array(1L, 2L, 3L))
  }

  // ---------- per-group z-scores ----------

  test("groupZScores: NULL group is its own population (null-safe join)") {
    import graft.operators.Profile
    val df = Seq((1L, Option.empty[String], Some(1)),
      (2L, Option.empty[String], Some(3)), (3L, Some("a"), Some(9)))
      .toDF("id", "g", "v")
    val out = Profile.groupZScores(df, "v", "g")
      .orderBy("id").select("id", "z").as[(Long, Option[Double])].collect()
    // null group: mean 2, var 1 → z = ∓1; singleton "a" → 0
    assert(out(0)._2.get === -1.0)
    assert(out(1)._2.get === 1.0)
    assert(out(2)._2.get === 0.0)
  }

  test("groupZScores: hand-computed values, degenerate group, null value") {
    import graft.operators.Profile
    val df = Seq(
      (1L, "a", Some(2)), (2L, "a", Some(4)), (3L, "a", Some(6)),
      (4L, "b", Some(9)),                       // single row: var 0 → z 0
      (5L, "a", None))                          // null stays null
      .toDF("id", "g", "v")
    val out = Profile.groupZScores(df, "v", "g")
      .orderBy("id").select("id", "z").as[(Long, Option[Double])].collect()
    // group a: mean 4, var ((4+16+36)/3 - 16) = 56/3-16 = 8/3
    // (tolerance: the hand formula and the engine's fixed expression
    // order differ in the last ulp — the ORACLE uses the engine's order)
    val sd = math.sqrt(8.0 / 3)
    assert(math.abs(out(0)._2.get - (-2.0 / sd)) < 1e-12)
    assert(out(1)._2.get === 0.0)
    assert(math.abs(out(2)._2.get - 2.0 / sd) < 1e-12)
    assert(out(3)._2.get === 0.0)   // degenerate, not NaN
    assert(out(4)._2.isEmpty)       // null in → null out
  }

  // ---------- curation funnel ----------

  test("funnel: per-stage metrics from ONE pass, mass tracked, input row first") {
    import graft.operators.Funnel
    val docs = Seq(
      (1L, 10L, "keep"), (2L, 3L, "keep"), (3L, 10L, "drop"), (4L, 10L, "keep"))
      .toDF("id", "chars", "verdict")
    val f = Funnel(docs, massCol = Some("chars"))
      .stage("len", _.where($"chars" >= 5))
      .stage("verdict", _.where($"verdict" === "keep"))
    assert(f.df.count() === 2) // the single action
    assert(f.report() === Seq(
      ("input", 4L, Some(33L)),
      ("len", 3L, Some(30L)),
      ("verdict", 2L, Some(20L))))
    // massless mode
    val g = Funnel(docs).stage("len", _.where($"chars" >= 5))
    g.df.count()
    assert(g.report().map(r => (r._1, r._2, r._3)) === Seq(
      ("input", 4L, None), ("len", 3L, None)))
    // zero extra jobs: the report is metrics, not recomputation — a
    // second report() call returns instantly with the same values
    assert(f.report() === f.report())
  }

  // ---------- HTML → text extraction ----------

  test("htmlToText: subtree drops, tag strip, entity decode, whitespace collapse") {
    def ext(h: String): String =
      Seq(Tuple1(h)).toDF("h")
        .select(TextAnalysis.htmlToText($"h")).as[String].head()
    assert(ext("<html><body><p>hello   world</p></body></html>")
      === "hello world")
    // script/style content must VANISH, not just lose its tags
    assert(ext("<script>if (a < b) alert('x')</script>keep") === "keep")
    assert(ext("<style media=\"all\">p > a {}</style>keep") === "keep")
    assert(ext("a<!-- hidden\nnote -->b") === "a b")
    // entities, incl. the &amp;lt; double-decode trap: stays literal <
    assert(ext("fish &amp; chips") === "fish & chips")
    assert(ext("&amp;lt;not-a-tag&amp;gt;") === "&lt;not-a-tag&gt;")
    assert(ext("q&#39;s &quot;x&quot;&nbsp;y") === "q's \"x\" y")
    // attributes with > inside quotes are NOT handled (regex tier) —
    // multiline tags are
    assert(ext("<div\n class='a'>text</div>") === "text")
    assert(ext("") === "")
  }

  // ---------- perceptual image dedup (dHash) ----------

  test("dHash: identical payloads equal, resize stays near, noise differs") {
    import graft.operators.Multimodal
    val p = Multimodal.syntheticNoisyPng(7L, 36, 28)
    val h1 = Multimodal.imageDHash(p).get
    assert(Multimodal.imageDHash(p.clone()).get === h1) // re-decode stable
    // bilinear downscale preserves the coarse gradient structure
    val resized = Multimodal.resizePng(p, maxSide = 18)
    val h2 = Multimodal.imageDHash(resized).get
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 16,
      s"resize moved dHash too far: ${java.lang.Long.bitCount(h1 ^ h2)}")
    // a different noisy image is far away
    val other = Multimodal.imageDHash(
      Multimodal.syntheticNoisyPng(8L, 36, 28)).get
    assert(java.lang.Long.bitCount(h1 ^ other) > 10)
    // undecodable payload → None, never a fake hash
    assert(Multimodal.imageDHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("imageDHashes hashes stills + first video frame, skips audio") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticMedia(spark, 9) // ids 0..8, mime = id%3
    val out = Multimodal.imageDHashes(media)
      .select("media_id").as[Long].collect().sorted
    assert(out === Array(0L, 2L, 3L, 5L, 6L, 8L)) // id%3==1 (wav) absent
  }

  test("hammingNearDuplicates on dHashes finds planted copy pairs only") {
    import graft.operators.{Dedup, Multimodal}
    val base = spark.range(20).map { id =>
      Multimodal.MediaRecord(id, Multimodal.syntheticNoisyPng(id, 30, 24),
        "image/png", 30, 24, 0L)
    }
    val doubled = base.union(base.map(r => r.copy(media_id = r.media_id + 100)))
    val pairs = Dedup.hammingNearDuplicates(
        Multimodal.imageDHashes(doubled), "media_id", "dhash", maxHamming = 0)
      .as[(Long, Long, Int)].collect()
    assert(pairs.length === 20)
    assert(pairs.forall(p => p._2 === p._1 + 100 && p._3 === 0))
  }

  test("clusterSizes covers every vector exactly once") {
    val corpus = vecDf((0L until 20L).map(i =>
      i -> Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        0.5f, -0.25f)): _*)
    val idx = Similarity.buildIvf(corpus, "vec_id", "embedding",
      nCentroids = 4, refineIters = 1)
    val sizes = Similarity.clusterSizes(idx).as[(Int, Long)].collect()
    assert(sizes.map(_._2).sum === 20L)
    assert(sizes.forall(_._2 > 0))
  }

  test("readability: hand-computed counts, fragment floor, empty doc NULL") {
    val df = Seq(
      (1L, "The cat sat. It ran!"),  // 6 words, 2 sentences, 6 syllable groups
      (2L, "no punctuation here"),   // fragment → 1 sentence
      (3L, "")                        // zero words → NULL flesch
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // whitespace tokens: the/cat/sat./it/ran! = 5 (punctuation attached)
    assert(got(0).getAs[Long]("n_words") === 5L)
    assert(got(0).getAs[Long]("n_sentences") === 2L)
    // vowel groups: e,a,a,i,a = 5
    assert(got(0).getAs[Long]("n_syllables") === 5L)
    val expected = BigDecimal(
      206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getAs[Double]("flesch") === expected)
    assert(got(1).getAs[Long]("n_sentences") === 1L)
    assert(got(2).isNullAt(got(2).fieldIndex("flesch")))
    val p = TextAnalysis.readability(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"readability shuffled:\n$p")
  }

  test("waterfill: level search, saturation, and exact budget") {
    val got = Mixing.waterfill(Map("a" -> 1L, "b" -> 5L, "c" -> 10L), 12L)
    assert(got === Map("a" -> 1L, "b" -> 5L, "c" -> 6L))
    assert(got.values.sum === 12L)
  }

  test("waterfill: deterministic remainder to first unsaturated groups") {
    // level 2 fits 6 of budget 7; the single leftover unit goes to 'a'
    // (first in (size, name) order among the unsaturated)
    val got = Mixing.waterfill(Map("c" -> 3L, "a" -> 3L, "b" -> 3L), 7L)
    assert(got === Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("waterfill: budget covering everything, and zero budget") {
    val counts = Map("a" -> 2L, "b" -> 7L)
    assert(Mixing.waterfill(counts, 9L) === counts)
    assert(Mixing.waterfill(counts, 100L) === counts)
    assert(Mixing.waterfill(counts, 0L) === Map("a" -> 0L, "b" -> 0L))
    assert(Mixing.waterfill(Map.empty[String, Long], 5L) === Map.empty)
  }

  test("rake: both marginals converge, structural zeros stay absent") {
    // 2×2 with one empty cell; uniform targets 0.5/0.5 per axis
    val cells = Map(("r1", "c1") -> 30L, ("r1", "c2") -> 10L,
      ("r2", "c2") -> 60L)
    val w = Mixing.rake(cells,
      Map("r1" -> 0.5, "r2" -> 0.5), Map("c1" -> 0.5, "c2" -> 0.5),
      iters = 25)
    assert(w.keySet === cells.keySet, "IPF must not invent cells")
    val rowSum = w.groupBy(_._1._1).view.mapValues(_.values.sum)
    val colSum = w.groupBy(_._1._2).view.mapValues(_.values.sum)
    // r2 lives only in c2, so the joint target sits on the boundary
    // (w(r1,c2) → 0): the col marginal is exact after the final col
    // scaling; the row marginal approaches its target sub-geometrically
    assert(math.abs(colSum("c1") - 0.5) < 1e-9)
    assert(math.abs(rowSum("r1") - 0.5) < 0.01)
    // and it IS converging: the raw proportion started at 0.4
    assert(rowSum("r1") > 0.49 && rowSum("r1") < 0.51)
    // determinism: identical input → identical doubles
    assert(w === Mixing.rake(cells,
      Map("r1" -> 0.5, "r2" -> 0.5), Map("c1" -> 0.5, "c2" -> 0.5), 25))
  }

  test("rake: empty table and zero-count cells") {
    assert(Mixing.rake(Map.empty, Map.empty, Map.empty) === Map.empty)
    val z = Mixing.rake(Map(("r", "c") -> 0L), Map("r" -> 1.0),
      Map("c" -> 1.0))
    assert(z === Map(("r", "c") -> 0.0)) // no mass to move
  }

  test("rakeWeights: frame operator, NULL labels bucketed, weights sum to 1") {
    import spark.implicits._
    val df = (Seq.fill(3)(("en", "a")) ++ Seq.fill(1)(("de", "a")) ++
      Seq.fill(4)(("en", "b")) ++ Seq((null, "b"))).toDF("lang", "g")
    val got = Mixing.rakeWeights(df, "lang", "g", iters = 3).collect()
    assert(got.map(_.getString(0)).toSet === Set("en", "de", "<null>"))
    val total = got.map(_.getDouble(3)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"weights sum $total")
    assert(got.map(_.getLong(2)).sum === 9L)
  }

  test("classTfIdfTopTerms: hand-computed scores, class-characterizing terms win") {
    import spark.implicits._
    val df = Seq(
      ("code", "def def return"), ("code", "def x"),
      ("news", "election election results"), ("news", "election today")
    ).toDF("src", "text")
    val got = TextAnalysis.classTfIdfTopTerms(df, "src", "text", k = 1)
      .collect().map(r => r.getString(0) -> (r.getString(2), r.getDouble(3)))
      .toMap
    // totals: 10 words, 2 classes → A = 5.0; tf(def|code)=3, f(def)=3
    val defScore = BigDecimal(3.0 * math.log(1.0 + 5.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("code") === (("def", defScore)))
    assert(got("news")._1 === "election")
  }

  test("interleavePositions: stride schedule interleaves proportionally") {
    import spark.implicits._
    val df = (1L to 8L).map(i => (i, if (i <= 4) "a" else "b"))
      .toDF("id", "src")
    // w(a)=0.5, w(b)=0.25 → vt a: 2,4,6,8; b: 4,8,12,16 — consuming in
    // vt order gives two a's per b (ties: a before b, then id)
    val got = Mixing.interleavePositions(df, "id", "src",
        Map("a" -> 0.5, "b" -> 0.25))
      .orderBy(col("vt"), col("src"), col("id"))
      .select("src").as[String].collect().toSeq
    assert(got === Seq("a", "a", "b", "a", "a", "b", "b", "b"))
    // a source not in the weight map is excluded from the order
    val excl = Mixing.interleavePositions(
      Seq((1L, "a"), (2L, "zz")).toDF("id", "src"), "id", "src",
      Map("a" -> 1.0))
    assert(excl.select("src").as[String].collect().toSeq === Seq("a"))
  }

  test("hapaxStats: hand-counted vocab, null class bucketed") {
    import spark.implicits._
    val df = Seq(
      ("x", "a a b"), ("x", "c"),       // x: a:2 b:1 c:1 → hapax 2/3
      (null.asInstanceOf[String], "q q") // null class: q:2 → hapax 0/1
    ).toDF("src", "text")
    val got = TextAnalysis.hapaxStats(df, "src", "text")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("<null>", 2L, 1L, 0L, 0.0),
      ("x", 4L, 3L, 2L, BigDecimal(2.0 / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("waterfillAllocation: frame operator counts NULL groups too") {
    import spark.implicits._
    val df = (Seq.fill(6)("big") ++ Seq.fill(2)("small") ++
      Seq[String](null, null)).toDF("grp")
    val got = Mixing.waterfillAllocation(df, "grp", budget = 7L)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getLong(2))).toSet
    // sorted (n, name): (2, " null"), (2, "small"), (6, "big") — the
    // null tag sorts first among the size-2 groups; level search:
    // 7/3=2 ≥ 2 → rem 5; 5/2=2 ≥ 2 → rem 3; 3/1=3 < 6 → λ=3;
    // base 2+2+3=7, leftover 0
    assert(got === Set((None, 2L, 2L), (Some("small"), 2L, 2L),
      (Some("big"), 6L, 3L)))
  }
}
