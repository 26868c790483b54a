package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level (intra-document) deduplication — the C4-style boilerplate
  * scrub: drop every LINE whose occurrence count across the whole corpus
  * reaches `minOccurrences` (navigation chrome, cookie banners, "all
  * rights reserved" footers), keeping the rest of each document intact.
  * Complements document-level [[Dedup]]: near-identical boilerplate
  * never makes two documents near-duplicates, it just pollutes both.
  *
  * Scale shape, pass by pass:
  *  1. counting — lines split map-side, the aggregate shuffles
  *     (xxhash64(line), partial count) only: O(partitions × distinct
  *     hashes) rows, never line text;
  *  2. flagging — (id, pos, hash) triples semi-join the frequent-hash
  *     set (narrow 20-byte rows; AQE broadcasts the frequent side when
  *     it is small, which is the common case — boilerplate is by
  *     definition few DISTINCT lines);
  *  3. rebuild — the removal positions aggregate to one array per
  *     flagged document (bounded by lines/doc) and join the corpus on
  *     id: the ONE text-carrying exchange, same cost class as any
  *     enrichment join; unflagged documents pass through the join with
  *     a null removal set and keep their original text column verbatim.
  *
  * Same xxhash64 grouping trade as [[Dedup.exactDuplicates]]: a 64-bit
  * collision between two distinct lines merges their counts (≈2.7×10^4
  * colliding pairs at 10^12 distinct lines — negligible relative loss,
  * documented there).
  */
object LineDedup {

  private def splitLines(textCol: Column): Column = split(textCol, "\n")

  /** Frequent-line observability: (line_hash, n_occurrences, example) for
    * lines reaching `minOccurrences`, heaviest first. `example` carries
    * one representative line text (min_by keeps the aggregate map-side
    * combinable — no window, no text-keyed shuffle). */
  def frequentLines(df: DataFrame, textCol: String, minOccurrences: Long): DataFrame =
    df.select(explode(splitLines(col(textCol))).as("line"))
      .groupBy(xxhash64(col("line")).as("line_hash"))
      .agg(count(lit(1)).as("n"), min_by(col("line"), col("line")).as("example"))
      .where(col("n") >= minOccurrences)
      .orderBy(desc("n"), col("line_hash"))

  /** Rewrite `textCol` with corpus-frequent lines removed (empty string
    * if every line was boilerplate). Line order and all other columns
    * are preserved. */
  def removeDuplicateLines(df: DataFrame, idCol: String, textCol: String,
                           minOccurrences: Long): DataFrame = {
    require(minOccurrences >= 2, s"minOccurrences must be >= 2, got $minOccurrences")
    val lines = df.select(col(idCol),
        posexplode(splitLines(col(textCol))).as(Seq("pos", "line")))
      .select(col(idCol), col("pos"), xxhash64(col("line")).as("h"))
    val freq = lines.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minOccurrences).select("h")
    val removals = lines.join(freq, Seq("h"), "left_semi")
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("__rm"))
    val rebuilt = concat_ws("\n",
      filter(splitLines(col(textCol)), (x, i) => !array_contains(col("__rm"), i)))
    df.join(removals, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__rm").isNull, col(textCol)).otherwise(rebuilt))
      .drop("__rm")
  }

  /** WITHIN-document repetition removal: keep the FIRST occurrence of
    * each line inside a document, drop later repeats (the intra-doc
    * companion of the Gopher `dup_line_frac` rule — pages that repeat
    * their own nav blocks, SEO keyword walls, template stutter). Pure
    * projection: `array_distinct` preserves first-occurrence order, so
    * this is zero-shuffle, codegen'd, and scales with input splits —
    * corpus-frequency-based [[removeDuplicateLines]] is the only
    * variant that needs an aggregate.
    *
    * `delim` is both the split REGEX and the rejoin string (default
    * newline; pass `" "` for word-granularity unit streams). Adds
    * `n_dropped` (lines removed) so rejected volume is observable. */
  def dedupLinesWithinDoc(df: DataFrame, textCol: String,
                          delim: String = "\n"): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(delim))
    val kept = array_distinct(lines)
    df.withColumn("n_dropped",
        (size(lines) - size(kept)).cast("long"))
      .withColumn(textCol, array_join(kept, delim))
  }

  /** Intra-document repeated-line fraction — the SIGNAL form of
    * [[dedupLinesWithinDoc]] (score first, gate later — the quality-
    * filter convention): (n_lines − n_distinct_lines) / n_lines,
    * 0.0 for empty text. Zero-shuffle projection. */
  def repeatedLineFraction(textCol: Column, delim: String = "\n"): Column = {
    val lines = split(textCol, java.util.regex.Pattern.quote(delim))
    val n = size(lines)
    when(n === 0, lit(0.0))
      .otherwise((n - size(array_distinct(lines))).cast("double") / n)
  }

  /** Fixed-width word chunks of a document ("paragraph" units for
    * punctuation-free token streams): chunk i = words[i·w .. i·w+w−1],
    * the last chunk short. Empty/blank text ⇒ empty chunk array. One
    * native [[graft.functions.WordChunks]] eval per reference. */
  def wordChunks(textCol: Column, chunkWords: Int): Column = {
    require(chunkWords >= 1, "chunkWords must be >= 1")
    graft.functions.ShingleExpression.wordChunks(textCol, chunkWords)
  }

  /** The interpreted transform-over-slice spelling [[wordChunks]]
    * replaces — kept only as the SQL-mirror reference for the
    * differential test (the lambda re-evaluates the word split once
    * per chunk per reference; see the WordChunks Scaladoc). */
  private[graft] def wordChunksHof(textCol: Column, chunkWords: Int): Column = {
    require(chunkWords >= 1, "chunkWords must be >= 1")
    val ws = Dedup.words(textCol)
    when(size(ws) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), ((size(ws) - 1) / chunkWords).cast("int")),
        i => array_join(slice(ws, i * chunkWords + 1, lit(chunkWords)), " ")))
  }

  /** Cross-document chunk deduplication — the corpus-wide paragraph
    * scrub (Dolma/RefinedWeb-style): every duplicated chunk keeps ONE
    * copy globally, at its first occurrence in (id, position) order;
    * later occurrences — in other documents OR later in the same one —
    * drop. Returns (idCol, n_chunks, n_kept, text_deduped); a document
    * whose every chunk was seen earlier keeps an empty string.
    *
    * Scale shape: the explode ships (xxhash64(chunk), id, pos) — 24-byte
    * rows, never chunk text; the winner per hash is one min(struct)
    * aggregate (map-side partial); winners regroup to a per-doc kept-
    * position array (bounded by chunks/doc); the ONE text-carrying step
    * is the final join back to the corpus, where each doc's surviving
    * text is re-derived from its own text column by position — chunk
    * text never enters an exchange (PlanSpec pin). Same 64-bit-collision
    * trade as [[removeDuplicateLines]], documented at
    * [[Dedup.exactDuplicates]]. */
  def dedupChunksAcrossDocs(df: DataFrame, idCol: String, textCol: String,
                            chunkWords: Int = 12): DataFrame = {
    val chunked = df.select(col(idCol).as("__cid"),
      posexplode(wordChunks(col(textCol), chunkWords))
        .as(Seq("__pos", "__chunk")))
    val triples = chunked.select(col("__cid"), col("__pos"),
      xxhash64(col("__chunk")).as("__h"))
    val winners = triples.groupBy(col("__h"))
      .agg(min(struct(col("__cid"), col("__pos"))).as("__w"))
      .select(col("__w.__cid").as("__wid"), col("__w.__pos").as("__wpos"))
    val keptPos = winners.groupBy(col("__wid"))
      .agg(sort_array(collect_list(col("__wpos"))).as("__keep"))
    val chunksHere = wordChunks(col(textCol), chunkWords)
    df.join(keptPos, col(idCol) === col("__wid"), "left")
      .select(col(idCol),
        size(chunksHere).cast("long").as("n_chunks"),
        coalesce(size(col("__keep")), lit(0)).cast("long").as("n_kept"),
        // filter-with-index over the chunk array: the chunk expression
        // is the lambda INPUT, evaluated once per row — the previous
        // transform-over-positions spelling re-inlined the whole
        // wordChunks tree into its element_at reference, re-splitting
        // the document once per KEPT chunk (interpreted HOFs have no
        // CSE — the CdcChunkHashes/BENCH.md root cause)
        when(col("__keep").isNull, lit(""))
          .otherwise(array_join(
            filter(chunksHere, (c, i) => array_contains(col("__keep"), i)),
            " ")).as("text_deduped"))
  }
}
