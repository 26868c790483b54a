package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window document chunking — the step between raw tokenized
  * documents and fixed-context training/retrieval corpora: split each
  * `tokens` array into windows of at most `maxLen` tokens, consecutive
  * windows overlapping by `overlap` tokens (stride = maxLen − overlap).
  *
  * Semantics (deterministic, fully SQL-replicable — oracled by
  * q_chunk_tokens):
  *  - chunk k covers token indices [k·stride, min(k·stride + maxLen, n));
  *  - a document emits ceil((n − maxLen) / stride) + 1 chunks when
  *    n > maxLen, exactly 1 when 0 < n ≤ maxLen, and 0 when empty —
  *    every token lands in ≥1 chunk, the final chunk ends at n, and no
  *    chunk starts at or past n (so no chunk is pure overlap);
  *  - chunk_id is 0-based and dense per document.
  *
  * Scale shape: `sequence` + `explode` + `slice` are all codegen'd
  * collection ops, the plan is a narrow Generate over the scan — zero
  * exchanges, embarrassingly parallel, fan-out bounded by
  * ceil(n_tok/stride) per row. Token arrays are never shuffled; callers
  * repartition AFTER chunking only if the downstream op needs it.
  */
object Chunking {

  /** @return (idCol, chunk_id, chunk_start, chunk_tokens, n_chunk_tok) */
  def chunkTokens(df: DataFrame, idCol: String, tokensCol: String,
                  maxLen: Int, overlap: Int): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    require(overlap >= 0 && overlap < maxLen,
      s"overlap must be in [0, maxLen), got $overlap for maxLen=$maxLen")
    val stride = maxLen - overlap
    val n = size(col(tokensCol))
    val nChunks: Column = when(n <= maxLen, lit(1))
      .otherwise(ceil((n - maxLen).cast("double") / stride).cast("int") + 1)
    df.where(n > 0)
      .select(col(idCol), col(tokensCol),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride).as("chunk_start"),
        slice(col(tokensCol), col("chunk_id") * stride + 1, lit(maxLen))
          .as("chunk_tokens"))
      .withColumn("n_chunk_tok", size(col("chunk_tokens")))
  }

  /** Reassemble: drop each non-first chunk's `overlap` leading tokens and
    * concatenate in chunk order — inverse of [[chunkTokens]] (the
    * round-trip invariant ChunkingSpec pins). Small-data/test utility:
    * the grouped flatten collects each document's chunks to one row. */
  def unchunk(chunks: DataFrame, idCol: String, overlap: Int): DataFrame =
    chunks
      .withColumn("__body", when(col("chunk_id") === 0, col("chunk_tokens"))
        .otherwise(slice(col("chunk_tokens"), lit(overlap + 1),
          size(col("chunk_tokens")))))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("chunk_id"), col("__body"))))
        .getField("__body")).as("tokens"))
}
