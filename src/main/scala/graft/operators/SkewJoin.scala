package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salting for skewed equi-joins — the manual companion to AQE's
  * skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`), for the
  * cases AQE cannot fix: a build side too large to broadcast joined on a
  * key where a handful of values dominate (a hot `source`, a null-ish
  * default key, a celebrity id).
  *
  * Mechanics: the skewed (fact) side gets a deterministic per-row salt in
  * [0, saltFactor); the dimension side is replicated saltFactor× with an
  * exploded salt column; the join key becomes (key, salt), spreading each
  * hot key over saltFactor reducers. Cost: dim side grows saltFactor×
  * (bounded — pick saltFactor ≈ hot-key multiplicity / target partition
  * rows), fact side unchanged.
  */
object SkewJoin {

  /** Deterministic row salt: hash of the whole row modulo saltFactor
    * (no rand() — reruns and resumed stages see identical salts). */
  def rowSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int")

  /** Inner/left equi-join of a skewed fact against a non-broadcastable
    * dim on `key`, salted saltFactor ways. */
  def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, saltFactor))
    val replicatedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<int>")))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Pre-flight forecast of an inner equi-join: EXACT output rows per
    * key (nₐ·n_b — not an estimate: for an equi-join the per-key
    * product IS the output size), heaviest keys first. This is the
    * 10-second query you run BEFORE the 10-hour join: one hot key with
    * 10⁶ × 10⁶ rows means 10¹² output rows in one task, and the choice
    * between plain join / [[saltedEquiJoin]] / per-key caps should be
    * made from this table, not from the postmortem. Cost: two
    * map-side-combined count aggregates + an O(distinct-keys) join —
    * payloads never move. NULL keys are excluded (inner equi-joins
    * drop them anyway). */
  def joinSizeEstimate(a: DataFrame, aKey: String,
                       b: DataFrame, bKey: String,
                       topK: Int = 20): DataFrame = {
    require(topK > 0)
    val ca = a.where(col(aKey).isNotNull)
      .groupBy(col(aKey).as("key")).agg(count(lit(1)).as("n_a"))
    val cb = b.where(col(bKey).isNotNull)
      .groupBy(col(bKey).as("key")).agg(count(lit(1)).as("n_b"))
    ca.join(cb, Seq("key"))
      .select(col("key"), col("n_a"), col("n_b"),
        (col("n_a") * col("n_b")).as("rows_out"))
      .orderBy(desc("rows_out"), col("key"))
      .limit(topK)
  }
}
