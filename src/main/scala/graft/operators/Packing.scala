package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-budget training packs —
  * the step that turns a deduped, filtered corpus into the contiguous
  * token buckets a trainer consumes. Greedy first-fit in a defined
  * order: walk each group's documents sorted by id, accumulate cost,
  * open a new pack when the next document would overflow the budget
  * (a document larger than the whole budget gets a pack of its own —
  * greedy always places, never drops).
  *
  * Packing is inherently a sequential fold per group, which no
  * window/aggregate spelling expresses (the running sum RESETS on
  * overflow — not a prefix sum). The idiomatic Spark shape for exactly
  * this is the typed-Dataset `groupByKey.flatMapSortedGroups`: Spark
  * sort-groups (spillable, streaming iterator — a group never
  * materializes in memory) and the fold runs once per group, per task.
  *
  * Scale: the shuffle carries only (group, id, cost) triples — never
  * text or tokens; pack assignments join back by id downstream.
  * Parallelism is one task per group; when one group outgrows a task,
  * `shards > 1` salt-splits it by id hash (each shard packs
  * independently — any partition of documents into budget-respecting
  * packs is a valid packing; pack identity then lives in
  * (group, shard, pack_id)). Padding waste stays bounded either way:
  * each closed pack was too full to take the next document.
  *
  * Engine extension (reference validates rows; packing is what its
  * downstream trainer would need at 10^12 sequences).
  */
object Packing {

  /** @param groupCol pack within these groups (e.g. source); pack_id is
    *                 unique within (group, shard)
    * @param budget   max total cost per pack (oversized singles exempt)
    * @param shards   salt-split factor for giant groups (1 = exact
    *                 per-group sequential packing, SQL-oracle-able)
    * @return (groupCol, shard, idCol, costCol, pack_id, pack_pos) */
  def greedyPack(df: DataFrame, groupCol: String, idCol: String,
                 costCol: String, budget: Long, shards: Int = 1): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    require(shards > 0, "shards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // null cost → 0 (the row still packs — one corrupt row must not
    // abort the pass); null ids are unplaceable (no deterministic walk
    // position) and are dropped rather than crashing the tuple encoder
    val narrow = df.where(col(idCol).isNotNull)
      .select(
        col(groupCol).cast("string"),
        pmod(xxhash64(col(idCol)), lit(shards.toLong)).as("__shard"),
        col(idCol).cast("long"),
        coalesce(col(costCol).cast("long"), lit(0L)))
      .as[(String, Long, Long, Long)]
    narrow
      .groupByKey { case (g, shard, _, _) => (g, shard) }
      .flatMapSortedGroups(col(idCol).asc) { case ((g, shard), rows) =>
        var packId = 0L
        var acc = 0L
        var pos = 0
        rows.map { case (_, _, id, cost) =>
          if (acc > 0 && acc + cost > budget) { packId += 1; acc = 0L; pos = 0 }
          acc += cost
          val out = (g, shard, id, cost, packId, pos)
          pos += 1
          out
        }
      }
      .toDF(groupCol, "shard", idCol, costCol, "pack_id", "pack_pos")
  }
}
