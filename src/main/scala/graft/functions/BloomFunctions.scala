package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ExpressionInfo}
import org.apache.spark.sql.functions._

/** Column access to Spark's OWN bloom-filter kernel (the one behind
  * AQE runtime row-group filtering): `BloomFilterAggregate` builds a
  * `org.apache.spark.util.sketch.BloomFilter` over a long column and
  * serializes it to bytes; `BloomFilterMightContain` probes those bytes
  * per row with zero false NEGATIVES (a "no" is definite, a "yes" has
  * probability ≈ fpp of being wrong). Spark ships both expressions but
  * registers neither for SQL/Column use — this exposes them through the
  * same self-registering `call_function` pattern as the other graft
  * expressions, rather than reimplementing a sketch the engine already
  * codegens.
  *
  * The intended shape (see [[graft.operators.Dedup.dropSeenDuplicates]]):
  * aggregate the filter on the driver once (bytes ≈ 1.2 GB per 10^9 keys
  * at 1% fpp — sized by [[optimalNumBits]]), then inline it as a literal
  * so every task probes locally — the manual analogue of Spark's own
  * InjectRuntimeFilter, available across jobs instead of within one.
  */
object BloomFunctions {

  /** `BloomFilter.optimalNumOfBits`: n·ln(1/p)/ln(2)². */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)

  /** Idempotent; Column builders self-register on the active session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(FunctionIdentifier("graft_bloom_agg"))) return
    reg.registerFunction(FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      args => new BloomFilterAggregate(args(0), args(1), args(2)))
    reg.registerFunction(FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      args => BloomFilterMightContain(args(0), args(1)))
  }

  private def ensureRegistered(): Unit =
    try register(SparkSession.active) catch { case _: IllegalStateException => () }

  /** Aggregate a serialized bloom filter over a LongType column. */
  def bloomAgg(longCol: Column, expectedItems: Long, fpp: Double): Column = {
    ensureRegistered()
    call_function("graft_bloom_agg", longCol, lit(expectedItems),
      lit(optimalNumBits(expectedItems, fpp)))
  }

  /** Driver-side build: ONE aggregate job over `df`, returns the filter
    * bytes (or None when `df` is empty — probe nothing, match nothing).
    *
    * `BloomFilterAggregate` SILENTLY caps its inputs at
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
    * (defaults 4M items / 8 MB — sized for AQE's within-query runtime
    * filters, not a corpus registry). Above the cap the filter's real
    * fpp explodes and the prefilter silently degrades to "everything
    * hits". Raise both confs to the requested size first, so the
    * documented ~1.2 GB-per-10^9-keys sizing actually materializes. */
  def buildBloom(df: DataFrame, longCol: Column, expectedItems: Long,
                 fpp: Double): Option[Array[Byte]] = {
    val conf = df.sparkSession.conf
    val bits = optimalNumBits(expectedItems, fpp)
    def raise(key: String, atLeast: Long): Unit =
      if (conf.getOption(key).forall(_.toLong < atLeast))
        conf.set(key, atLeast.toString)
    raise("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", expectedItems)
    raise("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", bits)
    Option(df.agg(bloomAgg(longCol, expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf"))
  }

  /** Per-row probe of inlined filter bytes; false negatives impossible. */
  def mightContain(bloomBytes: Array[Byte], longCol: Column): Column = {
    ensureRegistered()
    call_function("graft_might_contain", lit(bloomBytes), longCol)
  }
}
