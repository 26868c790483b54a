package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ValidCategories allowlist dimension: load + status-retry + status-row
  * classification — Spark re-expression of the reference's
  * read_valid_categories_with_status_retry / get_invalid_status_rows
  * (/root/reference/utils/validate_core.py:534-627, loader
  * /root/reference/utils/cde.py:29-178).
  *
  * The dimension is metadata-sized; classification is three filters on a
  * cached frame, and the retry loop lives on the driver (the transient
  * "Loading..." states come from the upstream sheet recomputing).
  */
object ValidCategories {

  val MandatoryColumns: Seq[String] =
    Seq("Table", "Category", "ValidatorAppKey", "ValidatorAppDisplay")

  final case class StatusSplit(
      invalid: DataFrame, transient_ : DataFrame, hardInvalid: DataFrame) {
    def allOk: Boolean = invalid.isEmpty
    def hasHardInvalid: Boolean = !hardInvalid.isEmpty
  }

  /** Split rows by status column (validate_core.py:534-577): rows whose
    * trimmed status does not start with `expectedPrefix`; rows in
    * `transientStatuses`; rows failing both tests. */
  def classifyStatus(
      df: DataFrame, statusCol: String,
      expectedPrefix: String = "Ok: ",
      transientStatuses: Seq[String] = Seq("Loading...", "")): StatusSplit = {
    val status = trim(coalesce(col(statusCol).cast("string"), lit("")))
    val notOk = !status.startsWith(expectedPrefix)
    val isTransient = status.isin(transientStatuses: _*)
    StatusSplit(
      invalid = df.where(notOk),
      transient_ = df.where(isTransient),
      hardInvalid = df.where(notOk && !isTransient))
  }

  /** Retry while only transient statuses remain (validate_core.py:580-627):
    * returns the last loaded frame; hard-invalid rows end the retry early
    * (caller handles as error). */
  def loadWithStatusRetry(
      load: () => DataFrame,
      maxTries: Int = 3,
      sleepMillis: Long = 1000,
      statusCol: String = "Status",
      expectedPrefix: String = "Ok: ",
      transientStatuses: Seq[String] = Seq("Loading...", "")): DataFrame = {
    var last: DataFrame = null
    var attempt = 1
    while (attempt <= maxTries) {
      last = load()
      val split = classifyStatus(last, statusCol, expectedPrefix, transientStatuses)
      if (split.allOk) return last
      if (split.hasHardInvalid) return last // caller handles as error
      if (attempt < maxTries) Thread.sleep(sleepMillis)
      attempt += 1
    }
    last
  }

  /** Load the allowlist from CSV, verifying mandatory columns
    * (cde.py:29-178). */
  def loadCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    val missing = MandatoryColumns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"ValidCategories missing mandatory columns: $missing")
    df
  }
}
