package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incremental-load merge (SCD type 1): the reference's jobs are full
 * loads (TRUNCATE_DESTINATION + LOAD); the natural extension a user
 * needs next is "apply this update batch to the destination, keeping
 * the newest row per key". Without a transactional table format,
 * Spark-first upsert is a keyed window dedup over
 * (existing ∪ updates) followed by a destination overwrite.
 *
 * Scale posture: ONE shuffle on the merge keys (the window partition);
 * no driver-side diffing, no per-row lookups. Deterministic: ties on
 * the version column resolve to the UPDATE side, then to arbitrary-
 * but-stable input order only if versions AND sides tie (callers
 * wanting total determinism pass a unique version).
 */
object Upsert {

  /** Keep, per key, the row with the highest `versionCol`; on version
    * ties the updates side wins. Both frames must share a schema
    * (unionByName). */
  def keepLatest(existing: DataFrame, updates: DataFrame, keys: Seq[String],
                 versionCol: String): DataFrame = {
    require(keys.nonEmpty, "keepLatest needs at least one merge key")
    val tagged = existing.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(desc(versionCol), desc("_src"))
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Anti-join form: rows of `existing` whose key does NOT appear in
    * `updates`, unioned with all of `updates` — equivalent to
    * keepLatest when every update is newer; cheaper when the update
    * batch is small enough to broadcast (AQE decides). */
  def applyBatch(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyBatch needs at least one merge key")
    existing.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)
  }
}
