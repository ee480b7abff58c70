package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager, spill-safe materialization for plan fragments consumed more than
  * once (self-join sides, Pregel-loop inputs).
  *
  * Why not `localCheckpoint(true)`: its default storage level is
  * MEMORY_AND_DISK *deserialized* — an exploded shingle table cached as Java
  * objects is exactly what falls over under heap pressure on a busy
  * executor. MEMORY_AND_DISK_SER keeps the blocks compact and lets them
  * spill to disk gracefully, trading a little CPU on re-read for bounded
  * memory — the right default when the cached fragment is wide or exploded.
  *
  * Why persist at all instead of relying on `ReusedExchange`: exchange
  * reuse only deduplicates *identical* exchanges. A signature table feeding
  * both self-join sides AND a differently-partitioned aggregation (the
  * shape of every dedup query here) recomputes the signature projection per
  * distinct partitioning; one serialized persist computes it once.
  */
object Materialize {

  /** Persist serialized and force computation now; returns the cached
    * frame. The eager count also makes downstream timing honest — the
    * expensive projection is attributed to the query that declares it.
    */
  def apply(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    p.count()
    p
  }
}
