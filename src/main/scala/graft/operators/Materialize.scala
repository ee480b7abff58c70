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

  /** Like [[apply]] but returns the materializing count too — for
    * callers that need the row count anyway (stage funnels), so the
    * eager count is not paid twice.
    */
  def counted(df: DataFrame): (DataFrame, Long) = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK_SER)
    (p, p.count())
  }

  /** Eager serialized localCheckpoint: materializes like [[apply]] but
    * also TRUNCATES the logical lineage — the returned frame's plan is a
    * flat scan of the checkpointed blocks.
    *
    * When each is required: `apply` is right for a fragment consumed
    * more than once within ONE plan (self-join sides, a projection
    * feeding two aggregations) — caching dedups the physical work and
    * the logical plan stays small. But in an ITERATIVE loop where round
    * t's frame references round t−1's frame k>1 times, persist alone
    * leaves the analyzed logical plan growing O(k^T): Catalyst re-analyzes
    * the full lineage every round even though execution hits the cache,
    * and past ~4 rounds driver-side analysis dominates wall-clock
    * (observed: 70s for a 4-round × 3-ref loop at sf0.1, >15 min at
    * sf0.01 cold). Any frame referenced by its own successor in a loop
    * MUST go through `checkpointed` at the end of each round.
    */
  def checkpointed(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** LAZY serialized localCheckpoint: same lineage truncation as
    * [[checkpointed]] but with NO driver action of its own — the first
    * consumer's job materializes the blocks, later consumers reuse them.
    * The right round-boundary for iterative loops whose rounds are only
    * consumed downstream (broadcast builds, the next round's join): an
    * eager checkpoint would pay one driver action per round; no
    * checkpoint at all would re-execute the whole prefix chain once per
    * consumer (broadcast builds are separate executions, so an
    * unmaterialized T-round chain costs O(T²) work).
    */
  def lazyCheckpointed(df: DataFrame): DataFrame =
    df.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
}
