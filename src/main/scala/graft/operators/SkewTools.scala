package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins and aggregations.
  *
  * AQE's skew-join split handles most runtime skew automatically; these are
  * the explicit tools for the cases AQE can't see in advance — a hot key
  * known at plan time (e.g. a null-heavy foreign key, one giant district),
  * or a high-cardinality aggregation whose partial-combine ratio is poor.
  */
object SkewTools {

  /** Salted equi-join for a skewed LEFT side: left rows get a salt in
    * [0, buckets); the right side is exploded once per salt value. The
    * join key becomes (key, salt), spreading each hot key over `buckets`
    * reducers. Result equals a plain inner join.
    *
    * @param saltExpr salt for the left rows — MUST distribute the rows of
    *                 a single hot key across buckets, i.e. depend on
    *                 something other than `key`. Pass
    *                 `pmod(hash(col("other_col")), lit(buckets))` for a
    *                 deterministic (retry- and rerun-stable) salt; the
    *                 default is `rand`, which spreads perfectly but makes
    *                 reruns non-reproducible row-for-row.
    * @param extraCond additional join predicate over the two sides'
    *                  (distinctly named) columns, e.g. `col("da") < col("db")`
    *                  for a self-join's pair ordering.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int, saltExpr: Option[Column] = None,
                 extraCond: Option[Column] = None): DataFrame = {
    val salt = saltExpr.getOrElse((rand(seed = 42) * buckets).cast("int"))
    val salted = left.withColumn("__salt", salt.cast("int"))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    val joined = salted.join(exploded, Seq(key, "__salt"))
    // the filter folds into the join condition during optimization
    extraCond.fold(joined)(joined.filter).drop("__salt")
  }

  /** Key-distribution pre-flight for a planned join/aggregation: per-key
    * counts reduced to the top-`topN` heavy hitters (each with its share
    * of all rows in basis points) alongside corpus-wide stats — distinct
    * key count and `skew_ratio` = max/avg = `max_n * n_keys / total`, the
    * multiple by which the hottest reducer would exceed the mean if the
    * key were shuffled unmitigated. This is the measurement that decides
    * between a plain shuffle, [[saltedJoin]], and a broadcast.
    *
    * Two linear aggregations + a broadcast of the single-row stats;
    * integer math until the two final divisions, so the profile replays
    * exactly on any engine. Ties in the top-N break on the key value.
    */
  def profileKeys(df: DataFrame, key: String, topN: Int): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum("n").as("total"), max("n").as("max_n"))
    counts.orderBy(desc("n"), asc(key)).limit(topN)
      .crossJoin(broadcast(stats))
      .select(col(key), col("n"),
        round(col("n") * 10000.0 / col("total"), 2).as("share_bp"),
        col("n_keys"),
        round(col("max_n") * col("n_keys") * 1.0 / col("total"), 3)
          .as("skew_ratio"))
      .orderBy(desc("n"), asc(key))
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. `partial` and `merge` must
    * form a decomposable aggregate (sum/sum, count/sum, min/min, ...).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                buckets: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"sum_$valueCol"))

  /** Within-group all-pairs self-join with a per-task bound that is
    * independent of the largest group.
    *
    * The naive form — `df.as("a").join(df.as("b"), a.group === b.group &&
    * a.ord < b.ord)` — shuffles on the group key alone, so one skewed
    * group of size k lands k² candidate pairs on a single reducer; at
    * corpus scale a single giant cluster is a straggler-or-OOM. Here each
    * group is split into rank-ordered blocks of `blockSize` rows and the
    * join key becomes (group, blockA, blockB): side a replicates each row
    * to every partner block at-or-after its own, side b to every block
    * at-or-before its own, so every (blockA ≤ blockB) pair of blocks meets
    * on exactly one reducer holding ≤ blockSize rows per side — per-task
    * candidates ≤ blockSize², whatever the group-size distribution.
    *
    * The pair SET is identical to the naive join (blocks are rank-ordered
    * by `ord`, and the strict `a.ord < b.ord` predicate still applies), so
    * callers' results are unchanged — only the shuffle layout moves.
    * Shuffled row count is Σ_g k_g·⌈k_g/blockSize⌉ ≈ (pairs emitted)/
    * blockSize — the irreducible cost of an all-pairs semantic, paid in
    * bounded slices.
    *
    * Returns the joined frame with sides aliased `a` and `b` (select via
    * `col("a.x")` / `col("b.x")`); the `__blk`-family working columns
    * remain on both sides, so project explicitly rather than `*`.
    */
  def blockedSelfPairs(df: DataFrame, groupCol: String, orderCol: String,
                       blockSize: Int): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    // one window pass assigns the block id; materialized because both
    // join sides and the per-group block-count aggregate consume it, and
    // exchange reuse would not cover three distinct partitionings
    val ranked = Materialize(df.withColumn("__blk",
      ((row_number().over(w) - lit(1)) / lit(blockSize)).cast("int")))
    val nblk = ranked.groupBy(groupCol).agg(max("__blk").as("__maxblk"))
    val aSide = ranked.join(nblk, groupCol)
      .withColumn("__jb", explode(sequence(col("__blk"), col("__maxblk"))))
      .drop("__maxblk")
    val bSide = ranked
      .withColumn("__ia", explode(sequence(lit(0), col("__blk"))))
    aSide.as("a").join(bSide.as("b"),
      col(s"a.$groupCol") === col(s"b.$groupCol") &&
        col("a.__blk") === col("b.__ia") &&
        col("a.__jb") === col("b.__blk") &&
        col(s"a.$orderCol") < col(s"b.$orderCol"))
  }
}
