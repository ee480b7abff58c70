package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the clustering step
  * that turns verified near-dup pairs into dedup groups (transitive chains
  * A~B, B~C must dedup as one cluster).
  *
  * Min-label propagation, the Pregel pattern: every node repeatedly takes
  * the minimum label among itself and its neighbors until a fixpoint. Each
  * round is one equi-join + one aggregation, local-checkpointed (serialized)
  * so the loop's lineage stays flat and the per-round state — one (node,
  * label) row per node — stays compact. Labels only ever decrease, so an
  * unchanged label sum proves an unchanged labeling — PROVIDED the sum
  * cannot wrap: it is taken as DECIMAL(38,0), which 64-bit labels over any
  * realistic node count cannot overflow (BIGINT sums in non-ANSI mode wrap
  * silently and would void the witness).
  *
  * Rounds needed = graph diameter (label information travels one hop per
  * round). Near-dup graphs are overwhelmingly tiny dense clusters
  * (diameter ≤ a few), but a pathological chain must FAIL LOUDLY, not
  * return a silently-unconverged labeling — hence the cap raises
  * IllegalStateException instead of truncating.
  */
object ConnectedComponents {

  /** Edge-count bound below which the whole graph is labeled driver-side:
    * one collect + union-find instead of diameter-many distributed rounds.
    * Near-dup edge sets are verified-pair survivors — usually a tiny
    * fraction of the corpus — so in practice most runs take this path;
    * the distributed loop remains the path for genuinely large edge sets.
    * The two implementations are proven equal by
    * ConnectedComponentsPropertySpec (min-label == union-find).
    */
  val DriverEdgeLimit = 100000L

  /** @param pairs undirected edges, two integral id columns (one row per edge;
    *              either orientation)
    * @return (node, label) — `label` is the minimum node id reachable from
    *         `node`; isolated nodes (absent from `pairs`) are absent here
    */
  def minLabel(pairs: DataFrame, maxIters: Int = 64): DataFrame = {
    val longPairs = castLong(pairs)
    // cheap job over the (typically Materialized) pairs; a bounded edge
    // set never needs the iterative machinery. Both paths label over
    // long ids so the output schema cannot depend on which path ran.
    if (longPairs.limit((DriverEdgeLimit + 1).toInt).count() <= DriverEdgeLimit)
      driverUnionFind(longPairs)
    else minLabelDistributed(pairs, maxIters)
  }

  private def castLong(pairs: DataFrame): DataFrame = {
    // integral ids only: a silent cast("long") over double/decimal ids
    // would TRUNCATE distinct nodes onto each other and fabricate merges
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    pairs.schema.fields.take(2).foreach { f =>
      require(integral.contains(f.dataType),
        s"node id column '${f.name}' must be integral, got ${f.dataType}")
    }
    val Seq(ca, cb) = pairs.columns.toSeq.take(2).map(col)
    pairs.select(ca.cast("long").as("a"), cb.cast("long").as("b"))
  }

  /** The Pregel loop, dispatch-free — spec'd directly so the bounded-graph
    * fast path cannot shadow it from the tests that prove loop ==
    * union-find and the converge-or-raise contract.
    */
  private[graft] def minLabelDistributed(pairs: DataFrame,
                                         maxIters: Int = 64): DataFrame = {
    val longPairs = castLong(pairs)
    val edges = longPairs
      .unionAll(longPairs.select(col("b").as("a"), col("a").as("b")))

    // LAZY checkpoints: the per-round checksum is the action that
    // materializes the round's labels, so each round costs ONE Spark job
    // (an eager checkpoint followed by the checksum aggregate would pay
    // two). Lineage is still cut at materialization, keeping the loop's
    // plans flat.
    var labels = edges.select(col("a").as("doc")).distinct()
      .withColumn("label", col("doc"))
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    var prevSum = checksum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // one join + one aggregation per round: each node's new label is
      // the min over {its own label} ∪ {its neighbors' labels}, expressed
      // as a union feeding a single min-aggregate — the join-back of a
      // separate neighbor-min table would cost a second shuffle per round
      val contrib = edges
        .join(labels, edges("a") === labels("doc"))
        .select(col("b").as("doc"), col("label"))
        .unionAll(labels)
      labels = contrib
        .groupBy("doc").agg(min("label").as("label"))
        .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
      val sumNow = checksum(labels)
      converged = sumNow.compareTo(prevSum) == 0
      prevSum = sumNow
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIters rounds " +
          "(graph diameter exceeds the cap); raise maxIters")
    labels
  }

  /** Bounded-graph path: collect the edge list, label with an iterative
    * union-find whose union rule (larger root points at smaller) makes
    * every root the minimum id of its component — exactly the min-label
    * fixpoint the distributed loop converges to.
    */
  private def driverUnionFind(longPairs: DataFrame): DataFrame = {
    val spark = longPairs.sparkSession
    import spark.implicits._
    val edges = longPairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x // path compression, iteratively (deep chains, no stack)
      while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct
      .map(n => (n, find(n)))
      .toDF("doc", "label")
  }

  private def checksum(labels: DataFrame): java.math.BigDecimal = {
    // DECIMAL(38,0): a BIGINT sum wraps silently in non-ANSI mode, which
    // would let a wrapped sum masquerade as "unchanged". A decimal sum
    // does NOT raise in non-ANSI mode either — overflow yields NULL — so
    // the NULL cases must be told apart explicitly: sum is NULL over an
    // empty label set (no near-dup pairs is legal input; treat as 0 and
    // the loop converges immediately), while NULL with rows present means
    // overflow and must fail loudly rather than alias a fake fixpoint.
    // 38 digits cannot overflow for any realistic (label ≤ 2^63) ×
    // (rows ≤ 10^19) input, so the throw is a tripwire, not a code path.
    val row = labels
      .agg(sum(col("label").cast("decimal(38,0)")).as("s"), count(lit(1)).as("n"))
      .head()
    val (s, n) = (row.getDecimal(0), row.getLong(1))
    if (s == null && n > 0)
      throw new ArithmeticException(
        s"label checksum overflowed DECIMAL(38,0) over $n rows — " +
          "convergence witness void")
    if (s == null) java.math.BigDecimal.ZERO else s
  }
}
