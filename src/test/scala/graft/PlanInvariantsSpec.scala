package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan invariants — the guard that no quadratic
  * plan can silently ship.
  *
  * At 100 TB the only acceptable join shapes are equi-shuffles and
  * broadcasts of provably bounded sides. A CartesianProduct (shuffle ×
  * shuffle) is quadratic in the corpus and banned outright. A
  * BroadcastNestedLoopJoin is linear ONLY when its broadcast side is small;
  * here every BNLJ's build side must be a filtered input (the q44 cap
  * slice, q45's query set, q46's centroid sample) — a BNLJ broadcasting an
  * unfiltered corpus-sized table fails this spec.
  */
class PlanInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def buildSide(j: BroadcastNestedLoopJoinExec): SparkPlan =
    j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }

  /** collectWithSubqueries that ALSO descends into cached-plan fragments:
    * queries persist intermediates (Materialize), and a quadratic join
    * hidden inside an InMemoryRelation must not escape the invariant.
    */
  private def collectAll[T](plan: SparkPlan)(
      pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = plan.collectWithSubqueries(pf)
    // cached fragments may be wrapped in AdaptiveSparkPlanExec, which has
    // no children — descend through its input plan explicitly
    val nested = plan.collectWithSubqueries {
      case s: InMemoryTableScanExec => s.relation.cachedPlan
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
    }
    here ++ nested.flatMap(p => collectAll(p)(pf))
  }

  private def isBounded(build: SparkPlan): Boolean =
    collectAll(build) { case f: FilterExec => f }.nonEmpty ||
      collectAll(build) {
        case s: FileSourceScanExec if s.dataFilters.nonEmpty => s
      }.nonEmpty ||
      // a grouping-free (global) aggregate emits exactly one row — the
      // scalar-broadcast pattern (e.g. q62's min-count join)
      collectAll(build) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.isEmpty => a
      }.nonEmpty ||
      // a driver-side literal relation is bounded by construction — the
      // broadcast-local-state pattern (q66's k centroids live on the
      // driver between Lloyd iterations, MLlib-style)
      collectAll(build) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty ||
      // a literal Range(0, k) has constant cardinality whatever the
      // corpus — the generated-parameter-grid pattern (q211's m×64 JL
      // sign matrix built from two crossed literal ranges)
      collectAll(build) {
        case r: org.apache.spark.sql.execution.RangeExec => r
      }.nonEmpty ||
      // a LIMIT-k subtree emits at most k rows whatever the corpus — the
      // fixed-cardinality index-sample pattern (hashSample's
      // TakeOrderedAndProject: nlist/codebook entries, never a fraction
      // of N)
      collectAll(build) {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty ||
      collectAll(build) {
        case g: org.apache.spark.sql.execution.GlobalLimitExec => g
      }.nonEmpty

  test("no catalog plan contains a cartesian or an unbounded nested-loop join") {
    SparkEntry.catalog.foreach { case (name, qd) =>
      val plan = qd.fn(spark, sf).queryExecution.sparkPlan
      val carts = collectAll(plan) { case c: CartesianProductExec => c }
      // clue strings render the FULL plan tree — build them only on
      // failure (ScalaTest's assert clue is by-value, and rendering 220
      // large plans dominates this suite's wall time otherwise)
      if (carts.nonEmpty)
        fail(s"$name plans a CartesianProduct — quadratic in the " +
          s"corpus:\n$plan")
      collectAll(plan) { case j: BroadcastNestedLoopJoinExec => j }
        .foreach { j =>
          if (!isBounded(buildSide(j)))
            fail(s"$name broadcasts an UNFILTERED side in a nested-loop " +
              s"join:\n$plan")
        }
      spark.sqlContext.clearCache()
    }
  }

  /** Stricter than [[isBounded]]: the subtree must carry a node whose
    * output cardinality is a CONSTANT of the plan, independent of the
    * corpus — a LIMIT-k, a driver-local relation, a literal range, a
    * scalar aggregate, or a scan with a source-PUSHED literal upper bound
    * (`vec_id < 5` pushes; the round-5 defect `vec_id % 50 = 0` does NOT
    * push and names a fixed FRACTION of the corpus, so a generic
    * FilterExec deliberately does not qualify here). Only LessThan /
    * LessThanOrEqual / EqualTo count: a pushed GreaterThan (`vec_id > 0`)
    * pushes fine but selects a corpus-sized TAIL, which is exactly the
    * fraction-broadcast this predicate exists to reject.
    */
  private def isFixedCardinality(side: SparkPlan): Boolean =
    collectAll(side) {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }.nonEmpty ||
      collectAll(side) {
        case g: org.apache.spark.sql.execution.GlobalLimitExec => g
      }.nonEmpty ||
      collectAll(side) {
        case l: org.apache.spark.sql.execution.LocalTableScanExec => l
      }.nonEmpty ||
      collectAll(side) {
        case r: org.apache.spark.sql.execution.RangeExec => r
      }.nonEmpty ||
      collectAll(side) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.isEmpty => a
      }.nonEmpty ||
      collectAll(side) {
        case s: FileSourceScanExec if s.metadata.get("PushedFilters")
          // anchored so a NEGATED operator can never qualify: a pushed
          // Not(EqualTo(...)) is a not-equals selecting nearly the whole
          // corpus — the same false proof the GreaterThan exclusion
          // closed. The regex requires the operator name NOT preceded by
          // an identifier character or the "Not(" wrapper.
          .exists(pf => Seq("LessThan", "LessThanOrEqual", "EqualTo")
            .exists(op =>
              s"""(?<!\\w)(?<!Not\\()$op\\(""".r
                .findFirstIn(pf).isDefined)) => s
      }.nonEmpty

  test("every ANN-family broadcast side is fixed-cardinality — a " +
      "corpus-fraction broadcast cannot come back") {
    // the round-5 scale defect was index state broadcast as a FRACTION of
    // the corpus (vec_id % 50 centroids, % 10 codebooks). This pins the
    // fix at the plan level for the whole embedding family: every
    // BroadcastExchange subtree (including those hidden inside cached
    // fragments) must prove O(parameters) cardinality.
    val annFamily = Seq("q44_embed_neardup_cosine", "q45_ann_topk_bruteforce",
      "q46_ann_ivf", "q47_embed_lsh_srp", "q64_lsh_recall", "q66_ivf_kmeans",
      "q122_semantic_dedup", "q158_ivf_recall", "q162_pq_ann_adc",
      "q169_pq_recall", "q170_ivfpq_residual_ann")
    // the queries that carry broadcast INDEX state (centroids/codebooks)
    // must actually plan broadcasts; the rest are checked only if their
    // plan happens to broadcast (q44's capped exact baseline, for one,
    // legitimately plans a slice-bounded join with no broadcast at all)
    val indexCarrying = Set("q46_ann_ivf", "q66_ivf_kmeans",
      "q122_semantic_dedup", "q158_ivf_recall", "q162_pq_ann_adc",
      "q169_pq_recall", "q170_ivfpq_residual_ann")
    // auto-broadcast off = the 100 TB regime: a side the PLANNER chose to
    // broadcast from size estimates (q47's banded self-join at test SF)
    // reverts to a shuffle join on its own as the corpus grows — the only
    // broadcasts that survive this conf are the ones the CODE promises
    // via broadcast() hints, and those are the promises to audit
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      annFamily.foreach { name =>
        // sparkPlan (pre-exchange-insertion) carries the broadcast intent
        // on the JOIN nodes; collect each broadcast join's build side
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan
        val bcastSides = collectAll(plan) {
          case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
            j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
          case j: BroadcastNestedLoopJoinExec => buildSide(j)
        }
        if (indexCarrying(name))
          assert(bcastSides.nonEmpty,
            s"$name: expected hinted broadcast index-state joins")
        bcastSides.foreach { b =>
          if (!isFixedCardinality(b))
            fail(s"$name broadcasts a side whose cardinality can scale " +
              s"with the corpus:\n$b")
        }
        spark.sqlContext.clearCache()
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("no catalog plan rescans a table beyond its pinned budget") {
    // Redundant-scan tripwire: a reused intermediate whose derivation is
    // not cached re-runs its whole chain per consumer — the round-6 audit
    // found a CDC roundtrip proof scanning its snapshot 17 times and an
    // IVF-PQ pipeline re-assigning the corpus 10 times. The walk counts
    // FileSourceScans per table, deduplicating cached fragments (an
    // InMemoryRelation's population scan counts once however many times
    // the cache is read). Default budget: 2 scans of any one table.
    // Whitelisted exceptions, each with a scale rationale:
    val budget = Map(
      // recall gates: every scan carries the PUSHED validation-slice
      // filter (vec_id < K) — fixed-size reads at any corpus size
      "q64_lsh_recall" -> 6, "q158_ivf_recall" -> 6, "q169_pq_recall" -> 6,
      // sample pass + corpus pass + bounded query slice
      "q46_ann_ivf" -> 3, "q162_pq_ann_adc" -> 3,
      "q170_ivfpq_residual_ann" -> 3,
      // staged-index probe (1 pushed query-slice scan inside topm) +
      // bounded query-vector slice + ONE exact-embedding fetch pass
      "q179_retrieval_mmr_rerank" -> 3,
      // sample pass + two disjoint pushed assignment slices (base/delta)
      "q196_ivf_incremental_assign" -> 3,
      // set-op / gapfill branches are semantically distinct scans
      "q96_set_ops_all" -> 4, "q99_date_spine_gapfill" -> 3,
      // blocked self-join sides + stats pass
      "q83_fuzzy_entity_match" -> 3,
      // banded estimate vs exact vs candidate branches
      "q159_minhash_estimate_audit" -> 3,
      // three pushed event-type passes
      "q80_funnel_conversion" -> 3,
      // fused predicate pass + unique + ref-integrity per table
      "q82_data_quality" -> 3,
      // two logical snapshots derived from ONE fixture table, each read
      // once for its manifest and once for the pruned row diff; in
      // production these are two separate tables (2 reads each, 1 with
      // manifests precomputed at export)
      "q194_manifest_pruned_diff" -> 4)
    SparkEntry.catalog.foreach { case (name, qd) =>
      val plan = qd.fn(spark, sf).queryExecution.sparkPlan
      val caches = scala.collection.mutable.ArrayBuffer[SparkPlan]()
      def walk(p: SparkPlan,
               acc: scala.collection.mutable.ArrayBuffer[String]): Unit = {
        p match {
          case s: InMemoryTableScanExec =>
            val cp = s.relation.cachedPlan
            if (!caches.exists(_ eq cp)) caches += cp
          case f: FileSourceScanExec =>
            acc ++= f.relation.location.rootPaths.headOption
              .map(_.getName)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => walk(a.inputPlan, acc)
          case _ =>
        }
        if (!p.isInstanceOf[InMemoryTableScanExec])
          p.children.foreach(walk(_, acc))
        p.subqueries.foreach(walk(_, acc))
      }
      val acc = scala.collection.mutable.ArrayBuffer[String]()
      walk(plan, acc)
      var i = 0
      while (i < caches.length) { walk(caches(i), acc); i += 1 }
      val allowed = budget.getOrElse(name, 2)
      acc.groupBy(identity).foreach { case (tbl, hits) =>
        assert(hits.size <= allowed,
          s"$name scans $tbl ${hits.size}x (budget $allowed) — cache the " +
            "reused intermediate or whitelist with a scale rationale")
      }
      spark.sqlContext.clearCache()
    }
  }

  test("q44's cap filter pushes down to the parquet scan") {
    val plan = SparkEntry.queries("q44_embed_neardup_cosine")(spark, sf)
      .queryExecution.sparkPlan
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.metadata.get("PushedFilters").exists(_.contains("LessThan(vec_id,300")),
        s"cap not pushed: ${s.metadata.get("PushedFilters")}")
    }
  }
}
