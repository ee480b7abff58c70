package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, EqualTo, Expression, GenericInternalRow, JoinedRow, PredicateHelper, RowOrdering, SortOrder, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Native AS-OF join — the whole-operator custom-plan showcase: a marker
  * expression, a logical node, an optimizer `Rule`, a `SparkStrategy`, and
  * a physical `SparkPlan`, wired together by [[GraftExtensions]] via
  * `SparkSessionExtensions`.
  *
  * Semantics: each left row joins the single right row with equal keys and
  * the greatest `rightTs <= leftTs` (optionally within a max-gap
  * tolerance). Inner form drops unmatched left rows; left-outer emits them
  * with a null right side — DuckDB's `ASOF [LEFT] JOIN` / pandas
  * `merge_asof` — an operator Spark's built-ins cannot express as a single
  * join (the equi-join + filter + max formulation materializes every
  * key-pair first: quadratic per hot key; the union-and-carry window
  * (see q58) is the best built-in composition and needs a union plus
  * running-window state).
  *
  * Physical shape: both sides hash-partitioned on the keys and sorted by
  * (keys, ts) — the same distribution/ordering contract SortMergeJoin
  * declares, so EnsureRequirements inserts exactly one exchange per side —
  * then a single forward merge pass per partition carrying one candidate
  * row. O(n log n) in the partition, O(1) state, no window buffering, no
  * fan-out. At 100 TB this is the minimum possible: one shuffle per side
  * and a streaming merge.
  */
case class AsofLE(left: Expression, right: Expression,
                  tolerance: Option[Expression] = None)
    extends Expression with Unevaluable {

  /** Marker only: [[RewriteAsofJoin]] must consume it during optimization.
    * Unevaluable ⇒ a session without [[GraftExtensions]] fails loudly at
    * planning instead of silently computing something else.
    */
  override def children: Seq[Expression] = Seq(left, right) ++ tolerance
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = AsofLE.FunctionName

  /** The ordering the physical merge applies comes from `left.dataType`;
    * a mismatched right type would compare garbage silently, so reject at
    * analysis (same contract as SMJ's key equality).
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != right.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"${AsofLE.FunctionName} requires both timestamps to have the " +
          s"same type, got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (!RowOrdering.isOrderable(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"${AsofLE.FunctionName} requires an orderable timestamp type, " +
          s"got ${left.dataType.sql}")
    else if (tolerance.exists(t => !t.foldable))
      TypeCheckResult.TypeCheckFailure(
        s"${AsofLE.FunctionName} tolerance must be a literal")
    else if (tolerance.isDefined &&
        !AsofJoinExec.tolerableType(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"${AsofLE.FunctionName} tolerance supports integral-backed " +
          s"timestamp types (timestamp/long/int/date), got ${left.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsofLE =
    copy(left = newChildren(0), right = newChildren(1),
      tolerance = if (newChildren.size > 2) Some(newChildren(2)) else None)
}

object AsofLE {
  val FunctionName = "asof_le"
}

/** Logical AS-OF join node (post-rewrite, pre-planning). */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTs: Expression, rightTs: Expression,
                    joinType: JoinType = Inner,
                    toleranceVal: Option[Long] = None)
    extends BinaryNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Rewrites `Join(..., cond AND asof_le(lTs, rTs[, tol]))` into
  * [[AsofJoin]] for Inner and LeftOuter join types.
  *
  * The marker rides the public `DataFrame.join(cond, joinType)` API through
  * analysis (it is a registered, resolvable function), so no parser
  * changes are needed; this rule runs in the operator-optimization batch
  * and replaces the whole join before the planner would reject the
  * unevaluable condition.
  */
case class RewriteAsofJoin(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _)
        if cond.find(_.isInstanceOf[AsofLE]).isDefined =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (asofs, equis) = conjuncts.partition(_.isInstanceOf[AsofLE])
      require(asofs.size == 1,
        s"exactly one ${AsofLE.FunctionName} conjunct expected, got ${asofs.size}")
      val AsofLE(lts, rts, tol) = asofs.head: @unchecked
      require(lts.references.subsetOf(l.outputSet) &&
        rts.references.subsetOf(r.outputSet),
        s"${AsofLE.FunctionName}(leftTs, rightTs) must order (left, right)")
      val tolVal = tol.map { t =>
        val v = t.eval() match {
          case n: Number => n.longValue()
          case other => throw new IllegalArgumentException(
            s"${AsofLE.FunctionName} tolerance must be numeric, got $other")
        }
        require(v >= 0, s"${AsofLE.FunctionName} tolerance must be >= 0, got $v")
        v
      }
      val (lk, rk) = equis.map {
        case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
            b.references.subsetOf(r.outputSet) => (a, b)
        case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
            a.references.subsetOf(r.outputSet) => (b, a)
        case other => throw new IllegalArgumentException(
          s"as-of join supports only equi conjuncts besides " +
            s"${AsofLE.FunctionName}; got: ${other.sql}")
      }.unzip
      require(lk.nonEmpty, "as-of join requires at least one equi key")
      AsofJoin(l, r, lk, rk, lts, rts, jt, tolVal)
  }
}

/** Plans [[AsofJoin]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, jt, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, jt, tol) :: Nil
    case _ => Nil
  }
}

object AsofJoinExec {
  /** Types whose internal representation is integral, so a max-gap
    * tolerance is well-defined as `leftTs - rightTs <= tolerance` in the
    * type's own internal unit (µs for timestamps, days for dates).
    */
  def tolerableType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType |
        DateType | ShortType => true
    case _ => false
  }
}

/** Merge-based as-of join executor.
  *
  * Children are clustered on the join keys and sorted by (keys, ts) —
  * declared, not implemented here, so EnsureRequirements plans the minimal
  * exchanges (and reuses existing ones). Each co-partition pair is merged
  * in one forward pass: advance the right cursor while it is still
  * at-or-before the left row, remembering the latest key-matching row as
  * the (single, O(1)) candidate. Null keys and null timestamps never
  * match, mirroring equi-join null semantics; under LeftOuter those left
  * rows still emit (with a null right side), mirroring outer-join
  * semantics. A tolerance bounds the match: the candidate must satisfy
  * `leftTs - rightTs <= tolerance` (internal units) or the row counts as
  * unmatched — the candidate is still the GREATEST right ts at-or-before,
  * so a stale candidate can never shadow a fresher in-tolerance one.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        joinType: JoinType = Inner,
                        toleranceVal: Option[Long] = None)
    extends BinaryExecNode {

  require(joinType == Inner || joinType == LeftOuter,
    s"as-of join supports Inner and LeftOuter, got $joinType")
  require(toleranceVal.isEmpty || AsofJoinExec.tolerableType(leftTs.dataType),
    s"as-of tolerance unsupported for ${leftTs.dataType.sql}")

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val leftOuter = joinType == LeftOuter
    val tol = toleranceVal
    val tsType = lTsB.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        lKeysB.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lTsB.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val resultProj = UnsafeProjection.create(output, output)

      // internal integral value of a (non-null) ts row, for tolerance math
      def tsLong(row: InternalRow): Long = tsType match {
        case TimestampType | TimestampNTZType | LongType => row.getLong(0)
        case IntegerType | DateType => row.getInt(0).toLong
        case ShortType => row.getShort(0).toLong
        case other => throw new IllegalStateException(
          s"tolerance over ${other.sql}")
      }

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        // latest right row (copied — iterators reuse buffers) whose key
        // matched some left key and whose ts was at-or-before it
        private var candRow: InternalRow = _
        private var candKey: InternalRow = _
        private var nextOut: InternalRow = _
        // computed-but-unconsumed flag: the output row lives in
        // resultProj's reused buffer, so the next row must NOT be computed
        // until the current one has been handed out
        private var ready = false

        advanceRight()

        // skip right rows that can never match: null key or null ts
        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val row = rIter.next()
            if (!rKeyProj(row).anyNull && !rTsProj(row).isNullAt(0))
              rRow = row
          }
        }

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            var matched: InternalRow = null
            if (!lk.anyNull) {
              // drop right rows whose key is behind this (ascending) left key
              while (rRow != null && keyOrd.compare(rKeyProj(rRow), lk) < 0)
                advanceRight()
              val lt = lTsProj(l)
              if (!lt.isNullAt(0)) {
                // consume all key-equal rights at-or-before lt; the last
                // one is the as-of candidate (rights are ts-ascending)
                while (rRow != null && keyOrd.compare(rKeyProj(rRow), lk) == 0 &&
                    tsOrd.compare(rTsProj(rRow), lt) <= 0) {
                  candRow = rRow.copy()
                  candKey = lk.copy()
                  advanceRight()
                }
                if (candRow != null && keyOrd.compare(candKey, lk) == 0 &&
                    tol.forall(t => tsLong(lt) - tsLong(rTsProj(candRow)) <= t))
                  matched = candRow
              }
            }
            if (matched != null) nextOut = resultProj(joined(l, matched))
            else if (leftOuter) nextOut = resultProj(joined(l, nullRight))
          }
        }

        override def hasNext: Boolean = {
          if (!ready) { computeNext(); ready = true }
          nextOut != null
        }

        override def next(): InternalRow = {
          if (!ready) computeNext()
          ready = false
          nextOut
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
