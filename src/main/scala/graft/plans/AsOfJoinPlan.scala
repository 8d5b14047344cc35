package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, JoinedRow, NamedExpression,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{
  BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the engine's one WHOLE-OPERATOR extension
  * (SURVEY §7.3 tier (c): custom LogicalPlan + SparkStrategy +
  * SparkPlan), for the operator Spark genuinely lacks. Semantics match
  * [[graft.operators.AsOfJoin]] (strictly-earlier latest right row per
  * key; left outer): for each left row, the right row with the largest
  * rightTs < leftTs within the same key, or nulls.
  *
  * Physical shape: requiredChildDistribution clusters both sides on
  * the key and requiredChildOrdering sorts each side by (key, ts), so
  * Catalyst inserts exactly one exchange + sort per side and the
  * operator itself is a linear per-partition merge — no row
  * amplification, no window state, single forward pass over both
  * sorted streams. At 100 TB this is the sort-merge-join cost model
  * with an O(1)-memory merge (one buffered right row per key), versus
  * the union+window formulation's two-sided sort of the combined
  * stream. AsOfSpec pins exec-vs-composed equality row for row; the
  * q203 oracle is DuckDB's native ASOF JOIN — three independent
  * implementations must agree.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lts = leftTs
    val rts = rightTs
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lk.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lts.dataType))
      val nullRight: InternalRow = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // parents (exchanges, hash aggregates) may require UnsafeRow —
      // never leak the mutable JoinedRow out of the operator
      val outProj = UnsafeProjection.create(
        (lOut ++ rOut.map(_.withNullability(true))).map(_.dataType).toArray)
      val rBuf = ri.buffered
      // one buffered candidate: the latest right row seen for lastKey
      var lastKey: InternalRow = null
      var lastMatch: InternalRow = null
      li.map { l =>
        val lKey = lKeyProj(l)
        val lNull = lKey.isNullAt(0)
        val lTsRow = lTsProj(l).copy()
        // advance the right stream past everything strictly earlier
        // than (and matching-or-below) this left row; null keys sort
        // first and NEVER match (SQL equality: NULL = NULL is not true,
        // mirroring DuckDB ASOF JOIN ON equality) so null-keyed right
        // rows are consumed without ever becoming candidates
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rHead = rBuf.head
          val rKeyRow = rKeyProj(rHead)
          if (rKeyRow.isNullAt(0)) { rBuf.next() }
          else if (lNull) advancing = false
          else {
            val c = keyOrd.compare(rKeyRow, lKey)
            if (c < 0 ||
                (c == 0 && tsOrd.compare(rTsProj(rHead), lTsRow) < 0)) {
              val r = rBuf.next()
              if (c == 0) {
                // candidate for this key; later rows overwrite (sorted ts)
                lastKey = lKeyProj(l).copy()
                lastMatch = r.copy()
              }
            } else advancing = false
          }
        }
        val matched = !lNull && lastMatch != null && lastKey != null &&
          keyOrd.compare(lastKey, lKey) == 0
        outProj(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }
}

/** Public API for the native as-of join. Installs the planner strategy
  * session-locally (public ExperimentalMethods hook — also registered
  * by [[GraftExtensions]] for configured sessions), re-aliases the
  * right side so a self-join on the same source resolves cleanly, and
  * lifts the custom logical node into a DataFrame.
  */
object NativeAsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      rightKey: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val spark = left.sparkSession
    GraftColumnBridge.installStrategy(spark, AsOfJoinStrategy)
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan0 = GraftColumnBridge.analyzed(right)
    // fresh expr ids on the right so left/right from the same scan
    // don't collide in analysis (the custom node gets no
    // DeduplicateRelations help)
    val rAliases = rPlan0.output.map(a =>
      Alias(a, a.name)(exprId = NamedExpression.newExprId))
    val rPlan = Project(rAliases, rPlan0)
    def attrOf(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val rOut = rAliases.map(_.toAttribute)
    GraftColumnBridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan,
        attrOf(lPlan.output, key), attrOf(rOut, rightKey),
        attrOf(lPlan.output, leftTs), attrOf(rOut, rightTs)))
  }
}
