package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.TimestampType

/** The full custom-operator tier (SURVEY §7.0 preference (c)): as-of
  * join as its own `LogicalPlan` node, planner `SparkStrategy`, and
  * sort-merge `SparkPlan` — one streaming pass over co-partitioned,
  * co-sorted children.
  *
  * Where the composed rendering (operators.AsOfJoin: union + window +
  * filter) shuffles the UNION of both inputs and then runs a window
  * pass over it, this exec asks EnsureRequirements for
  * hash-clustering on the key and (key, ts) in-partition order per
  * child, then merges the two sorted streams with a single lookahead
  * pointer per partition: O(|L|+|R|) time, O(1) state (the current
  * right row and the last match) — no window buffering at all.
  * Same semantics, tested equal on the q36 oracle (q60).
  */
object AsOfJoinPhysical {

  /** Logical node: every left row joined to the LAST right row with
    * `rightTs <= leftTs` in its key group (or nulls). All expressions
    * are pre-resolved attributes of the children. */
  case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Physical sort-merge as-of join. */
  case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    /** Both children clustered on the key: EnsureRequirements inserts
      * compatible hash exchanges (or reuses existing ones). */
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    /** (key, ts) ascending within each partition — the merge order. */
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    private def tsOf(proj: UnsafeProjection, row: InternalRow): Long = {
      val r = proj(row)
      if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
    }

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val keyTypes = leftKeys.map(_.dataType)
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
        val lTsProj = UnsafeProjection.create(Seq(leftTs), lOut)
        val rTsProj = UnsafeProjection.create(Seq(rightTs), rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val nullRight = new GenericInternalRow(rOut.length)
        val joined = new JoinedRow
        // bind against the NULLABLE output schema, not the children's:
        // right attrs are non-nullable upstream, and a projection bound
        // non-nullable skips isNullAt — reading the all-null pad row as
        // zeros instead of nulls
        val outProj = UnsafeProjection.create(output, output)

        // single lookahead over the right stream + last match, both
        // copied out of the child's reused row buffers
        var curRight: InternalRow = null
        var curKey: UnsafeRow = null
        var curTs: Long = 0L
        var matchRow: InternalRow = null
        var matchKey: UnsafeRow = null

        def advance(): Unit =
          if (rIter.hasNext) {
            curRight = rIter.next().copy()
            curKey = rKeyProj(curRight).copy()
            curTs = tsOf(rTsProj, curRight)
          } else { curRight = null; curKey = null }
        advance()

        lIter.map { l =>
          val lts = tsOf(lTsProj, l)
          val lk = lKeyProj(l)
          var cmp = if (curKey == null) 1 else keyOrd.compare(curKey, lk)
          while (curRight != null && (cmp < 0 || (cmp == 0 && curTs <= lts))) {
            if (cmp == 0) { matchRow = curRight; matchKey = curKey }
            advance()
            cmp = if (curKey == null) 1 else keyOrd.compare(curKey, lk)
          }
          if (matchKey != null && keyOrd.compare(matchKey, lk) == 0)
            outProj(joined(l, matchRow))
          else
            outProj(joined(l, nullRight))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy mapping the logical node to the exec. */
  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
      case _ => Nil
    }
  }

  /** DataFrame surface. Right columns are exposed with `rightPrefix`
    * (re-aliased, which also mints fresh exprIds — both sides may
    * derive from the same base table without attribute conflicts).
    * Timestamps must be TIMESTAMP (micros) on both sides. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPrefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    GraftExtensions.install(spark)
    require(left.schema(leftTs).dataType == TimestampType &&
      right.schema(rightTs).dataType == TimestampType,
      "asOf needs TIMESTAMP ts columns on both sides")
    val rRenamed = right.select(
      right.columns.map(c => col(c).as(rightPrefix + c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rRenamed.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, rightPrefix + k)),
      attr(lPlan, leftTs), attr(rPlan, rightPrefix + rightTs))
    org.apache.spark.sql.graftshim.GraftDataset.ofRows(spark, node)
  }
}
