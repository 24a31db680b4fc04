/*
 * Catalyst extension: a logical MATMUL operator whose physical shape is
 * chosen by the OPTIMIZER from Catalyst's own size statistics — the planner
 * decision the reference hardwires (it always replicates the full B matrix
 * to every rank, program.c:97-98) and that matmul_auto (Python,
 * mapreduce/matmul.py) makes from driver-side counts.
 *
 * Dataflow:
 *   MatmulPlans.coo(session, A, B)  — A, B are COO DataFrames (i, j, v) —
 *   builds Dataset.ofRows(MatmulNode(A, B)).  The injected optimizer rule
 *   DispatchMatmul rewrites MatmulNode into Aggregate(sum(av*bv)) over
 *   Join(A.j = B.i) and, from left/right stats.sizeInBytes vs
 *   spark.sql.autoBroadcastJoinThreshold, pins a BROADCAST join hint on the
 *   smaller qualifying side (a shuffle-free broadcast-hash multiply) or
 *   leaves JoinHint.NONE (shuffled COO multiply; AQE may still upgrade at
 *   runtime).  The blocked-GEMM variant stays Python-side (its physical
 *   stage is an Arrow mapInPandas, not constructible from the JVM planner) —
 *   see matmul_auto.
 *
 * Output schema is fixed at (i INT, k INT, v BIGINT); the rewrite aliases
 * onto the node's original exprIds so downstream references stay valid.
 */
package emulatinghadoop.spark.matmul

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, AttributeSet, Cast, EqualTo, Multiply, NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, BinaryNode, Join, JoinHint, HintInfo, BROADCAST, LogicalPlan, Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Logical COO matrix multiply: left = A(i, j, v), right = B(i, j, v) with
  * B's first column as its row index; result C(i, k, v) = sum_j A(i,j)*B(j,k).
  */
case class MatmulNode(
    left: LogicalPlan,
    right: LogicalPlan,
    output: Seq[Attribute]
) extends BinaryNode {
  // `output` is a constructor arg of Expression type, so TreeNode counts it
  // among this node's expressions; declaring it produced-here keeps
  // CheckAnalysis's missing-input test happy.
  override def producedAttributes: AttributeSet = outputSet
  // Claim the three COO columns of each child as referenced, else
  // ColumnPruning sees an expression-free node and prunes the children to
  // zero columns before DispatchMatmul fires.
  override def references: AttributeSet =
    AttributeSet(left.output.take(3) ++ right.output.take(3))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan,
      newRight: LogicalPlan
  ): LogicalPlan = copy(left = newLeft, right = newRight)
}

/** Optimizer rule: MatmulNode -> Aggregate over (hinted) Join, hint chosen
  * from Catalyst statistics.  Runs inside the operator-optimization batch,
  * so the emitted Join/Aggregate get the full standard treatment
  * (column pruning, partial aggregation, AQE) afterwards.
  */
case class DispatchMatmul(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case m: MatmulNode =>
      val Seq(ai, aj, av) = m.left.output.take(3)
      val Seq(bi, bk, bv) = m.right.output.take(3)
      val threshold = conf.autoBroadcastJoinThreshold
      val aSize = m.left.stats.sizeInBytes
      val bSize = m.right.stats.sizeInBytes
      val hint =
        if (threshold >= 0 && bSize <= threshold && bSize <= aSize)
          JoinHint(None, Some(HintInfo(Some(BROADCAST))))
        else if (threshold >= 0 && aSize <= threshold)
          JoinHint(Some(HintInfo(Some(BROADCAST))), None)
        else JoinHint.NONE
      val join = Join(m.left, m.right, Inner, Some(EqualTo(aj, bi)), hint)
      val product = Multiply(Cast(av, LongType), Cast(bv, LongType))
      val aggs: Seq[NamedExpression] = Seq(
        Alias(Cast(ai, IntegerType), "i")(exprId = m.output(0).exprId),
        Alias(Cast(bk, IntegerType), "k")(exprId = m.output(1).exprId),
        Alias(Sum(product).toAggregateExpression(), "v")(exprId = m.output(2).exprId)
      )
      Aggregate(Seq(ai, bk), aggs, join)
  }
}

class MatmulExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(session => DispatchMatmul(session))
}

/** py4j entry points. */
object MatmulPlans {
  import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

  /** Build the logical matmul of two COO DataFrames (i, j, v). */
  def coo(
      session: CSparkSession,
      a: CDataset[Row],
      b: CDataset[Row]
  ): CDataset[Row] = {
    val aPlan = a.queryExecution.analyzed
    // Re-alias the right side so A.matmul(A) (Gram-style self-multiply)
    // does not produce duplicate exprIds across the two join sides.
    val bAnalyzed = b.queryExecution.analyzed
    val bPlan = Project(
      bAnalyzed.output.map(attr => Alias(attr, attr.name)()),
      bAnalyzed
    )
    val out = Seq(
      AttributeReference("i", IntegerType)(),
      AttributeReference("k", IntegerType)(),
      AttributeReference("v", LongType)()
    )
    org.apache.spark.sql.EmulatingHadoopDatasetBridge.ofRows(
      session,
      MatmulNode(aPlan, bPlan, out)
    )
  }
}
