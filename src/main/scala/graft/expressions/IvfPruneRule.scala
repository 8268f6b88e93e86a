package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Ascending, Expression, In, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}

import graft.operators.Ann

/** Optimizer rule (SURVEY §4.3.3): turn an exact brute-force kNN over an
  * IVF-partitioned layout into a partition-pruned search, automatically.
  *
  * Matched shape — exactly what `Knn.topK` plans:
  *
  *   Limit k
  *     Sort [dist ASC, ...]
  *       Project [..., dist := VectorDistance(vecCol, Literal(query))]
  *         <child whose scan has a `cell` partition column and a
  *          `_ivf_centroids.txt` written by Ann.writeIvf>
  *
  * Rewrite: insert `Filter (cell IN nprobe-nearest-cells(query))` below the
  * Project. The IN lands on the partition column, so the scan's
  * PartitionFilters skip every non-probed cell directory — the query never
  * touches ~(1 − nprobe/nlist) of a 100 TB corpus.
  *
  * The rewrite changes results (that is the point of ANN), so it is opt-in:
  *   spark.graft.ivf.autoPrune = true   (default false)
  *   spark.graft.ivf.nprobe    = N      (default 4)
  * The rule is idempotent (a child already filtered on `cell` is left
  * alone), which keeps it safe under a fixed-point optimizer batch.
  */
class IvfPruneRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.getOption("spark.graft.ivf.autoPrune").contains("true")
  private def nprobe: Int =
    session.conf.getOption("spark.graft.ivf.nprobe").map(_.toInt).getOrElse(4)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // NOTE: Catalyst's `Limit` extractor strips the LocalLimit (it returns
    // the grandchild), so rebuilding through it would DELETE the LocalLimit
    // node and break the TakeOrderedAndProject pattern downstream — match
    // GlobalLimit/LocalLimit explicitly and rebuild with copy().
    plan.transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, s @ Sort(order, _, p: Project, _))) =>
        rewrite(s, order, p)
          .map(ns => gl.copy(child = ll.copy(child = ns))).getOrElse(gl)
      case gl @ GlobalLimit(_, s @ Sort(order, _, p: Project, _)) =>
        rewrite(s, order, p).map(ns => gl.copy(child = ns)).getOrElse(gl)
    }
  }

  private def rewrite(s: Sort, order: Seq[SortOrder], p: Project): Option[Sort] = {
    for {
      distAttr <- order.headOption.collect {
        case SortOrder(a: AttributeReference, Ascending, _, _) => a }
      vd <- p.projectList.collectFirst {
        case al @ Alias(v: VectorDistance, _) if al.exprId == distAttr.exprId => v }
      query <- literalQueryVec(vd)
      cellAttr <- p.child.output.collectFirst {
        case a: AttributeReference if a.name == "cell" && a.dataType == IntegerType => a }
      if !alreadyPruned(p.child)
      path <- scanRootPath(p.child)
      centroids <- Ann.readCentroids(path, session.sparkContext.hadoopConfiguration)
    } yield {
      val cells = Ann.nearestCellsOf(centroids, query, nprobe)
      val filter = Filter(
        In(cellAttr, cells.map(c => Literal(c, IntegerType))), p.child)
      s.withNewChildren(Seq(p.withNewChildren(Seq(filter)))).asInstanceOf[Sort]
    }
  }

  /** The query side must be a literal float array (broadcast query vector). */
  private def literalQueryVec(vd: VectorDistance): Option[Seq[Float]] =
    (vd.left, vd.right) match {
      case (_, Literal(ad: ArrayData, ArrayType(FloatType, _))) =>
        Some(ad.toFloatArray().toSeq)
      case (Literal(ad: ArrayData, ArrayType(FloatType, _)), _) =>
        Some(ad.toFloatArray().toSeq)
      case _ => None
    }

  /** Idempotency guard. MUST survive the optimizer rewriting our inserted
    * `In` (OptimizeIn turns 1 value into EqualTo and >10 into InSet in the
    * SAME fixed-point batch) — so treat ANY filter referencing `cell` as
    * "already pruned", or the batch never converges and stacks duplicate
    * filters until the iteration limit. */
  private def alreadyPruned(plan: LogicalPlan): Boolean = plan.exists {
    case Filter(cond, _) => cond.references.exists(_.name == "cell")
    case _ => false
  }

  private def scanRootPath(plan: LogicalPlan): Option[String] = plan.collectFirst {
    case lr: LogicalRelation => lr.relation match {
      // keep the FULL path (scheme included) — stripping to toUri.getPath
      // would point the sidecar read at a nonexistent local path on hdfs/s3
      case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
  }.flatten
}
