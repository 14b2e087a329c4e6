package graft.plans

import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Dedup narrow SEMI/ANTI join build sides.
  *
  * A semi/anti probe only tests membership, so the build side is a SET —
  * but Spark materializes it row-for-row. When the build has huge row
  * count at tiny byte width (the reference's IMPALA-2256 regression:
  * `int_col IN (SELECT 1 FROM a CROSS JOIN b)` — a 121M-row build of a
  * single constant), AQE sees a byte-small shuffle and converts to a
  * broadcast join, then dies building a 121M-entry hash relation on the
  * driver. Reducing the build to its distinct rows first bounds it by
  * the key cardinality instead of the row count.
  *
  * Guarded two ways:
  *  - builds whose whole output is <= 16 bytes wide: the shape where row
  *    count and byte size diverge enough to fool AQE, and where the extra
  *    aggregate is provably cheap (the deduped set is at most the narrow
  *    key space);
  *  - AND an estimated build cardinality of >= ~1M rows (stats rowCount
  *    when available, else sizeInBytes / row width): a small build never
  *    has the broadcast hazard, so taxing every narrow semi/anti join
  *    with an aggregate would be pure regression (r5 measured up to 2.1x
  *    on small builds before this gate).
  *
  * Runs in the user optimizer batch, after RewriteSubquery has produced
  * the join form.
  */
object SemiJoinBuildDedup extends Rule[LogicalPlan] {
  private val HazardRows = BigInt(1L << 20)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, right, LeftSemi | LeftAnti, _, _)
        if right.output.nonEmpty && {
          val width = right.output.map(_.dataType.defaultSize).sum
          width <= 16 && {
            val st = right.stats
            val estRows = st.rowCount
              .getOrElse(st.sizeInBytes / BigInt(math.max(width, 1)))
            estRows >= HazardRows
          }
        } && !alreadyDeduped(right) =>
      j.copy(right = Aggregate(right.output, right.output, right))
  }

  private def alreadyDeduped(p: LogicalPlan): Boolean = p match {
    case Aggregate(g, a, _, _) => g.map(_.canonicalized) == a.map(_.canonicalized)
    case _ => false
  }
}
