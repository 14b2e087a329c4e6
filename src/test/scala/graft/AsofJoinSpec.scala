package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Pins for the union+window AS-OF JOIN: semantics against a
  * brute-force reference (ties, no-prior nulls, right-tiebreak) and
  * the one-shuffle plan shape that makes it scale.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] = {
    import spark.implicits._
    val l = left.toDF("event_id", "user_id", "tsn")
    val r = right.toDF("view_id", "user_id", "tsn")
    AsofJoin.asofJoin(l, r, Seq("user_id"), "tsn",
        Map("view_id" -> "view_id"), tieCol = "view_id")
      .select(col("event_id"), col("view_id")).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
  }

  test("matches brute-force most-recent-at-or-before per key") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(7).toLong, rnd.nextInt(100).toLong))
    val right = Seq.tabulate(200)(i =>
      (1000L + i, rnd.nextInt(7).toLong, rnd.nextInt(100).toLong))
    val got = run(left, right)
    left.foreach { case (id, u, t) =>
      val expect = right.filter(r => r._2 == u && r._3 <= t)
        .sortBy(r => (r._3, r._1)).lastOption.map(_._1)
      assert(got(id) == expect, s"left $id (user $u, ts $t)")
    }
  }

  test("equal timestamps: right row at the same ts IS eligible, and the " +
    "largest tie id wins") {
    val got = run(
      left = Seq((1L, 5L, 50L)),
      right = Seq((1001L, 5L, 50L), (1002L, 5L, 50L), (1003L, 5L, 49L)))
    assert(got(1L) == Some(1002L))
  }

  test("no prior right row -> null payload (left outer)") {
    val got = run(
      left = Seq((1L, 5L, 10L), (2L, 6L, 10L)),
      right = Seq((1001L, 5L, 11L)))
    assert(got(1L).isEmpty && got(2L).isEmpty)
  }

  test("plan shape: exactly one shuffle, no join operator at all") {
    import spark.implicits._
    val l = Seq.tabulate(100)(i => (i.toLong, (i % 5).toLong, i.toLong))
      .toDF("event_id", "user_id", "tsn")
    val r = Seq.tabulate(100)(i => (500L + i, (i % 5).toLong, i.toLong))
      .toDF("view_id", "user_id", "tsn")
    val df = AsofJoin.asofJoin(l, r, Seq("user_id"), "tsn",
      Map("view_id" -> "view_id"), tieCol = "view_id")
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      p +: kids.flatMap(walk)
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles")
    assert(!nodes.exists(_.nodeName.toLowerCase.contains("join")),
      "as-of must not plan a join operator")
  }

  test("driver entry: every matched lag is non-negative and views lead") {
    val out = SparkEntry.queries("join_asof")(spark, TestSpark.sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getLong(3) >= 0L, s"negative lag for click ${r.getLong(0)}")
    }
    // some clicks have no prior view at sf0.001 (first-ever event of a
    // user) and some do — the null path is exercised in both directions
    assert(rows.exists(_.isNullAt(2)) || rows.length < 200)
    assert(rows.exists(!_.isNullAt(2)))
  }
}
