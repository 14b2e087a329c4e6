package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Nested-types TableRef dialect (plans.NestedTableRefs): value checks
  * against hand-computed expectations on the reference's 8-row
  * ComplexTypesTbl fixture plus plan-shape assertions. The full
  * reference conformance surface runs in GoldenSpec
  * (reference-nested.test, 154 lifted cases).
  */
class NestedRefSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def mount(): Unit = Engine.sql(spark, sf,
    """create or replace temporary view complextypestbl as
      |select * from parquet.`/root/reference/testdata/ComplexTypesTbl/nullable.parq`
      |union all
      |select * from parquet.`/root/reference/testdata/ComplexTypesTbl/nonnullable.parq`""".stripMargin)

  private def rows(q: String): Seq[String] = {
    mount()
    Engine.sql(spark, sf, q).collect().map(GoldenRunner.render).toSeq.sorted
  }

  test("uncorrelated ref unnests with bigint pos") {
    val df = { mount(); Engine.sql(spark, sf,
      "select pos, item from complextypestbl.int_array") }
    assert(df.schema.map(_.dataType.sql) == Seq("BIGINT", "INT"))
    assert(df.count() == 10)
  }

  test("correlated ref joins parent scalars to items") {
    assert(rows("select id, item from complextypestbl t, t.int_array where id = 1")
      == Seq("1,1", "1,2", "1,3"))
  }

  test("left outer keeps parents with empty or null collections") {
    val ids = rows("select distinct id from complextypestbl t left outer join t.int_array")
    assert(ids == Seq("1", "2", "3", "4", "5", "6", "7", "8"))
  }

  test("anti join on a relative ref is an emptiness test") {
    assert(rows("select id from complextypestbl t left anti join t.int_array")
      == Seq("3", "4", "5", "6", "7"))
  }

  test("map refs expose key/value") {
    assert(rows("select id, key, value from complextypestbl t, t.int_map where id = 1")
      == Seq("1,'k1',1", "1,'k2',100"))
  }

  test("struct paths traverse to collections and flatten struct items") {
    assert(rows("select e, f from complextypestbl t, t.nested_struct.c.d.item where e is not null and id = 8")
      == Seq("-1,'nonnullable'"))
  }

  test("subplan aggregates decorrelate (count over empty = 0)") {
    assert(rows("select id, cnt from complextypestbl t, (select count(*) cnt from t.int_array) v")
      == Seq("1,3", "2,6", "3,0", "4,0", "5,0", "6,0", "7,0", "8,1"))
  }

  test("correlated unnest is shuffle-free (narrow Generate, 100 TB shape)") {
    mount()
    val df = Engine.sql(spark, sf,
      "select id, pos, item from complextypestbl t, t.int_array")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"unexpected shuffle in:\n$plan")
  }
}
