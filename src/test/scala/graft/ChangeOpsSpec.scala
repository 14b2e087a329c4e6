package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeOps

/** Pins for changelog application: last-writer-wins against a scalar
  * reference (including multiple ops per key in one batch), delete
  * semantics, insert-of-new-key, and idempotence of replay.
  */
class ChangeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def merge(snap: Seq[(Long, String)],
      log: Seq[(Long, Long, String, String)]): Map[Long, String] = {
    import spark.implicits._
    val s = snap.toDF("doc_id", "text")
    val l = log.toDF("doc_id", "seq", "op", "text")
    ChangeOps.applyChangelog(s, l, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("last-writer-wins with mixed ops per key, scalar reference") {
    val snap = (0L to 9L).map(i => i -> s"v$i")
    val rnd = new scala.util.Random(13)
    val log = Seq.tabulate(60) { i =>
      val key = rnd.nextInt(14).toLong // some keys beyond the snapshot
      val op = if (rnd.nextBoolean()) "upsert" else "delete"
      (key, i.toLong, op, s"u$i")
    }
    val got = merge(snap, log)
    // scalar reference
    val last = log.groupBy(_._1).map { case (k, ops) =>
      k -> ops.maxBy(_._2)
    }
    val expect = (snap.toMap -- last.keys) ++
      last.collect { case (k, (_, _, "upsert", t)) => k -> t }
    assert(got == expect)
  }

  test("replay is idempotent: applying the same log twice = once") {
    val snap = (0L to 20L).map(i => i -> s"v$i")
    val log = Seq((3L, 1L, "delete", ""), (5L, 2L, "upsert", "x"),
      (40L, 3L, "upsert", "new"))
    val once = merge(snap, log)
    import spark.implicits._
    val onceDf = once.toSeq.toDF("doc_id", "text")
    val twice = ChangeOps.applyChangelog(onceDf,
        log.toDF("doc_id", "seq", "op", "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == once)
  }

  test("driver entry: deleted keys gone, rewrites uppercased, inserts " +
    "present, %35 keys resolve to the higher-seq rewrite") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("snapshot_merge")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val snap = Engine.table(spark, d, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    snap.keys.foreach { id =>
      if (id % 5 == 0) assert(got(id) == snap(id).toUpperCase,
        s"rewrite $id (last-writer-wins over the delete when % 35 == 0)")
      else if (id % 7 == 0) assert(!got.contains(id), s"delete $id")
      else assert(got(id) == snap(id), s"untouched $id")
      if (id % 11 == 0) assert(got(id + 5000000L) == s"new:${snap(id)}")
    }
  }
}
