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

  test("scd2: intervals chain without gaps, deletes close without " +
    "opening, exactly one current version per live key") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "upsert", "a"), (1L, 5L, "upsert", "b"),
      (1L, 9L, "upsert", "c"),
      (2L, 2L, "upsert", "x"), (2L, 4L, "delete", ""),
      (3L, 3L, "upsert", "y"))
      .toDF("doc_id", "seq", "op", "text")
    val got = ChangeOps.scd2(log, "doc_id")
      .select("doc_id", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, 1L, Some(5L), false), (1L, 5L, Some(9L), false),
      (1L, 9L, None, true),
      (2L, 2L, Some(4L), false), // closed by the delete, NOT current
      (3L, 3L, None, true)))
  }

  test("compaction bins: contiguous per group, within budget + one " +
    "file, order-deterministic") {
    import spark.implicits._
    import graft.operators.Compaction
    val rnd = new scala.util.Random(29)
    val manifest = Seq.tabulate(200)(i =>
      ("g" + (i % 3), i.toLong, 50L + rnd.nextInt(500)))
      .toDF("src", "file", "size")
    val plan = Compaction.planBins(manifest, "src", "file", "size", 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    plan.groupBy(_._1).foreach { case (g, fs) =>
      val byFile = fs.sortBy(_._2)
      // bins increase monotonically in file order and start at 0
      assert(byFile.head._4 == 0L)
      byFile.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 >= a._4, s"$g bins not monotone")
      }
      // every bin's total is under budget + its largest member
      byFile.groupBy(_._4).foreach { case (bin, ms) =>
        val total = ms.map(_._3).sum
        assert(total < 1000L + ms.map(_._3).max, s"$g bin $bin overfull")
      }
    }
  }

  test("rankMap: high-NDV column ranks exactly match a sequential " +
    "sort, with NO global single-partition window") {
    import spark.implicits._
    import graft.operators.Compaction
    // near-unique column (5000 distinct doubles, shuffled) — the case
    // the old global row_number window funneled through one task
    val rnd = new scala.util.Random(41)
    val vals = rnd.shuffle((0 until 5000).map(i => i * 1.5 + 0.25))
    val df = vals.map(v => (v, "x")).toDF("v", "pad")
    // (structural: singleTaskNdv = 0 forces the two-phase plan, whose
    // only window partitions by __pid — the range-partition id — so
    // WindowExec never sees an empty partitionSpec and no task holds
    // more than one range)
    val got = Compaction.rankMap(df, "v", buckets = 4096L, parts = 8,
      singleTaskNdv = 0L)
    val rows = got.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    sorted.zipWithIndex.foreach { case (v, i) =>
      assert(rows(v) == i.toLong * 4096L / 5000L, s"rank of $v")
    }
    // the small-NDV single-window fast path (the default threshold)
    // must be bit-identical to the two-phase plan on the same input
    val fast = Compaction.rankMap(df, "v", buckets = 4096L, parts = 8)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(fast == rows, "fast path diverges from two-phase rank")
    // low-NDV sanity: 3 distinct values -> ranks 0, bucket/3, 2*bucket/3
    val small = Seq(5.0, 1.0, 9.0, 5.0, 1.0).map((_, "p")).toDF("v", "pad")
    val sm = Compaction.rankMap(small, "v", 12L, parts = 8)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(sm == Map(1.0 -> 0L, 5.0 -> 4L, 9.0 -> 8L))
  }

  test("rankMap: a NULL in the ranked column is rejected loudly on " +
    "both plans — engines disagree on NULL ordering") {
    import spark.implicits._
    import graft.operators.Compaction
    val withNull = Seq(Some(3.0), None, Some(1.0), Some(2.0))
      .map((_, "p")).toDF("v", "pad")
    for (thr <- Seq(0L, 1L << 20)) {
      val e = intercept[IllegalArgumentException] {
        Compaction.rankMap(withNull, "v", 12L, parts = 4,
          singleTaskNdv = thr).collect()
      }
      assert(e.getMessage.contains("NULL"), s"thr=$thr: ${e.getMessage}")
    }
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
