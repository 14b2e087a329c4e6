package graft

import graft.operators.MultimodalOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal pipeline stages: the decode step is an honest stub, the
  * plumbing (schemas, batch shapes, fan-out, determinism) is real.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("resize bounds payload size by the target pixel budget") {
    val rows = SparkEntry.queries("multimodal_resize")(spark, TestSpark.sf)
      .collect()
    assert(rows.length === 500)
    // 32x32 target / 64 = 16-byte budget
    assert(rows.forall(_.getInt(3) <= 16))
    assert(rows.forall(r => r.getInt(1) == 32 && r.getInt(2) == 32))
  }

  test("frame sampling fans out one row per sampled frame with timestamps") {
    val df = MultimodalOps.sampleFrames(
      Engine.table(spark, TestSpark.sf, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MultimodalOps.MediaRow](
          org.apache.spark.sql.Encoders.product[MultimodalOps.MediaRow]),
      frameBytes = 100, everyNth = 2)
    val byDoc = df.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min(col("ts_ms")).as("t0"))
      .collect()
    assert(byDoc.nonEmpty)
    assert(byDoc.forall(_.getLong(2) == 0L)) // first sampled frame at t=0
    // frame payloads are exactly frameBytes long and indices step by 2
    val one = df.filter(col("doc_id") === byDoc.head.getLong(0))
      .orderBy(col("frame_idx")).collect()
    assert(one.forall(_.getAs[Array[Byte]]("frame").length == 100))
    assert(one.map(_.getInt(1)).toSeq ===
      one.indices.map(_ * 2))
  }

  test("stages are deterministic across runs") {
    def snap() = SparkEntry.queries("multimodal_frames")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(snap() === snap())
  }

  test("Y4M payloads route through the real stream codec in sampleFrames") {
    import spark.implicits._
    import graft.operators.{MultimodalOps, RawVideo}
    val payload = MultimodalOps.y4mPayload(3L, 6, 8, 8)
    val media = Seq(MultimodalOps.MediaRow(3L, payload)).toDS()
    val rows = MultimodalOps.sampleFrames(media, frameBytes = 256, everyNth = 2)
      .orderBy("frame_idx").collect()
    // 6 real frames, every 2nd -> indices 0, 2, 4 at 25 fps
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 80L, 160L))
    val v = RawVideo.decodeY4m(payload)
    assert(rows(1).getAs[Array[Byte]]("frame").toSeq == v.frames(2).luma.toSeq)
  }
}
