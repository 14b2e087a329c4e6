package graft.operators

import graft.{Engine, Q}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — for every left row, the single most recent right row
  * with the same key and `right.ts <= left.ts` (time-series
  * enrichment: trades->quotes, clicks->views, metrics->deploys). One
  * of the operator classes Spark lacks natively (SPARK-22947 stalled;
  * DuckDB/kdb ship it as ASOF JOIN), and the classic trap is
  * implementing it as a range join — `l JOIN r ON key AND r.ts <= l.ts`
  * explodes to the full per-key history per left row before a window
  * prunes it.
  *
  * This is the scalable UNION + WINDOW formulation instead: tag both
  * sides, sort each key's timeline once — right rows BEFORE left rows
  * at equal ts, so "at or before" is inclusive — and carry the last
  * non-null right payload forward with
  * `last(payload, ignoreNulls) ROWS UNBOUNDED PRECEDING..CURRENT`.
  * Exactly ONE shuffle (the key hash partition + timeline sort), no
  * per-row history scan, running state one payload struct per key —
  * at 100 TB this is a single repartition+sort of l+r, the same cost
  * class as a sort-merge join, independent of history depth per key.
  * AsofJoinSpec pins semantics (ties, no-prior nulls, right-tiebreak
  * determinism) against a brute-force reference and the ONE-exchange
  * plan shape.
  *
  * Determinism: equal-ts right rows are ordered by `tieCol` so the
  * LAST one wins — callers pass a unique right id.
  */
object AsofJoin {

  /** Left-outer as-of join. `payload` = right columns to attach
    * (renamed as given); `tieCol` = unique right column breaking
    * equal-ts ties (latest wins). Left columns all ride through.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Map[String, String],
      tieCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payStruct = struct(payload.toSeq.sortBy(_._2).map {
      case (src, as) => col(src).as(as) }: _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        col(tieCol).as("__tie"), payStruct.as("__pay"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*))
          .schema.fields.head.dataType).as("__lrow")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__tie").dataType).as("__tie"),
        lit(null).cast(r.schema("__pay").dataType).as("__pay"),
        struct(leftCols.map(col): _*).as("__lrow")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__hit", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +: payload.values.toSeq.sorted.map(p =>
        col("__hit")(p).as(p)): _*)
  }

  /** Driver entry + FULL oracle: every click event enriched with its
    * user's most recent view event at-or-before it (µs-aligned
    * event-time per NOTES rule 2 — Spark sees TIMESTAMP(NANOS) as
    * nanos-long, DuckDB truncates to µs). The checked surface is the
    * matched view_id plus the exact integer lag in nanoseconds; DuckDB
    * computes it independently as a LATERAL top-1 per click — the
    * textbook (quadratic) spec the union+window plan must equal.
    */
  val asofEntry: Q = Q("join_asof",
    (s, d) => {
      Engine.configure(s)
      val ev = Engine.table(s, d, "events")
        .select(col("event_id"), col("user_id"),
          (col("ts") - col("ts") % 1000).as("tsn"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("tsn"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("tsn"))
      asofJoin(clicks, views, Seq("user_id"), "tsn",
        Map("view_id" -> "view_id", "tsn" -> "view_tsn"),
        tieCol = "view_id")
        .select(col("event_id"), col("user_id"), col("view_id"),
          (col("tsn") - col("view_tsn")).as("lag_ns"))
        .orderBy(col("event_id"))
    },
    Some("""WITH ev AS (
      |  SELECT event_id, user_id, epoch_ns(ts) tsn, event_type
      |  FROM events),
      |l AS (SELECT event_id, user_id, tsn FROM ev
      |      WHERE event_type = 'click'),
      |r AS (SELECT event_id AS view_id, user_id, tsn FROM ev
      |      WHERE event_type = 'view')
      |SELECT l.event_id, l.user_id, rr.view_id,
      |  l.tsn - rr.tsn AS lag_ns
      |FROM l LEFT JOIN LATERAL (
      |  SELECT r.view_id, r.tsn FROM r
      |  WHERE r.user_id = l.user_id AND r.tsn <= l.tsn
      |  ORDER BY r.tsn DESC, r.view_id DESC LIMIT 1) rr ON TRUE
      |ORDER BY l.event_id""".stripMargin))

  val defs: Seq[Q] = Seq(asofEntry)
}
