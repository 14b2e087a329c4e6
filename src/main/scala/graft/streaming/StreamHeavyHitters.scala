package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** Streaming Count-Min-Sketch — the incremental twin of the batch
  * `text_heavy_hitters` entry (the streaming-twin pattern of
  * [[StreamNearDedup]]/[[StreamAsof]]). Token frequencies over an
  * unbounded document stream with state bounded by the SKETCH, not
  * the vocabulary: `mapGroupsWithState` keyed by the (row, bucket)
  * cell keeps ONE long per cell — d=4 x w=64 = 256 state rows forever,
  * whatever flows through (StreamHeavyHittersSpec pins the bound and
  * the batch equivalence: after any micro-batch split the cells equal
  * the batch sketch of everything seen).
  *
  * That is the whole point of sketching a stream: an exact streaming
  * word count's state grows with vocabulary (unbounded on raw text),
  * the CMS state is 2 KB and still answers point queries with the
  * usual est >= exact one-sided bound. Per micro-batch the only
  * shuffle is the groupByKey on the cell key; bucketing is the batch
  * path's own expression ([[TextOps.cmsBucket]]), fused map-side.
  */
object StreamHeavyHitters {

  final case class CellInc(r: Int, b: Int)
  final case class Cell(r: Int, b: Int, cell: Long)

  private def bump(key: (Int, Int), rows: Iterator[CellInc],
      state: GroupState[Long]): Cell = {
    val n = state.getOption.getOrElse(0L) + rows.size
    state.update(n)
    Cell(key._1, key._2, n)
  }

  /** Running CMS cells over a streaming (doc_id, text) relation —
    * Update-mode output; each micro-batch re-emits every cell it
    * touched with its new running value (the LAST emission per cell is
    * the sketch).
    */
  def cells(docs: DataFrame): Dataset[Cell] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(
      explode(TextOps.tokens(lower(col("text")))).as("w"))
    val incs = tok.select(explode(array((0 until 4).map(r =>
        struct(lit(r).as("r"), TextOps.cmsBucket(r, col("w")).as("b"))): _*))
        .as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .as[CellInc]
    incs.groupByKey(c => (c.r, c.b))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(bump)
  }
}
