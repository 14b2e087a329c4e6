package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{JoinQueries, NestedQueries, PredicateQueries, PrimitiveQueries, RelationalQueries, Tpch2Queries, Tpch3Queries, TpchQueries, TpcdsQueries, WindowQueries}
import graft.operators.{AsofJoin, ChangeOps, Compaction, CorpusOps, DedupOps, ExactQuantile, FunnelOps, GraphOps, HilbertCurve, ImageDedup, IntervalJoin, MlOps, RetrievalOps, MultimodalOps, SimilarityOps, SketchOps, StatOps, TextOps, ZOrder}
import graft.functions.Udx
import graft.sources.{Formats, MixedFormat, TableSink}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-area registries; every entry with an
  * `oracle` is hash-checked against DuckDB by the driver (t2 gate), the
  * rest get a rows-only check.
  */
object SparkEntry {

  val all: Seq[Q] =
    TpchQueries.defs ++ Tpch2Queries.defs ++ Tpch3Queries.defs ++
      TpcdsQueries.defs ++ PrimitiveQueries.defs ++
      RelationalQueries.defs ++ JoinQueries.defs ++
      WindowQueries.defs ++ NestedQueries.defs ++ PredicateQueries.defs ++
      AsofJoin.defs ++ IntervalJoin.defs ++ ExactQuantile.defs ++
      ZOrder.defs ++ HilbertCurve.defs ++
      TextOps.defs ++ CorpusOps.defs ++ DedupOps.defs ++ MlOps.defs ++
      SketchOps.defs ++ RetrievalOps.defs ++ GraphOps.defs ++ StatOps.defs ++
      ChangeOps.defs ++ Compaction.defs ++ FunnelOps.defs ++
      SimilarityOps.defs ++
      MultimodalOps.defs ++ ImageDedup.defs ++ Udx.defs ++ TableSink.defs ++ Formats.defs ++
      MixedFormat.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
