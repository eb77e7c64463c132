package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gated query: a Spark implementation and (when SQL-expressible)
  * its DuckDB oracle over the same parquet tables. Non-SQL-expressible ops
  * (MLlib k-means train, streaming) omit the oracle → driver records a
  * rows-only check; their semantics are covered by ScalaTest instead.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  def all: Seq[GraftQuery] =
    VectorQueries.all ++ SparseQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ RelationalQueries.all ++ MultimodalQueries.all ++
      PipelineQueries.all ++ TemporalQueries.all ++ HybridQueries.all ++
      EvalQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
