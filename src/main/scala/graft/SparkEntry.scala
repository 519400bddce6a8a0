package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query catalogs. Every operator claimed in
  * SURVEY.md §2 has a named entry in `queries`; SQL-expressible ones have
  * a DuckDB twin in `oracleSql` for the driver's differential check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.CoreQueries.factionEconomy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CoreQueries.queries ++
    ops.JoinSetQueries.queries ++
    ops.WindowQueries.queries ++
    ops.AdvancedQueries.queries ++
    ops.ShapeQueries.queries ++
    ops.ScaleUtils.queries ++
    ops.TimeSeriesOps.queries ++
    ops.StatOps.queries ++
    ops.GraphOps.queries ++
    llm.TextOps.queries ++
    llm.RetrievalOps.queries ++
    llm.QualityOps.queries ++
    llm.VectorOps.queries ++
    llm.NearDupOps.queries ++
    llm.CorpusOps.queries ++
    llm.CorpusAudit.queries ++
    llm.SamplingOps.queries ++
    llm.SelectionOps.queries ++
    llm.MultimodalOps.queries ++
    sources.Interchange.queries ++
    streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.CoreQueries.oracleSql ++
    ops.JoinSetQueries.oracleSql ++
    ops.WindowQueries.oracleSql ++
    ops.AdvancedQueries.oracleSql ++
    ops.ShapeQueries.oracleSql ++
    ops.ScaleUtils.oracleSql ++
    ops.TimeSeriesOps.oracleSql ++
    ops.StatOps.oracleSql ++
    ops.GraphOps.oracleSql ++
    llm.TextOps.oracleSql ++
    llm.RetrievalOps.oracleSql ++
    llm.QualityOps.oracleSql ++
    llm.VectorOps.oracleSql ++
    llm.NearDupOps.oracleSql ++
    llm.CorpusOps.oracleSql ++
    llm.CorpusAudit.oracleSql ++
    llm.SamplingOps.oracleSql ++
    llm.SelectionOps.oracleSql ++
    llm.MultimodalOps.oracleSql ++
    sources.Interchange.oracleSql ++
    streaming.StreamOps.oracleSql
}
