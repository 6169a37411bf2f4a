package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see SURVEY.md §7 and README.
  *
  * Every implemented operator is registered here as a named query over the
  * driver test tables, with equivalent ANSI SQL for the DuckDB oracle in
  * [[oracleSql]]. Queries without an oracle entry (non-SQL-expressible
  * operations) get the driver's weaker rows-only check and are covered by
  * ScalaTest specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalTpch.q05LocalSupplier(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalTpch.queries ++
      RelationalQuality.queries ++ Dedup.queries ++ Similarity.queries ++
      GraphOps.queries ++
      TextAnalysis.queries ++ TextModels.queries ++ TextEval.queries ++
      TextSampling.queries ++ EventOps.queries ++ EventStreaming.queries ++
      EventStats.queries ++ Multimodal.queries ++
      ArrayOps.queries ++ Formats.queries ++ Layout.queries ++
      graft.cdc.CdcColumns.queries ++ graft.convert.ConvertQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ RelationalTpch.oracles ++
      RelationalQuality.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      GraphOps.oracles ++
      TextAnalysis.oracles ++ TextModels.oracles ++ TextEval.oracles ++
      TextSampling.oracles ++ EventOps.oracles ++ EventStreaming.oracles ++
      EventStats.oracles ++ Multimodal.oracles ++
      ArrayOps.oracles ++ Formats.oracles ++ Layout.oracles ++
      graft.cdc.CdcColumns.oracles ++ graft.convert.ConvertQueries.oracles
}
