package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every capability is a [[Q]] in the registry below; `queries` and
  * `oracleSql` are assembled from it so a query and its DuckDB oracle
  * can never drift apart structurally.
  */
object SparkEntry {

  val registry: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Nested.all ++
      graft.queries.Windows.all ++
      graft.queries.Scalars.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupSim.all ++
      graft.queries.Udfs.all ++
      graft.queries.ScaleOps.all ++
      graft.queries.Analytics.all ++
      graft.queries.BpeQueries.all ++
      graft.queries.Wave9.all ++
      graft.queries.Wave10.all ++
      graft.queries.Wave11.all ++
      graft.queries.Wave12.all ++
      graft.queries.Wave13.all ++
      graft.queries.Wave14.all ++
      graft.queries.Wave15.all ++
      graft.queries.Wave16.all ++
      graft.queries.Wave17.all ++
      graft.queries.Wave18.all ++
      graft.queries.Wave19.all ++
      graft.queries.Wave20.all ++
      graft.queries.Wave21.all ++
      graft.queries.Wave22.all ++
      graft.queries.Wave23.all ++
      graft.queries.Wave24.all ++
      graft.queries.Wave25.all ++
      graft.queries.Wave26.all ++
      graft.queries.Wave27.all ++
      graft.queries.Wave28.all ++
      graft.queries.Wave29.all ++
      graft.queries.Wave30.all ++
      graft.queries.Wave31.all ++
      graft.queries.Wave32.all ++
      graft.queries.Wave33.all ++
      graft.queries.Wave34.all ++
      graft.queries.Wave35.all ++
      graft.queries.Wave36.all ++
      graft.queries.Wave37.all ++
      graft.queries.Wave38.all ++
      graft.queries.Wave39.all ++
      graft.queries.Wave40.all ++
      graft.queries.Wave41.all ++
      graft.queries.Wave42.all ++
      graft.queries.Wave43.all ++
      graft.queries.Wave44.all ++
      graft.queries.Wave45.all ++
      graft.queries.Wave46.all ++
      graft.queries.Wave47.all ++
      graft.queries.Wave48.all ++
      graft.queries.Wave49.all ++
      graft.queries.Wave50.all ++
      graft.queries.Wave51.all ++
      graft.queries.Wave52.all ++
      graft.queries.Wave53.all ++
      graft.queries.Wave54.all ++
      graft.queries.Wave55.all ++
      graft.queries.Wave56.all ++
      graft.queries.Wave57.all ++
      graft.queries.Wave58.all ++
      graft.queries.Wave59.all ++
      graft.queries.Wave60.all ++
      graft.queries.Wave61.all ++
      graft.queries.Wave62.all ++
      graft.queries.Wave63.all ++
      graft.queries.Wave64.all ++
      graft.queries.Wave65.all ++
      graft.queries.Wave66.all ++
      graft.queries.Wave67.all ++
      graft.queries.Wave68.all ++
      graft.queries.Wave69.all ++
      graft.queries.Wave70.all ++
      graft.queries.Wave71.all ++
      graft.queries.Wave72.all ++
      graft.queries.Wave73.all ++
      graft.queries.Wave74.all ++
      graft.queries.Wave75.all ++
      graft.queries.Wave76.all ++
      graft.queries.Wave77.all ++
      graft.queries.Wave78.all ++
      graft.queries.Wave79.all ++
      graft.queries.Wave80.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Nested.flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
