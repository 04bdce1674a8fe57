package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RelationalQueries, ScaleQueries, TsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the checked operator inventory: the delegated relational
  * surface (RelationalQueries), the ModelarDB time-series surface end-to-end
  * (TsQueries), and the training-data pipeline operators (PipelineQueries).
  * Every entry with an oracle is hash-compared against DuckDB at sf0.01.
  */
object SparkEntry {

  private val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    RelationalQueries.queries ++ TsQueries.queries ++
      PipelineQueries.queries ++ ScaleQueries.queries // additions-only (r18)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val fn = all.find(_._1 == "q1_pricing_summary").get._2
    fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(all.map { case (name, fn, _) => name -> fn }: _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose results are
    * engine-seeded (LSH bucketing, stub decodes) — those get the driver's
    * rows-only check and are verified by the ScalaTest suites instead.
    */
  def oracleSql: Map[String, String] =
    ListMap(all.collect { case (name, _, Some(sql)) => name -> sql.trim }: _*)
}
