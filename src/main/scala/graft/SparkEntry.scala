package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Exemplars
import graft.operators.{AsofJoin, Behavioral, CorpusPrep, Dedup, Graph, Multimodal, Quality, RangeJoin, Relational, Sampling, SemiStructured, Similarity, Stats, TextOps, TimeSeries, ZOrder}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2-B to a
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the DuckDB
  * equivalent for each hash-gated query (implementation-only operators are
  * intentionally absent → driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped aggregate — scan, decimal discipline, hash agg,
    * total-order output: the whole t2 pipeline in miniature. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q11Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ SemiStructured.queries ++ TextOps.queries ++
      Dedup.queries ++ Similarity.queries ++ Exemplars.queries ++
      Multimodal.queries ++ AsofJoin.queries ++ RangeJoin.queries ++
      Sampling.queries ++ Stats.queries ++ TimeSeries.queries ++
      CorpusPrep.queries ++ Behavioral.queries ++ Graph.queries ++
      Quality.queries ++ ZOrder.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ SemiStructured.oracle ++ TextOps.oracle ++
      Exemplars.oracle ++ AsofJoin.oracle ++ RangeJoin.oracle ++
      Dedup.oracle ++ Sampling.oracle ++ Similarity.oracle ++
      Stats.oracle ++ TimeSeries.oracle ++ Multimodal.oracle ++
      CorpusPrep.oracle ++ Behavioral.oracle ++ Graph.oracle ++
      Quality.oracle ++ ZOrder.oracle
}
