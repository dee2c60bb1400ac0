package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operation: a Spark DataFrame implementation plus an
  * optional ANSI-SQL oracle the driver replays in DuckDB over the same
  * parquet tables. `oracle = None` → the driver records a weaker
  * rows-only check (used for ops SQL can't express, e.g. iterative
  * k-means or streaming).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  /** Assemble a module's query list into the SparkEntry map shapes. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
