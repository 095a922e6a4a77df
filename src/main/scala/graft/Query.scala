package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark DataFrame builder plus (when the
  * semantics are SQL-expressible) the equivalent DuckDB SQL the driver
  * uses as a correctness oracle. Oracle-less entries get the driver's
  * weaker rows-only check.
  */
final case class Query(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def tuple: (String, (SparkSession, String) => DataFrame) = name -> build
}
