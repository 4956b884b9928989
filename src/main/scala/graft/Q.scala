package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same tables.
  * The driver hash-compares the two at sf0.01 — column names must match
  * exactly, and every query orders its rows deterministically.
  */
final case class Q(name: String, oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)
