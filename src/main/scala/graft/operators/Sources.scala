package graft.operators

import graft.{Cols, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV and JSON ingestion — the most common first mile for a new user
  * of the engine (the reference only reads newline text:
  * /root/reference/src/mapreduce.cpp:26-29; this is extension surface
  * like the ORC/hive sinks in SourcesSpec).
  *
  * Oracle-checkable by construction: each query WRITES the fixture
  * (csv / json-lines twin of a small dimension table, derived from the
  * current data dir's parquet) to a fixed absolute path, reads it back
  * through the schema'd Spark source, and aggregates; the DuckDB
  * oracle reads THE SAME FILES via `read_csv` / `read_json`, so the
  * whole serialize → parse → type → aggregate path is hash-pinned in
  * both engines, not just Spark's round-trip with itself.
  *
  * The fixture path must be a constant because oracle SQL is a static
  * string — every run overwrites it from the current dir's table
  * before reading, so engine and oracle always see the same bytes
  * (queries run sequentially in the harness). Scale note: these are
  * format-plumbing pins on a 25/10-row dimension; ingesting 100 TB of
  * csv/json is the same `spark.read` call with a schema — splittable,
  * partition-parallel — and everything downstream is format-agnostic.
  */
object Sources {

  /** Absolute fixture root (java.io.tmpdir in this container),
    * embedded verbatim in the oracle SQL. */
  val FixtureRoot = "/tmp/graft_sources"

  val queries: Seq[Q] = Seq(

    // ---- csv: write nation as headered csv, read back with an
    //      EXPLICIT schema (schema inference on csv is a silent-cast
    //      minefield and a second full scan), aggregate per region.
    //      DuckDB parses the same csv bytes with the same column
    //      types. ----
    Q("q_csv_roundtrip", Some(s"""
      |SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
      |  MIN(n_name) AS first_name
      |FROM read_csv('$FixtureRoot/nation_csv/*.csv', header = true,
      |  columns = {'n_nationkey': 'INTEGER', 'n_name': 'VARCHAR',
      |             'n_regionkey': 'INTEGER'})
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)) {
      (s, dir) =>
      val path = s"$FixtureRoot/nation_csv"
      Tables.load(s, dir, "nation")
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("header", "true").csv(path)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_nations"), min("n_name").as("first_name"))
        .orderBy("n_regionkey")
    },

    // ---- json-lines: write supplier as ndjson, read back schema'd,
    //      aggregate with the exact-cents money pattern — doubles
    //      survive the text round trip bit-exactly (shortest
    //      round-trip repr on write, exact parse on read) in BOTH
    //      engines, which is precisely what this pin proves. ----
    Q("q_json_source", Some(s"""
      |SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |  ${Cols.sqlMoneySum("s_acctbal")} AS bal_sum
      |FROM read_json('$FixtureRoot/supplier_json/*.json',
      |  format = 'newline_delimited',
      |  columns = {'s_suppkey': 'BIGINT', 's_name': 'VARCHAR',
      |             's_nationkey': 'INTEGER', 's_acctbal': 'DOUBLE'})
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)) {
      (s, dir) =>
      val path = s"$FixtureRoot/supplier_json"
      Tables.load(s, dir, "supplier")
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType)))
      s.read.schema(schema).json(path)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"),
          Cols.moneySum(col("s_acctbal")).as("bal_sum"))
        .orderBy("s_nationkey")
    })
}
