package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared test fixture: one local SparkSession per suite, configured the
  * same way as the Verify/Bench mains (UTC, small shuffle parallelism,
  * nanos-as-long for the events table).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Testdata root; override via GRAFT_TESTDATA on hosts with a
    * different data layout. */
  val testdataRoot: String =
    sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata")

  /** sf0.001 fixture dir (smallest, fastest; ~6k lineitem rows). */
  val sfDir = s"$testdataRoot/sf0.001"

  /** sf0.01 fixture dir (~60k lineitem rows; the oracle scale — used by
    * suites that need the real data distribution, not just tiny rows). */
  val sf01Dir = s"$testdataRoot/sf0.01"

  override def afterAll(): Unit = {
    // Session is shared across suites in one JVM (getOrCreate); don't stop.
    super.afterAll()
  }
}
