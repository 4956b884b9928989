package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Schema-level lint over every `SparkEntry.oracleSql` entry: DESCRIBE
  * each oracle in DuckDB and fail if any result column is HUGEINT /
  * DECIMAL — types Spark's parquet writer never emits, so the driver's
  * typed-bits hash is guaranteed to mismatch even when the values are
  * numerically equal. This is the round-7 postmortem made unwritable:
  * three of the four red cells were DuckDB silently promoting a BIGINT
  * window-sum / `//` quotient to HUGEINT in a newly-authored oracle.
  *
  * DuckDB only exists python-side in this environment (it is the
  * driver's oracle engine, not a library dependency), so the spec shells
  * out to tools/oracle_lint.py and is cancelled — not passed — on hosts
  * without python3+duckdb.
  */
class OracleLintSpec extends AnyFunSuite {

  private val testdataRoot: String =
    sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata")

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  test("no oracle result column is HUGEINT/DECIMAL (DuckDB DESCRIBE)") {
    val (probe, _) = run("python3", "-c", "import duckdb")
    assume(probe == 0, "python3+duckdb not on this host; lint runs on CI")
    val json = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(json, Verify.oracleJson)
    val lint = Paths.get("tools/oracle_lint.py").toAbsolutePath
    val (code, out) =
      run("python3", lint.toString, s"$testdataRoot/sf0.001", json.toString)
    Files.deleteIfExists(json)
    assert(code == 0, s"oracle lint flagged:\n$out")
  }
}
