package graft

import java.nio.file.{Files, Paths}
import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** HUGEINT-hygiene gate (VERDICT r9 task #2): DuckDB silently promotes
  * `SUM(BIGINT)` (plain and windowed) and long integer-arithmetic chains
  * to HUGEINT/DECIMAL; the driver's strict value-hash then differs even
  * when every value is numerically identical — exactly how
  * `q_orders_seasonality` FAILed the r9 gate while being value-exact.
  * This spec DESCRIBEs every oracle mirror in DuckDB (via
  * tools/check_oracles.py --types) and asserts each output column lands
  * in the hash-safe type set, so the whole bug class is extinct at
  * `sbt test` time rather than discovered in the official artifact.
  *
  * DuckDB lives on the Python side only (the driver's oracle engine, not
  * a library dependency), so the spec shells out; if python3/duckdb is
  * absent the spec is canceled, not vacuously green.
  */
class OracleTypeSpec extends AnyFunSuite {
  test("every oracle mirror DESCRIBEs to hash-safe DuckDB types") {
    val probe = Process(Seq("python3", "-c", "import duckdb, pandas"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3+duckdb unavailable — sweep runs driver-side only")
    val tmp = Files.createTempDirectory("graft-oracle-types")
    Files.writeString(tmp.resolve("oracle_sql.json"),
      Verify.oracleJson(None, "/root/testdata/sf0.001"))
    val out = new StringBuilder
    val log = ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val code = Process(
      Seq("python3", "tools/check_oracles.py",
        "/root/testdata/sf0.001", tmp.toString, "--types"),
      new java.io.File(sys.props.getOrElse("user.dir", "."))).!(log)
    val bad = out.toString.linesIterator
      .filter(l => l.startsWith("FAIL") || l.startsWith("ERROR")).toSeq
    assert(code == 0 && bad.isEmpty,
      s"oracle mirrors with non-hash-safe DuckDB output types:\n${bad.mkString("\n")}")
    // The sweep must actually have covered the registry — a truncated
    // oracle_sql.json or a silently-empty run would otherwise pass.
    val okCount = out.toString.linesIterator.count(_.startsWith("OK"))
    assert(okCount + out.toString.linesIterator.count(_.startsWith("SKIP")) ==
      SparkEntry.oracleSql.size,
      s"type sweep covered $okCount keys but registry has ${SparkEntry.oracleSql.size}")
  }
}
