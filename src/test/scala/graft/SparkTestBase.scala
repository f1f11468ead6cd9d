package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide session,
  * mirrors the driver harness config: UTC, small shuffle partitions). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // keep catalog artifacts (derby metastore, warehouse) out of the repo
    val scratch = java.nio.file.Files.createTempDirectory("graft_test").toString
    System.setProperty("derby.system.home", scratch)
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
