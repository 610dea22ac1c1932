package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for E2E specs (one JVM-wide session; ScalaTest
  * runs suites sequentially in the forked test JVM).
  */
trait SparkSuiteBase extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkSuiteBase.session

  def sfDir: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session alive across suites; stopped by JVM exit
    super.afterAll()
  }
}

object SparkSuiteBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // engine functions registered the production way (SQL-callable with
      // no Scala code) — GraftExtensionsSpec exercises this path
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
