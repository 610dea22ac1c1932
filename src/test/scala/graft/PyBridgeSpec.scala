package graft

import java.{util => ju}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profile.ProfileSession
import graft.python.PyBridge

/** The Py4J gateway surface (graft.python.PyBridge) must stay callable with
  * plain-Java argument shapes (java.util.List, nullable String) — exactly
  * what pyspark's gateway sends — and produce the same frames as the Scala
  * API. The Python side itself is exercised end-to-end by
  * python/tests/test_facade.py.
  */
class PyBridgeSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def orders: DataFrame = spark.read.parquet(s"$sfDir/orders.parquet")

  private def jList(xs: String*): ju.List[String] = {
    val l = new ju.ArrayList[String]()
    xs.foreach(l.add)
    l
  }

  test("bridge groupBy(java list) equals Scala varargs session") {
    val viaBridge = PyBridge.newProfilingSession(orders, "p")
      .groupBy(jList("o_orderstatus"))
      .aggProfiles()
      .select(col("o_orderstatus"), col("o_totalprice.count"),
        col("o_totalprice.numbers.mean"))
      .collect().map(_.toSeq).toSet
    val viaScala = ProfileSession(orders, "p")
      .groupBy("o_orderstatus")
      .aggProfiles()
      .select(col("o_orderstatus"), col("o_totalprice.count"),
        col("o_totalprice.numbers.mean"))
      .collect().map(_.toSeq).toSet
    viaBridge shouldBe viaScala
    viaBridge should not be empty
  }

  test("timestamped aggProfiles carries the wire column; tags ride it") {
    val wire = PyBridge.newProfilingSession(orders, "wire")
      .groupBy(jList("o_orderstatus"))
      .withTag("env", "test")
      .aggProfiles(1700000000000L)
    wire.columns should contain("why_profile")
    val bytes = wire.select("why_profile").head.getAs[Array[Byte]](0)
    val msg = graft.io.ProfileProto.fromBytes(bytes)
    msg.tags should contain(graft.io.ProfileProto.TagPrefix + "env" -> "test")
    msg.sessionTimestamp shouldBe 1700000000000L
  }

  test("null / empty scoreField routes to the score-less confusion matrix") {
    val labeled = orders.select(
      (col("o_totalprice") > 150000).cast("string").as("t"),
      (col("o_totalprice") > 140000).cast("string").as("p"))
    // Py4J sends null for python None
    val viaNull = PyBridge.newProfilingSession(labeled, "m")
      .withClassificationModel("p", "t", null)
      .aggProfiles()
    viaNull.columns should contain("classification_metrics")
    viaNull.count() shouldBe 1L
  }

  test("mergeProfiles with an empty java list is the global rollup") {
    val per = PyBridge.newProfilingSession(orders, "m")
      .groupBy(jList("o_orderstatus")).aggProfiles()
    val merged = PyBridge.mergeProfiles(per, new ju.ArrayList[String]())
    val n = merged.select(col("o_totalprice.count")).head.getLong(0)
    n shouldBe orders.filter(col("o_totalprice").isNotNull).count()
  }

  test("estimateSegments accepts null target and returns a java list") {
    val segs = PyBridge.estimateSegments(orders, null, 30)
    segs shouldBe a[ju.List[_]]
    segs.forEach(s => orders.columns should contain(s))
  }
}
