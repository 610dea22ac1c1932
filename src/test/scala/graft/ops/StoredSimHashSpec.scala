package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Incremental TEXT dedup against a persisted SimHash store: write the
  * history's 8-byte fingerprints once, probe each new batch — exact
  * copies at Hamming 0, one-word edits through the wide-radius
  * multi-index-hashing probe expansion against the UNCHANGED store.
  */
class StoredSimHashSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private def doc(id: Long): String =
    (0 until 60).map(w => s"token${(id * 7 + w * 3) % 40}").mkString(" ")

  test("exact copies recover at hamming 0; one-word edits recover at " +
    "the wide radius through probe expansion; store equals the " +
    "in-memory pair path") {
    import spark.implicits._
    val table = s"sh_ref_${System.nanoTime()}"
    val reference = (0L until 20L).map(id => (id, doc(id)))
      .toDF("id", "text")
    Dedup.writeSimHashReference(reference, "id", "text", table,
      numBuckets = 4)
    try {
      val batch = ((0L until 5L).map(id => (1000L + id, doc(id))) ++
        (5L until 10L).map(id =>
          (2000L + id, doc(id).replace("token1 ", "edited "))))
        .toDF("id", "text")
      // exact copies at radius 0
      val exact = Dedup.simHashNearDupsStored(batch, table, "id", "text",
        maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      for (id <- 0L until 5L) exact.get((1000L + id, id)) shouldBe Some(0)
      // edits at radius 12 (wide probe against the UNCHANGED store)
      val wide = Dedup.simHashNearDupsStored(batch, table, "id", "text",
        maxHamming = 12)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      for (id <- 5L until 10L) {
        assert(wide.contains((2000L + id, id)),
          s"edited copy of stored $id not recovered at radius 12: $wide")
        wide((2000L + id, id)) should be > 0
      }
      // stored screen == brute force over (batch x reference) hashes
      val refH = reference
        .select(col("id"), Dedup.simHash(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val batH = batch
        .select(col("id"), Dedup.simHash(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      val brute = (for {
        (ib, hb) <- batH; (ir, hr) <- refH
        d = java.lang.Long.bitCount(hb ^ hr) if d <= 12
      } yield (ib, ir) -> d).toMap
      wide shouldBe brute
    } finally spark.sql(s"DROP TABLE IF EXISTS ${table}_buckets")
  }

  test("append grows the store; appended history resolves at the wide " +
    "radius too") {
    import spark.implicits._
    val table = s"sh_grow_${System.nanoTime()}"
    Dedup.writeSimHashReference(
      (0L until 10L).map(id => (id, doc(id))).toDF("id", "text"),
      "id", "text", table, numBuckets = 4)
    try {
      Dedup.appendSimHashReference(
        (10L until 20L).map(id => (id, doc(id))).toDF("id", "text"),
        "id", "text", table)
      val batch = (5L until 15L).map(id =>
        (1000L + id, doc(id).replace("token1 ", "edited ")))
        .toDF("id", "text")
      val found = Dedup.simHashNearDupsStored(batch, table, "id", "text",
        maxHamming = 12)
        .collect().map(r => (r.getLong(0) - 1000L, r.getLong(1)))
        .filter(p => p._1 == p._2).toSet
      // edits of both the original AND the appended ids resolve
      found shouldBe (5L until 15L).map(i => (i, i)).toSet
    } finally spark.sql(s"DROP TABLE IF EXISTS ${table}_buckets")
  }
}
