package graft

import org.scalatest.funspec.AnyFunSpec

/** Board-size and analysis canary for the driver contract.
  *
  * Round 11 lost six previously-green queries SILENTLY: the driver
  * refreshed the testdata (events.ts long-nanos → parquet
  * TIMESTAMP_MICROS) and every committed plan doing integer arithmetic on
  * `ts` stopped analyzing — but nothing in the repo turned red, because
  * no test ever constructed the driver-board queries against the real
  * testdata. The correctness board just shrank 128 → 127 while new
  * greens masked the losses.
  *
  * This spec converts that failure mode into a red test:
  *  - every `SparkEntry.queries` entry must CONSTRUCT against the
  *    current `/root/testdata/sf0.001` (construction analyzes the plan;
  *    for the streaming entries it also runs their MemoryStream
  *    fixture, which is the analysis surface those queries have), and
  *  - the board size is pinned, so a dropped or renamed entry is a
  *    visible diff here, never a silent shrink.
  */
class QueryBoardSpec extends AnyFunSpec with SparkSuiteBase {

  describe("SparkEntry driver board") {

    it("pins the board size (update BOTH counts when adding a query)") {
      assert(SparkEntry.queries.size == 275)
      // r17: q90/q91/q93/q98 re-shaped to invariant outputs with DuckDB
      // oracles (planted near-dup recall + exact Jaccard, token-multiset
      // screen recall, planted-copy exact top-k under pruning) — every
      // board query is now oracle-checked, zero rows-only; q273/q274
      // pin the profile_state raw-binary intermediate and the >= 64-col
      // per-column wide merge plan on exact counters; q275 pins the
      // streaming store compact/vacuum/merge lifecycle
      assert(SparkEntry.oracleSql.size == 275)
    }

    it("every oracle entry has a matching query") {
      val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
      assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
    }

    it("every query constructs and analyzes against the live testdata") {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            if (df.schema.fields.isEmpty) Some(s"$name: empty schema")
            else None
          } catch {
            case e: Throwable =>
              Some(s"$name: ${e.getClass.getSimpleName} ${
                Option(e.getMessage).getOrElse("").linesIterator
                  .take(1).mkString}")
          }
      }
      assert(failures.isEmpty,
        s"\n${failures.size} queries no longer analyze:\n  " +
          failures.mkString("\n  "))
    }
  }
}
