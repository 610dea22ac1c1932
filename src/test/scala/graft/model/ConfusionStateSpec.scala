package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the reference ClassificationMetrics matrices
  * (/root/reference/core/src/test/java/com/whylogs/core/metrics/ClassificationMetricsTest.java:16-202)
  * against the engine's ConfusionState (sparse cell map; dense matrix
  * reconstructed over sorted labels).
  */
class ConfusionStateSpec extends AnyFunSuite with Matchers {

  private def matrix(st: ConfusionState): (Seq[String], Map[(String, String), Long]) = {
    val labels =
      (st.cells.keys.map(_._1) ++ st.cells.keys.map(_._2)).toSeq.distinct.sorted
    (labels, st.cells.map { case (k, m) => k -> m.count }.toMap.withDefaultValue(0L))
  }

  test("single-label matrix is [[1]]") {
    val st = new ConfusionState
    st.update("0", "0", 0.0)
    val (labels, cells) = matrix(st)
    labels shouldBe Seq("0")
    cells(("0", "0")) shouldBe 1L
  }

  test("binary classification pinned matrix [[1,2],[1,3]]") {
    val st = new ConfusionState
    val preds = Seq(0, 1, 1, 0, 0, 1, 1)
    val tgts = Seq(1, 0, 1, 1, 0, 1, 1)
    preds.zip(tgts).foreach { case (p, t) =>
      st.update(p.toString, t.toString, 0.0)
    }
    val (labels, c) = matrix(st)
    labels shouldBe Seq("0", "1")
    // reference matrix[pred][target]: [[1,2],[1,3]]
    c(("0", "0")) shouldBe 1L
    c(("0", "1")) shouldBe 2L
    c(("1", "0")) shouldBe 1L
    c(("1", "1")) shouldBe 3L
  }

  test("merge with itself doubles every cell; original unaffected by updates") {
    val st = new ConfusionState
    val preds = Seq(0, 1, 1, 0, 0, 1, 1)
    val tgts = Seq(1, 0, 1, 1, 0, 1, 1)
    preds.zip(tgts).foreach { case (p, t) => st.update(p.toString, t.toString, 0.0) }
    val merged = ConfusionState.deserialize(st.serialize())
    merged.merge(st)
    val (_, c) = matrix(merged)
    c(("0", "0")) shouldBe 2L
    c(("0", "1")) shouldBe 4L
    c(("1", "0")) shouldBe 2L
    c(("1", "1")) shouldBe 6L
  }

  test("multiclass string labels pin the sklearn example") {
    val st = new ConfusionState
    val preds = Seq("cat", "ant", "cat", "cat", "ant", "bird")
    val tgts = Seq("ant", "ant", "cat", "cat", "ant", "cat")
    preds.zip(tgts).foreach { case (p, t) => st.update(p, t, 0.0) }
    val (labels, c) = matrix(st)
    labels shouldBe Seq("ant", "bird", "cat")
    // matrix[pred][target] over sorted labels: [[2,0,0],[0,0,1],[1,0,2]]
    c(("ant", "ant")) shouldBe 2L
    c(("ant", "bird")) shouldBe 0L
    c(("ant", "cat")) shouldBe 0L
    c(("bird", "ant")) shouldBe 0L
    c(("bird", "bird")) shouldBe 0L
    c(("bird", "cat")) shouldBe 1L
    c(("cat", "ant")) shouldBe 1L
    c(("cat", "bird")) shouldBe 0L
    c(("cat", "cat")) shouldBe 2L
  }

  test("score moments accumulate per cell") {
    val st = new ConfusionState
    st.update("a", "a", 0.9)
    st.update("a", "a", 0.7)
    st.update("a", "b", 0.1)
    val m = st.cells(("a", "a"))
    m.count shouldBe 2L
    m.sum shouldBe 1.6 +- 1e-12
    m.min shouldBe 0.7
    m.max shouldBe 0.9
  }

  test("serialization round-trip preserves cells") {
    val st = new ConfusionState
    st.update("x", "y", 0.5)
    st.update("y", "x", 0.25)
    val back = ConfusionState.deserialize(st.serialize())
    back.cells.keySet shouldBe st.cells.keySet
    back.cells(("x", "y")).sum shouldBe 0.5
  }
}
