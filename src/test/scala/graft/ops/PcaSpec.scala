package graft.ops

import graft.SparkSuiteBase
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** PCA: eigensolver pinned on hand matrices, fit invariants
  * (orthonormality, descending spectrum, Av = lambda v), projection
  * variance = eigenvalue, full-rank reconstruction, covariance op
  * agreement with the fitted matrix.
  */
class PcaSpec extends AnyFunSpec with SparkSuiteBase {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  describe("jacobiEigen") {
    it("solves a hand 2x2: [[2,1],[1,2]] has eigenvalues 3 and 1") {
      val (ev, vec) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
      assert(ev.sorted.zip(Array(1.0, 3.0)).forall {
        case (a, b) => math.abs(a - b) < 1e-12 })
      // eigenvector for 3 is (1,1)/sqrt(2) up to sign
      val k = ev.indexWhere(v => math.abs(v - 3.0) < 1e-9)
      val v3 = Array(vec(0)(k), vec(1)(k))
      assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-12)
      assert(math.abs(v3(0) - v3(1)) < 1e-12)
    }
  }

  describe("fit") {
    // deterministic anisotropic cloud: dominant direction (3,1,0)/|.|,
    // secondary (−1,3,0)/|.|, nothing on dim 2
    val n = 40
    lazy val rows = (0 until n).map { i =>
      val t = math.sin(i * 1.7) * 3.0   // large spread
      val u = math.cos(i * 2.3) * 0.5   // small spread
      (i.toLong, Seq(3.0 * t - 1.0 * u, 1.0 * t + 3.0 * u, 0.0)
        .map(_.toFloat))
    }
    lazy val df = rows.toDF("vec_id", "embedding")
    lazy val model = Pca.fit(df, "embedding")

    it("eigenvalues descend and the basis is orthonormal") {
      assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
      for (i <- 0 until model.d; j <- i until model.d) {
        val expected = if (i == j) 1.0 else 0.0
        assert(math.abs(
          dot(model.components(i), model.components(j)) - expected) < 1e-10,
          s"component dot ($i,$j)")
      }
    }

    it("satisfies A v = lambda v against the covMatrix op's matrix") {
      val cov = Array.ofDim[Double](3, 3)
      Pca.covMatrix(df, "embedding").collect().foreach { r =>
        val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
        cov(i)(j) = c; cov(j)(i) = c
      }
      for (k <- 0 until 3) {
        val v = model.components(k)
        val av = Array.tabulate(3)(i => dot(cov(i), v))
        val resid = av.zip(v.map(_ * model.eigenvalues(k)))
          .map { case (a, b) => math.abs(a - b) }.max
        assert(resid < 1e-9, s"eigenpair $k residual $resid")
      }
    }

    it("third eigenvalue is ~0 (no variance on dim 2) and the top " +
        "component lies in the data plane") {
      assert(math.abs(model.eigenvalues(2)) < 1e-9)
      assert(math.abs(model.components(0)(2)) < 1e-9)
    }

    it("sign canonicalization: largest-|coeff| entry is positive") {
      model.components.foreach { v =>
        val mi = v.indices.maxBy(i => (math.abs(v(i)), -i))
        assert(v(mi) >= 0.0)
      }
    }
  }

  describe("project") {
    lazy val rows = (0 until 30).map { i =>
      (i.toLong, Seq(math.sin(i * 1.1) * 2, math.cos(i * 0.7),
        math.sin(i * 2.9) * 0.3).map(_.toFloat))
    }
    lazy val df = rows.toDF("vec_id", "embedding")
    lazy val model = Pca.fit(df, "embedding")

    it("per-component sample variance of the scores equals the eigenvalue") {
      val proj = Pca.project(df, "embedding", model, 3)
      val stats = proj.select(posexplode(col("pca")).as(Seq("k", "v")))
        .groupBy("k").agg(var_samp("v").as("v"), avg("v").as("m"))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      for (k <- 0 until 3) {
        assert(math.abs(stats(k)._1 - model.eigenvalues(k)) < 1e-8,
          s"variance of component $k")
        assert(math.abs(stats(k)._2) < 1e-10, s"scores centered, comp $k")
      }
    }

    it("full-rank projection preserves pairwise distances (rotation)") {
      val orig = df.select(col("vec_id"),
        col("embedding").cast("array<double>").as("e")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val proj = Pca.project(df, "embedding", model, 3).select("vec_id", "pca")
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val ids = orig.keys.toSeq.sorted.take(8)
      for (a <- ids; b <- ids if a < b) {
        def d2(m: Map[Long, Array[Double]]) = {
          val (x, y) = (m(a), m(b))
          x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
        }
        assert(math.abs(d2(orig) - d2(proj)) < 1e-9, s"pair ($a,$b)")
      }
    }

    it("k out of range is rejected") {
      intercept[IllegalArgumentException] {
        Pca.project(df, "embedding", model, 0)
      }
    }

    it("whitened scores have unit variance and zero cross-covariance") {
      val w = Pca.whiten(df, "embedding", model, 2)
        .select(col("vec_id"), col("pca")).collect()
        .map(r => r.getSeq[Double](1).toArray)
      val n = w.length
      for (i <- 0 until 2; j <- i until 2) {
        val mi = w.map(_(i)).sum / n
        val mj = w.map(_(j)).sum / n
        val cov = w.map(v => (v(i) - mi) * (v(j) - mj)).sum / (n - 1)
        val expected = if (i == j) 1.0 else 0.0
        assert(math.abs(cov - expected) < 1e-6, s"whitened cov ($i,$j)=$cov")
      }
    }
  }

  describe("plan shape") {
    it("covMatrix is one aggregation job: the only exchange carries the " +
        "moment buffer, vectors never shuffle") {
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val plan = Pca.covMatrix(df, "embedding")
        .queryExecution.executedPlan.toString
      assert(plan.split("Exchange").length - 1 == 1, plan.take(800))
    }

    it("project adds no exchange at all (row-local broadcast literals)") {
      val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val m = Pca.fit(df, "embedding")
      val plan = Pca.project(df, "embedding", m, 4)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
    }
  }

  describe("explainedVariance") {
    it("ratios sum to 1 and cumulate monotonically") {
      val df = (0 until 10).map(i =>
        (i.toLong, Seq(i.toFloat, (i * 2).toFloat))).toDF("vec_id", "embedding")
      val m = Pca.fit(df, "embedding")
      val rows = Pca.explainedVariance(spark, m).collect()
      val ratios = rows.map(_.getDouble(2))
      assert(math.abs(ratios.sum - 1.0) < 1e-12)
      val cums = rows.map(_.getDouble(3))
      assert(cums.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-12))
      assert(math.abs(cums.last - 1.0) < 1e-12)
    }
  }
}
