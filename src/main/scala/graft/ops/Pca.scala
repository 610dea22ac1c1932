package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the linear
  * companion to the non-linear compressors in [[Similarity]]
  * (Matryoshka truncation, JL random projection): where those pick a
  * subspace blindly, PCA picks the variance-optimal one, and the
  * eigen-spectrum itself is a corpus diagnostic (intrinsic
  * dimensionality, anisotropy of the representation).
  *
  * Scale shape: the moment pass reduces the whole corpus in ONE
  * map-side-combined aggregate whose state is d + d(d+1)/2 + 1 doubles
  * (mean vector + upper-triangular second-moment + count) — for d=64
  * that is ~17 KB per partition, independent of row count; no vector
  * ever shuffles. The eigensolve then runs on the DRIVER over the d×d
  * matrix (constant-bounded collect, same pattern as the IVF codebook
  * fit), and projection is a row-local broadcast-literal dot product.
  */
object Pca {

  /** Long-form sample covariance of the embedding dimensions: one row
    * per (i, j) pair with i <= j. Exactly SQL-oracle-able
    * (`covar_samp` over exploded dims). NULL embeddings drop.
    */
  def covMatrix(df: DataFrame, embCol: String): DataFrame = {
    val e = col(embCol).cast("array<double>")
    val outer = flatten(transform(e, x => transform(e, y => x * y)))
    val agg = df.filter(col(embCol).isNotNull).agg(
      graft.functions.vec_sum(e).as("__s"),
      graft.functions.vec_sum(outer).as("__o"),
      count(lit(1)).as("__n"))
    val d = size(col("__s"))
    agg
      .select(col("__s"), col("__n"), d.as("__d"),
        posexplode(col("__o")).as(Seq("__k", "__oxy")))
      .select(
        (col("__k") / col("__d")).cast("long").as("i"),
        (col("__k") % col("__d")).cast("long").as("j"),
        ((col("__oxy") -
          element_at(col("__s"), (col("__k") / col("__d")).cast("int") + 1) *
          element_at(col("__s"), (col("__k") % col("__d")).cast("int") + 1) /
          col("__n")) / (col("__n") - 1)).as("cov"))
      .filter(col("i") <= col("j"))
  }

  /** Fitted model: mean, descending eigenvalues, row-major components
    * (components(k) is the k-th eigenvector), all deterministic — the
    * Jacobi sweep order is fixed and each eigenvector's sign is
    * canonicalized (largest-|coefficient| entry positive, first index
    * winning ties).
    */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def d: Int = mean.length
  }

  /** Fit by cyclic Jacobi rotation on the driver-collected d×d sample
    * covariance — O(d^3) per sweep on constant-size data (d is the
    * embedding width, never the corpus). Convergence to off-diagonal
    * Frobenius < 1e-12 or 64 sweeps.
    */
  def fit(df: DataFrame, embCol: String): PcaModel = {
    val e = col(embCol).cast("array<double>")
    val outer = flatten(transform(e, x => transform(e, y => x * y)))
    val row = df.filter(col(embCol).isNotNull).agg(
      graft.functions.vec_sum(e).as("s"),
      graft.functions.vec_sum(outer).as("o"),
      count(lit(1)).as("n")).collect()(0)
    val s = row.getSeq[Double](0).toArray
    val o = row.getSeq[Double](1).toArray
    val n = row.getLong(2).toDouble
    val d = s.length
    require(n > 1, s"PCA needs >1 row, got $n")
    val mean = s.map(_ / n)
    val a = Array.tabulate(d, d)((i, j) =>
      (o(i * d + j) - s(i) * s(j) / n) / (n - 1))
    val (evals, evecs) = jacobiEigen(a)
    // sort descending, canonicalize signs
    val order = evals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    val eigenvalues = order.map(evals(_))
    val components = order.map { k =>
      val v = Array.tabulate(d)(i => evecs(i)(k))
      val mi = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(mi) < 0) v.map(-_) else v
    }
    PcaModel(mean, eigenvalues, components)
  }

  /** Classic cyclic Jacobi for a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). Deterministic sweep order.
    */
  private[ops] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign(0) must be +1 here: equal diagonal entries need the
            // full 45-degree rotation, not a no-op
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sN = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - sN * aiq
              a(i)(q) = sN * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - sN * aqi
              a(q)(i) = sN * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sN * viq
              v(i)(q) = sN * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Project onto the top-k components: output = input columns plus a
    * `k`-length `pca` array column. The model ships as broadcast
    * literals; scoring is a row-local zip_with dot — zero shuffle.
    */
  def project(df: DataFrame, embCol: String, model: PcaModel,
      k: Int): DataFrame = {
    require(k >= 1 && k <= model.d, s"k=$k out of range 1..${model.d}")
    val meanLit = array(model.mean.map(lit(_)).toIndexedSeq: _*)
    val centered = zip_with(col(embCol).cast("array<double>"), meanLit,
      (x, mu) => x - mu)
    val scores = (0 until k).map { i =>
      val compLit = array(model.components(i).map(lit(_)).toIndexedSeq: _*)
      aggregate(zip_with(centered, compLit, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn("pca", array(scores.toIndexedSeq: _*))
  }

  /** PCA-whitened projection: [[project]] scores divided by
    * sqrt(eigenvalue + eps), so the output coordinates have unit
    * variance and zero covariance (ZCA-less whitening — the usual
    * preprocessing before cosine/linear probes when raw dimensions
    * carry wildly different energy). Same row-local broadcast-literal
    * shape as [[project]]; components with near-zero eigenvalues are
    * tamed by `eps` rather than exploding.
    */
  def whiten(df: DataFrame, embCol: String, model: PcaModel, k: Int,
      eps: Double = 1e-9): DataFrame = {
    require(k >= 1 && k <= model.d, s"k=$k out of range 1..${model.d}")
    val scales = (0 until k)
      .map(i => 1.0 / math.sqrt(math.max(model.eigenvalues(i), 0.0) + eps))
    val scaleLit = array(scales.map(lit(_)).toIndexedSeq: _*)
    project(df, embCol, model, k)
      .withColumn("pca", zip_with(col("pca"), scaleLit, (s, w) => s * w))
  }

  /** Explained-variance report from a fitted model: one row per
    * component with the eigenvalue, the variance ratio, and the
    * cumulative ratio (clamped to d rows; negative round-off
    * eigenvalues floor at 0 for the ratios).
    */
  def explainedVariance(spark: org.apache.spark.sql.SparkSession,
      model: PcaModel): DataFrame = {
    import spark.implicits._
    val total = model.eigenvalues.map(math.max(_, 0.0)).sum
    var cum = 0.0
    model.eigenvalues.zipWithIndex.map { case (ev, i) =>
      val ratio = if (total > 0) math.max(ev, 0.0) / total else 0.0
      cum += ratio
      (i.toLong, ev, ratio, cum)
    }.toSeq.toDF("component", "eigenvalue", "variance_ratio", "cum_ratio")
  }
}
