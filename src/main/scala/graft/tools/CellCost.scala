package graft.tools
import graft.metrics.{ColumnProfileState, ProfileConfig}
object CellCost {
  def run(tag: String, cfg: ProfileConfig, n: Int): Unit = {
    val st = new ColumnProfileState(cfg)
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) { st.trackDouble((i % 1000000).toDouble / 997.0); i += 1 }
    println(f"$tag%-28s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/cell")
  }
  def runLong(tag: String, cfg: ProfileConfig, n: Int): Unit = {
    val st = new ColumnProfileState(cfg)
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) { st.trackLong((i % 1000000).toLong - 500000L); i += 1 }
    println(f"$tag%-28s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/cell")
  }
  def runIntegralDouble(tag: String, cfg: ProfileConfig, n: Int): Unit = {
    val st = new ColumnProfileState(cfg)
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) { st.trackDouble((i % 1000000).toDouble); i += 1 }
    println(f"$tag%-28s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/cell")
  }
  /** low-cardinality floors: the r17 repeat-value memo turns the render
    * + HLL + theta work into a probe once a column's values repeat
    */
  def runLowCard(tag: String, cfg: ProfileConfig, n: Int, card: Int): Unit = {
    val st = new ColumnProfileState(cfg)
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) { st.trackDouble((i % card).toDouble + 0.05); i += 1 }
    println(f"$tag%-28s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/cell")
  }
  def runLowCardLong(tag: String, cfg: ProfileConfig, n: Int, card: Int): Unit = {
    val st = new ColumnProfileState(cfg)
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) { st.trackLong((i % card).toLong); i += 1 }
    println(f"$tag%-28s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/cell")
  }
  def runString(tag: String, cfg: ProfileConfig, n: Int, card: Int): Unit = {
    val st = new ColumnProfileState(cfg)
    val pool = (0 until card).map(i => s"enum_$i").toArray
    var i = 0
    val t0 = System.nanoTime()
    while (i < n) { st.trackString(pool(i % card)); i += 1 }
    println(f"$tag%-28s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/cell")
  }
  def main(args: Array[String]): Unit = {
    val n = 5000000
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      run("full default", ProfileConfig(), n)
      runLong("full long cells", ProfileConfig(), n)
      runIntegralDouble("full integral-double", ProfileConfig(), n)
      runLowCard("lowcard-16 fractional", ProfileConfig(), n, 16)
      runLowCardLong("lowcard-16 long", ProfileConfig(), n, 16)
      runString("lowcard-8 string", ProfileConfig(), n, 8)
      runString("highcard string", ProfileConfig(), n, 1000000)
      run("no hll", ProfileConfig(withHll = false), n)
      run("no freq", ProfileConfig(withFreqItems = false), n)
      run("no hll+freq (no strings)", ProfileConfig(withHll = false, withFreqItems = false), n)
      run("no kll", ProfileConfig(withKll = false), n)
      run("no theta", ProfileConfig(withTheta = false), n)
      run("counts only", ProfileConfig(withKll = false, withTheta = false, withHll = false, withFreqItems = false), n)
    }
  }
}
