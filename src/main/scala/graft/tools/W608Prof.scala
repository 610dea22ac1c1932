package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object W608Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("w608").getOrCreate()
    import graft.profile.ProfileSession._
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val numeric = Seq("l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val wide = li.select((0 until 608).map(i =>
      (col(numeric(i % numeric.length)) + lit(i)).as(s"c$i")): _*)
    val df = wide.newProfilingSession().aggProfiles()
    // warm pass
    var t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"pass1 ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"pass1b-reduceonly ${(System.nanoTime()-t0)/1e9}%.2f s")
    // fresh plan for the sampled pass: full map+reduce recompute
    val df2 = wide.newProfilingSession().aggProfiles()
    // sampled pass
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        Thread.sleep(50)
        val tm = java.lang.management.ManagementFactory.getThreadMXBean
        tm.dumpAllThreads(false, false).foreach { ti =>
          if (ti.getThreadName.startsWith("Executor task launch")) {
            val st = ti.getStackTrace
            if (st.nonEmpty) {
              // find the highest graft/datasketches frame, else top frame
              val interesting = st.find(f =>
                f.getClassName.startsWith("graft.") ||
                f.getClassName.startsWith("org.apache.datasketches") ||
                f.getClassName.contains("FloatingDecimal") ||
                f.getClassName.contains("UnsafeRow"))
              val key = interesting.getOrElse(st(0)).toString
              samples.merge(key, 1, (a, b) => a + b)
            }
          }
        }
      }
    })
    sampler.setDaemon(true); sampler.start()
    t0 = System.nanoTime()
    df2.queryExecution.toRdd.count()
    println(f"pass2-full ${(System.nanoTime()-t0)/1e9}%.2f s")
    stop = true
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) =>
      println(f"$v%6d  $k")
    }
    spark.stop()
  }
}
