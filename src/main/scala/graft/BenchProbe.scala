package graft

import org.apache.spark.sql.SparkSession

/** Floor diagnostic for the short queries: splits steady-state wall time
  * into PLAN (analysis + optimization + physical planning, driver-side)
  * and EXEC (job submission through result materialization), attributing
  * the sf0.1 per-query constant that keeps sub-300 ms queries above their
  * scaled bounds (README "sf0.1 caveat"). Same session config as
  * [[Bench]]; median of 5 after 2 warmups, one line per query.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", "8").toInt
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_BENCH_SHUFFLE", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Q.cacheTables(spark, sfDir, parts)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q6", "q2", "q11", "q16", "q22")
    def once(n: String): (Double, Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.executedPlan // forces analysis→physical planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e6, (t2 - t1) / 1e6)
    }
    // Iteration-MAJOR (one full pass over all queries per sample), matching
    // Bench's protocol, so the per-sample constant measured here is the one
    // the headline artifact pays when queries interleave.
    (1 to 2).foreach(_ => names.foreach(once)) // JIT + codegen warmup
    val passes = Seq.fill(5)(names.map(n => n -> once(n)).toMap)
    names.foreach { n =>
      val plan = passes.map(_(n)._1).sorted.apply(2)
      val exec = passes.map(_(n)._2).sorted.apply(2)
      println(f"[probe] $n%-4s plan=$plan%6.1f ms  exec=$exec%6.1f ms  total=${plan + exec}%6.1f ms")
    }
    spark.stop()
  }
}
