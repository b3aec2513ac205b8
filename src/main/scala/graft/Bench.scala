package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the driver-supplied
  * scale factor and prints ONE JSON line.
  *
  * Each query runs three times and reports the per-query MIN. The first
  * pass doubles as JVM/codegen warm-up; the passes traverse the query
  * list in alternating order (forward, reverse, forward) so a transient
  * host-load spike cannot inflate the same queries in every pass —
  * min-of-3 over interleaved passes damps the scheduler noise of a
  * loaded local[32] host. A trivial action warms the session first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warm-up: scan + shuffle + codegen once before timing
    spark.range(1000000).selectExpr("sum(id)").collect()

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val passes = Seq(names, names.reverse, names)
      .map(order => order.map(n => n -> once(n)).toMap)
    val results = names.map { n =>
      val ts = passes.map(_(n))
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }

    // Host-speed calibration: a fixed, data-independent workload (sha256
    // over 2M synthetic rows, the dominant primitive of the hash-family
    // queries). Host/VM speed varies across rounds; dividing totals by
    // this number normalizes cross-round comparisons.
    val calT0 = System.nanoTime()
    spark.range(2000000)
      .selectExpr("count(distinct sha2(cast(id as string), 256))").collect()
    val calibration = (System.nanoTime() - calT0) / 1e9

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Full-precision record. The driver keeps only the LAST 2000 chars
    // of stdout, and this line exceeds that window once the suite has
    // ~90 queries (r1-r4: the driver's parsed field was null every
    // round for exactly this reason) — so the calibration field goes
    // LAST (it survives the window) and a compact line follows.
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","calibration_sha2m_sec":$calibration}"""
    println(full)
    // Compact final line, guaranteed inside the tail window: headline
    // queries only (>=0.1s — below that, scheduler jitter dominates
    // the signal), 2-decimal values, short sf. A tail-window parser
    // finds this complete object; full per-query data stays above.
    def f2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val headline = results.filter { case (_, v) => v >= 0.1 }
      .map { case (k, v) => "\"" + k + "\":" + f2(v) }
      .mkString("{", ",", "}")
    val sfName = sfDir.split('/').last
    println(s"""{"metric":"total","value":${f2(total)},"unit":"sec","queries":$headline,"sf":"$sfName","calibration_sha2m_sec":${f2(calibration)}}""")
    // Also persist the full-precision record to a file in the repo so
    // nothing ever has to recover it from a truncated stdout tail
    // (sbt's "[success]" banner trails the compact line, so even a
    // last-line parser can miss it).
    // anchor beside this class's source tree when launched from the
    // repo (sbt runs from the project root), overridable for other cwds
    val benchPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    try java.nio.file.Files.write(benchPath,
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { // stdout stays the primary channel; never mask fatal errors
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not persist $benchPath: $e")
    }
    spark.stop()
  }
}
