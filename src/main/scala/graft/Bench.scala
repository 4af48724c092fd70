package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen compiler, parquet footers, shuffle
    // infra, window/generate/join codegen paths) so the first timed
    // queries don't absorb one-time JIT costs — r1 showed the first
    // heavy queries in sort order paying multi-second compile storms
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val warmSf = "/root/testdata/sf0.001"
    Seq("q_dedup_exact", "q_win_rows", "q_events_sessionize", "q_inner_join")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, warmSf)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $q failed: ${e.getMessage}")
        }
      }
    // release whatever a query pinned (dedup pipelines cache shingle
    // tables; CC loops leave localCheckpoint RDDs) and force a full GC
    // so the next query's timing doesn't pay this one's garbage — the
    // r2 bench showed a 2-5× band on untouched queries that ran right
    // after the heavy tail, which made real regressions undiagnosable
    def settle(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      System.gc()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min over 3 passes: pass 1 absorbs residual JIT/GC noise, the
      // min is the reproducible cost of the plan itself (the driver's
      // per-round comparisons need a low-variance statistic — totals
      // on this rig swing ±10% with machine load, which min-of-3
      // suppresses; a wall-clock average would keep that noise)
      val times = (1 to 3).map { _ =>
        settle()
        val t0 = System.nanoTime()
        // noop sink executes the full plan; count() would let Catalyst
        // prune the projected work and under-measure
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // a failed query reports -1, never a misleading partial elapsed time
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      (name, if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_of_3","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // Round 15 (VERDICT r14 item 2): the driver snapshots only the TAIL
    // of the sbt output, and the ~8 KB per-query line above has been
    // truncated mid-line in BENCH_r07/r13/r14 (parsed=null every time).
    // Emit a SECOND, compact closing line — total/count/failures only,
    // well under any tail window — so the driver's parse always finds
    // at least one complete JSON line. The full per-query map stays in
    // the big line (printed first, same format as every prior round)
    // and in the bench.json file written below.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"min_of_3","n":${results.size},"n_failed":${results.count(_._2 < 0)},"sf":"$sfDir"}"""
    println(compact)
    // ALSO persist to a file: the driver snapshots only the tail of
    // sbt output and has truncated the one-line JSON mid-line before
    // (BENCH_r07 parsed=null) — the file survives verbatim. The path
    // is env-overridable and logged ABSOLUTE so a run from another
    // cwd can't silently leave a stale repo-root snapshot looking
    // current.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json"))
      .toAbsolutePath
    try {
      java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] $outPath write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
