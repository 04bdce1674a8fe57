package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main.
  *
  * PRIMARY MODE (default): a supervisor that forks ONE FRESH JVM PER QUERY,
  * sequentially, and reports each query's median-of-3 from its own isolated
  * JVM as the primary JSON line. Shared-JVM numbers proved untrustworthy:
  * on identical bytecode, neighbors' cached state, GC pressure, and codegen
  * cache churn swung individual queries 4-8x between rounds with no code
  * change, in both directions. Isolation removes the interference at the
  * cost of JVM+session startup per query; startup is NOT timed — each child
  * warms up with one untimed run of its query at the target scale factor
  * before the timed runs.
  *
  * CHILD MODE (SPARK_GRAFT_BENCH_CHILD=1, internal): runs the queries named
  * in SPARK_GRAFT_BENCH_ONLY in-process and prints the same JSON line.
  *
  * TRIAGE MODE (SPARK_GRAFT_BENCH_INPROC=1): the old shared-JVM in-process
  * run over all (or SPARK_GRAFT_BENCH_ONLY-filtered) queries — fast, but
  * interference-dominated; use only for quick relative iteration.
  *
  * SPARK_GRAFT_BENCH_ONLY=q1,q8 restricts any mode to the named queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (name, _) => names.contains(name) })
    val child = sys.env.get("SPARK_GRAFT_BENCH_CHILD").contains("1")
    val inproc = sys.env.get("SPARK_GRAFT_BENCH_INPROC").contains("1")
    if (child || inproc) runInProcess(selected, targetSfWarmup = child)
    else runForked(selected)
  }

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  /** Millisecond resolution keeps the full 72-query line under ~2 KB so a
    * consumer that only retains a bounded stdout tail still captures (and
    * can parse) the whole map — round 11's artifact lost its head to
    * exactly that truncation.
    */
  private def fmt(v: Double): String =
    if (v < 0) "-1.0" else f"$v%.3f"

  private[graft] def jsonLine(results: Seq[(String, Double)],
      spreads: Map[String, (Double, Double)] = Map.empty): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val disp =
      if (spreads.isEmpty) ""
      else results.flatMap { case (k, _) => spreads.get(k).map(s =>
          "\"" + k + "\":[" + fmt(s._1) + "," + fmt(s._2) + "]") }
        .mkString(""","dispersion":{""", ",", "}")
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$disp,"sf":"$sfDir"}"""
  }

  /** Emit the combined line AND persist it to BENCH_LOCAL.json: the line
    * is the driver's contract, but harness captures have truncated long
    * lines before (the per-query head was lost in round 11) — the file
    * keeps a complete machine-readable copy for auditing. Children
    * (one-query forks) skip the file.
    */
  private def emit(results: Seq[(String, Double)],
      spreads: Map[String, (Double, Double)] = Map.empty): Unit = {
    // The stdout contract line stays lean (round 11's harness truncated a
    // long line); per-query dispersion ([min, max] of the timed runs —
    // same-code spread is the noise band any cross-round comparison must
    // clear) rides only in child lines (parent parses them) and in the
    // persisted BENCH_LOCAL.json audit copy.
    val line = jsonLine(results)
    // Only full-registry runs persist: a SPARK_GRAFT_BENCH_ONLY-filtered
    // iteration must not clobber the complete checked-in map. The FILE
    // copy (not the stdout contract line) is stamped with the measured
    // HEAD sha and a wall-clock timestamp so the artifact is
    // self-evidencing — a stale or hand-bumped map is detectable.
    if (!sys.env.contains("SPARK_GRAFT_BENCH_CHILD") &&
        !sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) {
      val sha = try {
        val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
        if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
      } catch { case _: Exception => "unknown" }
      val stamped = jsonLine(results, spreads).dropRight(1) +
        s""","commit":"$sha","generatedAtMs":${System.currentTimeMillis()}}"""
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_LOCAL.json"), stamped + "\n")
      catch { case _: Exception => () } // read-only cwd must not kill the line
      println(line)
    } else println(jsonLine(results, spreads)) // child/filtered: tiny line
  }

  // ---------------------------------------------------------------- forked

  /** Fork `java -cp <this classpath> graft.Bench` once per query with
    * SPARK_GRAFT_BENCH_CHILD=1 + SPARK_GRAFT_BENCH_ONLY=<name>, parse the
    * child's JSON line, and emit the combined line. Children run strictly
    * sequentially so they never compete for the box.
    */
  private def runForked(selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]): Unit = {
    val javaBin = new java.io.File(new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    // Resolve the classpath from the live classloader chain, not
    // java.class.path: under sbt the app classpath lives in layered custom
    // classloaders (project classes, dependency jars, the scala library)
    // and the system property only names the sbt launcher.
    def urlsOf(cl: ClassLoader): Seq[String] = cl match {
      case null => Nil
      case u: java.net.URLClassLoader =>
        u.getURLs.toSeq.flatMap(x => scala.util.Try(new java.io.File(x.toURI).getPath).toOption) ++ urlsOf(u.getParent)
      case other => urlsOf(other.getParent)
    }
    def codeSource(c: Class[_]): Option[String] =
      Option(c.getProtectionDomain.getCodeSource)
        .flatMap(s => scala.util.Try(new java.io.File(s.getLocation.toURI).getPath).toOption)
    val entries = (urlsOf(Bench.getClass.getClassLoader) ++
      codeSource(Bench.getClass) ++
      codeSource(classOf[scala.Function1[_, _]]) ++ // scala-library
      codeSource(classOf[SparkSession]) ++
      sys.props("java.class.path").split(java.io.File.pathSeparator).filter(_.nonEmpty)).distinct
    val cp = entries.mkString(java.io.File.pathSeparator)
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()
      .split("\\s+").filter(_.nonEmpty).toSeq
    val heap = sys.env.getOrElse("SPARK_GRAFT_CHILD_HEAP", "24g")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_CHILD_TIMEOUT", "900").toLong
    val names = selected.keys.toSeq
    val completed = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val spreads = scala.collection.mutable.Map[String, (Double, Double)]()
    names.foreach { name =>
      val cmd = (Seq(javaBin, s"-Xmx$heap", "-XX:+UseG1GC") ++ moduleOpts ++
        Seq("-cp", cp, "graft.Bench")).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      // Stdout goes to a temp file, not a pipe drained on this thread: a
      // wedged child that keeps stdout open would block a pipe drain to EOF
      // forever and the timeout below would never be reached.
      val outFile = java.io.File.createTempFile("graft-bench-child-", ".out")
      pb.redirectOutput(outFile)
      val proc = pb.start()
      val finished = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) { proc.destroyForcibly(); proc.waitFor() }
      val out = {
        val src = scala.io.Source.fromFile(outFile)
        try src.getLines().toList finally src.close()
      }
      outFile.delete()
      val childLine = out.reverseIterator.find(_.startsWith("{\"metric\""))
        .filter(_ => finished && proc.exitValue() == 0)
      val sec = childLine.flatMap { line =>
        val re = ("\"" + java.util.regex.Pattern.quote(name) + "\":(-?[0-9.eE+]+)").r
        re.findFirstMatchIn(line).map(_.group(1).toDouble)
      }.getOrElse(-1.0)
      childLine.foreach { line =>
        val re = ("\"dispersion\":\\{\"" + java.util.regex.Pattern.quote(name) +
          "\":\\[(-?[0-9.eE+]+),(-?[0-9.eE+]+)\\]").r
        re.findFirstMatchIn(line).foreach(m =>
          spreads(name) = (m.group(1).toDouble, m.group(2).toDouble))
      }
      if (sec < 0) System.err.println(s"[bench] $name: child failed (rc=${if (finished) proc.exitValue() else "timeout"})")
      else System.err.println(f"[bench] $name: $sec%.3f s (isolated)")
      completed += (name -> sec)
      // A cumulative line after EVERY child: consumers take the last JSON
      // line on stdout, so a run killed by an external timeout still
      // reports every query measured before the kill instead of nothing.
      emit(completed.toSeq, spreads.toMap)
      System.out.flush()
    }
  }

  // ------------------------------------------------------------ in-process

  /** `targetSfWarmup`: warm up by running each query once UNTIMED at the
    * target scale factor instead of the sf0.001 sweep + parquet pre-reads.
    * Used by forked children (one query each): it warms exactly the plan,
    * JIT paths, and page-cache bytes the timed runs touch, and costs one
    * extra query execution instead of a full small-sf pass — keeping the
    * per-child (JVM fork) overhead low enough to fork 57 of them.
    */
  private def runInProcess(
      selected: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
      targetSfWarmup: Boolean = false): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Let AQE re-plan (coalesce) the shuffles that feed cached frames:
      // iterative operators (dedup clustering) cache tiny per-round edge
      // sets, and without this flag every one of those rounds shuffles at
      // the full spark.sql.shuffle.partitions with near-empty tasks.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: run each selected query once at the smallest scale
    // factor so the timed numbers measure steady-state throughput, not
    // whole-stage codegen compilation and JIT warmup of each plan shape
    // (first-vs-second run of the heaviest query differs ~5x from compile
    // alone).
    if (targetSfWarmup) {
      selected.foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    } else {
      val warmupDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir) {
        selected.foreach { case (_, fn) =>
          try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
      }
      new java.io.File(sfDir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => try spark.read.parquet(f.getPath).count()
          catch { case _: Throwable => () })
    }
    // Median of 3 timed runs per query: absorbs a one-off slow run (GC,
    // page-cache miss) without hiding a real regression.
    val Runs = 3
    val results = selected.toSeq.map { case (name, fn) =>
      val times = (1 to Runs).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink materializes every output column (count() would let
        // Catalyst prune the computed columns away and under-measure).
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      // Failure marker: never report a failing query as a fast one.
      val median = if (times.size < Runs) -1.0 else times.sorted(Ordering.Double.TotalOrdering)(Runs / 2)
      (name, median, times)
    }
    val spreads = results.collect {
      case (name, median, times) if median >= 0 && times.nonEmpty =>
        name -> (times.min, times.max)
    }.toMap
    emit(results.map { case (n, m, _) => (n, m) }, spreads)
    spark.stop()
  }
}
