package graft
import org.apache.spark.sql.SparkSession

import graft.format.ReferenceOutput
import graft.pipeline.JaccardPipeline

/** The driver benchmark: one JSON record over every `SparkEntry`
  * query plus the reference-parity/curation/skew sentinels.
  *
  * SHARDED ACROSS JVMs since round 19: eight of rounds 9–18 burned a
  * verdict task proving some >1.5× per-entry swing was session
  * pressure, not a regression — block-manager/codegen/GC state that
  * accumulates over a 250-entry suite in one JVM and lands on
  * whichever entries run late (the full archaeology lives in
  * BASELINE.md). The per-entry hygiene (scrub + fresh session +
  * interleaved passes, below) bounded but never eliminated it, and it
  * scales with suite length. So the structural fix: the parent
  * process holds NO SparkContext and sequentially forks one child JVM
  * per shard (`SPARK_GRAFT_BENCH_SHARDS`, default 8; children are
  * never concurrent — a concurrent Spark JVM inflates common-entry
  * walls ~10%, the round-18 solo-run rule). Entry→shard assignment
  * hashes the entry NAME, so an entry keeps its shard (and its
  * per-JVM pressure window) as future rounds add entries; the five
  * sentinels pin to shard 0's head, preserving their same-window
  * round-over-round comparability. Each child runs the unchanged
  * measurement protocol over ~1/8 of the suite — short enough that
  * accumulated state stays in the regime where isolated A/B bands and
  * suite numbers have historically agreed.
  *
  * `SPARK_GRAFT_BENCH_SHARDS=1` reproduces the old single-JVM suite
  * (the A/B lever for validating the sharding itself).
  */
object Bench {
  /** Sentinel entries (reference parity, curation, skew) — the
    * round-over-round baseline signals. Pinned to shard 0, ahead of
    * its fixture entries, so they price in the same low-pressure
    * window every round (the round-9 finding: running them late
    * charged them the session's accumulated pressure).
    */
  private def sentinelNames(refNames: Seq[String]): Set[String] =
    refNames.toSet ++ Set("curation_documents", "jaccard_skew_hotword")

  private def shardOf(name: String, sentinels: Set[String],
                      k: Int): Int =
    if (sentinels(name)) 0 else math.abs(name.hashCode) % k

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nShards = sys.env.getOrElse("SPARK_GRAFT_BENCH_SHARDS", "8").toInt
    val shardEnv = sys.env.get("SPARK_GRAFT_BENCH_SHARD")
    if (shardEnv.isEmpty && nShards > 1) { runParent(sfDir, nShards); return }
    val (myShard, myK) = shardEnv match {
      case Some(s) =>
        val Array(i, k) = s.split('/'); (i.toInt, k.toInt)
      case None => (0, 1)
    }
    runSuite(sfDir, myShard, myK)
  }

  /** Fork one child JVM per shard (sequentially — never concurrent),
    * merge their records into the single driver-contract JSON line.
    * The parent creates no SparkContext: while a child measures, the
    * only other JVM alive is this idle process waiting on it.
    */
  private def runParent(sfDir: String, k: Int): Unit = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    // the forked sbt JVM's own flags (--add-opens set, -Xmx) — the
    // child must run Spark under the same module/memory regime
    val jvmFlags = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
      .toAbsolutePath.getParent
    java.nio.file.Files.createDirectories(outDir)
    val shardRecords: Seq[Option[String]] = (0 until k).map { i =>
      val shardOut = outDir.resolve(s"bench_shard_$i.json")
      java.nio.file.Files.deleteIfExists(shardOut)
      import scala.jdk.CollectionConverters._
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin)
      jvmFlags.asScala.foreach(f => { cmd.add(f); () })
      cmd.add("-cp"); cmd.add(sys.props("java.class.path"))
      cmd.add("graft.Bench")
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_SHARD", s"$i/$k")
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", shardOut.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.redirectErrorStream(true)
      val t0 = System.nanoTime()
      val p = pb.start()
      // forward the child's interleaved-pass log live; its stdout JSON
      // line is shard-partial, so everything goes to stderr — the
      // parent's stdout stays the one merged record
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      Iterator.continually(rd.readLine()).takeWhile(_ != null)
        .foreach(l => System.err.println(s"[shard $i] $l"))
      val code = p.waitFor()
      System.err.println(
        f"[bench] shard $i/$k exit=$code wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (code == 0 && java.nio.file.Files.exists(shardOut))
        Some(new String(java.nio.file.Files.readAllBytes(shardOut), "UTF-8"))
      else None
    }
    // merge: per-entry walls concatenate (shards are disjoint); any
    // missing/crashed shard records its entries as failed, so a dead
    // child can never read as a faster suite
    val perEntry = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val names = entryNames(sfDir)
    val sentinels = sentinelNames(
      names.filter(_.startsWith("jaccard_ref_")))
    shardRecords.zipWithIndex.foreach {
      case (Some(rec), _) =>
        val qs = "\"queries\":\\{([^}]*)\\}".r
          .findFirstMatchIn(rec).map(_.group(1)).getOrElse("")
        qs.split(',').filter(_.nonEmpty).foreach { kv =>
          val Array(n, v) = kv.split(':')
          perEntry(n.stripPrefix("\"").stripSuffix("\"")) = v.toDouble
        }
        "\"failed\":\\[([^\\]]*)\\]".r.findFirstMatchIn(rec)
          .map(_.group(1)).filter(_.nonEmpty).foreach(_.split(',')
            .foreach(f => failed += f.stripPrefix("\"").stripSuffix("\"")))
      case (None, i) =>
        names.filter(n => shardOf(n, sentinels, k) == i).foreach { n =>
          perEntry(n) = -1.0; failed += n
        }
    }
    // canonical order: sentinels first, then the alphabetical fixture
    val ordered = names.map(n => n -> perEntry.getOrElse(n, -1.0))
    val total =
      if (ordered.exists(_._2 < 0)) -1.0 else ordered.map(_._2).sum
    writeRecord(sfDir, ordered,
      ordered.filter(_._2 < 0).map(_._1) ++ failed.distinct
        .filterNot(f => ordered.exists(e => e._1 == f && e._2 < 0)),
      total, k)
  }

  /** The canonical entry-name order (sentinels, then the alphabetical
    * fixture) — computable without a SparkSession, shared by the
    * parent's merge and each child's filter.
    */
  private def entryNames(sfDir: String): Seq[String] = {
    val refs = Seq("small", "medium", "large")
      .filter(n => new java.io.File(s"/root/reference/datasets/$n.txt").isFile)
      .map(n => s"jaccard_ref_$n")
    refs ++ Seq("curation_documents", "jaccard_skew_hotword") ++
      SparkEntry.queries.keys.toSeq.sorted
  }

  private def writeRecord(sfDir: String, results: Seq[(String, Double)],
                          failed: Seq[String], total: Double,
                          shards: Int): Unit = {
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.distinct.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val record =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":4,"sentinel_runs":6,"agg":"min","interleaved":true,"shards":$shards,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(record)
    // Also persist the record to a file: the driver captures stdout as
    // a bounded log tail, which truncated the rounds 1-2 records. A
    // file is never clipped.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
      .toAbsolutePath
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, (record + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] record written to $out")
  }

  /** The measurement protocol, unchanged since round 5 (scrub + fresh
    * session per entry, two interleaved passes × two samples, min;
    * sentinels take a third in-pass sample), over this JVM's shard of
    * the suite.
    */
  private def runSuite(sfDir: String, myShard: Int, myK: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session (JVM JIT, codegen compiler, parquet reader,
    // shuffle machinery) with throwaway jobs so the first measured query
    // isn't charged for session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.groupBy(r.columns.head).count().collect()
      r.as("a").join(r.as("b"), r.columns.head).count()
      // the measured execution path: first noop write initializes the
      // DSv2 provider + write-side codegen, which would otherwise be
      // charged to the alphabetically-first query
      r.write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // A crashed query records -1 (distinguishable from any wall time);
    // any -1 later invalidates the whole headline total (see below), so
    // breakage can never read as speed.
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch {
        case t: Throwable =>
          System.err.println(s"[bench] query FAILED: $t")
          -1.0
      }
    }

    // Execute through the noop sink, NOT .count(): wrapping a query in
    // Aggregate(count(1)) lets Catalyst prune every unused projection and
    // drop the final sort, so projection-heavy queries (simhash, md5
    // fingerprints, scalar funcs) would be timed as bare row-count scans
    // without ever running the work they claim to measure. The noop write
    // consumes every output column.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Round-3's record showed min-of-two BACK-TO-BACK runs is not enough:
    // q11_rollup recorded 11.45 s and q23_jac_sim 7.15 s while isolated
    // runs of the identical plans measure ~1.0 s / ~1.3 s. Two causes,
    // both fixed here:
    //   1. cross-query session state: iterative queries `localCheckpoint`
    //      frames that were never unpersisted, and every query leaves
    //      broadcasts + temp views behind — accumulation turns into
    //      block-manager/GC pressure charged to whichever queries run
    //      late. `scrub()` below drops persisted RDDs, clears the
    //      (shared) cache, and gives the ContextCleaner a GC to act on,
    //      BETWEEN timed regions; each entry also runs in a fresh
    //      `newSession()` so temp views don't pile up.
    //   2. back-to-back sampling: one host-contention window inflates
    //      both samples of the same query. The two runs are
    //      INTERLEAVED (the full shard runs twice, per-query min across
    //      passes), so a contention event must span the whole shard to
    //      corrupt a min.
    // BLOCKING unpersist: the async form lets the block-manager delete
    // work (checkpointed frames from iterative queries, cached plans)
    // land inside the NEXT query's timed region — the round-4/5 record
    // distortion where queries were charged their predecessors' cleanup
    def scrub(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }

    // Every entry is a thunk over a FRESH session (temp-view isolation);
    // the SparkContext (and its warmed-up executors/codegen cache) is
    // shared, which is what makes per-query numbers comparable.
    type Entry = (String, SparkSession => Unit)
    val fixture: Seq[Entry] = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => name -> ((s: SparkSession) => exec(fn(s, sfDir)))
    }
    // Reference-parity pipeline on the reference's own corpora, end to end
    // including the formatted+sorted output (BASELINE.md compares these to
    // the 1-DN MapReduce wall times: 5.97 / 8.00 / 10.09 s).
    val refDatasets: Seq[Entry] = Seq("small", "medium", "large").flatMap { name =>
      val path = s"/root/reference/datasets/$name.txt"
      if (new java.io.File(path).isFile)
        Some(s"jaccard_ref_$name" -> ((s: SparkSession) =>
          ReferenceOutput.collectSorted(JaccardPipeline.run(s, path)): Unit))
      else None
    }
    // end-to-end curation cascade (quality → exact dedup → near dedup)
    // over the documents fixture (language gate off: the synthetic corpus
    // is not natural language)
    val curation: Seq[Entry] = Seq("curation_documents" -> ((s: SparkSession) => {
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
      graft.pipeline.CurationPipeline
        .run(docs, "doc_id", "text", languages = Set.empty).counts
      ()
    }))
    // skew stress (SURVEY §7.4 risk #2): 20k synthetic docs that ALL
    // share one hot token — unpruned, the pair stage would emit 2*10^8
    // pairs; df-pruning keeps it bounded (the unique tokens pair nothing,
    // so the measured work is the df computation + the pruned join).
    val skew: Seq[Entry] = Seq("jaccard_skew_hotword" -> ((s: SparkSession) => {
      import org.apache.spark.sql.functions._
      val docs = s.range(20000).select(
        col("id").cast("string").as("docId"),
        concat_ws(" ", lit("hotzz"),
          concat(lit("a"), col("id")), concat(lit("b"), col("id")),
          concat(lit("c"), col("id")), concat(lit("d"), col("id"))).as("text"))
      // count() is correct HERE: the point is the pair-stage cardinality
      val n = graft.operators.Jaccard.allPairs(docs,
        maxDocFrequency = Some(1000L)).count()
      require(n == 0L, s"pruned skew corpus must yield no pairs, got $n")
    }))
    // SENTINELS FIRST (see the object scaladoc: shard 0's head), then
    // the alphabetical fixture — filtered to THIS JVM's shard
    val sentinels: Set[String] =
      sentinelNames(refDatasets.map(_._1))
    val entries: Seq[Entry] =
      (refDatasets ++ curation ++ skew ++ fixture).filter {
        case (name, _) => shardOf(name, sentinels, myK) == myShard
      }

    // Two interleaved passes × two back-to-back samples per entry =
    // min of 4. The interleaving defends against a host-contention
    // window inflating one region; the in-pass repeat prices the plan
    // WARM (first sample pays per-session planning + codegen compile,
    // the second measures the execution the plan costs at steady
    // state). A crash in any sample records -1 so breakage can never
    // read as speed.
    //
    // SENTINELS take a THIRD in-pass sample (min of 6): they are the
    // round-over-round baseline signals, and two consecutive driver
    // rounds (r08 skew +120%, r09 curation +44%) flagged sentinel
    // drifts that plan-histogram profiling proved were session-wide
    // wall offsets on byte-identical plans (BASELINE.md). One more
    // warm sample per pass makes a sentinel's min robust to a
    // transient inside any single sample window at a cost of a few
    // seconds per round.
    val passes: Seq[Map[String, Double]] = (1 to 2).map { pass =>
      entries.map { case (name, run) =>
        scrub() // outside the timed region
        val sess = spark.newSession()
        // pre-warm the fresh session's state (SessionState build, parser,
        // first-use codepaths) so it isn't charged to the first sample
        sess.range(2L).selectExpr("sum(id)").collect()
        val samples = Seq.fill(if (sentinels(name)) 3 else 2)(
          timed(run(sess)))
        val t = if (samples.exists(_ < 0)) -1.0 else samples.min
        System.err.println(
          f"[bench] pass $pass $name%-28s " +
            samples.map(s => f"$s%8.3f").mkString(" / ") + " s")
        name -> t
      }.toMap
    }
    val results: Seq[(String, Double)] = entries.map { case (name, _) =>
      val samples = passes.map(_(name))
      name -> (if (samples.exists(_ < 0)) -1.0 else samples.min)
    }
    // any crashed query invalidates the headline total (value -1): a
    // smaller-because-broken total must never read as a speedup in
    // round-over-round comparisons
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = if (failed.nonEmpty) -1.0 else results.map(_._2).sum
    writeRecord(sfDir, results, failed, total, myK)
    spark.stop()
  }
}
