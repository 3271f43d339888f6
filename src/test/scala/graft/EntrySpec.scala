package graft

/** Guard for the driver contract: `entry` must run on a session we did
  * not configure (the external driver builds its own) and return rows. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 with an unprepared session") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => !r.isNullAt(0) && r.getDouble(2) >= 0.0))
  }

  test("every query name has either an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // EMPTY as of round 10: every query is oracle-checked. The last two
    // holdouts fell because their "not reproducible in SQL" premises
    // didn't survive scrutiny — the IVF family (q36/q56/q58) replays
    // search over the exported persisted index (only the k-means FIT
    // stays recall-graded, IvfIndexSpec), and the model seams (q39/q49)
    // are md5-derived BY CONSTRUCTION, so DuckDB's md5 + IEEE
    // float32/double arithmetic recompute them bit-for-bit.
    assert(noOracle == Set.empty[String])
    // and no orphan oracles
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("q207 CUSUM localizes a constructed rate shift at the last pre-shift bucket") {
    // type "up": 5 hourly buckets at 1 event/h then 5 at 5/h — T=10,
    // N=30, per-bucket terms n·T−N = −20 (low) / +20 (high), so the
    // CUSUM walks −20..−100 and back to 0: max |S| = 100 at bucket 4
    // (the LAST low hour — this operator's changepoint convention),
    // sign −1 = the prefix ran below the mean, i.e. the rate stepped
    // UP. Type "down" is the mirror: same |S| and bucket, sign +1.
    import spark.implicits._
    val rows = for {
      (tp, counts) <- Seq(
        ("up", Seq(1, 1, 1, 1, 1, 5, 5, 5, 5, 5)),
        ("down", Seq(5, 5, 5, 5, 5, 1, 1, 1, 1, 1)))
      (c, h) <- counts.zipWithIndex
      i <- 0 until c
    } yield (new java.sql.Timestamp((h * 3600L + 60L * i) * 1000L), tp)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-q207-").toString
    rows.toDF("ts", "event_type").write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q207_cusum_changepoint")(spark, dir)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getInt(3), x.getLong(4),
          x.getLong(5))).toMap
    assert(r("up") == ((4L * 3600L, 100L, -1, 10L, 30L)))
    assert(r("down") == ((4L * 3600L, 100L, 1, 10L, 30L)))
  }

  test("q53/q54 plans: no cartesian, no unbounded per-group collect") {
    for (q <- Seq("q53_jaccard_pairs", "q54_curation_pipeline")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Cartesian"), s"cartesian in $q plan:\n$plan")
      assert(!plan.contains("collect_set") && !plan.contains("collect_list"),
        s"unbounded per-group collect in $q plan:\n$plan")
    }
  }

  test("q83/q85 plans: no cartesian, q85 profile side broadcasts") {
    // q83 (dup spans): the span-key stats join must be a real equi-join
    // (corpus-scale both sides), never a cartesian, and nothing may
    // buffer per-group lists.
    val p83 = SparkEntry.queries("q83_dup_spans")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p83.contains("Cartesian") && !p83.contains("NestedLoop"),
      s"non-equi join in q83 plan:\n$p83")
    assert(!p83.contains("collect_set") && !p83.contains("collect_list"),
      s"unbounded per-group collect in q83 plan:\n$p83")
    // q85 (importance): both the 1-row totals and the 256-row rate
    // profile must reach their joins as broadcasts — the per-token
    // corpus side must never shuffle for a join (its only shuffle is
    // the per-doc aggregation).
    val p85 = SparkEntry.queries("q85_importance")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p85.contains("Cartesian"), s"cartesian in q85 plan:\n$p85")
    assert(!p85.contains("SortMergeJoin") &&
      !p85.contains("ShuffledHashJoin"),
      s"shuffled join in q85 plan (profile must broadcast):\n$p85")
  }

  test("q86/q88 plans: cluster-bounded pair join, broadcast boiler set") {
    // q86 (SemDeDup): the pair search must be an equi-join on the
    // cluster key — the clustering is what bounds the quadratic — and
    // never a cartesian; nothing may buffer per-cluster lists.
    val p86 = SparkEntry.queries("q86_semdedup")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p86.contains("Cartesian") && !p86.contains("NestedLoop"),
      s"non-equi pair join in q86 plan:\n$p86")
    assert(!p86.contains("collect_set") && !p86.contains("collect_list"),
      s"unbounded per-group collect in q86 plan:\n$p86")
    // q88 (boilerplate): the tiny boilerplate-gram set must join back to
    // the corpus-scale gram stream as a broadcast, and the gram-stats
    // join must never go cartesian.
    val p88 = SparkEntry.queries("q88_boilerplate")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p88.contains("Cartesian") && !p88.contains("NestedLoop"),
      s"non-equi join in q88 plan:\n$p88")
    assert(p88.contains("BroadcastHashJoin"),
      s"boiler join-back did not broadcast in q88 plan:\n$p88")
  }

  test("q51_decontam plan is bounded-state: no collect, shuffled semi join") {
    val plan = SparkEntry.queries("q51_decontam")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the round-4 shape held a collect_set buffer per gram — a hot-key
    // OOM at 100 TB on boilerplate grams. The rewrite must keep every
    // aggregation buffer scalar...
    assert(!plan.contains("collect_set") && !plan.contains("collect_list"),
      s"unbounded per-group collect in q51 plan:\n$plan")
    // ...and join test rows to the (corpus-scale) distinct train-gram
    // set with a shuffle, never a driver-sized broadcast.
    val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty, s"no semi join in q51 plan:\n$plan")
    assert(semiLines.forall(l => !l.contains("Broadcast")),
      s"broadcast semi join in q51 plan:\n$plan")
  }

  test("q209 prefilter leg prunes the probed cluster partitions") {
    // the prefilter strategy's whole value is that the metadata
    // predicate rides INSIDE a probe-pruned scan: the plan must show
    // a non-empty PartitionFilters on __ivf_cluster (2 of 8 probed
    // directories read, not a full scan + post-hoc filter)
    val plan = SparkEntry.queries("q209_filtered_ann")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*__ivf_cluster[^\\]]*\\]".r
      .findFirstIn(plan)
    assert(pf.exists(f => !f.contains("[]")),
      s"no cluster partition prune in q209 plan:\n$plan")
  }

  test("cachedRoot: a second session rebuilds ZERO roots; a regenerated corpus rebuilds; sub-paths resolve into the slot") {
    // the temp-root lifecycle fix (r17 #5): derived roots live in a
    // deterministic slot keyed on the corpus fingerprint. The in-JVM
    // ConcurrentHashMaps are what dedupe WITHIN a session, so calling
    // cachedRoot directly again IS exactly what a fresh session does —
    // the build fn must not run a second time.
    import java.nio.file.{Files => JF, Paths}
    val corpus = JF.createTempDirectory("graft-cache-corpus-").toString
    JF.write(Paths.get(corpus, "embeddings.parquet"),
      "fake-bytes".getBytes)
    var builds = 0
    def build(p: String): Unit = {
      builds += 1
      JF.createDirectories(Paths.get(p))
      JF.write(Paths.get(p, "root.txt"), "r".getBytes)
    }
    val p1 = SparkEntry.cachedRoot(corpus, "spec_root")(build)
    assert(builds == 1 && JF.exists(Paths.get(p1, "root.txt")))
    val p2 = SparkEntry.cachedRoot(corpus, "spec_root")(build)
    assert(builds == 1, "a second session must rebuild zero roots")
    assert(p2 == p1, "the slot is deterministic")
    // sub-rooted artifacts (the CDC fixtures' <slot>/pq shape) land
    // inside their slot and reuse the same way
    val ps = SparkEntry.cachedRoot(corpus, "spec_subbed",
      sub = "pq")(build)
    assert(builds == 2 && ps.endsWith("/spec_subbed/pq") &&
      JF.exists(Paths.get(ps, "root.txt")))
    assert(SparkEntry.cachedRoot(corpus, "spec_subbed",
      sub = "pq")(build) == ps && builds == 2)
    // a REGENERATED corpus (same path, different bytes) changes the
    // fingerprint — stale roots can never serve the new data
    JF.write(Paths.get(corpus, "embeddings.parquet"),
      "fake-bytes-regenerated".getBytes)
    val p3 = SparkEntry.cachedRoot(corpus, "spec_root")(build)
    assert(builds == 3 && p3 != p1,
      "a regenerated corpus must land in a fresh slot")
    // a builder that produces nothing fails loudly instead of
    // publishing an empty slot
    intercept[IllegalArgumentException](
      SparkEntry.cachedRoot(corpus, "spec_empty")(_ => ()))
  }

  test("cachedRoot reaper: a live-JVM generation survives past the age window; a dead stale one is reaped; hits refresh mtime") {
    // the r19 liveness items: (a) cache hits must TOUCH the
    // generation dir, or a steady-state sibling-SF generation ages out
    // and gets reaped by any later miss; (b) even an aged generation
    // is pinned while a `.live-<pid>` marker names a running JVM —
    // pid-death is exportIvfOracles' reaper convention.
    import java.nio.file.{Files => JF, Paths}
    val base = new java.io.File(SparkEntry.rootCacheBase)
    base.mkdirs()
    val stale = System.currentTimeMillis() - 72L * 3600 * 1000
    def plant(name: String, livePid: Option[Long]): java.io.File = {
      val gen = new java.io.File(base, name)
      new java.io.File(gen, "slot").mkdirs()
      livePid.foreach(pid => JF.write(
        Paths.get(gen.getPath, s"${SparkEntry.LiveMarkerPrefix}$pid"),
        Array.empty[Byte]))
      gen.setLastModified(stale)
      gen
    }
    // fake generations: valid-hex names that can never collide with a
    // real md5 fingerprint of this run's corpora
    val pinned = plant("deadbeef-spec-pinned",
      Some(ProcessHandle.current().pid()))
    val reapable = plant("deadbeef-spec-dead", Some(999999999L))
    val unmarked = plant("deadbeef-spec-unmarked", None)
    try {
      // a MISS triggers the reap pass
      val corpus = JF.createTempDirectory("graft-reap-corpus-").toString
      JF.write(Paths.get(corpus, "embeddings.parquet"), "x".getBytes)
      def build(p: String): Unit = {
        JF.createDirectories(Paths.get(p))
        JF.write(Paths.get(p, "root.txt"), "r".getBytes)
      }
      val p = SparkEntry.cachedRoot(corpus, "spec_reap")(build)
      assert(pinned.isDirectory,
        "an aged generation with a LIVE pid marker must survive the reap")
      assert(!reapable.isDirectory && !unmarked.isDirectory,
        "aged generations with only dead/no markers must be reaped")
      // the access touched the generation's mtime and left our own
      // live marker — the steady-state-hit protection
      val gen = new java.io.File(p).getParentFile
      assert(gen.lastModified() > stale, "access must refresh mtime")
      gen.setLastModified(stale)
      SparkEntry.cachedRoot(corpus, "spec_reap")(build) // pure HIT
      assert(gen.lastModified() > stale, "a HIT must refresh mtime too")
      assert(Option(gen.listFiles()).get.exists(_.getName ==
        s"${SparkEntry.LiveMarkerPrefix}${ProcessHandle.current().pid()}"),
        "every access leaves this JVM's live marker")
    } finally Seq(pinned, reapable, unmarked)
      .foreach(org.apache.hadoop.fs.FileUtil.fullyDelete)
  }

  test("EVERY gated entry: no cartesian product, no unbounded per-group collect (named whitelists only)") {
    // the all-entries plan sweep (r17 #4 / r18 #4): every gated plan —
    // not just the newest wave — must be free of CartesianProduct
    // (broadcast nested-loop against a bounded panel is the documented
    // and ALLOWED shape — the exact-panel crossJoin(broadcast(qDf))
    // pattern) and must never buffer per-group lists. A query that
    // NEEDS an exception earns a named whitelist entry with the reason
    // spelled out, so the exception is visible in review instead of
    // silently excluded from the sweep.
    val collectWhitelist: Map[String, String] = Map(
      "q13_context_concat" ->
        "A3 ordered concat folds the top-k retrieval panel — k-bounded",
      "q16_history" ->
        ("per-user chat history then last-10 truncation: state is " +
          "conversation-bounded by the serving contract (F6)"),
      "q20_chunker" ->
        ("S2 assembles one markdown unit per source by definition — " +
          "the collect IS the file-sized ingest unit"),
      "q100_boilerplate_removal" ->
        "per-doc removable start positions — document-length-bounded",
      "q106_dedup_removal" ->
        "per-doc removable start positions — document-length-bounded",
      "q112_retention" ->
        ("per-user active-day set — calendar-span-bounded, not " +
          "event-count-bounded"),
      "q139_postings_export" ->
        ("per-term postings digest: the inverted-index artifact is the " +
          "per-term list; a production export streams per-term shards, " +
          "the gate pins its bytes via the fold"),
      "q147_postings_shards" ->
        "same per-term postings digest as q139, sharded")
    val cartesianWhitelist: Map[String, String] = Map(
      // (none today — 1-row × 1-row crossJoins plan as
      // BroadcastNestedLoopJoin, which is allowed)
    )
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.size >= 215, s"sweep lost queries: ${names.size}")
    val failures = scala.collection.mutable.ListBuffer[String]()
    for (name <- names) {
      val plan = SparkEntry.queries(name)(
          spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") &&
          !cartesianWhitelist.contains(name))
        failures += s"$name: CartesianProduct"
      if ((plan.contains("collect_set") ||
          plan.contains("collect_list")) &&
          !collectWhitelist.contains(name))
        failures += s"$name: unbounded per-group collect"
    }
    assert(failures.isEmpty,
      s"plan sweep violations:\n${failures.mkString("\n")}")
  }
}
