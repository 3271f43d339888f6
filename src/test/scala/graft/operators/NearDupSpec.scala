package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions.simHash

class NearDupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (1L, base),
      (2L, base),                                   // exact dup of 1
      (3L, base.replace("today", "tomorrow")),      // near dup of 1
      (4L, "completely different text about spark sql window aggregation plans"),
      (5L, "another unrelated document mentioning parquet and shuffles only"))
      .toDF("doc_id", "text")
  }

  test("minhashPairs finds exact and near dups, not unrelated pairs") {
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 12, bands = 4, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))   // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty })
  }

  test("minhash/cosine plans contain no cartesian product") {
    val p1 = NearDup.minhashPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Cartesian"), s"cartesian in minhash plan:\n$p1")
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(1f, 2f, -1f, 0.5f, 1f, -2f, 1f, 1f)),
      (2L, Seq(1f, 2.1f, -0.9f, 0.4f, 1f, -2f, 1f, 1.1f)),
      (3L, Seq(-1f, -2f, 1f, -0.5f, -1f, 2f, -1f, -1f)))
      .toDF("vec_id", "embedding")
    val cp = NearDup.cosinePairs(vecs, "vec_id", "embedding",
      dim = 8, bits = 8, k = 5)
    assert(!cp.queryExecution.executedPlan.toString.contains("Cartesian"))
    val got = cp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L))) // 3 has opposite signs -> different bucket
  }

  test("simHash: identical docs collide, near-dups are Hamming-close") {
    import spark.implicits._
    val hashes = docs.select(col("doc_id"), simHash(col("text")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes.values.forall(h => h.length == 32 && h.forall("01".contains(_))))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(hashes(1L), hashes(3L)) <= 8)   // near dup: close
    assert(hamming(hashes(1L), hashes(4L)) > 8)    // unrelated: far
  }

  test("shingle cache is released after the result is materialized") {
    import graft.functions.TextFunctions.wordShinglesNative
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.6)
    pairs.collect()
    // an equivalent-plan frame resolves to the same CacheManager entry,
    // so its public storageLevel tells us whether the operator's
    // internal persist is still alive. Listener delivery is async —
    // poll briefly.
    val shEquivalent = docs
      .select(col("doc_id").as("id"),
        wordShinglesNative(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val deadline = System.currentTimeMillis + 15000
    def level = shEquivalent.storageLevel
    while (level != org.apache.spark.storage.StorageLevel.NONE &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(level == org.apache.spark.storage.StorageLevel.NONE,
      "shingle cache entry must be released after the first action")
  }

  test("jaccardPairs: prefix filtering equals brute force (no false negatives)") {
    import spark.implicits._
    import graft.functions.TextFunctions.wordShinglesNative
    // varied overlap levels, incl. pairs near the threshold boundary
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra"
    val many = (1 to 12).map { i =>
      val words = base.split(" ").toVector
      // doc i mutates the last i words -> smoothly decreasing jaccard
      val mutated = words.dropRight(i) ++ Vector.fill(i)(s"zz$i")
      (100L + i, mutated.mkString(" "))
    }
    val df = (Seq((1L, base), (2L, base)) ++ many).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val got = NearDup.jaccardPairs(df, "doc_id", "text",
          shingleN = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // brute force over ALL pairs with identical shingle + rounding math
      val sh = df.select(col("doc_id"),
          wordShinglesNative(col("text"), 3).as("sh"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
        .filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sh; (b, sb) <- sh if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        jr = BigDecimal.valueOf(j)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= t
      } yield (a, b, jr)).toSet
      assert(got == want,
        s"threshold $t: prefix-filtered ${got.size} != brute ${want.size}\n" +
          s"missing: ${want -- got}\nextra: ${got -- want}")
    }
  }

  test("jaccardPairs plan has no cartesian product") {
    val p = NearDup.jaccardPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian"), s"cartesian in jaccard plan:\n$p")
  }

  test("cosinePairs fails loudly on a dim mismatch instead of degrading") {
    import spark.implicits._
    // planes are packed row-major at bits*dim: a 4-dim vector against
    // dim=8 planes would either reinterpret the matrix (garbage buckets)
    // or bucket to null (rows vanish from the self-join) — must raise
    val vecs = Seq(
      (1L, Seq(1f, 2f, -1f, 0.5f)),
      (2L, Seq(1f, 2.1f, -0.9f, 0.4f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      NearDup.cosinePairs(vecs, "vec_id", "embedding",
        dim = 8, bits = 8, k = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("dim 8")),
      s"expected a loud dim-mismatch error, got: $ex")
  }

  test("cosinePairs drops null vectors (data) but still raises on wrong dim (arg)") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Some(Seq(1f, 2f, -1f, 0.5f, 1f, -2f, 1f, 1f))),
      (2L, Some(Seq(1f, 2.1f, -0.9f, 0.4f, 1f, -2f, 1f, 1.1f))),
      (3L, Option.empty[Seq[Float]])) // doc without an embedding: data,
      .toDF("vec_id", "embedding")    // not an arg error — must not crash
    val got = NearDup.cosinePairs(vecs, "vec_id", "embedding",
        dim = 8, bits = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("abandoned shingle cache is released after bounded unrelated actions") {
    import graft.functions.TextFunctions.wordShinglesNative
    // build but NEVER materialize: the listener must not wait forever —
    // after ListenerMaxUnrelatedActions completed foreign actions it
    // gives up, unpersists and unregisters
    NearDup.minhashPairs(docs, "doc_id", "text", threshold = 0.6)
    val shEquivalent = docs
      .select(col("doc_id").as("id"),
        wordShinglesNative(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    import spark.implicits._
    (0 until 33).foreach(_ => Seq(1).toDF("x").count())
    val deadline = System.currentTimeMillis + 15000
    def level = shEquivalent.storageLevel
    while (level != org.apache.spark.storage.StorageLevel.NONE &&
        System.currentTimeMillis < deadline) {
      Seq(1).toDF("x").count() // keep the listener bus draining
      Thread.sleep(100)
    }
    assert(level == org.apache.spark.storage.StorageLevel.NONE,
      "abandoned shingle cache must be released after bounded misses")
  }

  test("duplicateClusters: min-label propagation finds connected components") {
    import spark.implicits._
    // a 4-node CHAIN (needs multi-round propagation, not just one hop),
    // plus two separate components
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
        (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a_id", "b_id")
    val got = NearDup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateClusters refuses non-integral id columns loudly") {
    import spark.implicits._
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("a_id", "b_id")
    val ex = intercept[IllegalArgumentException] {
      NearDup.duplicateClusters(pairs)
    }
    assert(ex.getMessage.contains("integral id type"))
  }

  test("duplicateClusters: empty pair graph converges to empty labels") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(NearDup.duplicateClusters(pairs).count() == 0)
  }

  test("jaccardPairs large-union rounding boundary: true J < t is excluded even when it rounds to t; J == t is kept") {
    import spark.implicits._
    // the 4-dp rounding gap only opens at unions > ~4000 shingles —
    // beyond anything the test corpora produce — so synthesize it: a
    // shared prefix of p distinct words plus per-doc unique tails gives
    // exactly (p−2) shared 3-gram shingles out of (n−2) per doc
    def words(n: Int, tag: String) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // true J = 19999/25000 = 0.79996 < 0.8, but round(J, 4) = 0.8000:
    // the threshold must apply to the unrounded value (the bound the
    // prefix filter actually guarantees), so NO pair at t = 0.8 …
    val below = Seq(
      (1L, words(20001, "c") + " " + words(2500, "a")),
      (2L, words(20001, "c") + " " + words(2501, "b")))
      .toDF("doc_id", "text")
    assert(NearDup.jaccardPairs(below, "doc_id", "text",
      threshold = 0.8).count() == 0)
    // … while a threshold below the true J finds it, displayed rounded
    val shown = NearDup.jaccardPairs(below, "doc_id", "text",
      threshold = 0.7999).collect()
    assert(shown.length == 1 && shown.head.getDouble(2) == 0.8)
    // true J = 20000/25000 = 0.8 exactly — the prefix/length epsilons
    // only widen bounds, so the boundary-true pair must survive
    val atT = Seq(
      (1L, words(20002, "c") + " " + words(2500, "a")),
      (2L, words(20002, "c") + " " + words(2500, "b")))
      .toDF("doc_id", "text")
    assert(NearDup.jaccardPairs(atT, "doc_id", "text",
      threshold = 0.8).count() == 1)
  }

  test("duplicateClusters raises on null ids instead of dropping edges") {
    import spark.implicits._
    // a null id would otherwise become a (null, null) label row and the
    // edge would silently vanish from propagation — fail-loud instead
    val pairs = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(3L)))
      .toDF("a_id", "b_id")
    val ex = intercept[Exception] {
      NearDup.duplicateClusters(pairs).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("null id")), ex.toString)
  }

  test("giant-cluster stress: long chain converges in O(log diameter) rounds, 10k star resolves") {
    // CHAIN, diameter 1023 — the pointer-jumping worst case. Label
    // distance doubles per round (d_r = 2^(r-1)), so propagation needs
    // ⌈log₂ 1023⌉ + 1 = 11 rounds plus one convergence-detection round;
    // maxIter = 15 asserts the log-diameter bound with headroom — plain
    // min-propagation without the jump would need ~1023 rounds and throw.
    val chain = spark.range(1023)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val labels = NearDup.duplicateClusters(chain, maxIter = 15)
    assert(labels.count() == 1024)
    assert(labels.filter(col("cluster_rep") =!= 0L).count() == 0,
      "every chain node must resolve to the minimum id")
    // STAR: one 10⁴-member boilerplate cluster — every member shares one
    // rep, so the rep-join (l.rep === r_id) funnels the whole cluster
    // through one join key. Must resolve in ~2 rounds (1 propagation +
    // 1 detection) and keep exactly one representative.
    val star = spark.range(1, 10000)
      .select(lit(0L).as("a_id"), col("id").as("b_id"))
    val sLabels = NearDup.duplicateClusters(star, maxIter = 4)
    assert(sLabels.count() == 10000)
    assert(sLabels.filter(col("cluster_rep") =!= 0L).count() == 0,
      "every star member must resolve to the hub id")
  }

  test("semDedup: mega-cluster cap bounds pair work, exact dups never escape") {
    import spark.implicits._
    // one 600-row mega-cluster: k-means does not bound cluster size, so
    // the uncapped pair join would be C(600,2) = 179,700 pairs. Vectors
    // are md5-derived signed dim-32 noise (pairwise |cos| concentrates
    // near 1/√32 — nowhere near τ), EXCEPT ids 300..309 which duplicate
    // ids 0..9 exactly (the planted dups).
    val mdg = java.security.MessageDigest.getInstance("MD5")
    def vec(i: Long): Seq[Float] = {
      val j = if (i >= 300 && i < 310) i - 300 else i
      (0 until 32).map { d =>
        mdg.reset()
        val h = mdg.digest(s"$j|$d".getBytes("UTF-8"))
        val v = ((h(0) & 0xFF) << 8) | (h(1) & 0xFF)
        (v % 2001 - 1000).toFloat / 1000f
      }
    }
    val rows = (0L until 600L).map(i => (i, 0, vec(i)))
      .toDF("vec_id", "cl", "embedding")
    val cap = 100
    val capped = NearDup.semDedup(rows, "vec_id", "embedding", "cl",
      tau = 0.9999, maxCellRows = Some(cap)).collect()
    assert(capped.length == 1)
    // every planted duplicate drops: identical vectors share a cell by
    // construction (the cell key is the md5 of the vector bytes)
    assert(capped(0).getAs[Long]("n_dropped") >= 10,
      s"planted exact dups escaped the cap: ${capped(0)}")
    // and the cap actually bounds the quadratic: recompute the cell
    // assignment the operator uses and compare pair counts
    val cells = rows
      .withColumn("cell",
        pmod(conv(substring(md5(col("embedding").cast("string")), 1, 8),
          16, 10).cast("long"), lit((600 + cap - 1) / cap)))
      .groupBy("cell").count().collect().map(_.getLong(1))
    val cappedPairs = cells.map(n => n * (n - 1) / 2).sum
    assert(cappedPairs < 179700L / 3,
      s"sub-split did not bound the pair join: $cappedPairs")
    // uncapped on the same frame agrees on totals and finds the same
    // planted dups (no cross-cell NEAR-dups exist at this tau)
    val flat = NearDup.semDedup(rows, "vec_id", "embedding", "cl",
      tau = 0.9999).collect()
    assert(flat(0).getAs[Long]("n_vecs") == 600)
    assert(flat(0).getAs[Long]("n_dropped") ==
      capped(0).getAs[Long]("n_dropped"))
  }

  test("lsh collision probability: bucket counts stay bounded (no hot key)") {
    // signatures of unrelated docs must not all collapse into one bucket
    val buckets = NearDup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.0)
    val n = buckets.count()
    assert(n < 10, s"suspiciously many candidate pairs: $n") // 5 docs -> few pairs
  }

  test("multiProbeBuckets: base first, each probe flips exactly one lowest-margin bit") {
    val rnd = new scala.util.Random(3)
    val q = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    val probes = NearDup.multiProbeBuckets(q, bits = 8, dim = 64,
      nFlips = 3)
    assert(probes.length == 4 && probes.distinct.length == 4)
    val base = probes.head
    assert(base.length == 8 && base.forall(c => c == '0' || c == '1'))
    // each non-base probe is Hamming distance 1 from the base
    probes.tail.foreach { p =>
      assert(p.length == 8 &&
        p.zip(base).count { case (a, b) => a != b } == 1, s"$p vs $base")
    }
    // the flipped bits are the 3 smallest |margin| ones (recompute)
    val planes = NearDup.hyperplanes(8, 64)
    val margins = (0 until 8).map(b =>
      (0 until 64).map(j => q(j).toDouble * planes(b * 64 + j)).sum)
    val want = margins.zipWithIndex
      .map { case (m, b) =>
        (math.floor(math.abs(m) * 1e4 + 0.5).toLong, b) }
      .sorted.take(3).map(_._2).toSet
    val got = probes.tail
      .map(p => p.zip(base).indexWhere { case (a, b) => a != b }).toSet
    assert(got == want, s"flipped $got, expected lowest-margin $want")
  }

  test("hyperplanesInt is exactly the double plane matrix times 1024") {
    val d = NearDup.hyperplanes(16, 64)
    val i = NearDup.hyperplanesInt(16, 64)
    assert(d.length == i.length)
    d.zip(i).foreach { case (x, k) =>
      assert(x == k / 1024.0, s"$x vs $k")
      assert(k >= -1000 && k <= 1000)
    }
  }

  test("multiProbeBuckets recall: probing never shrinks, usually grows, the candidate set") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 300L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    graft.plans.VectorExpressions.ensureRegistered(spark)
    val q = Seq.fill(64)(rnd.nextFloat() - 0.5f)
    def candidates(nFlips: Int): Set[Long] = {
      val probes = NearDup.multiProbeBuckets(q, 8, 64, nFlips)
      vecs.withColumn("b", NearDup.signBucket(
          org.apache.spark.sql.functions.col("embedding"),
          NearDup.hyperplanes(8, 64)))
        .filter(org.apache.spark.sql.functions.col("b")
          .isin(probes: _*))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val single = candidates(0)
    val multi = candidates(3)
    assert(single.subsetOf(multi))
    assert(multi.size > single.size,
      s"3 extra buckets over 256 on 300 rows should widen the net " +
        s"(single=${single.size}, multi=${multi.size})")
  }
}
