package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions._
import graft.operators.KnnSearch
import graft.sources.MarkdownIngest

/** Property-based invariants (SURVEY §5 item 3). Uses raw ScalaCheck Gen
  * with seeded sampling (the scalatest bridge artifact isn't in the
  * offline cache) — deterministic across runs. */
class PropertySpec extends SparkSpec {

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toSeq)

  /** deterministic samples from a generator */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("distance properties: non-negativity, identity, symmetry") {
    import spark.implicits._
    val pairs = samples(Gen.zip(vecGen, vecGen), 40)
    val rows = pairs.toDF("a", "b")
      .select(
        l2Distance(col("a"), col("b")).as("ab"),
        l2Distance(col("b"), col("a")).as("ba"),
        l2Distance(col("a"), col("a")).as("aa"),
        cosineSimilarity(col("a"), col("b")).as("cos"))
      .collect()
    rows.foreach { row =>
      assert(row.getDouble(0) >= 0.0)
      assert(row.getDouble(0) == row.getDouble(1)) // symmetric
      assert(row.getDouble(2) == 0.0)              // d(a,a) = 0
      assert(row.getDouble(3) >= -1.0000001 && row.getDouble(3) <= 1.0000001)
    }
  }

  test("top-k is a prefix of the full sort") {
    import spark.implicits._
    val cases = samples(
      Gen.zip(Gen.listOfN(30, vecGen), vecGen, Gen.choose(1, 10)), 8)
    cases.foreach { case (vs, q, k) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val top = KnnSearch.topK(df, "embedding", q, k, KnnSearch.L2,
        tieBreak = Some("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val full = df
        .withColumn("d", l2Distance(col("embedding"), KnnSearch.litVec(q)))
        .orderBy(col("d"), col("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(top == full.take(math.min(k, vs.size)))
    }
  }

  test("jaccardPairs equals brute force on random corpora and thresholds") {
    import spark.implicits._
    import graft.functions.TextFunctions.wordShinglesNative
    import graft.operators.NearDup
    // small vocab so shingles genuinely collide across docs
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val docGen: Gen[String] =
      Gen.chooseNum(3, 25).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val caseGen = Gen.zip(
      Gen.listOfN(30, docGen), Gen.oneOf(0.3, 0.5, 0.7, 0.9))
    samples(caseGen, 6).foreach { case (texts, t) =>
      val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = NearDup.jaccardPairs(df, "doc_id", "text",
          shingleN = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
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
        s"threshold $t: prefix ${got.size} != brute ${want.size}; " +
          s"missing ${want -- got}, extra ${got -- want}")
    }
  }

  test("duplicateClusters labels equal transitive-closure min on random graphs") {
    import spark.implicits._
    import graft.operators.NearDup
    val edgeGen = Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    samples(Gen.listOfN(20, edgeGen), 6).foreach { edges =>
      val df = edges.toDF("a_id", "b_id")
      val got = NearDup.duplicateClusters(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize: root = min member of each component
      val want = parent.keys.map(x => x -> find(x)).toMap
      assert(got == want, s"labels $got != union-find $want on $edges")
    }
  }

  test("chunker: sub-chunk concat reconstructs the body (oversize split)") {
    val bodyGen = Gen.chooseNum(1, 3000).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    samples(Gen.zip(bodyGen, Gen.choose(16, 512)), 60).foreach {
      case (body, max) =>
        val chunks = MarkdownIngest.chunkMarkdown("/t.md", s"# T\n$body", max)
        assert(chunks.map(_.text).mkString == body.trim)
        assert(chunks.forall(_.text.length <= max))
    }
  }

  test("adaptive k formula matches the reference bounds") {
    (0 to 20).foreach { n =>
      val k = KnnSearch.adaptiveK(n, rerank = false)
      assert(k >= 3 && k <= 13)
      assert(KnnSearch.adaptiveK(n, rerank = true) == 10)
    }
  }

  test("native text expressions == HOF forms on random unicode-ish text") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    import graft.plans.VectorExpressions
    VectorExpressions.ensureRegistered(spark)
    // words over a mixed alphabet (ascii, digits, punctuation, accents,
    // CJK) separated by random whitespace runs — exercises the
    // normalization/tokenization corners the word-soup corpus doesn't
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('.', ',', '!', '-', '@'),
      1 -> Gen.oneOf('é', 'ü', 'ß', 'λ', '中', '文'))
    val wordGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val wsGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.zip(wordGen, wsGen))
        .map(_.map { case (w, s) => w + s }.mkString))
    val texts = samples(textGen, 120)
    val sw = Seq("the", "a", "of")
    val df = texts.toDF("text")
    val bad = df.select(
        simHashNative(col("text")).as("ns"),
        simHash(col("text")).as("hs"),
        rollingHashNative(col("text")).as("nr"),
        rollingHash(col("text")).as("hr"),
        wordShinglesNative(col("text"), 2).as("nw"),
        wordShingles(col("text"), 2).as("hw"),
        charJaccardNative(col("text"), "the quick brown", 3).as("nj"),
        jaccard(charShingles(col("text"), 3),
          charShingles(lit("the quick brown"), 3)).as("hj"),
        stopwordRatioFromStats(tokenStatsNative(col("text"), sw)).as("nt"),
        stopwordRatio(col("text"), sw).as("ht"))
      .filter(col("ns") =!= col("hs") || col("nr") =!= col("hr") ||
        col("nw") =!= col("hw") || col("nj") =!= col("hj") ||
        col("nt") =!= col("ht"))
      .count()
    assert(bad == 0)
  }

  test("histogram quantile property: any (values, width, rank) brackets the exact percentile") {
    import spark.implicits._
    import graft.operators.Sketches
    val caseGen = Gen.zip(
      Gen.listOfN(400, Gen.chooseNum(-5000L, 5000L)),
      Gen.oneOf(16L, 64L, 250L),
      Gen.listOfN(3, Gen.chooseNum(1L, 1000000L)))
    samples(caseGen, 5).foreach { case (vals, width, qs) =>
      val df = vals.map(("g", _)).toDF("g", "v")
      val est = Sketches.histQuantiles(
          Sketches.histSketch(df, col("v"), Seq("g"), width),
          Seq("g"), width, qs.distinct)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val sorted = vals.sorted
      qs.distinct.foreach { q =>
        val r = ((vals.size.toLong * q + 999999L) / 1000000L).toInt
        val exact = sorted(r - 1)
        assert(est(q) <= exact && exact < est(q) + width,
          s"width=$width q=$q: ${est(q)} !~ $exact")
      }
    }
  }

  test("systematic sampler property: every multiplicity is floor-or-ceil of its weight share, sum is exactly k") {
    import spark.implicits._
    import graft.operators.Sampler
    val caseGen = Gen.zip(
      Gen.listOfN(200, Gen.chooseNum(1L, 500L)),
      Gen.chooseNum(1, 150))
    samples(caseGen, 5).foreach { case (ws, k) =>
      val rows = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val total = ws.sum
      val got = Sampler
        .systematicWeighted(rows.toDF("id", "w"), "id", "w", k)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got.values.sum == k, s"k=$k: slots sum ${got.values.sum}")
      rows.foreach { case (id, w) =>
        val share = w.toDouble * k / total
        val slots = got.getOrElse(id, 0L).toDouble
        assert(slots == math.floor(share) || slots == math.ceil(share),
          s"id=$id w=$w k=$k: $slots slots for share $share")
      }
    }
  }

  test("ewma property: random series fold to the sequential reference bit-for-bit") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val caseGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(-100.0, 100.0)))
    samples(caseGen, 4).foreach { series =>
      val rows = series.zipWithIndex.map { case ((u, x), i) =>
        (u, i.toLong, x)
      }
      val want = rows.groupBy(_._1).map { case (u, rs) =>
        val xs = rs.sortBy(_._2).map(_._3)
        u -> xs.tail.foldLeft(xs.head)((e, x) => e + (x - e) * 0.125)
      }
      val got = TimeSeries
        .ewmaLast(rows.toDF("u", "i", "x").repartition(7),
          Seq("u"), Seq("i"), "x", 0.125)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      want.foreach { case (u, e) =>
        assert(java.lang.Double.doubleToRawLongBits(got(u)) ==
          java.lang.Double.doubleToRawLongBits(e), s"u=$u: ${got(u)} vs $e")
      }
    }
  }

  test("opqPermutation property: valid permutation; the m hottest dims land in m distinct subspaces") {
    import spark.implicits._
    import graft.operators.Pq
    // random anisotropic corpora: per-dim scale drawn 1..64, values
    // md5-free (plain arithmetic) but deterministic via the seed
    val caseGen = Gen.zip(
      Gen.listOfN(16, Gen.chooseNum(1, 64)),
      Gen.chooseNum(2, 4).map(1 << _)) // m ∈ {4, 8, 16}
    samples(caseGen, 4).foreach { case (scales, m0) =>
      val m = if (16 % m0 == 0) m0 else 4
      val rows = (0L until 120L).map { i =>
        (i, scales.zipWithIndex.map { case (sc, j) =>
          (((i * (3 + 2 * j) + j * 7) % 97).toFloat / 97f - 0.5f) * sc
        })
      }
      val df = rows.toDF("vec_id", "embedding")
      val perm = Pq.opqPermutation(df, "embedding", m)
      // a permutation, exactly
      assert(perm.sorted.sameElements(0 until 16),
        s"not a permutation: ${perm.toSeq}")
      // determinism
      assert(Pq.opqPermutation(df, "embedding", m).sameElements(perm))
      // eigenvalue-allocation essence: the m highest-variance dims are
      // dealt to m DISTINCT subspaces (greedy fills empty buckets
      // first — always true by construction, and exactly what the
      // identity layout violates on a scaled band)
      val n = rows.length
      val varScaled = (0 until 16).map { j =>
        val xs = rows.map(r => BigDecimal(r._2(j).toDouble))
        val s = xs.sum; val ss = xs.map(x => x * x).sum
        (j, n * ss - s * s)
      }
      val hot = varScaled.sortBy(-_._2).take(m).map(_._1).toSet
      val dsub = 16 / m
      val owners = hot.map(d => perm.indexOf(d) / dsub)
      assert(owners.size == m,
        s"hot dims $hot landed in buckets $owners (m=$m)")
    }
  }

  test("budgetGate batch-execution property: equals the sequential fold on random feeds") {
    import spark.implicits._
    import graft.streaming.EventStreams
    import graft.streaming.EventStreams.BudgetDoc
    val caseGen = Gen.zip(
      Gen.listOfN(80, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(1L, 40L))),
      Gen.chooseNum(50L, 400L))
    samples(caseGen, 5).foreach { case (docs, budget) =>
      val rows = docs.zipWithIndex.map { case ((src, w), i) =>
        BudgetDoc(src, i.toLong, w) }
      // sequential reference: per source in doc_id order, admit while
      // the SEEN prefix stays within budget
      val expected = rows.groupBy(_.source).flatMap { case (_, ds) =>
        var seen = 0L
        ds.sortBy(_.doc_id).flatMap { d =>
          seen += d.n_toks
          if (seen <= budget) Some((d.source, d.doc_id, seen)) else None
        }
      }.toSet
      val got = EventStreams.budgetGate(rows.toDS(), budget)
        .collect().map(a => (a.source, a.doc_id, a.cum)).toSet
      assert(got == expected, s"budget=$budget: $got vs $expected")
    }
  }

  test("shingle guards: short/empty/null inputs yield empty arrays") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq("", "one", "one two", "a b c d").toDF("t")
    val sizes = df.select(
      size(wordShingles(col("t"), 3)), size(charShingles(col("t"), 10)))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(sizes(0) == ((0, 0)))
    assert(sizes(1) == ((0, 0)))
    assert(sizes(2)._1 == 0)
    assert(sizes(3)._1 == 2) // "a b c", "b c d"
    val nullRow = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(size(wordShingles(col("t"), 3)), size(charShingles(col("t"), 3)))
      .head()
    assert(nullRow.getInt(0) == 0 && nullRow.getInt(1) == 0)
  }
}
