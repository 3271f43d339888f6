package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MixerSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("stratified sample: deterministic, rate-proportional, rate edge cases") {
    val rates = Map("en" -> 0.5, "es" -> 0.25)
    val a = Mixer.sample(docs, "lang", "text", rates, defaultRate = 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Mixer.sample(docs, "lang", "text", rates, defaultRate = 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "resampling must keep the identical row set")
    // kept fraction tracks the stratum rate (16-bit hash grid; the
    // corpus is small, so allow generous statistical slack)
    val perLang = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(Mixer.keepExpr(col("lang"), col("text"), rates, 0.05),
          1L).otherwise(0L)).as("kept"))
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def frac(l: String) = perLang(l)._2.toDouble / perLang(l)._1
    assert(math.abs(frac("en") - 0.5) < 0.15, s"en ${frac("en")}")
    assert(math.abs(frac("es") - 0.25) < 0.15, s"es ${frac("es")}")
    assert(frac("de") < 0.2, s"default-rate stratum too big ${frac("de")}")
    // rate 0 drops the stratum entirely; rate 1 keeps it entirely
    val extremes = Map("en" -> 0.0, "es" -> 1.0)
    val kept = Mixer.sample(docs, "lang", "text", extremes, 0.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("en"))
    assert(kept("es") == perLang("es")._1)
    assert(kept.keySet == Set("es"))
    // the decision is a narrow filter — no shuffle before it
    val plan = Mixer.sample(docs, "lang", "text", rates, 0.05)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample must be narrow:\n$plan")
  }

  test("thresholdHex grid: rounding, caps, rejection") {
    assert(Mixer.thresholdHex(0.5) == "8000")
    assert(Mixer.thresholdHex(0.25) == "4000")
    assert(Mixer.thresholdHex(0.1) == "199a")
    assert(Mixer.thresholdHex(0.05) == "0ccd")
    assert(Mixer.thresholdHex(0.0) == "0000")
    assert(Mixer.thresholdHex(1.0) == "g")
    assert(Mixer.thresholdHex(2.0) == "g")
    intercept[IllegalArgumentException](Mixer.thresholdHex(-0.1))
    // "g" sorts after every hex prefix — rate 1 keeps everything
    assert("ffff" < "g" && "0000" < "g")
  }

  test("temperatureRates: scarcest stratum keeps all, tau=1 keeps " +
      "everything, tau->0 approaches the uniform mix, guards") {
    val counts = Map("en" -> 1000L, "es" -> 100L, "zh" -> 10L)
    val r = Mixer.temperatureRates(counts, temperature = 0.7)
    assert(r("zh") == 1.0, s"scarcest stratum must keep all: $r")
    assert(r("en") < r("es") && r("es") < r("zh"),
      s"rates must be monotone decreasing in count: $r")
    // rate_i = (n_i / n_min)^(tau - 1), checked against the closed form
    assert(math.abs(r("en") -
      math.pow(1000.0, -0.3) / math.pow(10.0, -0.3)) < 1e-12)
    // tau = 1: no resampling anywhere
    assert(Mixer.temperatureRates(counts, 1.0).values.forall(_ == 1.0))
    // small tau approaches the uniform mix n_min/n_i
    val r0 = Mixer.temperatureRates(counts, 1e-9)
    assert(math.abs(r0("en") - 10.0 / 1000.0) < 1e-6, r0.toString)
    // empty strata get rate 0; all-empty and bad tau are rejected
    assert(Mixer.temperatureRates(counts + ("xx" -> 0L), 0.7)("xx") == 0.0)
    intercept[IllegalArgumentException](
      Mixer.temperatureRates(Map("a" -> 0L), 0.7))
    intercept[IllegalArgumentException](
      Mixer.temperatureRates(counts, 0.0))
    intercept[IllegalArgumentException](
      Mixer.temperatureRates(counts, 1.5))
    intercept[IllegalArgumentException](
      Mixer.temperatureRates(Map.empty[String, Long], 0.7))
  }

  private def alloc(ds: Seq[(String, Long)], budget: Long) = {
    import spark.implicits._
    Mixer.waterfill(ds.toDF("k", "d"), "k", "d", budget)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("waterfill: small strata satisfied in full, large capped at a common level") {
    // demands 10, 20, 100, 100; budget 80: 10 + 20 fit, the two big
    // ones split 50 -> 25 each
    val a = alloc(Seq("a" -> 10L, "b" -> 20L, "c" -> 100L, "d" -> 100L),
      80L)
    assert(a("a") == ((10L, 10L, 1L)))
    assert(a("b") == ((20L, 20L, 1L)))
    assert(a("c") == ((100L, 25L, 0L)))
    assert(a("d") == ((100L, 25L, 0L)))
  }

  test("waterfill: the allocation sums EXACTLY to min(budget, total demand)") {
    // remainder distribution: budget 82 over the same demands gives
    // 10+20 + 26+26 — the first unsatisfied (sort order) gets the +1s
    val a = alloc(Seq("a" -> 10L, "b" -> 20L, "c" -> 100L, "d" -> 100L),
      82L)
    assert(a.values.map(_._2).sum == 82L)
    assert(a("c")._2 == 26L && a("d")._2 == 26L)
    val b = alloc(Seq("a" -> 10L, "b" -> 20L, "c" -> 100L, "d" -> 101L),
      83L)
    assert(b.values.map(_._2).sum == 83L)
    // 53 over two: base 26 rem 1 -> c (earlier in (demand, key) order)
    // gets 27
    assert(b("c")._2 == 27L && b("d")._2 == 26L)
    // abundant budget: everyone satisfied, sum == total demand
    val c = alloc(Seq("a" -> 10L, "b" -> 20L), 1000L)
    assert(c.values.map(_._2).sum == 30L)
    assert(c.values.forall(_._3 == 1L))
  }

  test("waterfill: unsatisfied strata form a suffix of the (demand, key) order") {
    val ds = Seq("a" -> 5L, "b" -> 7L, "c" -> 11L, "d" -> 13L,
      "e" -> 17L, "f" -> 100L)
    for (budget <- Seq(0L, 3L, 20L, 40L, 60L, 200L)) {
      val a = alloc(ds, budget)
      val ordered = ds.sortBy { case (k, d) => (d, k) }
        .map { case (k, _) => a(k)._3 }
      assert(ordered == ordered.sorted.reverse,
        s"satisfied flags not a prefix at budget=$budget: $ordered")
      assert(a.values.map(_._2).sum ==
        math.min(budget, ds.map(_._2).sum))
    }
  }

  test("waterfill properties hold on random instances (max-min fairness characterization)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 30) {
      val n = 1 + rnd.nextInt(8)
      val ds = (0 until n).map(i => s"s$i" -> (rnd.nextInt(1000) + 1L))
      val total = ds.map(_._2).sum
      val budget = rnd.nextInt((total * 3 / 2).toInt + 1).toLong
      val a = alloc(ds, budget)
      // (a) conservation: Σ alloc == min(budget, Σ demand)
      assert(a.values.map(_._2).sum == math.min(budget, total),
        s"trial $trial: conservation broke for $ds budget=$budget: $a")
      ds.foreach { case (k, d) =>
        val (_, got, sat) = a(k)
        // (b) never over-allocate
        assert(got <= d, s"trial $trial: $k got $got > demand $d")
        // (c) satisfied strata get their full demand
        if (sat == 1L) assert(got == d)
      }
      // (d) capped strata sit within 1 of a common water level
      val capped = a.values.filter(_._3 == 0L).map(_._2).toSeq
      if (capped.nonEmpty)
        assert(capped.max - capped.min <= 1L,
          s"trial $trial: capped allocations not level: $capped")
      // (e) no satisfied stratum's demand may exceed the capped water
      // level (otherwise capping it instead would be fairer)
      if (capped.nonEmpty) {
        val minCapped = capped.min
        a.values.filter(_._3 == 1L).foreach { case (d, _, _) =>
          assert(d <= minCapped + 1,
            s"trial $trial: satisfied demand $d above capped level " +
              s"$minCapped") }
      }
    }
  }

  test("waterfillPct derives the budget in-plan: 6/10 of total demand") {
    import spark.implicits._
    val ds = Seq("a" -> 10L, "b" -> 20L, "c" -> 100L).toDF("k", "d")
    val viaPct = Mixer.waterfillPct(ds, "k", "d", 6)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val viaAbs = Mixer.waterfill(ds, "k", "d", 130L * 6 / 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(viaPct == viaAbs)
    assert(viaPct.values.sum == 78L)
  }
}
