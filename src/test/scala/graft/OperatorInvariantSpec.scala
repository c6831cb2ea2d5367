package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-3 operators — properties the
  * DuckDB hash parity can't express (parity proves Spark == oracle;
  * these prove both compute the RIGHT thing).
  */
class OperatorInvariantSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("sketch_quantile: estimates monotone and within a bin of the exact quantile") {
    val est = operators.Sketches.sketchQuantile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // exact DISCRETE quantile under the sketch's own definition:
    // smallest value whose rank k satisfies 100k >= q·n — the estimate
    // must be exactly that value's bin edge (not the INTERPOLATED
    // percentile, which at sparse tails sits several empty bins away)
    val byType = sources.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    def disc(vs: Array[Double], q: Int): Double = {
      val n = vs.length
      val k = (q * n + 99) / 100 // smallest k with 100k >= q·n
      math.floor(vs(k - 1) * 10) / 10
    }
    est.foreach { case (t, (p50, p95, p99)) =>
      assert(p50 <= p95 && p95 <= p99, s"$t: quantiles not monotone ($p50, $p95, $p99)")
      val vs = byType(t)
      assert(p50 == disc(vs, 50), s"$t p50: est $p50 vs discrete ${disc(vs, 50)}")
      assert(p95 == disc(vs, 95), s"$t p95: est $p95 vs discrete ${disc(vs, 95)}")
      assert(p99 == disc(vs, 99), s"$t p99: est $p99 vs discrete ${disc(vs, 99)}")
    }
  }

  test("sketch_bloom: no false negatives — probe hits cover every true member") {
    operators.Sketches.sketchBloom(spark, sf).collect().foreach { r =>
      val hits = r.getAs[Long]("n_probe_hits")
      val present = r.getAs[Long]("n_probe_present")
      assert(hits >= present,
        s"${r.getString(0)}: $hits hits < $present true members — a Bloom filter may never false-negative")
    }
  }

  test("tfidf_topterms: per-doc ranks 1..k with non-increasing scores") {
    val rows = operators.TextAnalysis.tfidfTopTerms(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank"), r.getAs[Double]("score")))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq,
        s"doc $doc: ranks not dense: ${byRank.map(_._2).toSeq}")
      assert(byRank.length <= operators.TextAnalysis.TfidfTopK)
      assert(byRank.sliding(2).forall { case Array(a, b) => a._3 >= b._3; case _ => true },
        s"doc $doc: scores increase with rank")
    }
  }

  test("events_retention: rates bounded, retained never exceeds cohort") {
    operators.Queries.eventsRetention(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n_users")
      val d1 = r.getAs[Long]("d1_retained"); val d7 = r.getAs[Long]("d7_retained")
      assert(d1 <= n && d7 <= n, s"cohort ${r.getAs[Long]("cohort_day")}: retained > cohort")
      val r1 = r.getAs[Double]("d1_rate"); val r7 = r.getAs[Double]("d7_rate")
      assert(r1 >= 0 && r1 <= 1 && r7 >= 0 && r7 <= 1)
    }
  }

  test("corpus_mix: takes within availability, binding source taken fully") {
    val plan = operators.Corpus.corpusMix(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("target_ppm"), r.getAs[Long]("n_avail"), r.getAs[Long]("n_take")))
    plan.foreach { case (src, (_, avail, take)) =>
      assert(take <= avail, s"$src: take $take > avail $avail")
    }
    // the binding source (max target/avail ratio) is taken to within
    // the double-floor rounding loss (M and n_take each floor once)
    val binding = plan.minBy { case (_, (ppm, avail, _)) => avail * 1000000L / ppm }
    assert(binding._2._3 >= binding._2._2 - 1,
      s"binding source ${binding._1} underused: $binding")
  }

  test("embed_project: projections deterministic and norm ratios sane") {
    val out = operators.Similarity.embedProject(spark, sf)
    val a = out.collect(); val b = operators.Similarity.embedProject(spark, sf).collect()
    assert(a.sameElements(b), "projection must be a pure function of the input")
    a.foreach { r =>
      val ratio = r.getAs[Double]("norm_ratio")
      // 16 of 64 dims with unit-variance +-1 coefficient entries: the
      // ratio concentrates well away from 0 (no collapse) and below the
      // full-norm bound scaled by the coefficient mass
      assert(ratio > 0.0 && ratio < 10.0, s"vec ${r.getAs[Long]("vec_id")}: norm ratio $ratio")
    }
  }
}
