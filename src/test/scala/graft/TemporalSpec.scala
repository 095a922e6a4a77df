package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkTestBase {

  test("q18 range join: all gaps within [0, 300] s, no self pairs") {
    val df = TemporalOps.q18.build(spark, sf).cache()
    assert(df.filter(col("gap_s") < 0 || col("gap_s") > 300).count() === 0)
    assert(df.filter(col("a_id") === col("b_id")).count() === 0)
  }

  test("q18 bucketed range join matches naive range join") {
    val bucketed = TemporalOps.q18.build(spark, sf)
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("ts div 1000000000").as("es"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.es") >= col("a.es") && col("b.es") <= col("a.es") + 300 &&
          col("a.event_id") =!= col("b.event_id"))
      .select(col("a.event_id").as("a_id"), col("b.event_id").as("b_id"))
    assert(bucketed.select("a_id", "b_id").except(naive).count() === 0)
    assert(naive.except(bucketed.select("a_id", "b_id")).count() === 0)
  }

  test("q19 as-of join: one row per matched event, order date <= event time") {
    val df = TemporalOps.q19.build(spark, sf).cache()
    assert(df.count() === df.select("event_id").distinct().count())
  }

  test("native as-of exec reports SQL metrics (output + matched rows)") {
    import spark.implicits._
    val ev = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 5L))
      .toDF("eid", "k", "t")
    val qt = Seq((100L, 1L, 8L), (101L, 1L, 15L))
      .toDF("qid", "qk", "qt")
    // outer: events 1,2 match (qt 8, then 15); event 3 (key 2) is
    // null-filled — 3 output rows, 2 matched. AQE wraps the plan in an
    // adaptive root that hides the exec from collect(); disable it here
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = graft.plans.AsOfOps.asofJoin(ev, qt,
        ev("k"), qt("qk"), ev("t"), qt("qt"),
        rightTieBreak = Seq(qt("qid")), outer = true)
      // collect() (not count()) so the INSPECTED QueryExecution is the
      // one that runs — count() builds its own aggregate plan
      assert(joined.collect().length === 3)
      val exec = joined.queryExecution.executedPlan.collect {
        case e: graft.plans.AsOfJoinExec => e
      }.head
      assert(exec.metrics("numOutputRows").value === 3)
      assert(exec.metrics("numMatchedRows").value === 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q20 windows: sliding total = 2x tumbling total (1h / 30min slide)") {
    val tumbling = TemporalOps.q20a.build(spark, sf)
      .agg(sum("n")).head().getLong(0)
    val sliding = TemporalOps.q20b.build(spark, sf)
      .agg(sum("n")).head().getLong(0)
    assert(sliding === 2 * tumbling)
  }

  test("q21 sessions: per-user event counts are preserved") {
    val sessions = TemporalOps.q21.build(spark, sf)
      .groupBy("user_id").agg(sum("n_events").as("n"))
    val raw = Tables.events(spark, sf).groupBy("user_id").count()
    val joined = sessions.join(raw, "user_id")
      .filter(col("n") =!= col("count"))
    assert(joined.count() === 0)
  }

  test("q22 json extraction: every event has a k value") {
    val df = TemporalOps.q22.build(spark, sf)
    val totalK = df.agg(sum("n_k")).head().getLong(0)
    assert(totalK === Tables.events(spark, sf).count())
  }

  test("q72 scd2: one current row per user, contiguous versions, no gaps") {
    val dim = TemporalOps.q72.build(spark, sf).cache()
    val users = dim.select("user_id").distinct().count()
    assert(dim.filter(col("is_current")).count() === users)
    // versions are 1..max with no holes: count == max per user
    val holes = dim.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("version").as("m"))
      .filter(col("n") =!= col("m"))
    assert(holes.count() === 0)
    // every closed interval ends exactly where the next one starts
    val nxt = dim.select(col("user_id"), (col("version") - 1).as("version"),
      col("valid_from").as("next_from"))
    val gaps = dim.join(nxt, Seq("user_id", "version"))
      .filter(col("valid_to") =!= col("next_from"))
    assert(gaps.count() === 0)
    // history covers every event exactly once
    assert(dim.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sf).count())
  }

  test("q76 rolling features: bounded frames, max dominates avg, gaps non-negative") {
    val df = TemporalOps.q76.build(spark, sf).cache()
    assert(df.count() === Tables.events(spark, sf).count())
    assert(df.filter(col("roll_n") < 1 || col("roll_n") > 5).count() === 0)
    assert(df.filter(col("roll_max") < col("value")).count() === 0)
    // cent-rounding of the mean can only miss the true values by 5e-7
    assert(df.filter(col("roll_avg") > col("roll_max") + 1e-6).count() === 0)
    assert(df.filter(col("gap_s") < 0).count() === 0)
  }

  test("q97 interpolate: contiguous hourly grid per user, interp bounded by neighbors") {
    val df = TemporalOps.q97.build(spark, sf).cache()
    // grid completeness: per user, rows == (max-min)/3600 + 1, hours distinct
    val grid = df.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      countDistinct(col("hour")).as("nd"),
      ((unix_timestamp(max(col("hour"))) - unix_timestamp(min(col("hour")))) / 3600 + 1)
        .as("expect"))
    assert(grid.filter(col("n") =!= col("expect") || col("nd") =!= col("n")).count() === 0)
    // endpoints are observations (interpolation is total by construction)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val ends = df
      .withColumn("mn", min(col("hour")).over(w))
      .withColumn("mx", max(col("hour")).over(w))
      .filter(col("hour") === col("mn") || col("hour") === col("mx"))
    assert(ends.filter(!col("is_obs")).count() === 0)
    // every interpolated value lies between its neighboring observations
    val wu = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy("hour").rowsBetween(Long.MinValue, 0)
    val wd = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy("hour").rowsBetween(0, Long.MaxValue)
    val obsv = when(col("is_obs"), col("value"))
    val bounded = df
      .withColumn("pv", last(obsv, ignoreNulls = true).over(wu))
      .withColumn("nv", first(obsv, ignoreNulls = true).over(wd))
      .filter(!col("is_obs"))
      .filter(col("value") < least(col("pv"), col("nv")) - 1e-9 ||
        col("value") > greatest(col("pv"), col("nv")) + 1e-9)
    assert(bounded.count() === 0)
  }

  test("q99 funnel: stages monotone decreasing, rates sum to 1") {
    val df = TemporalOps.q99.build(spark, sf).cache()
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stage k user count: users at exactly stage k; cumulative counts
    // (reached >= k) must be monotone decreasing in k
    val reached3 = rows.getOrElse(3L, 0L)
    val reached2 = reached3 + rows.getOrElse(2L, 0L)
    val reached1 = reached2 + rows.getOrElse(1L, 0L)
    assert(reached1 >= reached2 && reached2 >= reached3)
    // the 1 h conversion window makes drop-off real: stage 1 must hold
    // users the later stages lost
    assert(reached1 > reached2, "funnel should discriminate at sf0.001")
    assert(reached1 === Tables.events(spark, sf)
      .filter(col("event_type") === "view").select("user_id").distinct().count())
    val rateSum = df.agg(sum("rate")).head().getDouble(0)
    assert(math.abs(rateSum - 1.0) < 1e-9)
  }

  test("q102 markov: probabilities normalize per source state, counts cover all transitions") {
    val df = TemporalOps.q102.build(spark, sf).cache()
    val sums = df.groupBy("prev_type").agg(sum("p").as("ps"))
    assert(sums.filter(abs(col("ps") - 1.0) > 1e-9).count() === 0)
    // total transitions = total events - one per user (no predecessor)
    val events = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.agg(sum("n")).head().getLong(0) === events - users)
  }

  test("q107 scd2 lookup: one row per purchase, validity honored, nulls only pre-history") {
    val df = TemporalOps.q107.build(spark, sf).cache()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() === purchases)
    assert(df.select("event_id").distinct().count() === purchases)
    // matched rows obey the validity interval
    val dim = TemporalOps.q72.build(spark, sf)
      .select(col("user_id"), col("version"), col("valid_from"), col("valid_to"))
    val viol = df.filter(col("version").isNotNull)
      .join(dim, Seq("user_id", "version"))
      .filter(col("valid_from") > col("t") ||
        (col("valid_to").isNotNull && col("valid_to") <= col("t")))
    assert(viol.count() === 0)
    // unmatched rows are exactly the lookups before the user's history starts
    val firstFrom = dim.groupBy("user_id").agg(min("valid_from").as("f0"))
    val unmatched = df.filter(col("version").isNull).join(firstFrom, "user_id")
    assert(unmatched.filter(col("t") >= col("f0")).count() === 0)
  }

  test("q113 survival: durations non-negative, censored iff no later purchase") {
    val df = TemporalOps.q113.build(spark, sf).cache()
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(df.count() === signups)
    assert(df.filter(col("duration_s") < 0).count() === 0)
    // censored rows end exactly at the corpus horizon
    val maxEs = Tables.events(spark, sf)
      .select((expr("ts div 1000000000")).as("es")).agg(max("es")).head().getLong(0)
    assert(df.filter(col("censored"))
      .filter(col("t0") + col("duration_s") =!= maxEs).count() === 0)
    // uncensored users really purchased after their signup
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("ts div 1000000000").as("es"))
    val bad = df.filter(!col("censored"))
      .join(ev.filter(col("event_type") === "purchase"), "user_id")
      .groupBy("user_id", "t0", "duration_s")
      .agg(max(when(col("es") === col("t0") + col("duration_s"), 1L).otherwise(0L)).as("hit"))
      .filter(col("hit") === 0)
    assert(bad.count() === 0)
  }

  test("q112 sequence match: seq lengths = event counts, regex verdict reproducible") {
    val df = TemporalOps.q112.build(spark, sf).cache()
    assert(df.filter(length(col("seq")) =!= col("n_events")).count() === 0)
    assert(df.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sf).count())
    // verdict re-derived on the driver from the emitted sequences
    df.collect().foreach { r =>
      val expect = "v[ce]*c[ce]*p".r.findFirstIn(r.getString(2)).isDefined
      assert(r.getBoolean(3) === expect, s"user ${r.getLong(0)}")
    }
    // the fixture should have both matched and unmatched users
    assert(df.filter(col("matched")).count() > 0)
  }

  test("q110 range frames: every frame includes self, brute-force parity on one user") {
    val df = TemporalOps.q110.build(spark, sf).cache()
    assert(df.count() === Tables.events(spark, sf).count())
    assert(df.filter(col("n_10m") < 1).count() === 0)
    // brute-force recompute for one user
    val u = df.select("user_id").head().getLong(0)
    val rows = df.filter(col("user_id") === u)
      .select("es", "n_10m").collect().map(r => (r.getLong(0), r.getLong(1)))
    val times = rows.map(_._1)
    rows.foreach { case (es, n) =>
      val expect = times.count(t => t >= es - 600 && t <= es)
      assert(n === expect, s"user $u es $es")
    }
  }

  test("q100 cohort retention: offset-0 is 100%, rates within (0,1]") {
    val df = TemporalOps.q100.build(spark, sf).cache()
    val zero = df.filter(col("offset_w") === 0)
    assert(zero.filter(col("n_active") =!= col("n_cohort")).count() === 0)
    assert(df.filter(col("retention") <= 0 || col("retention") > 1).count() === 0)
    // cohort sizes sum to the distinct-user universe
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(zero.agg(sum("n_cohort")).head().getLong(0) === users)
  }

  test("q117 changepoint: cusum is the running sum of devs and ~0 at horizon") {
    val df = TemporalOps.q117.build(spark, sf).cache()
    // one row per (event_type, day) actually present in events
    val pairs = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 1000000000) div 86400").as("day"))
      .distinct().count()
    assert(df.count() === pairs)
    // per type: cusum telescopes (cusum_i - cusum_{i-1} = dev_i, first = dev)
    df.collect().groupBy(_.getString(0)).foreach { case (_, rows) =>
      var run = BigDecimal(0)
      rows.sortBy(_.getLong(1)).foreach { r =>
        run += BigDecimal(r.getDouble(3)).setScale(6)
        assert(run.toDouble === r.getDouble(4))
      }
      // mean rounded to 6dp => |final cusum| <= 5e-7 * days
      assert(math.abs(run.toDouble) <= 5e-7 * rows.size + 1e-9)
    }
  }

  test("q122 attribution: purchases and revenue conserved per model") {
    val df = TemporalOps.q122.build(spark, sf).cache()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    val nP = purchases.count()
    val rev = purchases
      .agg(sum(col("value").cast("decimal(18,4)"))).head().getDecimal(0)
    Seq("last_touch", "first_touch").foreach { m =>
      val part = df.filter(col("model") === m)
      assert(part.agg(sum("n_purchases")).head().getLong(0) === nP, m)
      val got = part.agg(sum("revenue")).head().getDouble(0)
      assert(math.abs(got - rev.doubleValue()) < 1e-4, m)
    }
    // channels are only the four synthesized ones + the explicit bucket
    val chans = df.select("channel").distinct().collect().map(_.getString(0)).toSet
    assert(chans.subsetOf(
      Set("direct", "email", "search", "social", "unattributed")))
    // an unattributed purchase really has no prior view/click
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("es"), col("event_id"))
    val firstTouch = ev.filter(col("event_type").isin("view", "click"))
      .groupBy("user_id").agg(min(struct(col("es"), col("event_id"))).as("t"))
    val pNoTouch = ev.filter(col("event_type") === "purchase")
      .join(firstTouch, Seq("user_id"), "left")
      .filter(col("t").isNull ||
        struct(col("es"), col("event_id")) <= col("t"))
      .count()
    val unatt = df.filter(col("model") === "last_touch" &&
      col("channel") === "unattributed")
      .agg(sum("n_purchases")).head()
    assert((if (unatt.isNullAt(0)) 0L else unatt.getLong(0)) === pNoTouch)
  }

  test("q127 streaks: matches a driver-side islands recompute") {
    val df = TemporalOps.q127.build(spark, sf).cache()
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), expr("(ts div 1000000000) div 86400").as("day"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    assert(df.count() === byUser.size)
    df.collect().foreach { r =>
      val days = byUser(r.getLong(0))
      // island lengths from consecutive-day runs over the sorted days
      val lens = scala.collection.mutable.ListBuffer(1L)
      days.sliding(2).filter(_.length == 2).foreach { p =>
        if (p(1) == p(0) + 1) lens(lens.size - 1) += 1 else lens += 1L
      }
      assert(r.getLong(3) === days.size) // active_days
      assert(r.getLong(1) === lens.size) // n_streaks
      assert(r.getLong(2) === lens.max)  // longest
    }
  }

  test("q128 twap: intervals telescope, twap matches driver recompute") {
    val df = TemporalOps.q128.build(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000000").as("es"),
        col("event_id"), col("value"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(r => (r.getLong(1), r.getLong(2)))).toMap
    df.collect().foreach { r =>
      val rows = ev(r.getLong(0))
      assert(r.getLong(1) === rows.size - 1)
      // total interval time telescopes to span
      assert(r.getLong(2) === rows.last.getLong(1) - rows.head.getLong(1))
      val num = rows.sliding(2).map { p =>
        BigDecimal(p(0).getDouble(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
          BigDecimal(p(1).getLong(1) - p(0).getLong(1))
      }.sum
      val twap = num.toDouble / (rows.last.getLong(1) - rows.head.getLong(1))
      assert(math.abs(r.getDouble(3) - twap) < 1e-9)
    }
  }

  test("q130 decay score: integer decay recompute, bounded by undecayed sum") {
    val df = TemporalOps.q130.build(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000000").as("es"), col("value"))
      .collect()
    val tMax = ev.map(_.getLong(1)).max
    val cr = Array(1000000L, 905724L, 820335L, 742997L, 672950L, 609507L, 552045L)
    val expect = ev.groupBy(_.getLong(0)).view.mapValues { rows =>
      val micro = rows.map { r =>
        val days = (tMax - r.getLong(1)) / 86400L
        val dm = math.floor(cr((days % 7).toInt) / math.pow(2.0, (days / 7).toDouble)).toLong
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * dm
      }.sum
      (rows.length.toLong, micro.toDouble / 1e6)
    }.toMap
    val got = df.collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, score) = expect(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - score) < 1e-6)
      // decay <= 1 so the score never exceeds the undecayed value sum
      val raw = ev.filter(_.getLong(0) == r.getLong(0)).map(_.getDouble(2)).sum
      assert(r.getDouble(2) <= raw + 1e-6)
    }
  }

  test("q134 rolling distinct: WAU matches brute-force trailing-7-day sets") {
    val df = TemporalOps.q134.build(spark, sf).cache()
    val base = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = base.map(_._2).distinct.sorted
    assert(df.count() === days.length)
    df.collect().foreach { r =>
      val d = r.getLong(0)
      val dau = base.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = base.filter(b => b._2 >= d - 6 && b._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(r.getLong(1) === dau)
      assert(r.getLong(2) === wau)
      // the window contains the day, so DAU <= WAU and stickiness in (0, 1]
      assert(dau <= wau)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("q143 interval merge: matches brute-force union of 30-min ranges") {
    val df = TemporalOps.q143.build(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000000").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = ev.groupBy(_._1).view.mapValues { rows =>
      val sorted = rows.map(r => (r._2, r._2 + 1800L)).sortBy(identity)
      val merged = sorted.tail.foldLeft(List(sorted.head)) {
        case (acc @ ((s0, e0) :: rest), (s1, e1)) =>
          if (s1 <= e0) (s0, math.max(e0, e1)) :: rest else (s1, e1) :: acc
        case (Nil, iv) => List(iv)
      }
      (merged.length.toLong,
        merged.map(iv => iv._2 - iv._1).sum,
        merged.map(iv => iv._2 - iv._1).max,
        rows.length.toLong)
    }.toMap
    assert(df.count() === expect.size)
    df.collect().foreach { r =>
      val (n, cov, lng, ne) = expect(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === cov)
      assert(r.getLong(3) === lng)
      assert(r.getLong(4) === ne)
      // every merged span covers at least one raw interval
      assert(r.getLong(2) >= 1800L && r.getLong(3) >= 1800L)
    }
  }

  test("q146 seasonal anomaly: leave-one-out weekday baseline, exact flag") {
    val df = TemporalOps.q146.build(spark, sf).cache()
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 1000000000 div 86400").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    df.collect().foreach { r =>
      val (et, day, dow, n) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dow === ((day + 4) % 7))
      assert(n === daily((et, day)))
      val peers = daily.filter { case ((e, d), _) =>
        e == et && ((d + 4) % 7) == dow && d != day
      }.values
      assert(peers.nonEmpty)
      val baseline = peers.sum.toDouble / peers.size
      assert(math.abs(r.getDouble(4) - baseline) < 1e-9)
      // integer cross-multiplied form: no double rounding at the tie
      assert(r.getBoolean(5) === (2 * n * peers.size > 3 * peers.sum))
    }
  }

  test("q151 ewma: dyadic-weight recompute; den telescopes to 255 once warm") {
    val df = TemporalOps.q151.build(spark, sf).cache()
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 1000000000) div 86400").as("day"))
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d0ByType = daily.keys.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    df.collect().foreach { r =>
      val (t, d) = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) === daily.getOrElse((t, d), 0L))
      val m = math.min(7L, d - d0ByType(t))
      val den = 256L - (1L << (7 - m).toInt)
      assert(r.getLong(4) === den)
      if (m == 7L) assert(den === 255L)
      val num = (0 to m.toInt)
        .map(k => (1L << (7 - k)) * daily.getOrElse((t, d - k), 0L)).sum
      assert(r.getLong(3) === num)
      assert(r.getDouble(5) === num.toDouble / den.toDouble)
    }
  }

  test("q157 late data audit: driver recompute of lateness buckets") {
    val df = TemporalOps.q157.build(spark, sf).collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000000000").as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var hwm = Long.MinValue
    val lates = ev.map { case (_, es) => hwm = math.max(hwm, es); hwm - es }
    def bucket(l: Long): Int =
      if (l == 0) 0 else if (l <= 300) 1 else if (l <= 600) 2
      else if (l <= 1800) 3 else if (l <= 3600) 4 else 5
    val expect = lates.groupBy(bucket).view
      .mapValues(ls => (ls.length.toLong, ls.max)).toMap
    assert(df.length === expect.size)
    df.foreach { r =>
      val (n, mx) = expect(r.getLong(0).toInt)
      assert(r.getLong(2) === n, s"bucket ${r.getString(1)} count")
      assert(r.getLong(3) === mx, s"bucket ${r.getString(1)} max lateness")
    }

    // the fixture is chronologically ordered (1 bucket); prove the band
    // logic on a synthetic out-of-order stream staged as a fixture dir
    val dir = java.nio.file.Files.createTempDirectory("late-audit")
    dir.toFile.deleteOnExit()
    val rows = Seq((1L, 1000L), (2L, 900L), (3L, 2000L),
      (4L, 1500L), (5L, 9200L), (6L, 5200L))
    import spark.implicits._
    rows.toDF("event_id", "es")
      .select(col("event_id"),
        timestamp_seconds(col("es")).cast("timestamp_ntz").as("ts"),
        lit(1L).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val syn = TemporalOps.q157.build(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(syn === Map(0L -> (3L, 0L), 1L -> (1L, 100L),
      2L -> (1L, 500L), 5L -> (1L, 4000L)))
  }

  test("q158 rolling HLL: every estimate within 5% of the exact WAU") {
    val est = TemporalOps.q158.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = TemporalOps.q134.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (d, w) =>
      assert(math.abs(est(d).toDouble - w) <= math.max(2.0, 0.05 * w),
        s"day $d: est ${est(d)} vs exact $w")
    }
  }

  test("q152 path trigrams: driver recompute of the global top-10") {
    val got = TemporalOps.q152.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000000000").as("es"),
        col("event_id"), col("event_type"))
      .collect()
    val tri = ev.groupBy(_.getLong(0)).values.flatMap { rows =>
      val path = rows.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getString(3))
      path.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }
    val top = tri.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (g, c) => (-c, g) }.take(10)
    assert(got === top)
    assert(got.nonEmpty)
  }

  test("q186 interval overlap: cell decomposition equals a driver brute force") {
    val got = TemporalOps.q186.build(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // driver brute force over the naive theta-join semantics
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("es"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def res(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 12
    }
    val windows = ev.map { case (_, _, t, es) => (t, es / 86400) }.distinct
      .map { case (t, d) => (t, d, d * 86400 + res(t) * 3600) }
    val acc = scala.collection.mutable.Map[(String, Long), (Set[Long], Set[Long])]()
    for ((t, d, bs) <- windows; (id, u, _, es) <- ev) {
      if (es < bs + 7200 && bs < es + 1800) {
        val k = (t, d)
        val (ids, us) = acc.getOrElse(k, (Set.empty[Long], Set.empty[Long]))
        acc(k) = (ids + id, us + u)
      }
    }
    assert(got.keySet === acc.keySet)
    acc.foreach { case (k, (ids, us)) =>
      assert(got(k) === ((ids.size.toLong, us.size.toLong)))
    }
  }

  test("q191 quarantine: statuses partition the stream, rejects non-empty") {
    val rows = TemporalOps.q191.build(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("valid", "bad_type", "malformed"))
    assert(rows.values.sum === Tables.events(spark, sf).count())
    assert(rows("bad_type") > 0 && rows("malformed") > 0)
    assert(rows("valid") > rows("bad_type") + rows("malformed"))
  }
}
