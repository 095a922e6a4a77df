package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): algebraic laws checked over
  * ScalaCheck-generated micro-tables. Gen is driven with explicit seeds
  * (no scalatest bridge in the offline cache) so failures reproduce. */
/** Witness that a task attempt actually failed (see the retry spec). */
object RetryProbe {
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class PropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val rowsGen = Gen.listOfN(150, for {
    k <- Gen.choose(0, 15)
    v <- Gen.choose(-1000, 1000)
  } yield (k, v))

  private val seeds = 1L to 8L

  test("join algebra: semi + anti partition the probe side; left = inner + anti") {
    import spark.implicits._
    seeds.foreach { s =>
      val l = sample(rowsGen, s).toDF("k", "v")
      val r = sample(rowsGen, s + 100).toDF("k", "w")
        .groupBy("k").agg(max("w").as("w")) // unique build keys
      val inner = l.join(r, Seq("k"), "inner").count()
      val left = l.join(r, Seq("k"), "left").count()
      val semi = l.join(r, Seq("k"), "left_semi").count()
      val anti = l.join(r, Seq("k"), "left_anti").count()
      assert(semi + anti === l.count(), s"seed=$s")
      assert(left === inner + anti, s"seed=$s")
      assert(semi === inner, s"seed=$s (unique build keys ⇒ semi = inner)")
    }
  }

  test("dedup idempotence: dropDuplicates twice = once; count = distinct keys") {
    import spark.implicits._
    seeds.foreach { s =>
      val df = sample(rowsGen, s).toDF("k", "v")
      val once = df.dropDuplicates("k")
      assert(once.count() === df.select("k").distinct().count(), s"seed=$s")
      assert(once.dropDuplicates("k").count() === once.count(), s"seed=$s")
    }
  }

  test("window running sum: last value per key equals the group total") {
    import spark.implicits._
    seeds.foreach { s =>
      val df = sample(rowsGen, s).zipWithIndex
        .map { case ((k, v), i) => (k, v.toLong, i.toLong) }
        .toDF("k", "v", "ord")
      val w = Window.partitionBy("k").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastRunning = df.withColumn("run", sum("v").over(w))
        .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy(col("ord").desc)))
        .filter(col("rn") === 1).select("k", "run")
      val groupSum = df.groupBy("k").agg(sum("v").as("tot"))
      val mismatch = lastRunning.join(groupSum, "k")
        .filter(col("run") =!= col("tot")).count()
      assert(mismatch === 0, s"seed=$s")
    }
  }

  test("set ops: |A ∪ B| + |A ∩ B| = |A| + |B| on distinct key sets") {
    import spark.implicits._
    seeds.foreach { s =>
      val a = sample(rowsGen, s).map(_._1).toDF("k").distinct()
      val b = sample(rowsGen, s + 100).map(_._1).toDF("k").distinct()
      val u = a.union(b).distinct().count()
      val i = a.intersect(b).count()
      assert(u + i === a.count() + b.count(), s"seed=$s")
      assert(a.except(b).count() === a.count() - i, s"seed=$s")
    }
  }

  test("native as-of join equals the composed join-then-rank on random tables") {
    import spark.implicits._
    import graft.plans.AsOfOps
    val eventsGen = Gen.listOfN(120, for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    val quotesGen = Gen.listOfN(80, for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 50L); p <- Gen.choose(1, 999)
    } yield (k, t, p))
    seeds.foreach { s =>
      val ev = sample(eventsGen, s).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("eid", "ek", "et")
      val qt = sample(quotesGen, s + 100).zipWithIndex
        .map { case ((k, t, p), i) => (i.toLong, k, t, p) }.toDF("qid", "qk", "qt", "qp")
      val native = AsOfOps.asofJoin(ev, qt, ev("ek"), qt("qk"), ev("et"), qt("qt"),
          rightTieBreak = Seq(qt("qid")))
        .select("eid", "qid")
      val w = Window.partitionBy("eid")
        .orderBy(col("qt").desc, col("qid").desc)
      val composed = ev.join(qt, col("ek") === col("qk") && col("qt") <= col("et"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("eid", "qid")
      assert(native.exceptAll(composed).count() === 0, s"seed=$s")
      assert(composed.exceptAll(native).count() === 0, s"seed=$s")
    }
  }

  test("native FORWARD as-of join equals the composed rank-ascending form on random tables") {
    import spark.implicits._
    import graft.plans.AsOfOps
    val eventsGen = Gen.listOfN(120, for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 50L)
    } yield (k, t))
    val quotesGen = Gen.listOfN(80, for {
      k <- Gen.choose(0L, 8L); t <- Gen.choose(0L, 50L); p <- Gen.choose(1, 999)
    } yield (k, t, p))
    seeds.foreach { s =>
      val ev = sample(eventsGen, s).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("eid", "ek", "et")
      val qt = sample(quotesGen, s + 100).zipWithIndex
        .map { case ((k, t, p), i) => (i.toLong, k, t, p) }.toDF("qid", "qk", "qt", "qp")
      val native = AsOfOps.asofJoin(ev, qt, ev("ek"), qt("qk"), ev("et"), qt("qt"),
          rightTieBreak = Seq(qt("qid")), forward = true)
        .select("eid", "qid")
      val w = Window.partitionBy("eid")
        .orderBy(col("qt").asc, col("qid").asc)
      val composed = ev.join(qt, col("ek") === col("qk") && col("qt") >= col("et"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("eid", "qid")
      assert(native.exceptAll(composed).count() === 0, s"seed=$s")
      assert(composed.exceptAll(native).count() === 0, s"seed=$s")
    }
  }

  test("decimal sum is partitioning-independent (order-free aggregation)") {
    import spark.implicits._
    seeds.foreach { s =>
      val vals = sample(Gen.listOfN(300, Gen.choose(-1e6, 1e6)), s)
      val df = vals.toDF("v").select(col("v").cast("decimal(18,4)").as("v"))
      val s1 = df.coalesce(1).agg(sum("v")).head().getDecimal(0)
      val s32 = df.repartition(32).agg(sum("v")).head().getDecimal(0)
      assert(s1 === s32, s"seed=$s")
    }
  }

  test("md5-residue sample membership is bit-identical across task retries") {
    val spk = spark
    import spk.implicits._
    // a source whose partition 1 FAILS on its first attempt: the rows that
    // survive must be chosen by content hash, not by attempt/partition
    // state. (An accumulator can't witness the failure — updates from
    // failed tasks are dropped — so a JVM-singleton probe records it;
    // sound in local mode where tasks share the driver JVM.)
    RetryProbe.fired.set(false)
    val flaky = spk.range(0, 10000, 1, 4).mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc.partitionId() == 1 && tc.attemptNumber() == 0) {
        RetryProbe.fired.set(true)
        throw new RuntimeException("injected first-attempt failure")
      }
      it
    }.toDF("id")
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .filter(graft.Canon.md5Residue(col("id").cast("string"), 20) === 0)
      .agg(count(lit(1)), sum(col("id")))
      .as[(Long, Long)].head()
    val withRetry = sample(flaky)
    assert(RetryProbe.fired.get(), "the injected failure never fired")
    val clean = sample(spk.range(0, 10000, 1, 4).toDF("id"))
    assert(withRetry === clean)
  }

  test("property: withExactRank == unpartitioned row_number for random " +
    "data (heavy ties), any bucket count, both directions") {
    import spark.implicits._
    // heavy duplicate values stress the boundary-tiling argument: rows
    // equal on the value column MUST still rank identically because the
    // composite boundary includes the unique tiebreak
    val dataGen = Gen.listOfN(300, Gen.choose(0, 9))
    seeds.foreach { s =>
      val vals = sample(dataGen, s)
      val df = vals.zipWithIndex
        .map { case (v, i) => (v.toLong, i.toLong) }.toDF("v", "id")
        .repartition(7) // scatter rows so buckets span partitions
      for ((asc, buckets) <- Seq((true, 2), (true, 32), (false, 5))) {
        val ord =
          if (asc) Seq(col("v").asc, col("id").asc)
          else Seq(col("v").desc, col("id").asc)
        val expected = df.withColumn("rn",
            row_number().over(Window.orderBy(ord: _*)).cast("long"))
          .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2)))
        val got = graft.operators.ScaleOps.withExactRank(df, "rn",
            Seq("v" -> asc, "id" -> true), buckets = buckets,
            sampleFraction = 0.5)
          .orderBy("id").collect().map(r => (r.getLong(1), r.getLong(2)))
        assert(got.toSeq === expected.toSeq,
          s"seed=$s asc=$asc buckets=$buckets")
      }
    }
  }

  test("bucket function: the V2 produceResult == the writer column == " +
    "bucketOf for random longs/strings + null, any bucket count; " +
    "results always land in [0, n)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import graft.sources.GraftBucketFunction
    seeds.foreach { s =>
      val n = sample(Gen.choose(1, 64), s)
      // LONG keys (negative included — floorMod, not %)
      val longs = sample(Gen.listOfN(60,
        Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)), s)
      val viaCol = longs.toDF("k")
        .select(pmod(hash(col("k")), lit(n)).as("b"))
        .collect().map(_.getInt(0)).toSeq
      val viaOf = longs.map(v =>
        GraftBucketFunction.bucketOf(v, LongType, n))
      val boundL = GraftBucketFunction.bind(StructType(Seq(
        StructField("_0", IntegerType), StructField("_1", LongType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
          .ScalarFunction[Integer]]
      val viaFn = longs.map(v =>
        boundL.produceResult(InternalRow(n, v)).intValue())
      assert(viaCol === viaOf, s"seed=$s n=$n: bucketOf drifted")
      assert(viaCol === viaFn, s"seed=$s n=$n: produceResult drifted")
      assert(viaCol.forall(b => b >= 0 && b < n))
      // STRING keys + the null row (hash(null) = seed on every path)
      val strs = sample(Gen.listOfN(40, Gen.alphaNumStr), s)
      val viaColS = strs.toDF("k")
        .select(pmod(hash(col("k")), lit(n)).as("b"))
        .collect().map(_.getInt(0)).toSeq
      val boundS = GraftBucketFunction.bind(StructType(Seq(
        StructField("_0", IntegerType), StructField("_1", StringType))))
        .asInstanceOf[org.apache.spark.sql.connector.catalog.functions
          .ScalarFunction[Integer]]
      val viaFnS = strs.map(v =>
        boundS.produceResult(InternalRow(n, UTF8String.fromString(v)))
          .intValue())
      assert(viaColS === viaFnS, s"seed=$s n=$n: string bucket drifted")
      val nullCol = Seq(Option.empty[String]).toDF("k")
        .select(pmod(hash(col("k")), lit(n)).as("b"))
        .head().getInt(0)
      assert(nullCol === boundS.produceResult(InternalRow(n, null))
        .intValue(), s"seed=$s n=$n: null bucket drifted")
    }
  }

  test("property: eq-merge LWW composes over RANDOM change-batch " +
    "sequences — stored state == a driver fold, before and after purge") {
    import spark.implicits._
    import graft.sources.Sources
    // a batch: per touched key an op; upserts carry a payload derived
    // from (batch, key) so last-writer-wins is observable
    val batchGen = Gen.listOfN(6, for {
      k <- Gen.choose(1L, 12L)
      isUpsert <- Gen.oneOf(true, false)
    } yield (k, isUpsert))
    val seqGen = Gen.listOfN(4, batchGen)
    seeds.foreach { s =>
      val batches = sample(seqGen, s)
      val dir = java.nio.file.Files.createTempDirectory(s"eq-prop-$s")
      dir.toFile.deleteOnExit()
      val t = s"$dir/t"
      Sources.commitVersion(
        (1L to 12L).map(k => (k, s"base$k")).toDF("k", "w"), t)
      var expected: Map[Long, String] =
        (1L to 12L).map(k => k -> s"base$k").toMap
      batches.zipWithIndex.foreach { case (b, i) =>
        // a key may appear twice in one generated batch — keep the
        // FIRST op per key (distinct change keys is the API contract)
        val perKey = b.groupBy(_._1).view.mapValues(_.head._2).toSeq
        val changes = perKey.map { case (k, up) =>
          (k, s"b$i-$k", if (up) "upsert" else "delete")
        }.toDF("k", "w", "op")
        Sources.mergeVersionEq(spark, t, changes, Seq("k"))
        perKey.foreach { case (k, up) =>
          expected = if (up) expected + (k -> s"b$i-$k") else expected - k
        }
        val got = Sources.readVersion(spark, t)
          .select("k", "w").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got === expected,
          s"seed=$s after batch $i: stored state diverged from the fold")
      }
      // the deferred position work reclaims losslessly
      Sources.purgeEq(spark, t)
      val afterPurge = Sources.readVersion(spark, t)
        .select("k", "w").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(afterPurge === expected, s"seed=$s: purge changed the state")
      assert(Sources.eqOf(t, Sources.latestVersion(t)).isEmpty)
      // and the whole history replays through batch CDF: LWW-reducing
      // readChanges(0 -> head) over the base snapshot == the fold
      val head = Sources.latestVersion(t)
      val feed = Sources.readChanges(spark, t, 1, head)
        .select("k", "w", "_change_type").collect()
      // readChanges collapses the range: deletes name retired rows,
      // inserts the surviving ones — apply deletes then inserts
      val dels = feed.filter(_.getString(2) == "delete")
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val ins = feed.filter(_.getString(2) == "insert")
        .map(r => (r.getLong(0), r.getString(1)))
      val base = (1L to 12L).map(k => k -> s"base$k")
        .filterNot { case (k, w) => dels.contains((k, w)) }.toMap
      val fromCdf = ins.foldLeft(base) { case (acc, (k, w)) =>
        acc + (k -> w) }
      assert(fromCdf === expected,
        s"seed=$s: CDF range replay diverged from the fold")
    }
  }

  test("property: boundedCells totally partitions ANY corpus with every " +
    "final cell under the cap — random duplication factors and skews") {
    import spark.implicits._
    // corpora drawn with a random number of dense duplicate clusters
    // (the seed-split-defeating shape) mixed with spread vectors
    val corpusGen = for {
      n <- Gen.choose(40, 160)
      nClusters <- Gen.choose(1, 4)
      clusterMass <- Gen.choose(30, 90) // percent of docs in clusters
      jitter <- Gen.choose(1, 9)
    } yield (0 until n).map { i =>
      val e = Array.fill(6)(0.0f)
      if (i * 100 < n * clusterMass) {
        val c = i % nClusters
        e(c) = 1.0f
        e(nClusters % 6) = 0.001f * jitter * (1 + i % 11)
      } else {
        e(i % 6) = 1.0f + 0.01f * (i % 7)
        e((i + 2) % 6) = 0.03f * (i % 5)
      }
      (i.toLong, e.toSeq)
    }
    seeds.foreach { s =>
      val rows = sample(corpusGen, s)
      val cap = 8
      val cells = functions.SimilarityOps
        .boundedCells(rows.toDF("vec_id", "embedding"), cap)
        .select("vec_id", "cell_id").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      // total partition: every vector exactly once
      assert(cells.length === rows.length, s"seed=$s: row count drifted")
      assert(cells.map(_._1).distinct.length === rows.length,
        s"seed=$s: a vector landed in two cells")
      // the hard bound, whatever the duplication structure
      val occ = cells.groupBy(_._2).view.mapValues(_.length)
      val worst = occ.maxBy(_._2)
      assert(worst._2 <= cap,
        s"seed=$s: cell ${worst._1} holds ${worst._2} > cap $cap")
    }
  }

  test("property: decontaminate == the brute-force n-gram overlap on " +
    "random corpora over a tiny vocabulary (heavy accidental overlap)") {
    import spark.implicits._
    val n = 3
    // tiny vocabulary forces real n-gram collisions between random docs
    val docGen = Gen.listOfN(30, for {
      len <- Gen.choose(0, 25)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks)
    seeds.foreach { s =>
      val docs = sample(docGen, s).zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.mkString(" "), "en")
      }
      val isBenchId = (id: Long) => id % 5 == 0
      // brute force on the driver
      def grams(ts: Seq[String]): Set[Seq[String]] =
        ts.sliding(n).filter(_.size == n).map(_.toSeq).toSet
      val toksOf = docs.map { case (id, t, _) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val benchGrams = toksOf.collect {
        case (id, ts) if isBenchId(id) => grams(ts) }
        .foldLeft(Set.empty[Seq[String]])(_ ++ _)
      val expected = toksOf.collect {
        case (id, ts) if !isBenchId(id) =>
          id -> grams(ts).count(benchGrams.contains)
      }.filter(_._2 > 0)
      val got = functions.TextOps.decontaminate(
          docs.toDF("doc_id", "text", "lang"), n,
          isBench = pmod(col("doc_id"), lit(5)) === 0)
        .select("doc_id", "n_shared").collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === expected,
        s"seed=$s: engine $got vs brute force $expected")
    }
  }
}
