package graft.functions

import graft.{Query, Tables}
import graft.plans.VectorExpressions.dotNative
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64):
  * brute-force cosine top-k as the correctness baseline (SURVEY.md §2.2
  * Q24) and an LSH-bucketed variant as the 100 TB scale path.
  *
  * Dot products use [[graft.plans.DotProduct]], a codegen'd native
  * expression (the higher-order `aggregate(zip_with(...))` form runs
  * interpreted and topped the sf0.1 profile). Norms are computed ONCE
  * per vector before the pair join — `sqrt(dot(v,v))` per pair would
  * triple the dominant cost. Both engines fold the array left-to-right
  * in double, so results stay bit-identical to the DuckDB oracle.
  */
object SimilarityOps {

  /** Reference (interpreted) formulation, kept for cross-checking the
    * native expression in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  /** Embeddings extended with a precomputed L2 norm. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dotNative(col("embedding"), col("embedding"))))

  /** Deterministic Lloyd-to-convergence k-means on a driver-held
    * sample — how production ANN indexes actually train their model
    * state (faiss trains IVF centroids and PQ codebooks on a bounded
    * sample, then applies them distributed; training on the full
    * corpus buys nothing once the sample covers the density). Seeds =
    * the first k points in input order (id-sorted upstream), empty
    * clusters keep their previous centroid, ties break to the smaller
    * index — every choice is deterministic, so the codebook is
    * reproducible across runs, partitionings, and retries. Stops when
    * assignments are stable or after `maxIters`. */
  private[graft] def lloyd(points: Array[Array[Double]], k: Int,
      maxIters: Int = 25): Array[Array[Double]] = {
    require(points.length >= k, s"need >= $k training points")
    val dim = points.head.length
    var cents = Array.tabulate(k)(i => points(i).clone)
    val assign = Array.fill(points.length)(-1)
    var changed = true
    var it = 0
    while (changed && it < maxIters) {
      changed = false
      val sums = Array.fill(k, dim)(0.0)
      val cnt = new Array[Long](k)
      var i = 0
      while (i < points.length) {
        val p = points(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var j = 0
          val cc = cents(c)
          while (j < dim) { val t = p(j) - cc(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c } // strict <: smaller-index tie
          c += 1
        }
        if (assign(i) != best) { changed = true; assign(i) = best }
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += p(j); j += 1 }
        cnt(best) += 1
        i += 1
      }
      cents = Array.tabulate(k)(c =>
        if (cnt(c) == 0) cents(c)
        else { val s = sums(c); Array.tabulate(dim)(j => s(j) / cnt(c)) })
      it += 1
    }
    cents
  }

  /** The bounded deterministic training sample: the first `n` vectors
    * by id. Driver-held model input (n×64 doubles), never data-scale —
    * the id predicate pushes to the scan, so at 100 TB this reads a
    * handful of files of an id-clustered layout, not the corpus. */
  private def trainSample(emb: DataFrame, n: Int): Array[Array[Double]] =
    emb.filter(col("vec_id") < n).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))

  private val dotSql = (a: String, b: String) =>
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Q24 — cosine top-5 neighbors of a fixed query vector (vec_id 0) per
    * label. The one-row query side is broadcast; the scan side streams —
    * a single pass, no shuffle except the final per-label top-k. */
  val q24 = Query(
    "q24_cosine_topk",
    (s, dir) => {
      val emb = withNorm(Tables.embeddings(s, dir))
      val qv = broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("nrm").as("qnrm")))
      val w = Window.partitionBy("label").orderBy(col("sim").desc, col("vec_id").asc)
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(qv)
        .select(col("vec_id"), col("label"),
          (dotNative(col("embedding"), col("qe")) / (col("nrm") * col("qnrm")))
            .as("sim"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select("label", "rn", "vec_id", "sim")
        .orderBy("label", "rn")
    },
    Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
            |sims AS (
            |  SELECT vec_id, label,
            |         ${cosineSql("e.embedding", "q.qe")} AS sim
            |  FROM embeddings e CROSS JOIN q
            |  WHERE vec_id <> 0)
            |SELECT label, CAST(row_number() OVER w AS BIGINT) AS rn, vec_id, sim
            |FROM sims
            |WINDOW w AS (PARTITION BY label ORDER BY sim DESC, vec_id ASC)
            |QUALIFY row_number() OVER w <= 5
            |ORDER BY label, rn""".stripMargin)
  )

  /** Q31 — brute-force nearest neighbor for a probe set (vec_id < 50):
    * the all-pairs baseline every ANN variant is validated against.
    * Probe side is broadcast (it is the small side by construction). */
  val q31 = Query(
    "q31_knn_bruteforce",
    (s, dir) => {
      val emb = withNorm(Tables.embeddings(s, dir))
      val probes = broadcast(emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"),
          col("nrm").as("na")))
      val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
      probes
        .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
          col("nrm").as("nb")),
          col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          (dotNative(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("a_id", "b_id", "sim")
        .orderBy("a_id")
    },
    Some(s"""WITH probes AS (
            |  SELECT vec_id AS a_id, embedding AS ea FROM embeddings WHERE vec_id < 50),
            |sims AS (
            |  SELECT a_id, e.vec_id AS b_id,
            |         ${cosineSql("p.ea", "e.embedding")} AS sim
            |  FROM probes p JOIN embeddings e ON e.vec_id <> p.a_id)
            |SELECT a_id, b_id, sim
            |FROM sims
            |QUALIFY row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id ASC) = 1
            |ORDER BY a_id""".stripMargin)
  )

  /** Q31b — LSH-bucketed ANN, the scale path: **multi-table**
    * random-hyperplane LSH (the OR-amplified construction every
    * production LSH index uses — one table's bucket must match on ALL
    * its bits, any of L tables may produce the candidate). With bit
    * agreement probability p = 1 − θ/π per hyperplane, recall@1 is
    * 1 − (1 − p^b)^L: a single 8-bit table on this fixture's
    * noise-level neighbors (cos ≈ 0.35 → p ≈ 0.61) gives 2%;
    * b=4, L=16 gives ≈ 0.91 (gated ≥ 0.8 in TextDedupSpec).
    *
    * Scale shape: candidates come from an equi-join on (table, bucket)
    * — per-bucket quadratic, never global quadratic — then pair-dedup
    * before scoring so a pair colliding in several tables is scored
    * once. The b/L knobs trade candidate volume against recall: wider
    * buckets (larger b) and fewer tables when true near-dups are
    * close (cos ≥ 0.8, the dedup regime); this fixture's noise-level
    * targets are LSH's worst case and still clear the gate. Recall is
    * approximate by design → rows-only check (SURVEY.md §7.4 excludes
    * approximate results from hash-matching). */
  val q31b = Query(
    "q31b_knn_lsh",
    (s, dir) => {
      val bits = 4
      val tables = 16
      // sign bit h of table t = 1 iff sum_d w(t,h,d) * v[d] > 0.
      // Weights come from a splitmix64 finalizer over (t,h,d) — the
      // first linear-congruential attempt left planes correlated across
      // tables (recall 0.62 observed vs 0.84 predicted for independent
      // planes; with splitmix the prediction holds)
      def mix(seed: Long): Long = {
        var z = seed + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      def planeBit(t: Int, h: Int): Column = {
        val weights = array((0 until 64).map { d =>
          lit((mix((t.toLong * 64 + h) * 67 + d) & 0xfffffL).toDouble
            / 0xfffffL.toDouble - 0.5)
        }: _*)
        when(dotNative(col("embedding"), weights) > 0, lit(1L << h)).otherwise(lit(0L))
      }
      def buckets: Column = array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          (0 until bits).map(h => planeBit(t, h)).reduce(_ + _).as("bucket"))
      }: _*)
      val emb = withNorm(Tables.embeddings(s, dir))
      val bucketed = emb.select(col("vec_id"), col("embedding"), col("nrm"),
        explode(buckets).as("tb"))
      val probes = bucketed.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("tb"))
      val cands = bucketed
        .select(col("vec_id").as("b_id"), col("tb"))
      // pair-dedup BEFORE scoring: multi-table collisions are common by
      // construction and the dot product is the expensive part
      val pairs = probes.join(cands, Seq("tb"))
        .filter(col("a_id") =!= col("b_id"))
        .select("a_id", "b_id").distinct()
      val ea = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val eb = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
      pairs.join(ea, "a_id").join(eb, "b_id")
        .select(col("a_id"), col("b_id"),
          (dotNative(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("a_id", "b_id", "sim")
        .orderBy("a_id")
    },
    None
  )

  /** Embedding-cosine near-duplicate pairs above a similarity threshold
    * (dedup-by-embedding mandate). Brute force over the probe range —
    * the LSH path (q31b) is the scale variant. */
  val q31c = Query(
    "q31c_embedding_neardup",
    (s, dir) => {
      val emb = withNorm(Tables.embeddings(s, dir))
      val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      a.filter(col("a_id") < 200)
        .join(b.filter(col("b_id") < 200), col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (dotNative(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
        .filter(col("sim") > 0.4)
        .orderBy("a_id", "b_id")
    },
    Some(s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            |       ${cosineSql("a.embedding", "b.embedding")} AS sim
            |FROM embeddings a JOIN embeddings b
            |  ON a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
            |WHERE ${cosineSql("a.embedding", "b.embedding")} > 0.4
            |ORDER BY a_id, b_id""".stripMargin)
  )

  /** Q31d — IVF-style ANN, the other scale path: a coarse quantizer
    * (k=8 centroids, [[lloyd]]-trained to convergence on the bounded
    * deterministic sample) partitions the vectors into cells; probes
    * search only their `nprobe=4` nearest cells via an equi-join on
    * the cell id.
    *
    * The centroids are k×dim driver constants (8×64 doubles — model
    * state, not data). Converged training (vs the earlier single Lloyd
    * iteration from raw seeds) tightens the cells so the true neighbor
    * lands inside the probed nprobe=4 set far more often — measured
    * recall@1 0.82 → ≥0.9 on the same fixture at the same nprobe.
    * Approximate by design → rows-only check, validated against brute
    * force in tests.
    */
  val q31d = Query(
    "q31d_knn_ivf",
    (s, dir) => {
      val emb = withNorm(Tables.embeddings(s, dir)).cache()
      val k = 8

      def centroidCol(c: Array[Double]): Column = array(c.map(lit): _*)
      def nearestCell(cents: Seq[Array[Double]]): Column = {
        // nearest by squared L2 == argmax(⟨x,c⟩ − ‖c‖²/2) — exact for
        // ANY centroid norms (converged means are not unit-norm, so
        // the plain-dot shortcut no longer applies); greatest(...)
        // with a struct tiebreak keeps it deterministic
        val scored = cents.zipWithIndex.map { case (c, i) =>
          struct((dotNative(col("embedding"), centroidCol(c))
              - lit(c.map(x => x * x).sum / 2.0)).as("s"),
            lit(i.toLong).as("cell"))
        }
        greatest(scored: _*).getField("cell")
      }

      val cents: Seq[Array[Double]] =
        lloyd(trainSample(emb, 2048), k).toSeq

      val cells = emb.withColumn("cell", nearestCell(cents))
        .select(col("vec_id").as("b_id"), col("embedding").as("eb"),
          col("nrm").as("nb"), col("cell"))
      // probes search their nprobe=4 nearest cells (of k=8): half the
      // index's cells, the recall/cost knob every IVF deployment tunes.
      // On this fixture's noise-level neighbors (true NN cos ≈ 0.35 —
      // cell assignment barely correlates with the NN) nprobe=2 gave
      // recall@1 0.60, nprobe=4 clears the 0.8 gate; clustered real
      // corpora sit far above this worst case at the same nprobe.
      val probeCells = emb.filter(col("vec_id") < 50)
        .withColumn("cellscores", array(cents.zipWithIndex.map { case (c, i) =>
          // same ⟨x,c⟩ − ‖c‖²/2 score as the index side, so "my nprobe
          // nearest cells" ranks cells exactly as assignment does
          struct((dotNative(col("embedding"), centroidCol(c))
              - lit(c.map(x => x * x).sum / 2.0)).as("s"),
            lit(i.toLong).as("cell"))
        }: _*))
        .withColumn("probed", slice(reverse(array_sort(col("cellscores"))), 1, 4))
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"),
          col("nrm").as("na"),
          explode(col("probed").getField("cell")).as("cell"))
      val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
      probeCells.join(cells, Seq("cell"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          (dotNative(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("a_id", "b_id", "sim")
        .orderBy("a_id")
    },
    None
  )

  /** Q65 — int8 embedding quantization: per-vector absmax scaling to
    * [-127, 127] (the standard storage/bandwidth compression for
    * embedding corpora — 4× smaller than float32, dot products stay
    * rank-faithful). Pure map-side array work; the digest condenses the
    * quantized vector so the oracle hash-checks every element without
    * shipping arrays through the compare. Zero vectors degrade to NULL
    * via nullif instead of dividing by zero.
    */
  val q65 = Query(
    "q65_vec_quantize",
    (s, dir) => {
      val amax = array_max(transform(col("embedding"), x => abs(x)))
        .cast("double")
      val scale = lit(127.0) / nullif(amax, lit(0.0))
      val qv = transform(col("embedding"),
        x => round(x.cast("double") * scale).cast("long"))
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"), col("label").cast("long").as("label"),
          amax.as("amax"),
          size(col("embedding")).cast("long").as("n_dims"),
          aggregate(qv, lit(0L), (acc, x) => acc + x).as("qsum"),
          md5(concat_ws(",", transform(qv, _.cast("string")))).as("qdigest"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (
           |  SELECT vec_id, label, embedding,
           |         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS amax
           |  FROM embeddings),
           |q AS (
           |  SELECT vec_id, label, amax, embedding,
           |         list_transform(embedding,
           |           x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / nullif(amax, 0.0))) AS BIGINT)) AS qv
           |  FROM e)
           |SELECT vec_id, CAST(label AS BIGINT) AS label, amax,
           |       CAST(len(embedding) AS BIGINT) AS n_dims,
           |       CAST(list_sum(qv) AS BIGINT) AS qsum,
           |       md5(array_to_string(qv, ',')) AS qdigest
           |FROM q ORDER BY vec_id""".stripMargin)
  )

  /** Q98 — SemDeDup-style semantic deduplication: coarse-cluster the
    * embedding corpus, then inside each cluster drop every vector that
    * is cosine-similar (> 0.4, this fixture's near-dup level — q31c)
    * to an earlier-id vector in the same cluster. This is the
    * embedding-space dedup pass LLM corpora run after exact/MinHash
    * text dedup; clustering first is what makes it tractable — pairwise
    * comparison happens only WITHIN a cluster, never globally.
    *
    * Clustering is TWO-LEVEL nearest-seed quantization (the
    * hierarchical IVF assignment shape): kc = ⌈√k⌉ COARSE seeds
    * (vec_id < kc) route each of the k FINE seeds (vec_id < k) to a
    * coarse cell, then every vector finds its coarse cell (kc dot
    * products) and its fine cell among only that coarse cell's fine
    * seeds (expected √k dot products). Assignment cost is n·2√k —
    * with the occupancy rule k = ⌈n/64⌉ that is O(n^1.5/8), not the
    * O(n²/64) a single dense n×k pass would cost, which is the
    * difference between feasible and impossible at 10⁹ vectors. Every
    * step is deterministic (argmax cosine, ties to the lower id;
    * coarse seeds self-route so no coarse cell is ever fine-seedless)
    * and exactly SQL-expressible, so the whole pipeline hash-checks
    * against the oracle (the cosine kernel is the bit-identical
    * native DotProduct). The trained-centroid variant lives in q31d.
    *
    * The drop rule is the non-recursive form (similar to ANY earlier
    * same-cell vector ⇒ drop), declared semantics — the chain-aware
    * variant needs the q66 iterative machinery.
    *
    * Scale shape: the only dense (nested-loop) joins are against the
    * kc = O(√k) coarse-seed relation, broadcast; the fine stage is an
    * equi-join on the coarse cell; the dup pair join is an equi-join
    * on cell (per-cell quadratic bounded by the k knob); verdict is
    * one anti-join keyed (cell, vec_id). No corpus-proportional
    * relation ever sits on the dense side of a join
    * (PlanShapeSpec asserts this on the physical plan).
    */
  /** q98's nearest-seed cell assignment with the cluster-granularity
    * knob `k` EXPOSED: seeds are the first k vec_ids (deterministic),
    * every vector lands in its argmax-cosine cell. k is the per-cell
    * quadratic bound's denominator — at corpus scale it must GROW with
    * n so expected cell size n/k (and the within-cell pair work
    * Σ c_i²) stays fixed; `TextDedupSpec` asserts the bound executes
    * (doubling k shrinks both the max cell and Σ c_i² on the fixture)
    * rather than living in a comment. */
  /** The occupancy rule for semantic-dedup cells: k = ⌈n / target⌉, so
    * the EXPECTED cell size stays `targetOccupancy` as the corpus
    * grows — the within-cell pair join's Σc² cost is then O(n · occ)
    * instead of O(n²/k_fixed), which is the difference between a knob
    * someone forgot to turn at 100× scale and a bound that holds by
    * construction. Both gated callers (q98/q224) and their DuckDB
    * oracles derive k this way, so the hash gate rides the same rule. */
  def derivedK(s: SparkSession, dir: String,
      targetOccupancy: Int = 64): Int = {
    val n = Tables.embeddings(s, dir).count()
    math.max(1, math.ceil(n.toDouble / targetOccupancy).toInt)
  }

  /** kc = ⌈√k⌉ — the coarse-seed count of the two-level assignment.
    * Both engines derive it identically (IEEE sqrt is correctly
    * rounded, so perfect squares are exact in both). */
  private[graft] def coarseCount(k: Long): Long =
    math.max(1L, math.ceil(math.sqrt(k.toDouble)).toLong)

  def semdedupCells(s: SparkSession, dir: String, k: Int): DataFrame =
    twoLevelCells(withNorm(Tables.embeddings(s, dir)), k.toLong)

  /** The two-level hierarchical nearest-seed assignment (shared by
    * q98/q224 and [[boundedCells]]'s first stage — see the q98
    * Scaladoc for the cost argument). Input must carry `nrm`; output
    * is (vec_id, embedding, nrm, cell, csim) with `csim` = cosine to
    * the OWN fine seed — q224's prototypicality rank needs
    * distance-to-own-seed.
    *
    * Determinism inventory: coarse argmax ties → lower coarse id;
    * coarse seeds (vec_id < kc) route to THEMSELVES (so a coarse cell
    * can never receive vectors while owning zero fine seeds, even
    * under duplicate-vector tie pathologies); fine argmax ties →
    * lower fine id. Only the kc-row coarse relation is broadcast
    * dense state; the `routed` fine-seed relation is k rows — corpus-
    * proportional under the occupancy rule — so its join is a keyed
    * equi-join on the coarse cell with NO broadcast hint (planner +
    * AQE decide). */
  // Argmax via row_number WINDOWS, deliberately: the max_by/first
  // partial-aggregation form needs struct- and array-valued aggregate
  // buffers, which Spark cannot hold in a codegen HashAggregate — the
  // whole plan fell to SortAggregate (measured 2x slower at sf0.1 than
  // one window sort per argmax). The windows partition by vec_id/cell,
  // so no global sort exists at any scale.
  private[graft] def twoLevelCells(emb: DataFrame, k: Long): DataFrame = {
    val kc = coarseCount(k)
    val coarse = broadcast(emb.filter(col("vec_id") < kc)
      .select(col("vec_id").as("ccell0"), col("embedding").as("cce"),
        col("nrm").as("ccn")))
    val fine = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"),
        col("nrm").as("cn"))
    val wr = Window.partitionBy("cell")
      .orderBy(col("rsim").desc, col("ccell0").asc)
    val routed = fine.crossJoin(coarse)
      .select(col("cell"), col("ce"), col("cn"), col("ccell0"),
        (dotNative(col("ce"), col("cce")) / (col("cn") * col("ccn")))
          .as("rsim"))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(
        when(col("cell") < kc, col("cell")).otherwise(col("ccell0"))
          .as("ccell"),
        col("cell"), col("ce"), col("cn"))
    val wv = Window.partitionBy("vec_id")
      .orderBy(col("vsim").desc, col("ccell0").asc)
    val vc = emb.crossJoin(coarse)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("ccell0"),
        (dotNative(col("embedding"), col("cce")) / (col("nrm") * col("ccn")))
          .as("vsim"))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("ccell0").as("ccell"))
    val wf = Window.partitionBy("vec_id")
      .orderBy(col("csim").desc, col("cell").asc)
    vc.join(routed, Seq("ccell"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"),
        (dotNative(col("embedding"), col("ce")) / (col("nrm") * col("cn")))
          .as("csim"))
      .withColumn("rn", row_number().over(wf))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "nrm", "cell", "csim")
  }

  /** The DuckDB statement of [[twoLevelCells]] as a CTE chain ending
    * in `cells(vec_id, embedding, cell, csim)` — shared verbatim by
    * the q98/q224/q227 oracles so the hash gates ride the exact
    * two-level rule the engine runs. `kExpr` is an aggregate over
    * `embeddings` yielding the fine-seed count k. */
  private def twoLevelCellsCtes(kExpr: String): String =
    s"""params AS (
       |  SELECT $kExpr AS k,
       |         CAST(CEIL(SQRT($kExpr)) AS BIGINT) AS kc
       |  FROM embeddings),
       |coarse AS (
       |  SELECT vec_id AS ccell, embedding AS cce FROM embeddings
       |  WHERE vec_id < (SELECT kc FROM params)),
       |fine AS (
       |  SELECT vec_id AS cell, embedding AS ce FROM embeddings
       |  WHERE vec_id < (SELECT k FROM params)),
       |routed AS (
       |  SELECT CASE WHEN f.cell < (SELECT kc FROM params) THEN f.cell
       |              ELSE c.ccell END AS ccell,
       |         f.cell, f.ce
       |  FROM fine f CROSS JOIN coarse c
       |  QUALIFY row_number() OVER (
       |    PARTITION BY f.cell
       |    ORDER BY ${cosineSql("f.ce", "c.cce")} DESC, c.ccell ASC) = 1),
       |vc AS (
       |  SELECT e.vec_id, e.embedding, c.ccell
       |  FROM embeddings e CROSS JOIN coarse c
       |  QUALIFY row_number() OVER (
       |    PARTITION BY e.vec_id
       |    ORDER BY ${cosineSql("e.embedding", "c.cce")} DESC, c.ccell ASC) = 1),
       |cells AS (
       |  SELECT v.vec_id, v.embedding, r.cell,
       |         ${cosineSql("v.embedding", "r.ce")} AS csim
       |  FROM vc v JOIN routed r ON v.ccell = r.ccell
       |  QUALIFY row_number() OVER (
       |    PARTITION BY v.vec_id
       |    ORDER BY ${cosineSql("v.embedding", "r.ce")} DESC, r.cell ASC) = 1)""".stripMargin

  /** OCCUPANCY-BOUNDED cell assignment — the hard per-cell guarantee
    * the derived-k rule alone cannot give on a SKEWED corpus (derived k
    * fixes the MEAN occupancy; a dense near-duplicate cluster still
    * lands one giant cell). Three deterministic stages:
    *
    *  1. two-level nearest-seed assignment at k = ⌈n/cap⌉ (the
    *     [[derivedK]] rule, via [[twoLevelCells]] — n·2√k dots, the
    *     q98 assignment shape);
    *  2. SEMANTIC SPLIT: each over-full cell re-assigns its members to
    *     ⌈c/cap⌉ sub-seeds (its first vec_ids) — one recursive
    *     quantization pass, pair cost Σ c·⌈c/cap⌉ ≈ n, never n²;
    *  3. HARD CHUNK: a still-over-full sub-cell (all-identical vectors
    *     defeat any seed split) chunks by prototypicality rank into
    *     ⌈c/cap⌉ runs of ≤ cap — rank-adjacent vectors are the most
    *     similar ones, so near-dup pairs mostly stay co-chunked; the
    *     residual recall loss is the price of the compute bound, the
    *     standard trade every capped-occupancy dedup makes.
    *
    * Output: (vec_id, embedding, nrm, cell_id, csim2) with STRING
    * `cell_id = cell.sub#chunk`; every final cell has ≤ cap members,
    * so any downstream within-cell pair join is ≤ cells·cap² by
    * construction (TextDedupSpec pins this on a deliberately skewed
    * corpus). Fully SQL-expressible — q227 hash-gates the whole
    * pipeline against DuckDB. */
  def boundedCells(emb0: DataFrame, cap: Int): DataFrame = {
    val emb = withNorm(emb0)
    val n = emb.count()
    val k1 = math.max(1L, math.ceil(n.toDouble / cap).toLong)
    // stage 1 is the shared two-level assignment — n·2√k1 dots, never
    // the dense n×k1 pass (see the q98 Scaladoc for the cost argument)
    val a1 = twoLevelCells(emb, k1)
    val big = a1.groupBy("cell").agg(count(lit(1)).as("c"))
      .filter(col("c") > cap)
      .select(col("cell"),
        ceil(col("c") / lit(cap.toDouble)).cast("long").as("m"))
    // NO broadcast hints below: the over-full cell list and its
    // sub-seed set are corpus-size-BOUNDED only in expectation — a
    // pathologically skewed corpus can push Σ⌈c/cap⌉ toward n/cap,
    // past any broadcast threshold. The joins are all equi-joins on
    // `cell`, so the planner (with the manifest statistics + AQE)
    // broadcasts exactly when the side really is small and falls back
    // to a keyed shuffle when it isn't — the shape stays
    // Σ c·⌈c/cap⌉ ≈ n either way.
    val wSeed = Window.partitionBy("cell").orderBy(col("vec_id").asc)
    val subseeds = a1.join(big, Seq("cell"))
      .withColumn("srn", row_number().over(wSeed))
      .filter(col("srn") <= col("m"))
      .select(col("cell"), col("vec_id").as("sub"),
        col("embedding").as("se"), col("nrm").as("sn"))
    val bigCells = big.select("cell")
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("csim2").desc, col("sub").asc)
    val reassigned = a1.join(bigCells, Seq("cell"))
      .join(subseeds, Seq("cell"))
      .withColumn("csim2",
        dotNative(col("embedding"), col("se")) / (col("nrm") * col("sn")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"),
        col("sub"), col("csim2"))
    val small = a1.join(bigCells, Seq("cell"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"),
        lit(-1L).as("sub"), col("csim").as("csim2"))
    val a2 = reassigned.unionByName(small)
    val wChunk = Window.partitionBy("cell", "sub")
      .orderBy(col("csim2").desc, col("vec_id").asc)
    a2.withColumn("chunk",
        floor((row_number().over(wChunk) - lit(1)) / lit(cap.toDouble))
          .cast("long"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        concat(col("cell").cast("string"), lit("."),
          col("sub").cast("string"), lit("#"),
          col("chunk").cast("string")).as("cell_id"),
        col("csim2"))
  }

  /** q98's full SemDeDup pass at granularity `k` and cosine threshold
    * `threshold`: within-cell pair join, similar-to-ANY-earlier drop
    * rule, keep verdict per vector. */
  def semdedup(s: SparkSession, dir: String, k: Int,
      threshold: Double = 0.4): DataFrame = {
    val cells = semdedupCells(s, dir, k)
    val a = cells.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = cells.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter((dotNative(col("ea"), col("eb")) / (col("na") * col("nb")))
        > threshold)
      .select(col("cell"), col("b_id").as("vec_id")).distinct()
    cells.select("vec_id", "cell")
      .join(dropped.withColumn("hit", lit(1)), Seq("cell", "vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("hit").isNull.as("keep"))
      .orderBy("vec_id")
  }

  val q98 = Query(
    "q98_semdedup",
    // k derived from the corpus by the occupancy rule (⌈n/64⌉ — 8 on
    // the 500-vector fixtures, 32 at the sf0.1 bench), the oracle
    // derives it identically
    (s, dir) => semdedup(s, dir, k = derivedK(s, dir)),
    Some(s"""WITH ${twoLevelCellsCtes("CAST(CEIL(COUNT(*) / 64.0) AS BIGINT)")},
            |dropped AS (
            |  SELECT DISTINCT b.cell, b.vec_id
            |  FROM cells a JOIN cells b
            |    ON a.cell = b.cell AND a.vec_id < b.vec_id
            |  WHERE ${cosineSql("a.embedding", "b.embedding")} > 0.4)
            |SELECT c.vec_id, c.cell, d.vec_id IS NULL AS keep
            |FROM cells c LEFT JOIN dropped d
            |  ON c.cell = d.cell AND c.vec_id = d.vec_id
            |ORDER BY c.vec_id""".stripMargin)
  )

  /** Q140 — cross-label mutual-kNN pairing: pairs of vectors from
    * DIFFERENT labels that are each other's cross-label cosine top-1 —
    * the margin-free core of parallel-corpus (bitext) mining, where
    * mutual nearest neighbors across languages are the alignment
    * candidates worth keeping.
    *
    * Scale shape: THIS form is the exact fixture-scale oracle (the
    * all-cross-pairs scan, codegen'd
    * [[graft.plans.VectorExpressions.DotProduct]], one per-vector
    * top-1 window); the 100 TB form is [[q140b]] — the SAME
    * mutual-check composed with the persisted IVF index
    * ([[AnnIndex.mutualKnnFromIndex]]), candidates from shared probed
    * cells instead of the full cross product, per-vector argmax +
    * mutual self-join unchanged, recall gated ≥0.9 vs this query in
    * AnnIndexSpec. The mutual check itself is a self-join of the
    * 1-row-per-vector `best` relation on (a, b) = (b, a) — linear,
    * never quadratic.
    *
    * Cross-engine exactness: cosine is the q24-proven device (fixed
    * left-to-right accumulation both engines reproduce bit-for-bit);
    * sim(a,b) = sim(b,a) exactly (same products, same order), so the
    * mutual property is engine-independent; argmax ties break on
    * vec_id.
    */
  val q140 = Query(
    "q140_mutual_knn",
    (s, dir) => {
      val emb = withNorm(Tables.embeddings(s, dir))
      val a = emb.select(col("vec_id").as("a_id"), col("label").as("a_label"),
        col("embedding").as("ae"), col("nrm").as("anrm"))
      val b = emb.select(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("embedding").as("be"), col("nrm").as("bnrm"))
      val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
      val best = a.join(b, col("a_label") =!= col("b_label"))
        .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"),
          (dotNative(col("ae"), col("be")) / (col("anrm") * col("bnrm")))
            .as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("a_id", "a_label", "b_id", "b_label", "sim")
      best.join(
          best.select(col("a_id").as("rb"), col("b_id").as("ra")),
          col("a_id") === col("ra") && col("b_id") === col("rb"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "a_label", "b_id", "b_label", "sim")
        .orderBy("a_id")
    },
    Some(s"""WITH sims AS (
            |  SELECT a.vec_id AS a_id, a.label AS a_label,
            |         b.vec_id AS b_id, b.label AS b_label,
            |         ${cosineSql("a.embedding", "b.embedding")} AS sim
            |  FROM embeddings a JOIN embeddings b ON a.label <> b.label),
            |best AS (
            |  SELECT a_id, a_label, b_id, b_label, sim FROM sims
            |  QUALIFY row_number() OVER (PARTITION BY a_id
            |    ORDER BY sim DESC, b_id ASC) = 1)
            |SELECT x.a_id, x.a_label, x.b_id, x.b_label, x.sim
            |FROM best x JOIN best y ON x.a_id = y.b_id AND x.b_id = y.a_id
            |WHERE x.a_id < x.b_id
            |ORDER BY x.a_id""".stripMargin)
  )

  /** Q173 — product-quantization ANN (PQ-ADC), the third scale path
    * next to LSH (q31b) and IVF (q31d), and the one that also SHRINKS
    * the index: each 64-dim float vector (256 B) becomes 16 sub-space
    * codes of 4 bits (8 B, 32×), and search runs against the codes.
    *
    *  - **Codebook**: per-subspace k-means over the bounded
    *    deterministic sample ([[lloyd]] — reproducible codewords,
    *    16×16×4 doubles of driver model state, never data).
    *  - **Encode**: per sub-space, argmin squared-L2 to the 16
    *    codewords, smaller-code tiebreak via `least` on (dist, k)
    *    structs — map-side, embarrassingly parallel at any scale.
    *  - **ADC search**: each probe precomputes its 16×16 distance
    *    table ONCE (the asymmetric-distance trick — probe stays
    *    full-precision, candidates stay compressed); candidate
    *    distance is then 16 table lookups summed, no float math per
    *    pair. Top-40 by ADC, then exact cosine re-rank of those 40 —
    *    the standard two-stage deployment (measured recall@1 0.96).
    *
    * Approximate by design → rows-only; SimilaritySpec gates measured
    * recall@1 vs q31 brute force and pins encode determinism. At
    * 100 TB: PQ composes with q31d — IVF cells bound the candidate
    * set, ADC ranks inside a cell, and the HOF table-lookup here
    * would graduate to a codegen'd expression like [[dotNative]] did.
    */
  val q173 = Query(
    "q173_pq_adc",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir).cache()
      // 64 dims = 16 sub-spaces x 4 dims, 16 codewords each -> 64-bit
      // code (4x shrink vs 8x4-bit; this fixture's embeddings are
      // near-noise — true-NN cosine ~0.35 — so finer cells + a deeper
      // re-rank buy the recall real corpora get at coarser settings)
      val M = 16; val K = 16; val sub = 4
      // codebook: per-subspace k-means ([[lloyd]] on the bounded
      // deterministic sample's sub-vectors) — trained codewords cover
      // each subspace's actual density instead of wherever the first K
      // vectors happened to land, which is what holds recall while the
      // code stays 16 nibbles. Driver model state: 16×16×4 doubles.
      val sample = trainSample(emb, 2048)
      val cb: Array[Array[Array[Double]]] = // cb(m)(k) = codeword
        Array.tabulate(M)(m =>
          lloyd(sample.map(_.slice(m * sub, (m + 1) * sub)), K))
      // ‖c‖² per codeword is a Scala constant; ‖x_m‖² is constant per
      // (row, sub-space) ACROSS codewords, so for both the encode argmin
      // and the summed ADC ranking it cancels — every distance below is
      // the rank-equivalent c² − 2·⟨x, c⟩, leaving the codegen'd
      // DotProduct as the only per-row arithmetic (replaces the
      // interpreted zip_with/aggregate sqDist; measured win is modest at
      // this SF — the 16×16 least-tree per row is the remaining cost —
      // but the interpreted lambdas scale per PAIR while this form's
      // hot path is pure generated code)
      val c2: Array[Array[Double]] =
        Array.tabulate(M, K)((m, k) => cb(m)(k).map(x => x * x).sum)
      def cwCol(m: Int, k: Int): Column =
        array(cb(m)(k).map(x => lit(x.toFloat)): _*)
      def subv(m: Int): Column = slice(col("embedding"), m * sub + 1, sub)
      def score(m: Int, k: Int): Column =
        lit(c2(m)(k)) - lit(2.0) * dotNative(subv(m), cwCol(m, k))
      // encode: per sub-space argmin over the 16 codewords
      val codes = emb.select(col("vec_id").as("b_id"),
        array((0 until M).map { m =>
          least((0 until K).map { k =>
            struct(score(m, k).as("d"), lit(k).as("k"))
          }: _*).getField("k")
        }: _*).as("codes"))
      // probes: the 16x16 ADC score table, flattened [m*K + k]
      val probes = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"),
          array((for (m <- 0 until M; k <- 0 until K)
            yield score(m, k)): _*).as("tbl"))
      // candidate ADC = Σ_m tbl[m, code_m], unrolled to a flat 16-term
      // codegen'd sum (a fold HOF here would re-interpret per pair)
      val adcSum = (0 until M).map(m =>
        element_at(col("tbl"),
          (lit(m * K) + element_at(col("codes"), m + 1) + 1).cast("int")))
        .reduce(_ + _)
      // ADC rows carry ONLY (a_id, b_id, adc) — the probe's 2 KB table
      // and embedding must not ride through the 250 k-row top-k sort
      // (payload, not arithmetic, dominated the first cut of this query)
      val adc = codes.crossJoin(broadcast(probes.select("a_id", "tbl")))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), adcSum.as("adc"))
      val wAdc = Window.partitionBy("a_id").orderBy(col("adc").asc, col("b_id").asc)
      val cand = adc.withColumn("rn", row_number().over(wAdc))
        .filter(col("rn") <= 40).drop("rn", "adc")
      // exact re-rank of the 40 survivors (probe embedding re-joined
      // broadcast — 50 rows — only after the cut)
      val full = withNorm(emb)
        .select(col("vec_id").as("b_id"), col("embedding").as("eb"),
          col("nrm").as("nb"))
      val wSim = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id").asc)
      cand.join(broadcast(probes.select(col("a_id"), col("ea"))), "a_id")
        .join(full, "b_id")
        .select(col("a_id"), col("b_id"),
          (dotNative(col("ea"), col("eb")) /
            (sqrt(dotNative(col("ea"), col("ea"))) * col("nb"))).as("sim"))
        .withColumn("rn", row_number().over(wSim))
        .filter(col("rn") === 1)
        .select("a_id", "b_id", "sim")
        .orderBy("a_id")
    },
    None
  )

  /** Q203 — IVF-ADC, the two stages composed (Jégou et al.'s IVFADC,
    * the index layout behind every production billion-vector ANN
    * deployment): the [[lloyd]]-trained coarse quantizer (q31d) bounds
    * the candidate set to the probe's `nprobe` nearest CELLS, and
    * PQ-ADC ranking (q173) scores those candidates from 16-nibble
    * codes — at 100 TB the scan touches only the probed cells'
    * code lists (≈ nprobe/k of the corpus, 32× compressed), never a
    * full-precision vector until the final top-40 exact re-rank.
    * Residual-free variant (codes encode the raw vectors, not
    * cell-relative residuals): simpler, and on this fixture's
    * near-noise geometry the residual rotation buys nothing the
    * deeper re-rank doesn't.
    *
    * Approximate by design → rows-only; SimilaritySpec gates recall@1
    * vs q31 brute force and determinism end-to-end.
    */
  val q203 = Query(
    "q203_ivfadc",
    (s, dir) => {
      // the PERSISTED form (round-6): the corpus is COMMITTED to a
      // graft table in producer slices, [[AnnIndex.init]] trains + pins
      // the model once, [[AnnIndex.maintainQuery]] builds the index
      // table off the change feed (per commit: encode the delta, keyed
      // merge — the corpus is never re-read, the model never
      // re-trained), and the search joins the index table's probed
      // posting lists. Output is bit-identical to the former inline
      // form (same lloyd sample, same expressions); recall@1 stays
      // gated in SimilaritySpec; incremental ≡ rebuild in AnnIndexSpec.
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft-ann-${math.abs(dir.hashCode).toString}")
      def wipe(p: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      wipe(root)
      java.nio.file.Files.createDirectories(root)
      val src = root.resolve("emb_t").toString
      val idx = root.resolve("emb_idx").toString
      val emb = Tables.embeddings(s, dir)
      graft.sources.Sources.commitVersion(
        emb.filter(col("vec_id") < 1000), src)
      graft.sources.Sources.commitVersion(
        emb.filter(col("vec_id") >= 1000), src)
      AnnIndex.init(s, src, idx)
      AnnIndex.maintainQuery(s, src, idx, s"$root/ckpt").awaitTermination()
      AnnIndex.searchFromIndex(s, emb, idx, col("vec_id") < 50)
    },
    None
  )

  /** Q140b — mutual-kNN COMPOSED WITH THE PERSISTED INDEX
    * ([[AnnIndex.mutualKnnFromIndex]]): the q140 semantics with
    * candidates from shared probed IVF cells (posting-list equi-join)
    * instead of the all-cross-pairs theta join — the ScaleOps
    * restatement of the inventory's last cross product. The per-vector
    * argmax and the mutual self-join are byte-identical to q140; only
    * the candidate generation changes. q140 stays as the exact
    * fixture-scale oracle; AnnIndexSpec gates recall vs it (≥0.9) and
    * plan-asserts no BroadcastNestedLoopJoin survives anywhere in the
    * composed query. Approximate by design → rows-only. */
  val q140b = Query(
    "q140b_mutual_knn_scale",
    (s, dir) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft-mknn-${math.abs(dir.hashCode).toString}")
      def wipe(p: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      wipe(root)
      java.nio.file.Files.createDirectories(root)
      val src = root.resolve("emb_t").toString
      val idx = root.resolve("emb_idx").toString
      val emb = Tables.embeddings(s, dir)
      graft.sources.Sources.commitVersion(emb, src)
      AnnIndex.init(s, src, idx)
      AnnIndex.maintainQuery(s, src, idx, s"$root/ckpt").awaitTermination()
      AnnIndex.mutualKnnFromIndex(s, emb, idx)
    },
    None
  )

  /** Q224 — D4-shaped diversity pruning (Tirumala et al. 2023, "D4:
    * Improving LLM Pretraining via Document De-Duplication and
    * Diversification"): SemDeDup first (within-cell near-dups drop,
    * q98's rule unchanged), then SSL-PROTOTYPES on the survivors —
    * within each cell, the TOP-20% most prototypical documents (the
    * ones closest to their cell seed: least informative, most
    * cluster-redundant) are pruned too, keeping the diverse tail.
    * Every vector gets a verdict: `dup` (semantic duplicate), `proto`
    * (prototype-pruned), `keep`.
    *
    * Cross-engine exactness: assignment and prototypicality both use
    * the q24 cosine device; the 20% cut is the integer
    * cross-multiplication `rn * 5 <= n_live` (no float fraction); all
    * ranks tiebreak on vec_id.
    *
    * Scale shape: assignment = broadcast k seeds, map-side; the dup
    * pair join is within-cell (q98's documented shape — cells bound
    * the pairs); the prototype rank is a per-cell window. Nothing is
    * global, nothing is quadratic across cells. */
  val q224 = Query(
    "q224_d4_diversify",
    (s, dir) => {
      val cells = semdedupCells(s, dir, k = derivedK(s, dir))
      val a = cells.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = cells.select(col("cell"), col("vec_id").as("b_id"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val dupDropped = a.join(b, Seq("cell"))
        .filter(col("a_id") < col("b_id"))
        .filter((dotNative(col("ea"), col("eb")) / (col("na") * col("nb")))
          > 0.4)
        .select(col("cell"), col("b_id").as("vec_id")).distinct()
      val live = cells.join(dupDropped, Seq("cell", "vec_id"), "left_anti")
      val wcell = Window.partitionBy("cell")
        .orderBy(col("csim").desc, col("vec_id").asc)
      val ranked = live
        .withColumn("rn", row_number().over(wcell))
        .withColumn("n_live",
          count(lit(1)).over(Window.partitionBy("cell")))
      val verdicts = dupDropped.withColumn("stage", lit("dup"))
        .select("vec_id", "cell", "stage")
        .unionByName(ranked.select(col("vec_id"), col("cell"),
          when(col("rn") * 5 <= col("n_live"), lit("proto"))
            .otherwise(lit("keep")).as("stage")))
      verdicts.orderBy("vec_id")
    },
    Some(s"""WITH ${twoLevelCellsCtes("CAST(CEIL(COUNT(*) / 64.0) AS BIGINT)")},
            |dropped AS (
            |  SELECT DISTINCT b.cell, b.vec_id
            |  FROM cells a JOIN cells b
            |    ON a.cell = b.cell AND a.vec_id < b.vec_id
            |  WHERE ${cosineSql("a.embedding", "b.embedding")} > 0.4),
            |live AS (
            |  SELECT c.vec_id, c.cell, c.csim
            |  FROM cells c LEFT JOIN dropped d
            |    ON c.cell = d.cell AND c.vec_id = d.vec_id
            |  WHERE d.vec_id IS NULL),
            |ranked AS (
            |  SELECT vec_id, cell,
            |         row_number() OVER (PARTITION BY cell
            |           ORDER BY csim DESC, vec_id ASC) AS rn,
            |         count(*) OVER (PARTITION BY cell) AS n_live
            |  FROM live)
            |SELECT vec_id, cell, stage FROM (
            |  SELECT vec_id, cell, 'dup' AS stage FROM dropped
            |  UNION ALL
            |  SELECT vec_id, cell,
            |         CASE WHEN rn * 5 <= n_live THEN 'proto'
            |              ELSE 'keep' END AS stage
            |  FROM ranked)
            |ORDER BY vec_id""".stripMargin)
  )

  /** Q223 — margin-based parallel-pair mining against the persisted
    * index ([[AnnIndex.marginMineFromIndex]], the Artetxe & Schwenk
    * ratio margin): sides from vec_id parity (the fixture's stand-in
    * for two languages), candidates from shared probed IVF cells,
    * margin-mutual-best pairs above threshold. Approximate by design
    * (avgK over candidates, not the full side) → rows-only;
    * AnnIndexSpec gates precision/recall vs the exact fixture-scale
    * form and plan-asserts no cross product anywhere. */
  val q223 = Query(
    "q223_margin_mine",
    (s, dir) => {
      val root = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"),
        s"graft-margin-${math.abs(dir.hashCode).toString}")
      def wipe(p: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      wipe(root)
      java.nio.file.Files.createDirectories(root)
      val src = root.resolve("emb_t").toString
      val idx = root.resolve("emb_idx").toString
      val emb = Tables.embeddings(s, dir)
      graft.sources.Sources.commitVersion(emb, src)
      AnnIndex.init(s, src, idx)
      AnnIndex.maintainQuery(s, src, idx, s"$root/ckpt").awaitTermination()
      AnnIndex.marginMineFromIndex(s, emb, idx,
        sideA = pmod(col("vec_id"), lit(2)) === 0)
    },
    None
  )

  /** Q227 — the occupancy-BOUNDED cell assignment end-to-end
    * ([[boundedCells]]), hash-gated: two-level derived-k nearest-seed
    * quantization, recursive sub-seed split of over-full cells, hard
    * prototypicality-rank chunking — every final cell ≤ 64 members by
    * construction, so the downstream pair join is ≤ cells·64² whatever
    * the corpus skew (TextDedupSpec pins the bound on a deliberately
    * pathological corpus; this gate pins the exact assignment).
    * Cross-engine exactness: all three stages ride the q24 cosine
    * device; every window tiebreaks on vec_id/seed id. */
  val q227 = Query(
    "q227_semdedup_bounded",
    (s, dir) => boundedCells(Tables.embeddings(s, dir), cap = 64)
      .groupBy("cell_id")
      .agg(count(lit(1)).as("n_members"),
        min(col("vec_id")).as("first_vec"),
        max(col("vec_id")).as("last_vec"))
      .orderBy("cell_id"),
    Some(s"""WITH ${twoLevelCellsCtes("CAST(CEIL(COUNT(*) / 64.0) AS BIGINT)")},
            |a1 AS (
            |  SELECT vec_id, embedding, cell, csim FROM cells),
            |big AS (
            |  SELECT cell, CAST(CEIL(COUNT(*) / 64.0) AS BIGINT) AS m
            |  FROM a1 GROUP BY cell HAVING COUNT(*) > 64),
            |subseeds AS (
            |  SELECT a.cell, a.vec_id AS sub, a.embedding AS se
            |  FROM a1 a JOIN big b ON a.cell = b.cell
            |  QUALIFY row_number() OVER (
            |    PARTITION BY a.cell ORDER BY a.vec_id ASC) <= b.m),
            |reassigned AS (
            |  SELECT a.vec_id, a.cell, ss.sub,
            |         ${cosineSql("a.embedding", "ss.se")} AS csim2
            |  FROM a1 a JOIN subseeds ss ON a.cell = ss.cell
            |  QUALIFY row_number() OVER (
            |    PARTITION BY a.vec_id
            |    ORDER BY ${cosineSql("a.embedding", "ss.se")} DESC,
            |             ss.sub ASC) = 1),
            |a2 AS (
            |  SELECT vec_id, cell, sub, csim2 FROM reassigned
            |  UNION ALL
            |  SELECT a.vec_id, a.cell, CAST(-1 AS BIGINT), a.csim
            |  FROM a1 a WHERE a.cell NOT IN (SELECT cell FROM big)),
            |a3 AS (
            |  SELECT vec_id, cell, sub,
            |         CAST(FLOOR((row_number() OVER (
            |           PARTITION BY cell, sub
            |           ORDER BY csim2 DESC, vec_id ASC) - 1) / 64.0)
            |           AS BIGINT) AS chunk
            |  FROM a2)
            |SELECT CAST(cell AS VARCHAR) || '.' || CAST(sub AS VARCHAR)
            |         || '#' || CAST(chunk AS VARCHAR) AS cell_id,
            |       CAST(COUNT(*) AS BIGINT) AS n_members,
            |       MIN(vec_id) AS first_vec,
            |       MAX(vec_id) AS last_vec
            |FROM a3
            |GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** q240's sign-matrix entry: +1 when ((i²·31 + i·j·17 + j²·29) mod
    * 101) is even, −1 otherwise (1-based i ≤ 64, j ≤ 16 — every
    * intermediate stays far below int overflow in both engines). */
  private[graft] def rpSign(i: Int, j: Int): Int =
    if (((i * i * 31 + i * j * 17 + j * j * 29) % 101) % 2 == 0) 1 else -1

  /** Q240 — Johnson–Lindenstrauss random projection: every embedding
    * (dim 64) down to 16 dims through a FIXED ±1 sign matrix. The
    * standard bandwidth/memory lever before any pairwise stage — a
    * 4× smaller vector preserves pairwise distances within ~1/√16,
    * so candidate generation (LSH, blocked kNN) runs on the sketch
    * and only survivors touch the full vector (Achlioptas'
    * database-friendly projection; the same trick SimHash plays on
    * text shingles, here for dense vectors).
    *
    * The matrix is never materialized or shipped: entry s(i,j) is the
    * closed form ((i²·31 + i·j·17 + j²·29) mod 101) mod 2 → ±1 —
    * small-magnitude integer arithmetic both engines evaluate
    * identically (the QUADRATIC mixing matters: an affine form like
    * (i·a + j·b) mod m makes every row a cyclic shift of one ±1
    * sequence, rows correlate, and measured distortion doubles —
    * 0.52 median vs this form's 0.25, the theory value for k=16),
    * so the gate
    * is a FULL hash gate on the projected values (sums fold
    * left-to-right in double via the native dot, exactly like q24's
    * oracle contract). Projection is per-row map work against 16
    * broadcast-literal sign vectors — zero shuffle at any scale; the
    * final orderBy exists only for the driver's deterministic compare.
    */
  val q240 = Query(
    "q240_random_projection",
    (s, dir) => {
      val projs: Seq[Column] = (1 to 16).map { j =>
        val sv = (1 to 64).map(i => if (rpSign(i, j) > 0) 1.0f else -1.0f)
        dotNative(col("embedding"), typedLit(sv))
      }
      Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(array(projs: _*)))
        .select(col("vec_id"), (col("pos") + 1).cast("int").as("j"),
          col("col").as("proj"))
        .orderBy("vec_id", "j")
    },
    Some("""SELECT vec_id, CAST(j AS INT) AS j,
           |       list_sum(list_transform(generate_series(1, 64),
           |         i -> CAST(embedding[i] AS DOUBLE) *
           |              CASE WHEN ((i*i*31 + i*j*17 + j*j*29) % 101) % 2 = 0
           |                   THEN CAST(1 AS DOUBLE)
           |                   ELSE CAST(-1 AS DOUBLE) END)) AS proj
           |FROM embeddings CROSS JOIN generate_series(1, 16) AS t(j)
           |ORDER BY vec_id, j""".stripMargin)
  )

  val all: Seq[Query] = Seq(q24, q31, q31b, q31c, q31d, q65, q98, q140,
    q140b, q173, q203, q223, q224, q227, q240)
}
