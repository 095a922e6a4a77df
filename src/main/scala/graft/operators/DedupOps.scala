package graft.operators

import graft.{Query, Tables}
import graft.functions.TextOps.{tokHash, tokensWithPos, P}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the training-data-pipeline
  * mandate: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is built so candidate generation is an
  * EQUI-join on a hash/bucket key (never an all-pairs comparison):
  *  - exact: hash-groupBy on a normalized-text digest;
  *  - MinHash: shingle → minhash → band → bucket equi-join (classic LSH);
  *  - SimHash: 16-bit half-signature equi-join, Hamming filter after;
  *  - n-gram Jaccard: shared-shingle equi-join, exact Jaccard after
  *    (at 100 TB you run MinHash first and this only on candidates).
  *
  * Signatures hash 3-token SHINGLES, not single tokens: the fixture
  * vocabulary is ~31 words, so single-token sets have pairwise Jaccard
  * ~0.66 (every doc collides with every doc — LSH degenerates into the
  * all-pairs join it exists to avoid, measured 300+ s at sf0.1), while
  * shingle sets sit at ~0.01 and candidates stay near-dup-only. The
  * same degeneracy argument applies at 100 TB: shingling is what keeps
  * bucket sizes bounded.
  *
  * All hashing is md5-derived modular arithmetic that DuckDB reproduces
  * exactly, so the oracles are full hash-checks, not rows-only.
  */
object DedupOps {

  /** Canonical text form shared by all dedup variants: lower-case,
    * whitespace collapsed, trimmed. */
  private def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Distinct 3-token shingles per doc
    * ([[graft.functions.TextOps.shinglesOf]] — the single shared
    * shingle definition). */
  private[operators] def shingles(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextOps.shinglesOf(Tables.documents(s, dir), distinct = true)

  /** Shingle CTEs over `table` (any doc_id+text relation) — source is a
    * parameter so the cascade (q175) can shingle stage SURVIVORS with
    * the same text as the whole-corpus queries. */
  private def shinglesSqlFrom(table: String): String =
    s"""toks AS (
       |  SELECT doc_id, i AS pos, toks[i] AS tok FROM (
       |    SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
       |    FROM $table) t, unnest(range(1, len(t.toks)+1)) u(i)
       |  WHERE toks[i] <> ''),
       |sh AS (
       |  SELECT DISTINCT doc_id, concat(tok, ' ', t2, ' ', t3) AS sh FROM (
       |    SELECT doc_id, tok,
       |           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
       |           lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
       |    FROM toks) x
       |  WHERE t3 IS NOT NULL)""".stripMargin

  private val shinglesSql = shinglesSqlFrom("documents")

  /** Exact dedup: group by digest of normalized text; per group emit the
    * keeper (min doc_id) and the duplicate count. A plain hash-groupBy —
    * one shuffle on the digest, map-side combinable. */
  val q27 = Query(
    "q27_dedup_exact",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(normText(col("text"))).as("digest"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"))
        .orderBy("digest"),
    Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest,
           |       MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin)
  )

  // ---- MinHash + LSH -----------------------------------------------------

  val NumHashes = 16
  val NumBands = 4 // 4 rows per band

  /** Per-doc minhash SIGNATURE (doc_id, sig array<long> ordered by hash
    * index) over the shingle sets of any documents-shaped DataFrame
    * (needs doc_id, lang, text). Takes a DataFrame — not a table path —
    * so the streaming incremental dedup can run the IDENTICAL signature
    * pipeline per micro-batch.
    *
    * ONE exchange end to end (guide §2.3/§2.4): the 16 per-hash minima
    * are 16 aggregates of ONE groupBy(doc_id) — not an explode×16 whose
    * 16-fold row blowup crosses a (doc_id, i) shuffle — and the groupBy
    * reuses the shingle window's hash(doc_id) partitioning, so no new
    * exchange forms. The shingle `distinct` is dropped as provably
    * irrelevant here: min over a multiset equals min over its set. */
  private[graft] def sigsOf(docs: DataFrame): DataFrame = {
    val mins = (0 until NumHashes).map { i =>
      val a = (2654435761L * (i + 1)) % P
      val b = (40503L * (i + 7)) % P
      min((lit(a) * col("tv") + lit(b)) % P).as(s"__m$i")
    }
    graft.functions.TextOps.shinglesOf(docs, distinct = false)
      .withColumn("tv", tokHash(col("sh")))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** LSH band rows (doc_id, band, sig) from signatures — THE collision
    * key of the minhash dedup family. Map-side (explode×NumBands +
    * array slice), no aggregation: the signature already carries the
    * band contents in order. */
  private[graft] def bandsFromSigs(sigs: DataFrame): DataFrame = {
    val rows = NumHashes / NumBands
    sigs
      .select(col("doc_id"), col("sig").as("__sig"),
        explode(sequence(lit(0L), lit((NumBands - 1).toLong))).as("band"))
      .select(col("doc_id"), col("band"),
        array_join(transform(
          slice(col("__sig"), (col("band") * rows + 1).cast("int"),
            lit(rows)), x => x.cast("string")), ",").as("sig"))
  }

  private[graft] def bandsOf(docs: DataFrame): DataFrame =
    bandsFromSigs(sigsOf(docs))

  private val minhashesSql =
    s"""$shinglesSql,
       |th AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(sh),1,15)) AS BIGINT) % 2147483647 AS tv
       |  FROM sh),
       |mh AS (
       |  SELECT doc_id, i,
       |         MIN((((2654435761 * (i+1)) % 2147483647) * tv
       |              + ((40503 * (i+7)) % 2147483647)) % 2147483647) AS mh
       |  FROM th, range(0, 16) r(i)
       |  GROUP BY doc_id, i)""".stripMargin

  /** MinHash+LSH near-dup candidates: shingle → minhash → band → bucket
    * equi-join, then estimated Jaccard = matching-minhash fraction.
    * The only non-key-equi work is the final signature compare on the
    * (small) candidate set — exactly the plan that survives 100 TB.
    */
  /** Banded candidate pairs + estimated Jaccard from signatures —
    * q28's whole derivation, shared with [[graft.streaming.NearDupStore]]'s
    * spec so "incremental ≡ batch" compares against the ONE batch
    * definition. */
  private[graft] def minhashPairsOf(sigs: DataFrame): DataFrame = {
    val bands = bandsFromSigs(sigs)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
      .distinct()
    cand
      .join(sigs.withColumnRenamed("doc_id", "a_doc").withColumnRenamed("sig", "sa"), "a_doc")
      .join(sigs.withColumnRenamed("doc_id", "b_doc").withColumnRenamed("sig", "sb"), "b_doc")
      .select(col("a_doc"), col("b_doc"),
        (aggregate(zip_with(col("sa"), col("sb"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).cast("double") / NumHashes)
          .as("est_jaccard"))
  }

  val q28 = Query(
    "q28_dedup_minhash",
    (s, dir) => minhashPairsOf(sigsOf(Tables.documents(s, dir)).cache())
      .orderBy("a_doc", "b_doc"),
    Some(s"""WITH $minhashesSql,
            |bands AS (
            |  SELECT doc_id, i // 4 AS band,
            |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
            |  FROM mh GROUP BY doc_id, i // 4),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
            |  FROM bands a JOIN bands b
            |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            |sigs AS (
            |  SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id)
            |SELECT c.a_doc, c.b_doc,
            |  CAST(list_sum(list_transform(list_zip(sa.sig, sb.sig),
            |       x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 AS est_jaccard
            |FROM cand c
            |JOIN sigs sa ON c.a_doc = sa.doc_id
            |JOIN sigs sb ON c.b_doc = sb.doc_id
            |ORDER BY a_doc, b_doc""".stripMargin)
  )

  // ---- SimHash -----------------------------------------------------------

  val SimBits = 32

  /** SimHash near-dup: 32-bit signature from signed per-bit votes of the
    * distinct-shingle hashes; candidates share one of the two 16-bit
    * halves (a pigeonhole guarantee for Hamming distance within a half),
    * then exact Hamming filter <= 6.
    */
  val q29 = Query(
    "q29_dedup_simhash",
    (s, dir) => {
      val sh = shingles(s, dir).withColumn("tv", tokHash(col("sh")))
      val sim = sh
        .withColumn("i", explode(sequence(lit(0), lit(SimBits - 1))))
        .withColumn("vote",
          when(expr("shiftright(tv, cast(i as int)) & 1L") === 1L, lit(1L))
            .otherwise(lit(-1L)))
        .groupBy("doc_id", "i")
        .agg(sum(col("vote")).as("v"))
        .withColumn("bit", when(col("v") > 0, lit(1L)).otherwise(lit(0L)))
        .groupBy("doc_id")
        .agg(sum(col("bit") * expr("shiftleft(cast(1 as bigint), cast(i as int))"))
          .as("simhash"))
        .withColumn("h0", col("simhash").bitwiseAND(lit(65535L)))
        .withColumn("h1", shiftright(col("simhash"), 16))
      val a = sim.select(col("doc_id").as("a_doc"), col("simhash").as("sa"),
        col("h0").as("a0"), col("h1").as("a1"))
      val b = sim.select(col("doc_id").as("b_doc"), col("simhash").as("sb"),
        col("h0").as("b0"), col("h1").as("b1"))
      val cand = a.join(b, col("a_doc") < col("b_doc") &&
          (col("a0") === col("b0") || col("a1") === col("b1")))
      cand
        .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
        .filter(col("hamming") <= 6)
        .select("a_doc", "b_doc", "hamming")
        .orderBy("a_doc", "b_doc")
    },
    Some(s"""WITH $shinglesSql,
            |th AS (
            |  SELECT doc_id, CAST(concat('0x', substr(md5(sh),1,15)) AS BIGINT) % 2147483647 AS tv
            |  FROM sh),
            |votes AS (
            |  SELECT doc_id, i,
            |         CAST(SUM(CASE WHEN ((tv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
            |  FROM th, range(0, 32) r(i)
            |  GROUP BY doc_id, i),
            |sim AS (
            |  SELECT doc_id,
            |         CAST(SUM((CASE WHEN v > 0 THEN 1 ELSE 0 END) * ((1::BIGINT) << i)) AS BIGINT) AS simhash
            |  FROM votes GROUP BY doc_id),
            |shalf AS (
            |  SELECT doc_id, simhash, simhash & 65535 AS h0, simhash >> 16 AS h1 FROM sim)
            |SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
            |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            |FROM shalf a JOIN shalf b
            |  ON a.doc_id < b.doc_id AND (a.h0 = b.h0 OR a.h1 = b.h1)
            |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
            |ORDER BY a_doc, b_doc""".stripMargin)
  )

  // ---- n-gram Jaccard ----------------------------------------------------

  /** Exact 3-gram (token trigram) Jaccard similarity for pairs sharing at
    * least one shingle. Candidate generation is the shared-shingle
    * equi-join; at 100 TB this runs after MinHash banding (q28) has cut
    * the candidate set.
    */
  /** q30's near-dup rule (shared-shingle Jaccard ≥ 0.2 pairs) over any
    * documents-shaped DataFrame — ONE definition so the cascade (q175)
    * and the whole-corpus queries can never disagree about what a
    * near-duplicate is. */
  private[graft] def jaccardPairsOf(docs: DataFrame): DataFrame = {
    val sh = graft.functions.TextOps.shinglesOf(docs, distinct = true)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_doc"), col("n_sh").as("na")), "a_doc")
      .join(sizes.select(col("doc_id").as("b_doc"), col("n_sh").as("nb")), "b_doc")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= 0.2)
      .select("a_doc", "b_doc", "n_inter", "jaccard")
  }

  val q30 = Query(
    "q30_dedup_ngram_jaccard",
    (s, dir) =>
      jaccardPairsOf(Tables.documents(s, dir))
        .orderBy("a_doc", "b_doc"),
    Some(s"""WITH $shinglesSql,
            |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            |inter AS (
            |  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, COUNT(*) AS n_inter
            |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT a_doc, b_doc, n_inter,
            |       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
            |FROM inter
            |JOIN sizes sa ON a_doc = sa.doc_id
            |JOIN sizes sb ON b_doc = sb.doc_id
            |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2
            |ORDER BY a_doc, b_doc""".stripMargin)
  )

  /** Q50 — eval-set contamination check: for each training document, how
    * many of its distinct 3-token shingles also appear in the held-out
    * eval split (docs with doc_id % 10 == 0). This is the n-gram-overlap
    * decontamination pass of a training-data pipeline; the eval shingle
    * set is the small side by construction → broadcast equi-join, and
    * the per-doc counts are one combinable aggregate.
    */
  val q50 = Query(
    "q50_contamination",
    (s, dir) => {
      val sh = shingles(s, dir)
      val evalSh = sh.filter(col("doc_id") % 10 === 0)
        .select("sh").distinct()
      val train = sh.filter(col("doc_id") % 10 =!= 0)
      val hits = train.join(broadcast(evalSh), Seq("sh"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      train.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)).cast("double") /
            col("n_sh").cast("double")).as("contamination"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $shinglesSql,
            |ev AS (SELECT DISTINCT sh.sh FROM sh WHERE doc_id % 10 = 0),
            |tr AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
            |hits AS (
            |  SELECT doc_id, COUNT(*) AS n_shared FROM tr
            |  WHERE EXISTS (SELECT 1 FROM ev WHERE ev.sh = tr.sh)
            |  GROUP BY doc_id),
            |tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM tr GROUP BY doc_id)
            |SELECT t.doc_id, t.n_sh,
            |       COALESCE(h.n_shared, 0) AS n_shared,
            |       CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / CAST(t.n_sh AS DOUBLE) AS contamination
            |FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
            |ORDER BY t.doc_id""".stripMargin)
  )

  /** Q55 — cross-source canonical selection: cluster documents by their
    * bag-of-words digest (same distinct-token vocabulary) and keep one
    * canonical doc per cluster — smallest source name, then smallest
    * doc_id. This is the "which copy survives" step of multi-source
    * corpus merging. Clustering is a hash-groupBy on the digest; the
    * keeper pick is a bounded per-cluster window.
    */
  val q55 = Query(
    "q55_dedup_crosssource",
    (s, dir) => {
      val bow = tokensWithPos(Tables.documents(s, dir))
        .select(col("doc_id"), col("tok")).distinct()
        .groupBy("doc_id")
        .agg(md5(array_join(array_sort(collect_set(col("tok"))), " ")).as("dig"))
      val docs = Tables.documents(s, dir).select("doc_id", "source")
      val members = bow.join(docs, "doc_id")
      val stats = members.groupBy("dig")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
      val w = Window.partitionBy("dig")
        .orderBy(col("source").asc, col("doc_id").asc)
      members.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dig"), col("doc_id").as("keeper_doc"),
          col("source").as("keeper_source"))
        .join(stats, "dig")
        .select("dig", "keeper_doc", "keeper_source", "n_docs", "n_sources")
        .orderBy("keeper_doc")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
           |  FROM documents),
           |bow AS (
           |  SELECT doc_id, md5(string_agg(DISTINCT tok, ' ' ORDER BY tok)) AS dig
           |  FROM toks WHERE tok <> '' GROUP BY doc_id),
           |members AS (
           |  SELECT b.dig, d.doc_id, d.source FROM bow b JOIN documents d USING (doc_id)),
           |stats AS (
           |  SELECT dig, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
           |  FROM members GROUP BY dig),
           |keep AS (
           |  SELECT dig, doc_id AS keeper_doc, source AS keeper_source FROM members
           |  QUALIFY row_number() OVER (PARTITION BY dig ORDER BY source ASC, doc_id ASC) = 1)
           |SELECT k.dig, k.keeper_doc, k.keeper_source, s.n_docs, s.n_sources
           |FROM keep k JOIN stats s USING (dig)
           |ORDER BY k.keeper_doc""".stripMargin)
  )

  /** Q56 — fuzzy near-dup via blocked edit distance: candidate pairs
    * share a (lang, length bucket) cell and differ ≤5 chars in length,
    * then Levenshtein over the 30-char prefix keeps pairs under
    * distance 16. Blocking turns the all-pairs comparison into an
    * equi-join whose block sizes are bounded by the length-bucket
    * width — the classic way string-similarity dedup survives scale.
    * The probe side expands to its three neighboring cells (like q18's
    * time bucketing) so pairs straddling a bucket boundary are NOT
    * lost: a qualifying pair's buckets differ by at most 1, the build
    * row lives in exactly one cell, and the probe visits that cell
    * exactly once — complete and duplicate-free.
    *
    * Catalyst pushes the distance filter into the join condition, so the
    * distance runs on every block pair — the prefix length IS the cost
    * knob (cells = prefix²·pairs). 30 chars keeps the sf0.1 bench at
    * ~4 s where 60 chars cost 21.7 s; the threshold form of
    * `levenshtein` is deliberately NOT used — its band (2·threshold·n)
    * is wider than the full 30×30 matrix here and measured slower.
    */
  val q56 = Query(
    "q56_dedup_editdist",
    (s, dir) => {
      def side(p: String): DataFrame =
        Tables.documents(s, dir).select(
          col("doc_id").as(s"${p}_doc"),
          col("lang").as(s"${p}_lang"),
          col("n_chars").as(s"${p}_n"),
          substring(col("text"), 1, 30).as(s"${p}_pre"),
          floor(col("n_chars") / 25).cast("long").as(s"${p}_bucket"))
      // fan the probe side out: the corpus arrives as one row-group, so
      // without this the pair verification (levenshtein × every block
      // pair) runs in a single task — 13 s → seconds at sf0.1. The
      // shuffle is tiny (doc prefixes), the fan-out is what matters.
      // explicit count: the shuffle is bytes-tiny, so AQE would coalesce
      // it back to one partition and serialize the verification again
      side("a")
        .withColumn("cell",
          explode(array(col("a_bucket") - 1, col("a_bucket"), col("a_bucket") + 1)))
        .repartition(64, col("a_lang"), col("cell"))
        .join(side("b"),
          col("a_lang") === col("b_lang") &&
            col("cell") === col("b_bucket") &&
            col("a_doc") < col("b_doc") &&
            abs(col("a_n") - col("b_n")) <= 5)
        .withColumn("dist", levenshtein(col("a_pre"), col("b_pre")).cast("long"))
        .filter(col("dist") <= 16)
        .select("a_doc", "b_doc", "dist")
        .orderBy("a_doc", "b_doc")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, lang, n_chars, substr(text, 1, 30) AS pre,
           |         n_chars // 25 AS bucket
           |  FROM documents)
           |SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
           |       CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist
           |FROM d a JOIN d b
           |  ON a.lang = b.lang AND abs(a.bucket - b.bucket) <= 1
           | AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 5
           |WHERE levenshtein(a.pre, b.pre) <= 16
           |ORDER BY a_doc, b_doc""".stripMargin)
  )

  /** Shared oracle fragment: q30's Jaccard pairs + the recursive-CTE
    * connected-components closure (DuckDB's deduplicating UNION
    * recursion). ONE definition so q66 and q68 can never disagree about
    * cluster membership. Yields CTEs `cc_pairs` and `labels(doc_id,
    * cluster_id)`; prepend `WITH RECURSIVE $shinglesSql,`. */
  private val ccLabelsSql =
    """sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |cc_pairs AS (
      |  SELECT a_doc, b_doc
      |  FROM inter
      |  JOIN sizes sa ON a_doc = sa.doc_id
      |  JOIN sizes sb ON b_doc = sb.doc_id
      |  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2),
      |edges AS (SELECT a_doc AS u, b_doc AS v FROM cc_pairs
      |          UNION SELECT b_doc, a_doc FROM cc_pairs),
      |nodes AS (SELECT DISTINCT u AS n FROM edges),
      |walk(n, l) AS (
      |  SELECT n, n FROM nodes
      |  UNION
      |  SELECT e.v, w.l FROM walk w JOIN edges e ON w.n = e.u WHERE w.l < e.v),
      |labels AS (SELECT n AS doc_id, MIN(l) AS cluster_id FROM walk GROUP BY n)""".stripMargin

  /** Edge-count bound under which components are solved on the driver:
    * 2^18 undirected edges ≈ 4 MB of longs collected — comfortably
    * "bounded metadata", never data-scale (guide §5). Every fixture and
    * incremental-maintenance batch in this repo is orders of magnitude
    * below it; a corpus-wide pair set above it takes the distributed
    * loop. */
  private[graft] val DriverCcMaxEdges = 1 << 18

  /** Connected components, labels = min member id per component.
    *
    * Small graphs (≤ [[DriverCcMaxEdges]] edges, long keys) are solved
    * with a driver-side union-find: the distributed min-label loop
    * costs 4+ Spark jobs PER ROUND (two joins, a pointer jump, a
    * convergence count) and O(log diameter) rounds — 150+ scheduler
    * round-trips for a graph whose edge list fits in one task. The
    * union-find is label-equivalent (union-by-min makes each root the
    * component minimum, exactly the loop's fixpoint) and
    * order-independent, measured 8.4 s → <0.5 s on the q252/q253
    * cluster-view drains at sf0.1.
    *
    * Large graphs run the distributed min-label propagation **with
    * pointer jumping**: each round, (1) every node offers its label to
    * its neighbors and keeps the minimum seen, then (2) every node
    * replaces its label by its label's label (path compression — a
    * label is always itself a node id, so `label(label(n))` is well
    * defined and ≤ `label(n)`). Step 1 alone needs O(diameter) rounds —
    * a 200-hop path of near-identical docs (boilerplate chains do this)
    * would blow the round bound; the jump in step 2 doubles the
    * compressed distance per round, so convergence is O(log diameter).
    * Every round is two shuffle joins + one combinable aggregate, and
    * `localCheckpoint` truncates lineage so the plan doesn't grow with
    * iterations — the standard scalable CC shape on Spark.
    * (A recursive-CTE formulation without dedup between rounds — all
    * Spark 4 supports is UNION ALL — enumerates exponentially many
    * walks on dense duplicate cliques and hits the recursion row limit;
    * the iterative loop IS the scalable shape.)
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    // one materialization serving both paths: the bounded probe reads
    // it back, and a fallback's edge doubling re-reads it instead of
    // re-running the (often expensive) pair derivation
    val p = pairs.select(col("a_doc").as("u"), col("b_doc").as("v"))
      .localCheckpoint()
    val longKeys = p.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (longKeys) {
      val probe = p.limit(DriverCcMaxEdges + 1).collect()
      if (probe.length <= DriverCcMaxEdges &&
          probe.forall(r => !r.isNullAt(0) && !r.isNullAt(1))) {
        // union-by-min + path halving: the root of every set is its
        // minimum member, so find(x) IS the loop's converged label
        val parent = new java.util.HashMap[Long, Long](probe.length * 2)
        def find(x0: Long): Long = {
          var x = x0
          while (parent.get(x) != x) {
            parent.put(x, parent.get(parent.get(x)))
            x = parent.get(x)
          }
          x
        }
        probe.foreach { r =>
          val u = r.getLong(0); val v = r.getLong(1)
          if (!parent.containsKey(u)) parent.put(u, u)
          if (!parent.containsKey(v)) parent.put(v, v)
          val ru = find(u); val rv = find(v)
          if (ru != rv) parent.put(math.max(ru, rv), math.min(ru, rv))
        }
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row](
          parent.size())
        parent.keySet().forEach { n =>
          rows.add(org.apache.spark.sql.Row(n.longValue(), find(n))); ()
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("l",
            org.apache.spark.sql.types.LongType, nullable = false)))
        return spark.createDataFrame(rows, schema)
      }
    }
    val edges = p
      .union(p.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("u").as("n")).distinct()
      .withColumn("l", col("n"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    val maxIter = 64
    while (changed > 0 && iter < maxIter) {
      // min label offered by neighbors, folded into each node's own
      // label via left join + least (a union of `labels` with a plan
      // derived from `labels` would share attribute ids across union
      // children and trip Catalyst's constraint rewrite)
      val offered = edges.join(labels, col("u") === col("n"))
        .groupBy(col("v")).agg(min(col("l")).as("lo"))
      val propagated = labels.join(offered, col("n") === col("v"), "left")
        .select(col("n"), least(col("l"), coalesce(col("lo"), col("l"))).as("l"))
        .localCheckpoint()
      // pointer jump: l := label(l). Left join + coalesce only as a
      // guard — every label is a node, so the match always exists.
      val next = propagated.as("x")
        .join(propagated.as("p"), col("x.l") === col("p.n"), "left")
        .select(col("x.n").as("n"), coalesce(col("p.l"), col("x.l")).as("l"))
        .localCheckpoint()
      changed = next.as("a")
        .join(labels.as("b"), col("a.n") === col("b.n"))
        .filter(col("a.l") =!= col("b.l")).count()
      labels = next
      iter += 1
    }
    // silently returning partial labels would split true clusters and
    // let extra "keepers" survive dedup — fail loudly instead
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — component diameter exceeds " +
        "what O(log d) pointer-jumping can close in the bound; raise maxIter")
    labels
  }

  /** Q66 — duplicate-cluster assignment: transitive closure over the
    * n-gram-Jaccard near-dup pairs (q30), labeling every clustered doc
    * with the min doc_id of its connected component
    * ([[connectedComponents]]). This is the step an LSH pipeline needs
    * AFTER pair generation — pairs alone over-delete (a~b, b~c must
    * keep one of {a,b,c}, not two survivors). The oracle computes the
    * same closure with DuckDB's deduplicating UNION recursion. */
  val q66 = Query(
    "q66_dedup_clusters",
    (s, dir) => {
      val labels = connectedComponents(q30.build(s, dir))
        .select(col("n").as("doc_id"), col("l").as("cluster_id"))
      val csizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
      labels.join(csizes, "cluster_id")
        .select("doc_id", "cluster_id", "csize")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $shinglesSql,
            |$ccLabelsSql,
            |csizes AS (SELECT cluster_id, COUNT(*) AS csize FROM labels GROUP BY cluster_id)
            |SELECT l.doc_id, l.cluster_id, c.csize
            |FROM labels l JOIN csizes c USING (cluster_id)
            |ORDER BY l.doc_id""".stripMargin)
  )

  /** Q68 — the dedup VERDICT: inside each q66 duplicate cluster keep
    * exactly one doc — the longest (whitespace-token count), min doc_id
    * on ties — and mark the rest for deletion. This is the output a
    * training-data pipeline actually consumes (a keep/drop column per
    * doc), composed from cluster assignment + a quality signal. */
  val q68 = Query(
    "q68_dedup_verdict",
    (s, dir) => {
      val labels = connectedComponents(q30.build(s, dir))
        .select(col("n").as("doc_id"), col("l").as("cluster_id"))
      val qual = Tables.documents(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("n_tokens"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_tokens").desc, col("doc_id").asc)
      labels.join(qual, "doc_id")
        .withColumn("keep", row_number().over(w) === 1)
        .select("doc_id", "cluster_id", "n_tokens", "keep")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $shinglesSql,
            |$ccLabelsSql,
            |qual AS (
            |  SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
            |  FROM documents)
            |SELECT l.doc_id, l.cluster_id, q.n_tokens,
            |       row_number() OVER (PARTITION BY l.cluster_id
            |                          ORDER BY q.n_tokens DESC, l.doc_id ASC) = 1 AS keep
            |FROM labels l JOIN qual q USING (doc_id)
            |ORDER BY l.doc_id""".stripMargin)
  )

  /** Q74 — URL-canonical dedup, the cheapest and highest-yield dedup
    * pass a web corpus runs before any content hashing: normalize each
    * document's URL (lowercase, strip scheme / `www.` / query string /
    * fragment / trailing slash) and keep one document per canonical URL.
    * The fixture has no URL column, so one is composed deterministically
    * from (source, lang, doc_id) with deliberate case / scheme / query
    * noise — the oracle builds the identical string.
    *
    * Scale shape: per-row string normalization (codegen'd regexps, no
    * shuffle) followed by ONE hash aggregation on the canonical key —
    * exactly q27's exact-dedup plan with the digest replaced by the
    * canonical URL.
    */
  val q74 = Query(
    "q74_url_dedup",
    (s, dir) => {
      val noisy = Tables.documents(s, dir)
        .withColumn("url",
          graft.Canon.noisyUrl(col("doc_id"), col("source"), col("lang")))
      noisy
        .withColumn("canon", graft.Canon.canonUrl(col("url")))
        .groupBy("canon")
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_docs"))
        .orderBy("canon")
    },
    Some(s"""WITH noisy AS (
           |  SELECT doc_id, ${graft.Canon.noisyUrlSql} AS url
           |  FROM documents)
           |SELECT regexp_replace(
           |         regexp_replace(
           |           regexp_replace(lower(url), '^https?://(www[.])?', ''),
           |           '[?#].*$$', ''),
           |         '/$$', '') AS canon,
           |       MIN(doc_id) AS keeper,
           |       COUNT(*) AS n_docs
           |FROM noisy GROUP BY 1 ORDER BY canon""".stripMargin)
  )

  /** Q137 — exact set-similarity self-join (shingle Jaccard ≥ 0.6)
    * with PPJoin-style prefix filtering: the deterministic complement
    * to MinHash-LSH (q28, probabilistic) and the scale upgrade over
    * q30's all-shared-shingle join. Under a global rare-first shingle
    * order, any pair with J ≥ τ must share a shingle inside BOTH
    * prefixes of length n − ⌈τ·n⌉ + 1 (the globally smallest common
    * shingle cannot fit in either suffix once the length filter
    * τ·max ≤ min holds), so candidates come from an equi-join on the
    * short prefixes only — frequent shingles never generate pairs,
    * which is exactly what caps bucket sizes at 100 TB.
    *
    * Cross-engine exactness: the τ threshold is the integer predicate
    * 5·inter ≥ 3·(na+nb−inter) — no FP boundary — and jaccard is one
    * IEEE division of exact BIGINTs. The oracle states the naive
    * all-shared-shingle semantics; identical results prove the
    * pruning lossless.
    */
  /** The exact PPJoin+ candidate stage over any (doc_id, sh) relation:
    * rare-first prefixes, length filter, and the POSITIONAL overlap
    * upper bound — all three lossless for J ≥ 0.6.
    *
    * The positional filter is the skew armor: a match on prefix ranks
    * (ra, rb) bounds the whole intersection by 1 + min(na−ra, nb−rb)
    * (every other common shingle sits after the match in BOTH
    * rare-first orders, because the earliest common shingle is globally
    * smallest), so a pair must satisfy 8·(1 + min(na−ra, nb−rb)) ≥
    * 3·(na+nb) at SOME shared prefix shingle or it cannot reach τ —
    * correct because the earliest shared prefix shingle always carries
    * the loosest bound. Heavy shingles are doubly disarmed: rare-first
    * ordering pushes a high-df shingle out of every prefix that has
    * rarer content, and where one does slip into a big bucket, only
    * low-rank×low-rank rank pairs survive the bound — candidate volume
    * per bucket collapses from |bucket|² to the near-duplicate mass
    * (spec-pinned on a 50 %-hot-shingle corpus). Returns distinct
    * (a_doc, b_doc). */
  private[graft] def setSimCandidates(sh: DataFrame): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefix = sh.join(freq, "sh").join(sz, "doc_id")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df").asc, col("sh").asc))
        .cast("long"))
      .filter(col("r") <= col("n") - expr("(3 * n + 4) div 5") + lit(1))
      .select("doc_id", "sh", "n", "r")
      .localCheckpoint()
    prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          lit(5L) * least(col("a.n"), col("b.n")) >=
            lit(3L) * greatest(col("a.n"), col("b.n")) &&
          lit(8L) * (lit(1L) + least(col("a.n") - col("a.r"),
            col("b.n") - col("b.r"))) >=
            lit(3L) * (col("a.n") + col("b.n")))
      .select(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
      .distinct()
  }

  /** Full exact set-similarity pipeline over any (doc_id, sh) relation:
    * [[setSimCandidates]] → shared-shingle count → τ predicate. */
  private[graft] def setSimPairs(sh: DataFrame): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = setSimCandidates(sh)
      .join(sh.select(col("doc_id").as("a_doc"), col("sh")), "a_doc")
      .join(sh.select(col("doc_id").as("b_doc"), col("sh")), Seq("b_doc", "sh"))
      .groupBy("a_doc", "b_doc").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sz.select(col("doc_id").as("a_doc"), col("n").as("na")), "a_doc")
      .join(sz.select(col("doc_id").as("b_doc"), col("n").as("nb")), "b_doc")
      .filter(lit(5L) * col("n_inter") >=
        lit(3L) * (col("na") + col("nb") - col("n_inter")))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")).cast("double"))
      .select("a_doc", "b_doc", "n_inter", "jaccard")
      .orderBy("a_doc", "b_doc")
  }

  val q137 = Query(
    "q137_setsim_prefix",
    (s, dir) => {
      // The shingle relation feeds FOUR subtrees (sizes, frequencies,
      // prefix construction, intersection counting) and the prefix
      // relation two (its own self-join); localCheckpoint materializes
      // each once instead of re-running the tokenize→explode→window
      // lineage per subtree. (An array_intersect verification — cand
      // pairs joined to collected per-doc shingle arrays — was measured
      // 2.4× SLOWER here: candidate volume × array payload beats the
      // explode's shuffle. The aggregation form is the right one when
      // prefixes admit many candidates.)
      setSimPairs(shingles(s, dir).localCheckpoint())
    },
    Some(s"""WITH $shinglesSql,
            |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
            |inter AS (
            |  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, COUNT(*) AS n_inter
            |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT a_doc, b_doc, CAST(n_inter AS BIGINT) AS n_inter,
            |       CAST(n_inter AS DOUBLE)
            |         / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
            |FROM inter
            |JOIN sz sa ON a_doc = sa.doc_id
            |JOIN sz sb ON b_doc = sb.doc_id
            |WHERE 5 * n_inter >= 3 * (sa.n + sb.n - n_inter)
            |ORDER BY a_doc, b_doc""".stripMargin)
  )

  /** Q164 — MinHash candidate-quality eval: precision/recall of q28's
    * LSH band-collision candidates against the exact shingle-Jaccard
    * ≥ 0.2 ground truth (q30's rule). The recall gate every production
    * dedup deployment tracks continuously (the batch twin of the ANN
    * recall invariants on q31b/q31d): band/row geometry drifts out of
    * tune as the corpus changes, and this readout is how you notice.
    * Both sides are deterministic md5-derived computations, so the
    * whole confusion matrix hash-checks cross-engine — an EVAL of an
    * approximation that is itself exactly reproducible.
    *
    * Scale: truth needs the exact shared-shingle join — at 100 TB run
    * the eval on a deterministic md5-residue document sample (q42's
    * device) rather than the corpus; the estimator is unbiased because
    * membership is by pair-independent doc hash.
    */
  val q164 = Query(
    "q164_minhash_eval",
    (s, dir) => {
      val bands = bandsOf(Tables.documents(s, dir))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_doc"), col("b.doc_id").as("b_doc"))
        .distinct()
      val truth = q30.build(s, dir).select("a_doc", "b_doc")
      val tp = truth.join(cand, Seq("a_doc", "b_doc"), "left_semi")
        .agg(count(lit(1)).as("tp"))
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      val nc = cand.agg(count(lit(1)).as("n_cand"))
      nt.crossJoin(nc).crossJoin(tp)
        .select(col("n_truth"), col("n_cand"), col("tp"),
          (col("n_cand") - col("tp")).as("fp"),
          (col("n_truth") - col("tp")).as("fn"),
          (col("tp").cast("double") / col("n_cand").cast("double")).as("precision"),
          (col("tp").cast("double") / col("n_truth").cast("double")).as("recall"))
    },
    Some(s"""WITH $minhashesSql,
            |bands AS (
            |  SELECT doc_id, i // 4 AS band,
            |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
            |  FROM mh GROUP BY doc_id, i // 4),
            |cand AS (
            |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
            |  FROM bands a JOIN bands b
            |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            |inter AS (
            |  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, COUNT(*) AS n_inter
            |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |truth AS (
            |  SELECT a_doc, b_doc FROM inter
            |  JOIN sizes sa ON a_doc = sa.doc_id
            |  JOIN sizes sb ON b_doc = sb.doc_id
            |  WHERE CAST(n_inter AS DOUBLE)
            |        / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2),
            |tpc AS (SELECT CAST(COUNT(*) AS BIGINT) AS tp
            |        FROM truth JOIN cand USING (a_doc, b_doc)),
            |ntc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
            |ncc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand)
            |SELECT n_truth, n_cand, tp,
            |       CAST(n_cand - tp AS BIGINT) AS fp,
            |       CAST(n_truth - tp AS BIGINT) AS fn,
            |       CAST(tp AS DOUBLE) / CAST(n_cand AS DOUBLE) AS precision,
            |       CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
            |FROM ntc, ncc, tpc""".stripMargin)
  )

  /** Q165 — transitive-chain audit of connected-component dedup: how
    * many document pairs share a q66 cluster WITHOUT being direct
    * near-duplicates? Min-label components merge A–B and B–C into one
    * cluster even when A and C share nothing — the chaining failure
    * mode of every CC-based dedup (and the soft spot called out in
    * this repo's own q66 scale notes). n_transitive / n_within is the
    * fraction of merge decisions made by transitivity alone; when it
    * climbs, clusters are chaining and the pair threshold needs
    * raising (or the verdict should switch to star-shaped keeper
    * assignment). Within-cluster pair fan-out is bounded by the max
    * cluster size — exactly the quantity this query also reports.
    */
  val q165 = Query(
    "q165_chain_audit",
    (s, dir) => {
      val pairs = q30.build(s, dir).select("a_doc", "b_doc").localCheckpoint()
      val labels = connectedComponents(pairs)
        .select(col("n").as("doc_id"), col("l").as("cluster_id"))
        .localCheckpoint()
      // n_within is closed-form from cluster sizes: a cluster of c docs
      // contributes c·(c−1)/2 unordered pairs. Materializing the pair
      // self-join to COUNT it would be quadratic in the largest cluster —
      // the very pathology this audit exists to flag — so on the
      // mega-cluster corpus it's meant to detect, the audit itself would
      // blow up. The oracle states the pair-join semantics explicitly,
      // proving this closed form equivalent.
      val csz = labels.groupBy("cluster_id").agg(count(lit(1)).as("c"))
      val agg1 = labels.agg(count(lit(1)).as("n_docs"))
      // coalesce: on a dup-free corpus `pairs` (hence `csz`) is empty and
      // the global sum is NULL — the oracle's COUNT-based pair join says 0
      val agg2 = csz.agg(count(lit(1)).as("n_clusters"), max(col("c")).as("max_cluster"),
        shiftright(coalesce(sum(col("c") * (col("c") - lit(1))), lit(0L))
          .cast("long"), 1).as("n_within"))
      val agg3 = pairs.agg(count(lit(1)).as("n_direct"))
      agg1.crossJoin(agg2).crossJoin(agg3)
        .select(col("n_docs"), col("n_clusters"), col("max_cluster"),
          col("n_direct"), col("n_within"),
          (col("n_within") - col("n_direct")).as("n_transitive"))
    },
    Some(s"""WITH RECURSIVE $shinglesSql,
            |$ccLabelsSql,
            |within AS (
            |  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc
            |  FROM labels a JOIN labels b
            |    ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id),
            |csz AS (SELECT cluster_id, COUNT(*) AS c FROM labels GROUP BY 1)
            |SELECT CAST((SELECT COUNT(*) FROM labels) AS BIGINT) AS n_docs,
            |       CAST((SELECT COUNT(*) FROM csz) AS BIGINT) AS n_clusters,
            |       CAST((SELECT MAX(c) FROM csz) AS BIGINT) AS max_cluster,
            |       CAST((SELECT COUNT(*) FROM cc_pairs) AS BIGINT) AS n_direct,
            |       CAST((SELECT COUNT(*) FROM within) AS BIGINT) AS n_within,
            |       CAST((SELECT COUNT(*) FROM within) AS BIGINT)
            |         - CAST((SELECT COUNT(*) FROM cc_pairs) AS BIGINT) AS n_transitive""".stripMargin)
  )

  /** Q167 — LSH geometry sweep: q164's recall readout at THREE
    * band/row geometries in one query (rows-per-band r ∈ {2, 4, 8}
    * over the 16 minhashes → 8/4/2 bands). The S-curve trade-off made
    * measurable: small r → many permissive bands → recall ↑ candidates
    * ↑; large r → few strict bands → the opposite. This is how the
    * q28 production geometry (r=4) is TUNED rather than assumed — run
    * the sweep, pick the cheapest r that clears the recall gate. One
    * extra fan-out of the (doc, i, mh) relation per geometry, each a
    * hash-keyed equi-join; truth shared across geometries.
    */
  val q167 = Query(
    "q167_lsh_geometry_sweep",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val sigs = sigsOf(Tables.documents(s, dir)).localCheckpoint()
      val truth = q30.build(s, dir).select("a_doc", "b_doc").localCheckpoint()
      val nt = truth.agg(count(lit(1)).as("n_truth"))
      val geoms = Seq(2, 4, 8).toDF("r")
      // every geometry's band signatures slice out of the ONE signature
      // array map-side — no per-geometry (doc, i, mh) fan-out shuffle
      val bands = sigs.crossJoin(broadcast(geoms))
        .select(col("r"), col("doc_id"), col("sig").as("__sig"),
          explode(sequence(lit(0),
            (lit(NumHashes) / col("r")).cast("int") - 1)).as("band"))
        .select(col("r"), col("doc_id"), col("band"),
          concat_ws(",", transform(
            slice(col("__sig"), col("band") * col("r") + 1,
              col("r")), x => x.cast("string"))).as("sig"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.r") === col("b.r") && col("a.band") === col("b.band") &&
            col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.r").as("r"), col("a.doc_id").as("a_doc"),
          col("b.doc_id").as("b_doc"))
        .distinct()
      val perR = cand.groupBy("r").agg(count(lit(1)).as("n_cand"))
      val tp = cand.join(truth, Seq("a_doc", "b_doc"), "left_semi")
        .groupBy("r").agg(count(lit(1)).as("tp"))
      perR.join(tp, Seq("r"), "left")
        .crossJoin(broadcast(nt))
        .select(col("r").cast("long").as("r"),
          expr("cast(16 div r as bigint)").as("n_bands"),
          col("n_cand"), coalesce(col("tp"), lit(0L)).as("tp"),
          col("n_truth"),
          (coalesce(col("tp"), lit(0L)).cast("double") /
            col("n_truth").cast("double")).as("recall"))
        .orderBy("r")
    },
    Some(s"""WITH $minhashesSql,
            |geoms AS (SELECT unnest([2, 4, 8]) AS r),
            |bands AS (
            |  SELECT g.r, m.doc_id, m.i // g.r AS band,
            |         string_agg(CAST(m.mh AS VARCHAR), ',' ORDER BY m.i) AS sig
            |  FROM mh m CROSS JOIN geoms g
            |  GROUP BY g.r, m.doc_id, m.i // g.r),
            |cand AS (
            |  SELECT DISTINCT a.r, a.doc_id AS a_doc, b.doc_id AS b_doc
            |  FROM bands a JOIN bands b
            |    ON a.r = b.r AND a.band = b.band AND a.sig = b.sig
            |   AND a.doc_id < b.doc_id),
            |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            |inter AS (
            |  SELECT a.doc_id AS a_doc, b.doc_id AS b_doc, COUNT(*) AS n_inter
            |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |truth AS (
            |  SELECT a_doc, b_doc FROM inter
            |  JOIN sizes sa ON a_doc = sa.doc_id
            |  JOIN sizes sb ON b_doc = sb.doc_id
            |  WHERE CAST(n_inter AS DOUBLE)
            |        / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.2),
            |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
            |perr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_cand
            |         FROM cand GROUP BY r),
            |tp AS (SELECT c.r, CAST(COUNT(*) AS BIGINT) AS tp
            |       FROM cand c JOIN truth t
            |         ON c.a_doc = t.a_doc AND c.b_doc = t.b_doc
            |       GROUP BY c.r)
            |SELECT CAST(p.r AS BIGINT) AS r, CAST(16 // p.r AS BIGINT) AS n_bands,
            |       p.n_cand, COALESCE(tp.tp, 0) AS tp, n.n_truth,
            |       CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(n.n_truth AS DOUBLE)
            |         AS recall
            |FROM perr p LEFT JOIN tp ON p.r = tp.r CROSS JOIN nt n
            |ORDER BY r""".stripMargin)
  )

  /** Q175 — the dedup CASCADE as one accounted pipeline: canonical-URL
    * keeper (q74's rule) → exact-text keeper (q27's rule) → near-dup
    * cluster verdict (q66/q68's rule, longest-doc-wins) — each stage
    * applied to the SURVIVORS of the previous one, emitting the
    * (docs_in, docs_out, removed) funnel row per stage. This is the
    * shape a production corpus actually runs (cheap high-yield passes
    * first so the expensive shingle join sees the smallest possible
    * input) and the accounting every pipeline owner reports; the stage
    * rules are the shared definitions (`Canon.noisyUrl`/`canonUrl`,
    * `normText`, [[jaccardPairsOf]], [[connectedComponents]]), so the
    * cascade can never drift from the standalone queries.
    *
    * Everything stays declarative — stage counts are aggregates
    * cross-joined into the four output rows, no driver-side counting —
    * and the oracle replays the identical cascade in DuckDB (the
    * shingle CTE parameterized onto stage-2 survivors).
    */
  val q175 = Query(
    "q175_dedup_cascade",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val k1 = docs
        .withColumn("url",
          graft.Canon.noisyUrl(col("doc_id"), col("source"), col("lang")))
        .withColumn("canon", graft.Canon.canonUrl(col("url")))
        .groupBy("canon").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val s1 = docs.join(k1, "doc_id")
      val k2 = s1
        .groupBy(md5(normText(col("text"))).as("digest"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val s2 = s1.join(k2, "doc_id").localCheckpoint()
      val labels = connectedComponents(jaccardPairsOf(s2))
        .select(col("n").as("doc_id"), col("l").as("cluster_id"))
      val qual = s2.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("n_tokens"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_tokens").desc, col("doc_id").asc)
      val dropped3 = labels.join(qual, "doc_id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") =!= 1)
      def cnt(df: DataFrame, as: String): DataFrame =
        df.agg(count(lit(1)).cast("long").as(as))
      def stage(name: String, in: DataFrame, out: DataFrame): DataFrame =
        cnt(in, "docs_in").crossJoin(cnt(out, "docs_out"))
          .select(lit(name).as("stage"), col("docs_in"), col("docs_out"),
            (col("docs_in") - col("docs_out")).as("removed"))
      val s3count = cnt(s2, "a").crossJoin(cnt(dropped3, "b"))
        .select((col("a") - col("b")).as("docs_out"))
      stage("1_url", docs, s1)
        .union(stage("2_exact", s1, s2))
        .union(cnt(s2, "docs_in").crossJoin(s3count)
          .select(lit("3_neardup").as("stage"), col("docs_in"),
            col("docs_out"), (col("docs_in") - col("docs_out")).as("removed")))
        .orderBy("stage")
    },
    Some(s"""WITH RECURSIVE noisy AS (
            |  SELECT doc_id, ${graft.Canon.noisyUrlSql} AS url
            |  FROM documents),
            |k1 AS (
            |  SELECT MIN(doc_id) AS doc_id FROM (
            |    SELECT doc_id,
            |           regexp_replace(
            |             regexp_replace(
            |               regexp_replace(lower(url), '^https?://(www[.])?', ''),
            |               '[?#].*$$', ''),
            |             '/$$', '') AS canon
            |    FROM noisy) GROUP BY canon),
            |s1 AS (SELECT d.* FROM documents d JOIN k1 USING (doc_id)),
            |k2 AS (
            |  SELECT MIN(doc_id) AS doc_id FROM s1
            |  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))),
            |s2 AS (SELECT s1.* FROM s1 JOIN k2 USING (doc_id)),
            |${shinglesSqlFrom("s2")},
            |$ccLabelsSql,
            |qual AS (
            |  SELECT doc_id,
            |         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
            |  FROM s2),
            |drop3 AS (
            |  SELECT doc_id FROM (
            |    SELECT l.doc_id,
            |           row_number() OVER (PARTITION BY l.cluster_id
            |                              ORDER BY q.n_tokens DESC, l.doc_id ASC) AS rn
            |    FROM labels l JOIN qual q USING (doc_id)) WHERE rn <> 1)
            |SELECT '1_url' AS stage,
            |       (SELECT COUNT(*) FROM documents) AS docs_in,
            |       (SELECT COUNT(*) FROM s1) AS docs_out,
            |       (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM s1) AS removed
            |UNION ALL
            |SELECT '2_exact',
            |       (SELECT COUNT(*) FROM s1), (SELECT COUNT(*) FROM s2),
            |       (SELECT COUNT(*) FROM s1) - (SELECT COUNT(*) FROM s2)
            |UNION ALL
            |SELECT '3_neardup',
            |       (SELECT COUNT(*) FROM s2),
            |       (SELECT COUNT(*) FROM s2) - (SELECT COUNT(*) FROM drop3),
            |       (SELECT COUNT(*) FROM drop3)
            |ORDER BY stage""".stripMargin)
  )

  /** Q185 — entity resolution (record linkage) across two keyed tables:
    * match `customer` against a deterministically NOISY registry copy
    * (names case-mangled / suffixed / re-punctuated, balances perturbed
    * by cents, ~6% of customers absent) by blocking + multi-field
    * scoring — the classic MDM/dedup shape the reference's Type-1
    * upserts assume away (its keys always match exactly;
    * createDW.sql:23-26). Per customer: the best registry candidate in
    * its block (min name-distance, then balance delta, then reg_id) and
    * a matched verdict (name distance ≤ 3 AND balance within 5 cents).
    *
    * Blocking: (nationkey, digit-string of the normalized name mod 50)
    * — candidates are an EQUI-join on the block key, never customer ×
    * registry; block sizes stay bounded because the digit residue
    * spreads uniformly. Pairs straddling no block are impossible here
    * (the digit string survives every noise form — upper-case, ' JR'
    * suffix, '#'→'-' — by construction of the normalizer), which is the
    * property a production blocker must prove about ITS normalizer.
    * Scoring is q56's Levenshtein (identical in both engines) on the
    * raw names plus an exact integer cents delta.
    */
  val q185 = Query(
    "q185_entity_resolution",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val balC = graft.Canon.dec(col("c_acctbal"))
      // The noisy registry: deterministic per-key perturbations.
      val reg = cust
        .filter(pmod(col("c_custkey"), lit(17)) =!= 0)
        .select(
          (col("c_custkey") + 1000000L).as("reg_id"),
          when(pmod(col("c_custkey"), lit(4)) === 0, upper(col("c_name")))
            .when(pmod(col("c_custkey"), lit(4)) === 1,
              concat(col("c_name"), lit(" JR")))
            .when(pmod(col("c_custkey"), lit(4)) === 2,
              regexp_replace(col("c_name"), "#", "-"))
            .otherwise(col("c_name")).as("r_name"),
          col("c_nationkey").as("r_nationkey"),
          (balC + pmod(col("c_custkey"), lit(5)).cast("decimal(18,4)") *
            lit(0.01).cast("decimal(6,4)")).cast("decimal(18,4)").as("r_bal"))
      // A digit-free name yields '' — Spark casts '' to NULL (silent row
      // drop) while DuckDB's CAST raises; the '0' sentinel gives BOTH
      // engines the same degraded-but-defined block for such names.
      def blockKey(name: Column): Column = {
        val digits = regexp_replace(lower(name), "[^0-9]", "")
        pmod(when(digits === "", lit("0")).otherwise(digits).cast("long"),
          lit(50))
      }
      val cands = cust
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), balC.as("c_bal"))
        .join(reg,
          col("c_nationkey") === col("r_nationkey") &&
            blockKey(col("c_name")) === blockKey(col("r_name")))
        .withColumn("name_dist",
          levenshtein(lower(col("c_name")), lower(col("r_name"))).cast("long"))
        .withColumn("bal_delta_cents",
          // explicit floor on BOTH engines: Spark's decimal→long cast
          // truncates while DuckDB's rounds — whole-cent fixture values
          // hide the drift, sub-cent balances would not
          floor(abs((col("r_bal") - col("c_bal")) * lit(100).cast("decimal(6,0)")))
            .cast("long"))
      val best = Window.partitionBy("c_custkey")
        .orderBy(col("name_dist").asc, col("bal_delta_cents").asc,
          col("reg_id").asc)
      cands
        .withColumn("rk", row_number().over(best))
        .filter(col("rk") === 1)
        .select(col("c_custkey"), col("reg_id"), col("name_dist"),
          col("bal_delta_cents"),
          (col("name_dist") <= 3 && col("bal_delta_cents") <= 5).as("matched"))
        .orderBy("c_custkey")
    },
    Some("""WITH reg AS (
           |  SELECT c_custkey + 1000000 AS reg_id,
           |         CASE WHEN c_custkey % 4 = 0 THEN upper(c_name)
           |              WHEN c_custkey % 4 = 1 THEN concat(c_name, ' JR')
           |              WHEN c_custkey % 4 = 2 THEN replace(c_name, '#', '-')
           |              ELSE c_name END AS r_name,
           |         c_nationkey AS r_nationkey,
           |         CAST(CAST(c_acctbal AS DECIMAL(18,4)) +
           |              CAST(c_custkey % 5 AS DECIMAL(18,4)) *
           |              CAST(0.01 AS DECIMAL(6,4)) AS DECIMAL(18,4)) AS r_bal
           |  FROM customer WHERE c_custkey % 17 <> 0),
           |cands AS (
           |  SELECT c.c_custkey, r.reg_id,
           |         CAST(levenshtein(lower(c.c_name), lower(r.r_name)) AS BIGINT) AS name_dist,
           |         CAST(floor(abs((r.r_bal - CAST(c.c_acctbal AS DECIMAL(18,4))) * 100)) AS BIGINT) AS bal_delta_cents
           |  FROM customer c JOIN reg r
           |    ON c.c_nationkey = r.r_nationkey
           |   AND CAST(coalesce(nullif(regexp_replace(lower(c.c_name), '[^0-9]', '', 'g'), ''), '0') AS BIGINT) % 50
           |     = CAST(coalesce(nullif(regexp_replace(lower(r.r_name), '[^0-9]', '', 'g'), ''), '0') AS BIGINT) % 50)
           |SELECT c_custkey, reg_id, name_dist, bal_delta_cents,
           |       name_dist <= 3 AND bal_delta_cents <= 5 AS matched
           |FROM cands
           |QUALIFY row_number() OVER (PARTITION BY c_custkey
           |          ORDER BY name_dist ASC, bal_delta_cents ASC, reg_id ASC) = 1
           |ORDER BY c_custkey""".stripMargin)
  )

  /** Q213 — EXACT SUBSTRING dedup (the Lee et al. "Deduplicating
    * Training Data Makes Language Models Better" semantics, restated
    * distributed): find document pairs sharing a VERBATIM token span of
    * ≥ 16 tokens. The suffix-array formulation of the paper is
    * single-machine; the distributed restatement is a FINGERPRINT
    * DIAGONAL RUN:
    *
    *  1. every position emits its 8-token k-gram (`transform` +
    *     `slice` over the token array — pure codegen, no window, no
    *     UDF);
    *  2. an EQUI-join on the gram pairs up positions across documents
    *     (never all-pairs: only positions sharing a verbatim 8-gram
    *     meet);
    *  3. matches on the same DIAGONAL (p1 − p2 constant) at CONSECUTIVE
    *     positions are one shared span: gaps-and-islands per
    *     (d1, d2, diag) — a run of r consecutive matching grams is a
    *     verbatim span of r + 7 tokens. Exact, not probabilistic: two
    *     documents share a ≥16-token span iff a ≥9-run of 8-grams
    *     exists on some diagonal.
    *
    * Scale: the join key is the gram itself (content-hash-partitioned);
    * at 100 TB hot grams (boilerplate) are capped by document-frequency
    * before the join — here the exact form runs because the oracle
    * states exact semantics. Window state is per (pair, diagonal) —
    * keyed, never global. */
  val q213 = Query(
    "q213_substring_dedup",
    (s, dir) => {
      val K = 8
      val grams = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= K)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, size(toks) - ${K - 1}),
             |  i -> struct(i AS pos,
             |              array_join(slice(toks, i, $K), ' ') AS gram))"""
            .stripMargin)).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"),
          col("pg.gram").as("gram"))
      val a = grams.select(col("doc_id").as("d1"), col("pos").as("p1"),
        col("gram"))
      val b = grams.select(col("doc_id").as("d2"), col("pos").as("p2"),
        col("gram"))
      val pairs = a.join(b, Seq("gram"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"), col("p1"),
          (col("p1") - col("p2")).as("diag"))
      val w = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
      val spans = pairs
        .withColumn("isl", col("p1") - row_number().over(w))
        .groupBy("d1", "d2", "diag", "isl")
        .agg((count(lit(1)) + lit(K - 1)).cast("long").as("span"))
      spans.groupBy("d1", "d2")
        .agg(max(col("span")).as("max_span"),
          count(lit(1)).cast("long").as("n_runs"))
        .filter(col("max_span") >= 16)
        .orderBy("d1", "d2")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, u.tok, u.pos
           |  FROM documents,
           |  LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
           |                  unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos) u
           |),
           |grams AS (
           |  SELECT doc_id, pos,
           |         array_to_string(list(tok) OVER (PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING), ' ') AS gram,
           |         count(*) OVER (PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
           |  FROM toks),
           |g AS (SELECT doc_id, pos, gram FROM grams WHERE w = 8),
           |pairs AS (
           |  SELECT a.doc_id d1, b.doc_id d2, a.pos p1, a.pos - b.pos AS diag
           |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
           |runs AS (
           |  SELECT d1, d2, diag,
           |         p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS isl
           |  FROM pairs),
           |spans AS (
           |  SELECT d1, d2, CAST(COUNT(*) + 7 AS BIGINT) AS span
           |  FROM runs GROUP BY d1, d2, diag, isl)
           |SELECT d1, d2, MAX(span) AS max_span,
           |       CAST(COUNT(*) AS BIGINT) AS n_runs
           |FROM spans GROUP BY d1, d2
           |HAVING MAX(span) >= 16
           |ORDER BY d1, d2""".stripMargin)
  )

  /** Q216 — exact substring REMOVAL (the transform half of the Lee et
    * al. pipeline; [[q213]] is the detection half): every token span of
    * ≥ 16 tokens shared VERBATIM with a lower-doc_id document is CUT
    * from the higher document — first occurrence wins, later copies
    * lose exactly the duplicated positions, the surrounding text
    * survives. Same fingerprint-diagonal machinery as q213, then the
    * spans explode to covered (doc, position) pairs and an ANTI-join
    * drops them from the token stream; the cleaned text reassembles
    * position-ordered. Everything is keyed (gram → pair → doc) — no
    * stage holds more than one document's positions together, the
    * property that lets the transform run over a 100 TB corpus. */
  val q216 = Query(
    "q216_substring_removal",
    (s, dir) => {
      val K = 8
      val toksDf = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val grams = toksDf
        .filter(size(col("toks")) >= K)
        .select(col("doc_id"), explode(expr(
          s"""transform(sequence(1, size(toks) - ${K - 1}),
             |  i -> struct(i AS pos,
             |              array_join(slice(toks, i, $K), ' ') AS gram))"""
            .stripMargin)).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"),
          col("pg.gram").as("gram"))
      val a = grams.select(col("doc_id").as("d1"), col("pos").as("p1"),
        col("gram"))
      val b = grams.select(col("doc_id").as("d2"), col("pos").as("p2"),
        col("gram"))
      val pairs = a.join(b, Seq("gram"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"), col("p1"), col("p2"),
          (col("p1") - col("p2")).as("diag"))
      val w = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
      val spans = pairs
        .withColumn("isl", col("p1") - row_number().over(w))
        .groupBy("d1", "d2", "diag", "isl")
        .agg(min(col("p2")).cast("long").as("p2s"),
          (count(lit(1)) + lit(K - 1)).cast("long").as("len"))
        .filter(col("len") >= 16)
      val cov = spans
        .select(col("d2").as("doc_id"),
          explode(sequence(col("p2s"),
            col("p2s") + col("len") - lit(1L))).as("pos"))
        .distinct()
      val tokPos = toksDf
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + lit(1)).cast("long").as("pos"),
          col("tok"))
      val kept = tokPos.join(cov, Seq("doc_id", "pos"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr(
            "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
            " ").as("cleaned"))
      toksDf.select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          coalesce(col("cleaned"), lit("")).as("cleaned"))
        .orderBy("doc_id")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, u.tok, u.pos
           |  FROM documents,
           |  LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
           |                  unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos) u),
           |grams AS (
           |  SELECT doc_id, pos,
           |         array_to_string(list(tok) OVER (PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING), ' ') AS gram,
           |         count(*) OVER (PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
           |  FROM toks),
           |g AS (SELECT doc_id, pos, gram FROM grams WHERE w = 8),
           |pairs AS (
           |  SELECT a.doc_id d1, b.doc_id d2, a.pos p1, b.pos p2,
           |         a.pos - b.pos AS diag
           |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
           |runs AS (
           |  SELECT d1, d2, diag, p2,
           |         p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS isl
           |  FROM pairs),
           |spans AS (
           |  SELECT d2, MIN(p2) AS p2s, CAST(COUNT(*) + 7 AS BIGINT) AS len
           |  FROM runs GROUP BY d1, d2, diag, isl
           |  HAVING COUNT(*) + 7 >= 16),
           |cov AS (
           |  SELECT DISTINCT d2 AS doc_id, CAST(t.u AS BIGINT) AS pos
           |  FROM spans, LATERAL unnest(range(p2s, p2s + len)) AS t(u)),
           |kept AS (
           |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           |         string_agg(t.tok, ' ' ORDER BY t.pos) AS cleaned
           |  FROM toks t LEFT JOIN cov c
           |    ON t.doc_id = c.doc_id AND t.pos = c.pos
           |  WHERE c.pos IS NULL GROUP BY t.doc_id),
           |n AS (SELECT doc_id,
           |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           |      FROM documents)
           |SELECT n.doc_id, n.n_toks,
           |       coalesce(k.n_kept, 0) AS n_kept,
           |       n.n_toks - coalesce(k.n_kept, 0) AS n_removed,
           |       coalesce(k.cleaned, '') AS cleaned
           |FROM n LEFT JOIN kept k ON n.doc_id = k.doc_id
           |ORDER BY n.doc_id""".stripMargin)
  )

  /** Q245 — the STREAMING-MAINTAINED EXACT-DEDUP STORE
    * ([[graft.streaming.DedupStore]]), oracle-gated end-to-end: the
    * corpus lands in three commits plus one merge-on-read DV erasure;
    * change-feed maintenance keeps one canonical survivor (MIN live
    * doc_id) per content digest, PROMOTING the next-lowest member when
    * an erasure takes a group's survivor out — the non-invertible-
    * aggregate sibling of q225's subtractable counts, maintained by
    * re-aggregating ONLY the touched digest groups. The final store
    * hash-matches DuckDB's full-corpus recompute (the incremental ≡
    * batch proof). The fixture's texts are pairwise distinct, so the
    * gate keys on [[graft.streaming.DedupStore.headDigest]] (12-char
    * head fingerprint → 50 real duplicate groups, 8 of which lose
    * their survivor to the erasure and must promote); the maintenance
    * is key-agnostic.
    *
    * Scale shape: per drained version range the work is O(changed
    * docs) + O(affected digests) — never a corpus rescan — and the
    * whole batch (members + survivors + replay ledger) is ONE atomic
    * keyed merge, so there is no partial-application crash window.
    */
  val q245 = Query(
    "q245_dedup_store",
    (s, dir) => {
      val root = Tables.scratchRoot("dedupst", dir)
      val src = root.resolve("docs_t").toString
      val store = root.resolve("dedup_store").toString
      val ckpt = root.resolve("ckpt").toString
      import graft.sources.Sources
      import graft.streaming.DedupStore
      // pinned: three slice commits, one documents scan (guide §5)
      val docs = Tables.documents(s, dir).select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 0), src)
        Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 1), src)
        DedupStore.maintainQuery(s, src, store, ckpt,
          DedupStore.headDigest).awaitTermination()
        Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 2), src)
      } finally { docs.unpersist(); () }
      // a GDPR-style erasure that takes 8 groups' survivors with it
      Sources.deleteWhereDv(s, src, pmod(col("doc_id"), lit(11)) === 0)
      DedupStore.maintainQuery(s, src, store, ckpt,
        DedupStore.headDigest).awaitTermination()
      val nLive = DedupStore.members(s, store)
        .groupBy("digest").agg(count(lit(1)).as("n_live"))
      DedupStore.survivors(s, store)
        .join(nLive, Seq("digest"))
        .select(col("digest"), col("survivor_id"), col("n_live"))
        .orderBy("digest")
    },
    Some("""WITH live AS (
           |  SELECT doc_id, md5(substr(lower(text), 1, 12)) AS digest
           |  FROM documents WHERE doc_id % 11 <> 0)
           |SELECT digest, MIN(doc_id) AS survivor_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_live
           |FROM live GROUP BY digest ORDER BY digest""".stripMargin)
  )

  // ---- the incremental dedup chain's shared lifecycle + oracle ----------

  /** The q251/q252/q253 mutation sequence — three commits, a CoW
    * re-text UPDATE of every doc_id % 13 == 5 (tokens appended => new
    * shingles => new bands), a merge-on-read DV erasure of every
    * doc_id % 11 == 0 — with `drain()` invoked after the second commit
    * and again at the end. ONE definition so the three chained gates
    * can never run different sequences than their shared oracle
    * corpus describes. */
  private def chainLifecycle(s: SparkSession, dir: String, src: String)
      (drain: () => Unit): Unit = {
    import graft.sources.Sources
    // pinned: the three slice commits would otherwise each re-scan the
    // documents parquet (compute once, guide §5)
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 0), src)
      Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 1), src)
      drain()
      Sources.commitVersion(docs.filter(pmod(col("doc_id"), lit(3)) === 2), src)
    } finally { docs.unpersist(); () }
    Sources.updateWhere(s, src, pmod(col("doc_id"), lit(13)) === 5,
      Map("text" -> concat(col("text"), lit(" zq xv"),
        pmod(col("doc_id"), lit(7)).cast("string"))))
    Sources.deleteWhereDv(s, src, pmod(col("doc_id"), lit(11)) === 0)
    drain()
  }

  /** The lifecycle's final corpus, stated in SQL — the oracle twin of
    * [[chainLifecycle]]. */
  private val mutatedCorpusSql =
    """corpus AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 13 = 5
      |              THEN text || ' zq xv' || CAST(doc_id % 7 AS VARCHAR)
      |              ELSE text END AS text
      |  FROM documents WHERE doc_id % 11 <> 0)""".stripMargin

  /** q28's whole LSH derivation over the mutated corpus (shingles →
    * minhash → bands → banded candidates → signatures) — shared by all
    * three chain oracles so the LSH constants live in ONE SQL text. */
  private val lshPairsSql =
    s"""${shinglesSqlFrom("corpus")},
       |th AS (
       |  SELECT doc_id, CAST(concat('0x', substr(md5(sh),1,15)) AS BIGINT) % 2147483647 AS tv
       |  FROM sh),
       |mh AS (
       |  SELECT doc_id, i,
       |         MIN((((2654435761 * (i+1)) % 2147483647) * tv
       |              + ((40503 * (i+7)) % 2147483647)) % 2147483647) AS mh
       |  FROM th, range(0, 16) r(i)
       |  GROUP BY doc_id, i),
       |bands AS (
       |  SELECT doc_id, i // 4 AS band,
       |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
       |  FROM mh GROUP BY doc_id, i // 4),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_doc, b.doc_id AS b_doc
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sigs AS (
       |  SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id)""".stripMargin

  /** Thresholded pairs → recursive min-label closure (the ≥0.5 edge
    * bar is [[graft.streaming.ClusterView.EdgeThreshold]]). */
  private val lshClosureSql =
    s"""$lshPairsSql,
       |scored AS (
       |  SELECT c.a_doc, c.b_doc,
       |    CAST(list_sum(list_transform(list_zip(sa.sig, sb.sig),
       |         x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 AS est
       |  FROM cand c
       |  JOIN sigs sa ON c.a_doc = sa.doc_id
       |  JOIN sigs sb ON c.b_doc = sb.doc_id),
       |cc_pairs AS (SELECT a_doc, b_doc FROM scored WHERE est >= 0.5),
       |edges AS (SELECT a_doc AS u, b_doc AS v FROM cc_pairs
       |          UNION SELECT b_doc, a_doc FROM cc_pairs),
       |nodes AS (SELECT DISTINCT u AS n FROM edges),
       |walk(n, l) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT e.v, w.l FROM walk w JOIN edges e ON w.n = e.u WHERE w.l < e.v),
       |labels AS (SELECT n AS doc_id, MIN(l) AS cluster_id FROM walk GROUP BY n)""".stripMargin

  /** Q251 — the STREAMING-MAINTAINED NEAR-DUP INDEX
    * ([[graft.streaming.NearDupStore]]), oracle-gated end-to-end under
    * [[chainLifecycle]]: change-feed maintenance keeps signatures, LSH
    * band rows, and verified candidate pairs current; the re-texted
    * docs' stale band rows strip off the STORED signature, their pairs
    * recompute. The final pair view hash-matches DuckDB's FULL-CORPUS
    * q28 recompute over the mutated live corpus — the incremental ≡
    * batch proof for approximate near-dup detection.
    *
    * Scale shape: per drained version range the work is O(changed
    * docs) minhashing + a band-key equi-join against the index +
    * doc-keyed strips — never a corpus re-LSH — and the whole batch
    * (signatures + bands + pairs + replay ledger) is ONE atomic keyed
    * merge, so there is no partial-application crash window.
    */
  val q251 = Query(
    "q251_neardup_store",
    (s, dir) => {
      val root = Tables.scratchRoot("neardupst", dir)
      val src = root.resolve("docs_t").toString
      val store = root.resolve("nd_store").toString
      val ckpt = root.resolve("ckpt").toString
      import graft.streaming.NearDupStore
      chainLifecycle(s, dir, src) { () =>
        NearDupStore.maintainQuery(s, src, store, ckpt).awaitTermination()
      }
      NearDupStore.pairs(s, store).orderBy("a_doc", "b_doc")
    },
    Some(s"""WITH $mutatedCorpusSql,
            |$lshPairsSql
            |SELECT c.a_doc, c.b_doc,
            |  CAST(list_sum(list_transform(list_zip(sa.sig, sb.sig),
            |       x -> CASE WHEN x[1] = x[2] THEN 1 ELSE 0 END)) AS DOUBLE) / 16 AS est_jaccard
            |FROM cand c
            |JOIN sigs sa ON c.a_doc = sa.doc_id
            |JOIN sigs sb ON c.b_doc = sb.doc_id
            |ORDER BY a_doc, b_doc""".stripMargin)
  )

  /** Q252 — the INCREMENTAL DUPLICATE-CLUSTER VIEW
    * ([[graft.streaming.ClusterView]]): connected components over the
    * ≥0.5-estimated near-dup graph, maintained off the near-dup
    * store's OWN change feed — the derived-of-derived chain
    * (documents → LSH index → clusters) under [[chainLifecycle]].
    * Edge deletions SPLIT components — the non-invertible case no
    * per-edge bookkeeping survives — so the maintainer re-solves only
    * the affected components' closed subgraph per drained range. The
    * final view hash-matches DuckDB's recursive-CTE closure over the
    * full-corpus recompute.
    */
  val q252 = Query(
    "q252_cluster_view",
    (s, dir) => {
      val root = Tables.scratchRoot("clusterv", dir)
      val src = root.resolve("docs_t").toString
      val store = root.resolve("nd_store").toString
      val view = root.resolve("cluster_view").toString
      import graft.streaming.{ClusterView, NearDupStore}
      chainLifecycle(s, dir, src) { () =>
        NearDupStore.maintainQuery(s, src, store,
          root.resolve("ckpt_nd").toString).awaitTermination()
        ClusterView.maintainQuery(s, store, view,
          root.resolve("ckpt_cv").toString).awaitTermination()
      }
      ClusterView.clusters(s, view).orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $mutatedCorpusSql,
            |$lshClosureSql,
            |csizes AS (SELECT cluster_id, COUNT(*) AS csize FROM labels GROUP BY cluster_id)
            |SELECT l.doc_id, l.cluster_id, c.csize
            |FROM labels l JOIN csizes c USING (cluster_id)
            |ORDER BY l.doc_id""".stripMargin)
  )

  /** Q253 — the INCREMENTAL DEDUP-VERDICT VIEW
    * ([[graft.streaming.VerdictView]]): q68's keep/drop rule (most
    * tokens wins its cluster, min doc_id tie-break) maintained off the
    * CLUSTER VIEW's change feed — the dedup chain's last link, fully
    * incremental end to end: documents → LSH index → components →
    * verdicts. Touched clusters re-pick their keeper against the
    * source head (doc-keyed semi-join); a doc's move re-verdicts both
    * its old and new cluster (delete rows carry the old assignment).
    * Gate: [[chainLifecycle]] through all THREE maintainers; the
    * final verdicts hash-match DuckDB's recursive-closure recompute
    * with q68's window rule.
    */
  val q253 = Query(
    "q253_verdict_view",
    (s, dir) => {
      val root = Tables.scratchRoot("verdictv", dir)
      val src = root.resolve("docs_t").toString
      val store = root.resolve("nd_store").toString
      val view = root.resolve("cluster_view").toString
      val vv = root.resolve("verdict_view").toString
      import graft.streaming.{ClusterView, NearDupStore, VerdictView}
      chainLifecycle(s, dir, src) { () =>
        NearDupStore.maintainQuery(s, src, store,
          root.resolve("ck_nd").toString).awaitTermination()
        ClusterView.maintainQuery(s, store, view,
          root.resolve("ck_cv").toString).awaitTermination()
        VerdictView.maintainQuery(s, src, view, vv,
          root.resolve("ck_vv").toString).awaitTermination()
      }
      VerdictView.verdicts(s, vv).orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $mutatedCorpusSql,
            |$lshClosureSql,
            |qual AS (
            |  SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
            |  FROM corpus)
            |SELECT l.doc_id, l.cluster_id, q.n_tokens,
            |       row_number() OVER (PARTITION BY l.cluster_id
            |                          ORDER BY q.n_tokens DESC, l.doc_id ASC) = 1 AS keep
            |FROM labels l JOIN qual q USING (doc_id)
            |ORDER BY l.doc_id""".stripMargin)
  )

  val all: Seq[Query] =
    Seq(q27, q28, q29, q30, q50, q55, q56, q66, q68, q74, q137, q164, q165,
      q167, q175, q185, q213, q216, q245, q251, q252, q253)
}
