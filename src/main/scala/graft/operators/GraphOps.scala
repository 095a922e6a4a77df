package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the document corpus. The dedup side
  * already runs connected components ([[DedupOps]], pointer-jumping);
  * this adds PageRank — the canonical "importance over a link graph"
  * signal a web-corpus pipeline computes for quality weighting (the
  * original use: rank crawled pages for inclusion priority).
  *
  * The fixture has no link column, so the graph is synthesized
  * deterministically over the dense doc_id space [0, N): each document
  * links to (id·31+17) mod N (a bijection — keeps every node
  * reachable) and (id²·7+3) mod N (quadratic — non-uniform in-degree,
  * so ranks genuinely spread; two linear maps coprime to N would both
  * be bijections and PageRank would stay exactly uniform). Self-loops
  * and parallel edges are allowed and handled.
  *
  * **Exactness strategy: fixed-point integer PageRank.** Ranks are
  * BIGINT numerators at scale 10^15; every step is integer arithmetic
  * with explicit truncating division (declared semantics):
  * contribution = r div out_degree, inflow = exact BIGINT sum,
  * r' = (0.15·10^15 div N) + (85·inflow div 100). No floating point
  * anywhere in the loop, so Spark and DuckDB agree bit-for-bit and
  * the oracle hash-checks an ITERATIVE fixpoint computation — no
  * "approximately equal" escape hatch. The display rank divides by
  * 10^15 once at the output boundary (single IEEE op, same operands →
  * same double in both engines).
  *
  * Scale shape per iteration: one equi-join of the edge list with the
  * rank vector on src (both shuffle-partitioned on the key) + one
  * combinable SUM keyed dst. Rounds are fixed (3); lineage stays flat
  * (plan-only unrolling at this depth — checkpointing kicks in for
  * long-horizon loops like q66's components). Overflow headroom:
  * inflow ≤ 10^15, 85·inflow ≤ 8.5·10^16 « 2^63.
  */
object GraphOps {

  private val Scale = 1000000000000000L // 10^15
  private val Teleport = 150000000000000L // 0.15 * Scale

  /** The TWO link maps of the synthetic graph, as SQL text — single
    * definition interpolated into every oracle so a drifted constant
    * cannot silently make one graph query describe a different graph. */
  private val LinkMap1Sql = "(doc_id * 31 + 17) % n_docs"
  private val LinkMap2Sql = "(doc_id * doc_id * 7 + 3) % n_docs"

  /** Directed edges (src, dst) of the deterministic synthetic link
    * graph shared by EVERY graph query (map-choice rationale in q103's
    * scaladoc; self-loops/parallels included — each consumer filters
    * to its own needs). One definition, six consumers. */
  private def linkEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val withN = docs.crossJoin(
      broadcast(docs.agg(count(lit(1)).as("n_docs"))))
    withN
      .select(col("doc_id").as("src"),
        ((col("doc_id") * 31 + 17) % col("n_docs")).as("dst"))
      .union(withN
        .select(col("doc_id").as("src"),
          ((col("doc_id") * col("doc_id") * 7 + 3) % col("n_docs")).as("dst")))
  }

  val q103 = Query(
    "q103_pagerank",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val withN = docs.crossJoin(broadcast(n))
      val edges = linkEdges(s, dir)
      var ranks = withN.select(col("doc_id"),
        expr(s"CAST($Scale DIV n_docs AS BIGINT)").as("r"), col("n_docs"))
      for (_ <- 1 to 3) {
        val inflow = edges
          .join(ranks.select(col("doc_id").as("src"), col("r")), "src")
          .select(col("dst").as("doc_id"), expr("r DIV 2").as("c"))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("inflow"))
        ranks = ranks.select("doc_id", "n_docs")
          .join(inflow, Seq("doc_id"), "left")
          .select(col("doc_id"),
            (expr(s"CAST($Teleport DIV n_docs AS BIGINT)") +
              expr("CAST((85 * coalesce(inflow, 0L)) DIV 100 AS BIGINT)"))
              .as("r"),
            col("n_docs"))
      }
      ranks.select(col("doc_id"), col("r").as("rank_fp"),
        (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
            |e AS (
            |  SELECT doc_id AS src, $LinkMap1Sql AS dst FROM documents, n
            |  UNION ALL
            |  SELECT doc_id AS src, $LinkMap2Sql AS dst FROM documents, n),
            |r0 AS (SELECT doc_id, $Scale // n_docs AS r FROM documents, n),
            |i1 AS (SELECT e.dst AS doc_id, CAST(SUM(r0.r // 2) AS BIGINT) AS inflow
            |       FROM e JOIN r0 ON e.src = r0.doc_id GROUP BY e.dst),
            |r1 AS (SELECT d.doc_id,
            |              ($Teleport // n.n_docs) + ((85 * COALESCE(i1.inflow, 0)) // 100) AS r
            |       FROM documents d CROSS JOIN n LEFT JOIN i1 ON d.doc_id = i1.doc_id),
            |i2 AS (SELECT e.dst AS doc_id, CAST(SUM(r1.r // 2) AS BIGINT) AS inflow
            |       FROM e JOIN r1 ON e.src = r1.doc_id GROUP BY e.dst),
            |r2 AS (SELECT d.doc_id,
            |              ($Teleport // n.n_docs) + ((85 * COALESCE(i2.inflow, 0)) // 100) AS r
            |       FROM documents d CROSS JOIN n LEFT JOIN i2 ON d.doc_id = i2.doc_id),
            |i3 AS (SELECT e.dst AS doc_id, CAST(SUM(r2.r // 2) AS BIGINT) AS inflow
            |       FROM e JOIN r2 ON e.src = r2.doc_id GROUP BY e.dst),
            |r3 AS (SELECT d.doc_id,
            |              ($Teleport // n.n_docs) + ((85 * COALESCE(i3.inflow, 0)) // 100) AS r
            |       FROM documents d CROSS JOIN n LEFT JOIN i3 ON d.doc_id = i3.doc_id)
            |SELECT doc_id, CAST(r AS BIGINT) AS rank_fp,
            |       CAST(r AS DOUBLE) / 1000000000000000.0 AS rank
            |FROM r3 ORDER BY doc_id""".stripMargin)
  )

  /** Q119 — exact triangle count + global clustering coefficient over
    * the q103 link graph: the classic "how cliquish is this graph"
    * statistic (spam/link-farm detection on a web corpus; community
    * density on an interaction graph). Uses the same deterministic
    * edge synthesis as q103 so the two graph queries describe one
    * graph.
    *
    * Algorithm: undirected simple edges oriented by id (a < b), then
    * the standard two-join wedge→closure count: (a,b)⋈(b,c) forms the
    * wedge, a semi-check against (a,c) closes it. Orientation makes
    * each triangle count exactly once. Wedge denominator Σ d(d−1)/2
    * from exact integer degrees; clustering = 3T/W is the single IEEE
    * division at the boundary.
    *
    * Scale shape: the id-orientation is the textbook formulation; at
    * real web scale the join key should be the LOWER-DEGREE endpoint
    * (degree orientation bounds wedge fan-out by O(m^1.5) regardless
    * of skew — a celebrity node under id-orientation would explode the
    * wedge join). This graph's degrees are bounded (~4) by
    * construction, so the simpler formulation keeps the oracle
    * expressible; the degree-oriented variant drops in by replacing
    * `least/greatest` with a (degree, id) lexicographic orientation.
    */
  val q119 = Query(
    "q119_triangles",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val dirE = linkEdges(s, dir)
      val e = dirE.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val wedges = deg.agg(
        sum(expr("d * (d - 1) DIV 2")).cast("long").as("n_wedges"))
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .agg(count(lit(1)).as("n_triangles"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      n.crossJoin(ne).crossJoin(wedges).crossJoin(tri)
        .withColumn("clustering",
          lit(3.0) * col("n_triangles").cast("double") /
            col("n_wedges").cast("double"))
        .select(col("n_docs").as("n_nodes"), col("n_edges"),
          col("n_wedges"), col("n_triangles"), col("clustering"))
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
           |dir AS (
           |  SELECT doc_id AS src, $LinkMap1Sql AS dst
           |  FROM documents, n
           |  UNION ALL
           |  SELECT doc_id, $LinkMap2Sql
           |  FROM documents, n),
           |e AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM dir WHERE src <> dst),
           |deg AS (
           |  SELECT v, COUNT(*) AS d
           |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
           |  GROUP BY v),
           |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
           |tri AS (
           |  SELECT COUNT(*) AS n_triangles
           |  FROM e e1
           |  JOIN e e2 ON e1.b = e2.a
           |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
           |ne AS (SELECT COUNT(*) AS n_edges FROM e)
           |SELECT n.n_docs AS n_nodes, ne.n_edges, w.n_wedges, tri.n_triangles,
           |       3.0 * CAST(tri.n_triangles AS DOUBLE)
           |         / CAST(w.n_wedges AS DOUBLE) AS clustering
           |FROM n, ne, w, tri""".stripMargin)
  )

  /** Q121 — hierarchy flattening: enumerate every (node, ancestor)
    * pair of a parent tree and emit per-node depth and subtree size —
    * the org-chart / category-taxonomy / thread-reply rollup a
    * warehouse answers with a recursive CTE. The fixture has no parent
    * column, so the tree is synthesized deterministically as the
    * binary-heap shape parent(v) = (v−1) div 2 over the dense doc_id
    * space (depth ~log₂N, so the iterative algorithm genuinely runs
    * multiple rounds at every SF).
    *
    * Algorithm — **transitive closure by repeated squaring**: A₁ =
    * parent edges; A₂ₖ = Aₖ ∪ (Aₖ ⋈ Aₖ); ceil(log₂ depth) rounds
    * (5 at sf0.1) instead of the depth-many rounds of naive one-step
    * walking — the same O(log) round-complexity argument as q66's
    * pointer-jumping, here producing the full pair set rather than
    * just the root label. All integer arithmetic; the oracle is
    * DuckDB's WITH RECURSIVE over the same synthesis, so the
    * hash-check proves an iterative Spark loop equals a recursive SQL
    * evaluation.
    *
    * Scale shape: each round is one self-equi-join keyed on the
    * ancestor column + a distinct; pair volume is Σdepth(v) =
    * O(N log N) for balanced trees. Round count derives from the node
    * count (one scalar), not from collected data. For skewed (deep
    * path) hierarchies the same loop runs ceil(log₂ d) rounds — no
    * replan needed.
    */
  val q121 = Query(
    "q121_tree_flatten",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val nDocs = docs.count()
      // balanced-tree depth bound; +1 slack covers the off-by-one edge
      val rounds = math.max(1,
        math.ceil(math.log(math.log(nDocs.toDouble + 1) / math.log(2.0) + 1)
          / math.log(2.0)).toInt + 1)
      var pairs = docs.filter(col("doc_id") > 0)
        .select(col("doc_id").as("v"),
          expr("(doc_id - 1) DIV 2").as("a"))
      for (_ <- 1 to rounds) {
        val squared = pairs.as("p").join(
            pairs.as("q"), col("p.a") === col("q.v"))
          .select(col("p.v").as("v"), col("q.a").as("a"))
        pairs = pairs.union(squared).distinct().localCheckpoint()
      }
      val depth = docs.join(
          pairs.groupBy("v").agg(count(lit(1)).as("depth")),
          docs("doc_id") === col("v"), "left")
        .select(col("doc_id"), coalesce(col("depth"), lit(0L)).as("depth"))
      val subtree = docs.join(
          pairs.groupBy("a").agg(count(lit(1)).as("n_desc")),
          docs("doc_id") === col("a"), "left")
        .select(col("doc_id"),
          (coalesce(col("n_desc"), lit(0L)) + 1).as("subtree_size"))
      depth.join(subtree, "doc_id")
        .select("doc_id", "depth", "subtree_size")
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE anc(v, a) AS (
           |  SELECT doc_id, (doc_id - 1) // 2 FROM documents WHERE doc_id > 0
           |  UNION ALL
           |  SELECT v, (a - 1) // 2 FROM anc WHERE a > 0),
           |depth AS (
           |  SELECT d.doc_id, COALESCE(c.n, 0) AS depth
           |  FROM documents d LEFT JOIN
           |    (SELECT v, COUNT(*) AS n FROM anc GROUP BY v) c
           |    ON d.doc_id = c.v),
           |subtree AS (
           |  SELECT d.doc_id, COALESCE(c.n, 0) + 1 AS subtree_size
           |  FROM documents d LEFT JOIN
           |    (SELECT a, COUNT(*) AS n FROM anc GROUP BY a) c
           |    ON d.doc_id = c.a)
           |SELECT doc_id, CAST(depth AS BIGINT) AS depth,
           |       CAST(subtree_size AS BIGINT) AS subtree_size
           |FROM depth JOIN subtree USING (doc_id)
           |ORDER BY doc_id""".stripMargin)
  )

  /** Q162 — BFS shortest-path distances from node 0 over the q103 link
    * graph, to a fixed 8-hop horizon: the reachability/diameter probe
    * next to PageRank (importance), triangles (cohesion), and q121's
    * full ancestor closure — "how far is everything from the seed?"
    * is the crawl-frontier and influence-radius question.
    *
    * Iterative frontier expansion: each round joins the CURRENT
    * frontier (not the whole reached set) against the edge list, then
    * anti-joins out already-reached nodes — so per-round work is
    * |frontier|·out-degree, the BFS invariant that survives scale, and
    * the reached set only ever grows by genuinely-new nodes. Rounds
    * are a fixed horizon (declared semantics, like q66's bound);
    * `localCheckpoint` keeps lineage flat. The oracle is DuckDB's
    * WITH RECURSIVE min-over-paths — two genuinely different
    * algorithms (level-synchronous set BFS vs path enumeration), one
    * hash-checked answer.
    */
  val q162 = Query(
    "q162_graph_bfs",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val edges = linkEdges(s, dir).localCheckpoint()
      var dist = docs.filter(col("doc_id") === 0L)
        .select(col("doc_id"), lit(0L).as("dist")).localCheckpoint()
      var frontier = dist
      for (k <- 1 to 8) {
        val next = frontier
          .join(edges, frontier("doc_id") === edges("src"))
          .select(col("dst").as("doc_id"), lit(k.toLong).as("dist"))
          .distinct()
          .join(dist, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        dist = dist.union(next).localCheckpoint()
        frontier = next
      }
      dist.orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE n AS (SELECT COUNT(*) AS n_docs FROM documents),
           |e AS (
           |  SELECT doc_id AS src, $LinkMap1Sql AS dst
           |  FROM documents, n
           |  UNION ALL
           |  SELECT doc_id AS src, $LinkMap2Sql AS dst
           |  FROM documents, n),
           |bfs AS (
           |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS d
           |  UNION ALL
           |  SELECT e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.doc_id
           |  WHERE b.d < 8)
           |SELECT doc_id, CAST(MIN(d) AS BIGINT) AS dist
           |FROM bfs GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  /** Q169 — HITS hub/authority scores over the q103 link graph, two
    * mutual-reinforcement rounds: authorities are pointed AT by good
    * hubs, hubs point TO good authorities — the bipartite-flavored
    * complement of PageRank's single importance axis (a page can be a
    * great directory yet a poor destination; PageRank conflates the
    * two). Same exactness device as q103 shrunk to micro-units
    * (Scale 10⁶): every step is BIGINT arithmetic, each round
    * SUM-normalizes via `s·10⁶ div total` with truncating division
    * (declared semantics), so the iterative fixpoint hash-checks
    * bit-for-bit against the unrolled oracle. Micro-units keep the
    * normalization product ≤ N·10¹² — overflow-safe without int128.
    * Per round: one src-keyed join + one dst-keyed combinable sum
    * (authority step), then the same transposed (hub step).
    */
  val q169 = Query(
    "q169_hits",
    (s, dir) => {
      val M = 1000000L
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val edges = linkEdges(s, dir).localCheckpoint()
      def normalize(raw: DataFrame, c: String): DataFrame = {
        val tot = raw.agg(sum(col(c)).as("tot"))
        raw.crossJoin(broadcast(tot))
          .select(col("doc_id"), expr(s"CAST($c * $M DIV tot AS BIGINT)").as(c))
      }
      var hub = docs.select(col("doc_id"), lit(M).as("h"))
      var auth: DataFrame = null
      for (_ <- 1 to 2) {
        val aRaw = docs
          .join(edges.join(hub.select(col("doc_id").as("src"), col("h")), "src")
            .groupBy(col("dst").as("doc_id")).agg(sum(col("h")).as("a")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("a"), lit(0L)).as("a"))
        auth = normalize(aRaw, "a").localCheckpoint()
        val hRaw = docs
          .join(edges.join(auth.select(col("doc_id").as("dst"), col("a")), "dst")
            .groupBy(col("src").as("doc_id")).agg(sum(col("a")).as("h")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("h"), lit(0L)).as("h"))
        hub = normalize(hRaw, "h").localCheckpoint()
      }
      auth.join(hub, "doc_id")
        .select(col("doc_id"), col("a").as("auth_fp"), col("h").as("hub_fp"),
          (col("a").cast("double") / M).as("auth"),
          (col("h").cast("double") / M).as("hub"))
        .orderBy("doc_id")
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
           |e AS (
           |  SELECT doc_id AS src, $LinkMap1Sql AS dst
           |  FROM documents, n
           |  UNION ALL
           |  SELECT doc_id AS src, $LinkMap2Sql AS dst
           |  FROM documents, n),
           |h0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS h FROM documents),
           |a1r AS (
           |  SELECT d.doc_id, COALESCE(x.a, 0) AS a FROM documents d
           |  LEFT JOIN (SELECT e.dst AS doc_id, CAST(SUM(h0.h) AS BIGINT) AS a
           |             FROM e JOIN h0 ON e.src = h0.doc_id GROUP BY e.dst) x
           |    ON d.doc_id = x.doc_id),
           |a1 AS (SELECT doc_id, CAST(a * 1000000 // (SELECT SUM(a) FROM a1r)
           |              AS BIGINT) AS a FROM a1r),
           |h1r AS (
           |  SELECT d.doc_id, COALESCE(x.h, 0) AS h FROM documents d
           |  LEFT JOIN (SELECT e.src AS doc_id, CAST(SUM(a1.a) AS BIGINT) AS h
           |             FROM e JOIN a1 ON e.dst = a1.doc_id GROUP BY e.src) x
           |    ON d.doc_id = x.doc_id),
           |h1 AS (SELECT doc_id, CAST(h * 1000000 // (SELECT SUM(h) FROM h1r)
           |              AS BIGINT) AS h FROM h1r),
           |a2r AS (
           |  SELECT d.doc_id, COALESCE(x.a, 0) AS a FROM documents d
           |  LEFT JOIN (SELECT e.dst AS doc_id, CAST(SUM(h1.h) AS BIGINT) AS a
           |             FROM e JOIN h1 ON e.src = h1.doc_id GROUP BY e.dst) x
           |    ON d.doc_id = x.doc_id),
           |a2 AS (SELECT doc_id, CAST(a * 1000000 // (SELECT SUM(a) FROM a2r)
           |              AS BIGINT) AS a FROM a2r),
           |h2r AS (
           |  SELECT d.doc_id, COALESCE(x.h, 0) AS h FROM documents d
           |  LEFT JOIN (SELECT e.src AS doc_id, CAST(SUM(a2.a) AS BIGINT) AS h
           |             FROM e JOIN a2 ON e.dst = a2.doc_id GROUP BY e.src) x
           |    ON d.doc_id = x.doc_id),
           |h2 AS (SELECT doc_id, CAST(h * 1000000 // (SELECT SUM(h) FROM h2r)
           |              AS BIGINT) AS h FROM h2r)
           |SELECT a2.doc_id, a2.a AS auth_fp, h2.h AS hub_fp,
           |       CAST(a2.a AS DOUBLE) / 1000000.0 AS auth,
           |       CAST(h2.h AS DOUBLE) / 1000000.0 AS hub
           |FROM a2 JOIN h2 ON a2.doc_id = h2.doc_id
           |ORDER BY a2.doc_id""".stripMargin)
  )

  /** Q172 — Adamic–Adar link prediction over the q103 link graph: for
    * every non-adjacent pair with ≥1 common neighbor, score
    * Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)) — rare shared neighbors are strong
    * evidence, hub neighbors weak — and report the top-50 predicted
    * links. The "which docs should link" / "which users will interact"
    * recommender primitive next to q119's triangles (same undirected
    * simple-graph view, same edge synthesis).
    *
    * Exactness: per-node weight = `round(1/ln(deg), 6)` clamped to
    * DECIMAL(18,6) — the q53/q125 6dp-ln rule — so the pair score is an
    * order-free exact decimal sum and the top-50 cut under
    * (score DESC, u, v) ordering is deterministic in both engines. A
    * common neighbor has degree ≥ 2 by construction (one edge to each
    * side), so ln(deg) > 0; the deg ≥ 2 filter states it anyway.
    *
    * Scale shape: degree + weight is one combinable agg; candidates
    * come from the wedge join (u,w)⋈(w,v) keyed on the shared neighbor
    * — work Σ_w deg(w)², the inherent wedge bound (same as q119), never
    * all-pairs. At 100 TB the standard cap applies: drop (or sample)
    * hub neighbors above a degree threshold before the wedge join —
    * exactly the neighbors whose 1/ln(deg) contribution is smallest, so
    * the truncation error is bounded and named, not silent.
    */
  val q172 = Query(
    "q172_adamic_adar",
    (s, dir) => {
      val und = linkEdges(s, dir)
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val nbrs = und.select(col("a").as("v"), col("b").as("w"))
        .union(und.select(col("b").as("v"), col("a").as("w")))
      val weight = nbrs.groupBy(col("w")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
        .select(col("w"),
          round(lit(1.0) / log(col("deg")), 6)
            .cast("decimal(18,6)").as("aa_w"))
      val wedges = nbrs.select(col("w"), col("v").as("u"))
        .join(nbrs.select(col("w"), col("v")), "w")
        .filter(col("u") < col("v"))
        .join(weight, "w")
      wedges
        .join(und, wedges("u") === und("a") && wedges("v") === und("b"),
          "left_anti")
        .groupBy("u", "v")
        .agg(count(lit(1)).as("common_cnt"),
          sum(col("aa_w")).cast("decimal(18,6)").as("aa_dec"))
        .select(col("u"), col("v"), col("common_cnt"),
          col("aa_dec").cast("double").as("aa_score"))
        .orderBy(col("aa_dec").desc, col("u"), col("v"))
        .limit(50)
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
           |e0 AS (
           |  SELECT doc_id AS src, $LinkMap1Sql AS dst
           |  FROM documents, n
           |  UNION ALL
           |  SELECT doc_id AS src, $LinkMap2Sql AS dst
           |  FROM documents, n),
           |und AS (
           |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           |  FROM e0 WHERE src <> dst),
           |nbrs AS (
           |  SELECT a AS v, b AS w FROM und
           |  UNION ALL SELECT b AS v, a AS w FROM und),
           |wt AS (
           |  SELECT w, CAST(round(1.0 / ln(COUNT(*)), 6) AS DECIMAL(18,6)) AS aa_w
           |  FROM nbrs GROUP BY w HAVING COUNT(*) >= 2),
           |cand AS (
           |  SELECT n1.v AS u, n2.v AS v, wt.aa_w
           |  FROM nbrs n1 JOIN nbrs n2 ON n1.w = n2.w AND n1.v < n2.v
           |  JOIN wt ON wt.w = n1.w
           |  WHERE NOT EXISTS (SELECT 1 FROM und
           |                    WHERE und.a = n1.v AND und.b = n2.v)),
           |scored AS (
           |  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_cnt,
           |         CAST(SUM(aa_w) AS DECIMAL(18,6)) AS aa_dec
           |  FROM cand GROUP BY u, v)
           |SELECT u, v, common_cnt, CAST(aa_dec AS DOUBLE) AS aa_score
           |FROM scored ORDER BY aa_dec DESC, u, v LIMIT 50""".stripMargin)
  )

  /** Q170 — `WITH RECURSIVE` on the SPARK side: the root-climb over the
    * q121 heap-parent tree written as a recursive CTE and executed by
    * Spark 4's native recursion (`UnionLoop` — new SQL surface in 4.x),
    * with DuckDB evaluating the same recursion as the oracle. q121
    * proves an ITERATIVE DataFrame loop equals a recursive oracle; this
    * proves Spark's own recursive-SQL evaluator does — completing the
    * surface both directions. Each doc climbs parent = (id−1) div 2 to
    * the root, accumulating depth and the exact BIGINT sum of ancestor
    * ids; both accumulators are non-decreasing along the climb, so
    * MAX picks the completed-path row without needing the stop row
    * flagged.
    *
    * Scale note: recursion depth is log₂(N) for the heap tree (13 at
    * sf0.1, 27 at 100 B docs) — each level is one distributed
    * self-join round inside UnionLoop, the same work shape as q121's
    * hand-rolled loop, with the planner owning lineage instead of
    * localCheckpoint.
    */
  val q170 = Query(
    "q170_recursive_cte",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("rc_documents")
      s.sql("""WITH RECURSIVE climb(doc_id, anc, depth, anc_sum) AS (
              |  SELECT doc_id, doc_id, 0, CAST(0 AS BIGINT) FROM rc_documents
              |  UNION ALL
              |  SELECT doc_id, (anc - 1) DIV 2, depth + 1,
              |         anc_sum + CAST((anc - 1) DIV 2 AS BIGINT)
              |  FROM climb WHERE anc > 0)
              |SELECT doc_id, CAST(MAX(depth) AS BIGINT) AS depth,
              |       CAST(MAX(anc_sum) AS BIGINT) AS anc_sum
              |FROM climb GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },
    Some("""WITH RECURSIVE climb(doc_id, anc, depth, anc_sum) AS (
           |  SELECT doc_id, doc_id, 0, CAST(0 AS BIGINT) FROM documents
           |  UNION ALL
           |  SELECT doc_id, (anc - 1) // 2, depth + 1,
           |         anc_sum + CAST((anc - 1) // 2 AS BIGINT)
           |  FROM climb WHERE anc > 0)
           |SELECT doc_id, CAST(MAX(depth) AS BIGINT) AS depth,
           |       CAST(MAX(anc_sum) AS BIGINT) AS anc_sum
           |FROM climb GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  /** Q189 — k-core decomposition (coreness per node) of the undirected
    * link graph: iteratively peel nodes of degree < k for k = 1..4; a
    * node's coreness is the largest k whose core retains it. Coreness
    * is the standard "how embedded is this node" signal — spam rings
    * and boilerplate hubs live in high cores, crawl frontier leaves in
    * low ones — and the peeling cascade (dropping one node can drop its
    * neighbors next round) is exactly what one-shot degree filters get
    * wrong. On this graph the 4-core cascades to EMPTY in 3–4 genuine
    * rounds, so the fixture exercises multi-round peeling, not a single
    * filter pass.
    *
    * Scale shape per round: one semi-join of the edge list against the
    * survivor set on each endpoint + one combinable degree count —
    * |alive-edges| work that SHRINKS as peeling progresses, the same
    * frontier discipline as q162's BFS. Rounds are data-dependent:
    * bounded at [[KcoreMaxRounds]] per k with a LOUD failure (q66's
    * convergence rule), driver state is one count per round.
    * localCheckpoint keeps the per-round lineage flat.
    *
    * The oracle is the same peeling UNROLLED to the fixed round bound
    * as generated CTEs (q92's generated-SQL device) — extra rounds are
    * provable no-ops once the core is stable, so a fixed unrolling is
    * exact whenever Spark's loop converged within the bound, which the
    * build asserts. Everything is integer set algebra — no FP anywhere.
    */
  val KcoreMaxRounds = 6
  val KcoreMaxK = 4

  val q189 = Query(
    "q189_kcore",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val simple = linkEdges(s, dir).filter(col("src") =!= col("dst"))
      val ue = simple.select(col("src").as("u"), col("dst").as("v"))
        .union(simple.select(col("dst").as("u"), col("src").as("v")))
        .distinct()
        .localCheckpoint()
      var alive = ue.select(col("u").as("n")).distinct().localCheckpoint()
      // one count per ROUND, not two: this round's survivor count is
      // next round's "before"
      var aliveCount = alive.count()
      var coreness = docs.select(col("doc_id"), lit(0L).as("core"))
      for (k <- 1 to KcoreMaxK) {
        var converged = false
        var round = 0
        while (!converged && round < KcoreMaxRounds) {
          round += 1
          val deg = ue
            .join(alive.select(col("n").as("u")), "u")
            .join(alive.select(col("n").as("v")), "v")
            .groupBy("u").agg(count(lit(1)).as("deg"))
          val next = alive
            .join(deg.filter(col("deg") >= k).select(col("u").as("n")), "n", "left_semi")
            .localCheckpoint()
          val after = next.count()
          alive = next
          converged = after == aliveCount || after == 0L
          aliveCount = after
        }
        if (!converged)
          sys.error(s"q189_kcore: k=$k peeling did not converge within " +
            s"$KcoreMaxRounds rounds — raise KcoreMaxRounds (and the oracle unrolling)")
        coreness = coreness
          .join(alive.select(col("n").as("doc_id"), lit(1).as("in_core")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("in_core").isNotNull, lit(k.toLong))
              .otherwise(col("core")).as("core"))
      }
      coreness.select(col("doc_id"), col("core").as("coreness"))
        .orderBy("doc_id")
    },
    Some {
      // Unrolled peeling: for each k, KcoreMaxRounds rounds of
      // degree-filter CTEs; survivors of k seed k+1. Extra rounds
      // beyond actual convergence re-select the identical set.
      val sb = new StringBuilder
      sb.append(
        s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
          |de AS (
          |  SELECT doc_id AS u, $LinkMap1Sql AS v FROM documents, n
          |  UNION ALL
          |  SELECT doc_id AS u, $LinkMap2Sql AS v FROM documents, n),
          |ue AS MATERIALIZED (
          |  SELECT DISTINCT u, v FROM (
          |    SELECT u, v FROM de WHERE u <> v
          |    UNION ALL SELECT v AS u, u AS v FROM de WHERE u <> v)),
          |a_0_f AS MATERIALIZED (SELECT DISTINCT u AS m FROM ue)""".stripMargin)
      for (k <- 1 to KcoreMaxK) {
        var prev = if (k == 1) "a_0_f" else s"a_${k - 1}_f"
        for (r <- 1 to KcoreMaxRounds) {
          val cur = s"a_${k}_$r"
          sb.append(s""",
            |$cur AS MATERIALIZED (
            |  SELECT m FROM $prev WHERE m IN (
            |    SELECT e.u FROM ue e
            |    WHERE e.u IN (SELECT m FROM $prev)
            |      AND e.v IN (SELECT m FROM $prev)
            |    GROUP BY e.u HAVING COUNT(*) >= $k))""".stripMargin)
          prev = cur
        }
        sb.append(s""",
          |a_${k}_f AS MATERIALIZED (SELECT m FROM $prev)""".stripMargin)
      }
      sb.append("""
        |SELECT d.doc_id,
        |       CAST(CASE""".stripMargin)
      for (k <- KcoreMaxK to 1 by -1)
        sb.append(s"""
          |         WHEN d.doc_id IN (SELECT m FROM a_${k}_f) THEN $k""".stripMargin)
      sb.append("""
        |         ELSE 0 END AS BIGINT) AS coreness
        |FROM documents d ORDER BY d.doc_id""".stripMargin)
      sb.toString
    }
  )

  /** Q195 — degree distribution of the undirected simple link graph:
    * (degree, n_nodes) histogram INCLUDING the zero bucket (nodes whose
    * only links were self-loops vanish from the edge list — exactly the
    * rows a join-based degree count silently drops). The first profile
    * run on any web graph: the shape says power-law vs regular, and the
    * max degree is the skew bound for every downstream wedge join
    * (q119's scale note). Grain discipline: nodes collapse to degrees,
    * degrees to a ≤max-degree-row histogram — two combinable
    * aggregates, never a node-grain result.
    */
  val q195 = Query(
    "q195_degree_dist",
    (s, dir) => {
      val simple = linkEdges(s, dir).filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = simple.select(col("a").as("v")).union(simple.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("degree"))
      Tables.documents(s, dir).select(col("doc_id").as("v"))
        .join(deg, Seq("v"), "left")
        .select(coalesce(col("degree"), lit(0L)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
            |de AS (
            |  SELECT doc_id AS src, $LinkMap1Sql AS dst FROM documents, n
            |  UNION ALL
            |  SELECT doc_id AS src, $LinkMap2Sql AS dst FROM documents, n),
            |simple AS (
            |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            |  FROM de WHERE src <> dst),
            |deg AS (
            |  SELECT v, COUNT(*) AS degree FROM (
            |    SELECT a AS v FROM simple UNION ALL SELECT b FROM simple)
            |  GROUP BY v)
            |SELECT COALESCE(deg.degree, 0) AS degree,
            |       COUNT(*) AS n_nodes
            |FROM documents d LEFT JOIN deg ON d.doc_id = deg.v
            |GROUP BY 1 ORDER BY degree""".stripMargin)
  )

  val all: Seq[Query] =
    Seq(q103, q119, q121, q162, q169, q170, q172, q189, q195)
}
