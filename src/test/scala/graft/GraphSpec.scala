package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {

  test("q103 pagerank: mass conserved within truncation, floor respected, non-uniform") {
    val df = GraphOps.q103.build(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(df.count() === n)
    // every rank is at least the teleport floor
    val floor = 150000000000000L / n
    assert(df.filter(col("rank_fp") < floor).count() === 0)
    // total mass stays ~1: each truncating div loses < 1 unit per node
    // per iteration, so the deficit is bounded by ~3 * 2 * n units of 1e-15
    val mass = df.agg(sum("rank_fp")).head().getLong(0)
    assert(mass <= 1000000000000000L)
    assert(mass >= 1000000000000000L - 6L * n - 1000)
    // the 2-regular graph has varying IN-degree, so ranks must spread
    assert(df.select("rank_fp").distinct().count() > 1)
    // deterministic across runs (iterative plan, no stray randomness)
    val again = GraphOps.q103.build(spark, sf).collect()
    assert(df.collect().map(_.getLong(1)).sameElements(again.map(_.getLong(1))))
  }

  test("q119 triangles: matches a driver-side brute force on the same graph") {
    val row = GraphOps.q119.build(spark, sf).head()
    val n = Tables.documents(spark, sf).count()
    assert(row.getLong(0) === n)
    // rebuild the graph on the driver (sf0.001: ~1k edges)
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val edges = ids.flatMap { id =>
      Seq((id, (id * 31 + 17) % n), (id, (id * id * 7 + 3) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(row.getLong(1) === edges.size)
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).toSet }
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(row.getLong(2) === wedges)
    val tris = edges.toSeq.map { case (a, b) =>
      adj(a).count(c => c > b && edges.contains((b, c))).toLong
    }.sum
    assert(row.getLong(3) === tris)
    assert(row.getDouble(4) === 3.0 * tris / wedges)
  }

  test("q169 hits: integer fixed-point recompute, normalization conserved") {
    val rows = GraphOps.q169.build(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    val out = (0L until n).map(i =>
      i -> Seq((i * 31 + 17) % n, (i * i * 7 + 3) % n)).toMap
    val M = 1000000L
    var h = Array.fill(n.toInt)(M)
    var a = Array.fill(n.toInt)(0L)
    (1 to 2).foreach { _ =>
      val ar = Array.fill(n.toInt)(0L)
      out.foreach { case (u, vs) => vs.foreach(v => ar(v.toInt) += h(u.toInt)) }
      val at = ar.sum
      a = ar.map(x => x * M / at)
      val hr = Array.fill(n.toInt)(0L)
      out.foreach { case (u, vs) => vs.foreach(v => hr(u.toInt) += a(v.toInt)) }
      val ht = hr.sum
      h = hr.map(x => x * M / ht)
    }
    assert(rows.length === n)
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      assert(r.getLong(1) === a(i), s"auth at $i")
      assert(r.getLong(2) === h(i), s"hub at $i")
    }
    val sumA = rows.map(_.getLong(1)).sum
    assert(sumA <= M && sumA >= M - n) // sum-normalized within truncation
  }

  test("q170 recursive CTE: Spark's native recursion equals q121's iterative depth") {
    val rec = GraphOps.q170.build(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val iter = GraphOps.q121.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rec.keySet === iter.keySet)
    rec.foreach { case (id, (depth, ancSum)) =>
      assert(depth === iter(id), s"depth at $id")
      // driver recompute of the ancestor-id sum along the climb
      var (v, s) = (id, 0L)
      while (v > 0) { v = (v - 1) / 2; s += v }
      assert(ancSum === s, s"anc_sum at $id")
    }
  }

  test("q172 adamic-adar: matches a driver-side brute force") {
    val got = GraphOps.q172.build(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    val ids = (0L until n)
    val edges = ids.flatMap { id =>
      Seq((id, (id * 31 + 17) % n), (id, (id * id * 7 + 3) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).toSet }
    def w(node: Long): BigDecimal =
      BigDecimal(1.0 / math.log(adj(node).size.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val scores = (for {
      u <- ids; v <- ids if u < v && !edges.contains((u, v))
      common = adj.getOrElse(u, Set.empty) & adj.getOrElse(v, Set.empty)
      if common.nonEmpty
    } yield (u, v, common.size.toLong, common.toSeq.map(w).sum))
      .sortBy { case (u, v, _, s) => (-s, u, v) }.take(50)
    assert(got.length === scores.length)
    got.zip(scores).foreach { case (r, (u, v, cnt, s)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((u, v, cnt)))
      assert(math.abs(r.getDouble(3) - s.toDouble) < 1e-9)
    }
  }

  test("q162 bfs: matches a driver-side level-synchronous BFS") {
    val got = GraphOps.q162.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sf).count()
    val adj = (0L until n).map(i =>
      i -> Seq((i * 31 + 17) % n, (i * i * 7 + 3) % n)).toMap
    var dist = Map(0L -> 0L)
    var frontier = Seq(0L)
    (1 to 8).foreach { k =>
      val next = frontier.flatMap(adj).distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> k.toLong)
      frontier = next
    }
    assert(got === dist)
    assert(got.size > 1 && got.values.max >= 2) // the walk actually spreads
  }

  test("q121 tree flatten: heap depths analytic, subtree sizes reconcile") {
    val df = GraphOps.q121.build(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(df.count() === n)
    // binary-heap tree: depth(v) = floor(log2(v+1)) exactly
    val bad = df.collect().count { r =>
      val v = r.getLong(0)
      r.getLong(1) != (63 - java.lang.Long.numberOfLeadingZeros(v + 1)).toLong
    }
    assert(bad === 0)
    // the root's subtree is the whole tree; leaves have subtree 1
    assert(df.filter(col("doc_id") === 0).head().getLong(2) === n)
    assert(df.filter(col("subtree_size") === 1).count() === (n + 1) / 2)
    // sum of subtree sizes = sum of (depth + 1) (each node counted once
    // per ancestor-or-self)
    val sums = df.agg(sum("subtree_size"), sum("depth")).head()
    assert(sums.getLong(0) === sums.getLong(1) + n)
  }

  test("q189 kcore: matches a driver-side peeling brute force") {
    val got = GraphOps.q189.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sf).count()
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    for (i <- ids; d <- Seq((i * 31 + 17) % n, (i * i * 7 + 3) % n) if d != i) {
      adj(i) = adj(i) + d; adj(d) = adj(d) + i
    }
    val core = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    var alive = adj.keySet.toSet
    for (k <- 1 to GraphOps.KcoreMaxK) {
      var changed = true
      while (changed) {
        val drop = alive.filter(u => adj(u).count(alive) < k)
        changed = drop.nonEmpty
        alive = alive -- drop
      }
      alive.foreach(u => core(u) = k.toLong)
    }
    assert(got.keySet === ids.toSet)
    ids.foreach(i => assert(got(i) === core(i), s"doc $i"))
    // the 4-core is empty on this graph, so the max coreness is 3 and
    // at least one node peels below it (a genuine cascade happened)
    assert(got.values.max === 3L)
    assert(got.values.exists(_ < 3L))
  }

  test("q195 degree distribution: buckets partition all nodes, handshake sum holds") {
    val rows = GraphOps.q195.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.map(_._2).sum === Tables.documents(spark, sf).count())
    // handshake lemma: sum(degree * n_nodes) = 2 * |E| of the simple graph
    val n = Tables.documents(spark, sf).count()
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val edges = ids.flatMap(i => Seq((i * 31 + 17) % n, (i * i * 7 + 3) % n)
      .filter(_ != i).map(d => (math.min(i, d), math.max(i, d)))).toSet
    assert(rows.map { case (d, c) => d * c }.sum === 2L * edges.size)
  }
}
