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
}
