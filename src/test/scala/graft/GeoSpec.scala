package graft

import graft.operators.GeoOps
import org.apache.spark.sql.functions._

class GeoSpec extends SparkTestBase {

  test("q116 geo join: grid blocking loses no pair vs brute force, bounds hold") {
    val df = GeoOps.q116.build(spark, sf).cache()
    assert(df.filter(col("dist_km") >= 200.0 || col("dist_km") < 0).count() === 0)
    assert(df.filter(col("a_id") >= col("b_id")).count() === 0)
    // brute-force recompute on the driver over the same synthesized coords
    def res(salt: String, id: Long, m: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 15), 16) % m
    }
    val ids = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val pts = ids.map { id =>
      id -> ((res("lat:", id, 120000L) - 60000L) / 1000.0,
        (res("lon:", id, 360000L) - 180000L) / 1000.0)
    }.toMap
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val dLat = math.toRadians(b._1 - a._1) / 2
      val dLon = math.toRadians(b._2 - a._2) / 2
      val x = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.sin(dLon) * math.sin(dLon)
      2 * 6371.0088 * math.asin(math.sqrt(x))
    }
    val expect = (for {
      a <- ids; b <- ids if a < b
      d = math.rint(hav(pts(a), pts(b)) * 1000) / 1000 if d < 200.0
    } yield (a, b)).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
  }
}
