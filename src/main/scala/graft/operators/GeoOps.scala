package graft.operators

import graft.{Canon, Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial proximity over synthesized coordinates — the geo analog
  * of the LSH/blocking family: bucket by coarse grid cell, join only
  * same/adjacent cells, then exact-filter with the haversine distance.
  * The fixture has no geo columns, so each customer gets deterministic
  * (lat, lon) from md5 residues (the engine's one portable hash):
  * lat ∈ [−60, 60), lon ∈ [−180, 180), 0.001° steps.
  *
  * Cell size 4° with ±1-cell fan-out soundly covers the 200 km
  * threshold everywhere in the lat band: 200 km ≤ 1.8° of latitude and
  * ≤ 3.64° of longitude at |lat| = 60 — both under one 4° cell, so
  * qualifying pairs are never more than one cell apart. That is the
  * no-false-negatives argument every grid-blocked spatial join needs.
  *
  * Cross-engine exactness: coordinates are integer residues divided
  * once (exact IEEE); the haversine goes through libm trig, so the
  * distance is rounded to 3 decimals (q53's ln rule) and BOTH the
  * predicate and the output use the rounded value.
  *
  * Scale shape: per-cell quadratic only (the grid granularity knob),
  * one equi-join on the cell key with a 3× one-sided neighbor
  * fan-out; no global cross join at any scale.
  */
object GeoOps {

  private val R = 6371.0088 // mean earth radius, km

  private def lat(c: Column): Column =
    (Canon.md5Residue(concat(lit("lat:"), c), 120000L) - 60000L)
      .cast("double") / 1000.0
  private def lon(c: Column): Column =
    (Canon.md5Residue(concat(lit("lon:"), c), 360000L) - 180000L)
      .cast("double") / 1000.0

  private def haversineKm(la1: Column, lo1: Column, la2: Column, lo2: Column): Column = {
    val dLat = radians(la2 - la1) / 2
    val dLon = radians(lo2 - lo1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(la1)) * cos(radians(la2)) * sin(dLon) * sin(dLon)
    lit(2 * R) * asin(sqrt(a))
  }

  private val latSql = "(CAST(concat('0x', substr(md5(concat('lat:', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % 120000 - 60000) / 1000.0"
  private val lonSql = "(CAST(concat('0x', substr(md5(concat('lon:', CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) % 360000 - 180000) / 1000.0"

  /** Q116 — grid-blocked proximity self-join: customer pairs within
    * 200 km, via 4° cell bucketing + ±1-cell fan-out + exact rounded
    * haversine. */
  val q116 = Query(
    "q116_geo_join",
    (s, dir) => {
      val pts = Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("id"))
        .withColumn("la", lat(col("id").cast("string")))
        .withColumn("lo", lon(col("id").cast("string")))
        .withColumn("cx", floor(col("lo") / 4).cast("long"))
        .withColumn("cy", floor(col("la") / 4).cast("long"))
      // one-sided neighbor fan-out: left side explodes into its cell and
      // the 8 neighbors; right side stays put, so each cross-cell pair
      // is generated exactly once from the left
      val fan = pts.withColumn("nx",
          explode(array((-1 to 1).map(lit(_)): _*)))
        .withColumn("ny", explode(array((-1 to 1).map(lit(_)): _*)))
        .select(col("id").as("a_id"), col("la").as("a_la"), col("lo").as("a_lo"),
          (col("cx") + col("nx")).as("cx"), (col("cy") + col("ny")).as("cy"))
      val right = pts.select(col("id").as("b_id"), col("la").as("b_la"),
        col("lo").as("b_lo"), col("cx"), col("cy"))
      fan.join(right, Seq("cx", "cy"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("dist_km",
          round(haversineKm(col("a_la"), col("a_lo"), col("b_la"), col("b_lo")), 3))
        .filter(col("dist_km") < 200.0)
        .select("a_id", "b_id", "dist_km")
        .distinct()
        .orderBy("a_id", "b_id")
    },
    Some(s"""WITH pts AS (
            |  SELECT CAST(c_custkey AS BIGINT) AS id,
            |         $latSql AS la, $lonSql AS lo
            |  FROM customer),
            |cells AS (
            |  SELECT id, la, lo,
            |         CAST(floor(lo / 4) AS BIGINT) AS cx,
            |         CAST(floor(la / 4) AS BIGINT) AS cy
            |  FROM pts),
            |fan AS (
            |  SELECT id AS a_id, la AS a_la, lo AS a_lo,
            |         cx + dx.x AS cx, cy + dy.y AS cy
            |  FROM cells, (SELECT unnest([-1, 0, 1]) AS x) dx,
            |              (SELECT unnest([-1, 0, 1]) AS y) dy),
            |pairs AS (
            |  SELECT DISTINCT a_id, b.id AS b_id,
            |         round(2 * 6371.0088 * asin(sqrt(
            |           sin(radians(b.la - a_la) / 2) * sin(radians(b.la - a_la) / 2)
            |           + cos(radians(a_la)) * cos(radians(b.la))
            |             * sin(radians(b.lo - a_lo) / 2) * sin(radians(b.lo - a_lo) / 2))), 3)
            |           AS dist_km
            |  FROM fan JOIN cells b ON fan.cx = b.cx AND fan.cy = b.cy
            |  WHERE a_id < b.id)
            |SELECT a_id, b_id, dist_km FROM pairs
            |WHERE dist_km < 200.0
            |ORDER BY a_id, b_id""".stripMargin)
  )

  val all: Seq[Query] = Seq(q116)
}
