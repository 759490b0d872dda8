package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** Geospatial proximity on a grid index — the distance-join family
  * (SURVEY.md §2.3's theta-join row, specialized to the haversine metric).
  * Coordinates are SYNTHESIZED from `customer` with the engine-portable md5
  * arithmetic (q102/q152's coin, widened to two 32-bit draws), so both
  * engines derive bit-identical points and the join is fully oracle-able
  * without a geo extension on either side. */
object Geo {

  /** Grid-exact nearest-neighbor within 5 km: points land in a lat 0.05° ×
    * lon 0.1° grid sized so one cell step covers the search radius at the
    * synthesized latitudes (40–50°N: 0.05° lat = 5.57 km ≥ 5; 0.1° lon ≥
    * 7.15 km ≥ 5) — any pair within 5 km therefore differs by at most one
    * cell per axis, and the 3×3 neighborhood equi-join is EXACT, never a
    * cross join. Per point, the nearest in-radius neighbor by (rounded
    * haversine, id) — rounding the distance before both the radius predicate
    * and the rank makes the boundary cross-engine stable (q153's fence
    * trick); every customer emits a row (LEFT join), NULL when no neighbor
    * is in range, so the output is non-degenerate at every SF.
    *
    * 100 TB plan: the 9-offset expansion multiplies the PROBE side only
    * (9×), both sides shuffle on the cell key (co-partitioned equi-join, no
    * nested loop), and per-cell occupancy is bounded by the grid pitch —
    * the same pigeonhole that makes the LSH band joins (q46/q96) scale.
    * Skewed cells (urban clusters) would take q70's salting on the cell
    * key. */
  val q229GeoNnGrid: GraftQuery = GraftQuery.oracled(
    "q229_geo_nn_grid",
    """WITH pts AS (
      |  SELECT c_custkey AS id,
      |         40 + (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000) / 1000.0 AS lat,
      |         (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)) AS BIGINT) % 20000) / 1000.0 AS lon
      |  FROM customer),
      |g AS (SELECT id, lat, lon,
      |             CAST(floor(lat / 0.05) AS BIGINT) AS cl,
      |             CAST(floor(lon / 0.1) AS BIGINT)  AS cn
      |      FROM pts),
      |cand AS (
      |  SELECT a.id AS ida, b.id AS idb,
      |         round(2 * 6371.0 * asin(sqrt(
      |           pow(sin(radians(b.lat - a.lat) / 2), 2)
      |           + cos(radians(a.lat)) * cos(radians(b.lat))
      |             * pow(sin(radians(b.lon - a.lon) / 2), 2))), 4) AS dist_km
      |  FROM g a
      |  CROSS JOIN (VALUES (-1), (0), (1)) dl(dl)
      |  CROSS JOIN (VALUES (-1), (0), (1)) dn(dn)
      |  JOIN g b ON b.cl = a.cl + dl.dl AND b.cn = a.cn + dn.dn AND b.id <> a.id),
      |near AS (
      |  SELECT ida, idb, dist_km,
      |         row_number() OVER (PARTITION BY ida ORDER BY dist_km, idb) AS rn
      |  FROM cand WHERE dist_km <= 5.0)
      |SELECT p.id AS c_custkey, n.idb AS neighbor_id, n.dist_km
      |FROM pts p LEFT JOIN near n ON n.ida = p.id AND n.rn = 1
      |ORDER BY c_custkey""") { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val key = $"c_custkey".cast("string")
    val pts = Tables.customer(spark, dir).select(
      $"c_custkey".as("id"),
      (lit(40) + (conv(substring(md5(key), 1, 8), 16, 10).cast("long") % 10000) / 1000.0).as("lat"),
      ((conv(substring(md5(key), 9, 8), 16, 10).cast("long") % 20000) / 1000.0).as("lon"))
    val g = pts
      .withColumn("cl", floor($"lat" / 0.05).cast("long"))
      .withColumn("cn", floor($"lon" / 0.1).cast("long"))
    val probe = g
      .withColumn("dl", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dn", explode(array(lit(-1), lit(0), lit(1))))
      .select($"id".as("ida"), $"lat".as("lata"), $"lon".as("lona"),
        ($"cl" + $"dl").as("jcl"), ($"cn" + $"dn").as("jcn"))
    val cand = probe.join(g,
        probe("jcl") === g("cl") && probe("jcn") === g("cn") && g("id") =!= probe("ida"))
      .select($"ida", $"id".as("idb"),
        round(lit(2 * 6371.0) * asin(sqrt(
          pow(sin(radians($"lat" - $"lata") / 2), 2)
            + cos(radians($"lata")) * cos(radians($"lat"))
            * pow(sin(radians($"lon" - $"lona") / 2), 2))), 4).as("dist_km"))
      .filter($"dist_km" <= 5.0)
    val near = cand
      .withColumn("rn", row_number().over(
        Window.partitionBy($"ida").orderBy($"dist_km", $"idb")))
      .filter($"rn" === 1)
    pts.join(near, pts("id") === near("ida"), "left")
      .select(pts("id").as("c_custkey"), $"idb".as("neighbor_id"), $"dist_km")
      .orderBy($"c_custkey")
  }

  def all: Seq[GraftQuery] = Seq(q229GeoNnGrid)
}
