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

  /** GRID-DENSITY CLUSTERING (DBSCAN-shaped): points land in a coarse
    * 1°-lat × 2°-lon grid, cells at ≥ 1.08× average occupancy
    * (⌈27N/2500⌉ — the grid has exactly 100 cells) are "dense", and dense
    * cells that touch (8-neighborhood) merge into clusters via the
    * large-star/small-star closure (q109's O(log n) machinery). Output:
    * per cluster, its canonical cell id, cell count, and total points —
    * the grid formulation that replaces DBSCAN's per-point ε-graph with
    * a cell census at corpus scale (the ε-graph is quadratic; the grid is
    * one hash-agg + a 100-row adjacency problem).
    *
    * 100 TB plan: the only row-scale stage is the cell census (map-side
    * combined); adjacency, closure, and the report all operate on the
    * CELL table, whose size is fixed by the grid pitch (≤ 100 cells BY
    * CONSTRUCTION — 10 lat bands × 10 lon bands), not the data. Because
    * that bound holds at every SF, the closure is a driver-local
    * union-find over the collected census — the same pattern as AQE's
    * runtime-stats decisions — NOT a distributed star-contraction: the
    * round-7 profile showed 13.9 s of pure stage overhead running
    * large-star/small-star jobs on a 100-row table (each round is 3+
    * jobs; the data never leaves one partition). The bound is asserted,
    * so a grid change that broke it would fail loudly rather than
    * silently collect row-scale data. The DuckDB oracle re-derives the
    * same clusters with a recursive CTE over the identical dense-cell
    * adjacency. */
  val q287GridDensityClusters: GraftQuery = GraftQuery.oracled(
    "q287_grid_density_clusters",
    """WITH RECURSIVE pts AS (
      |  SELECT c_custkey AS id,
      |         40 + (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000) / 1000.0 AS lat,
      |         (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)) AS BIGINT) % 20000) / 1000.0 AS lon
      |  FROM customer),
      |cells AS (SELECT CAST(floor(lat) AS BIGINT) AS cl,
      |                 CAST(floor(lon / 2) AS BIGINT) AS cn,
      |                 CAST(count(*) AS BIGINT) AS n
      |          FROM pts GROUP BY 1, 2),
      |thr AS (SELECT CAST(floor((27 * (SELECT count(*) FROM pts) + 2499) / 2500.0) AS BIGINT) AS t),
      |dense AS (SELECT cl, cn, n, cl * 1000 + cn AS cid FROM cells, thr WHERE n >= thr.t),
      |adj AS (SELECT a.cid AS src, b.cid AS dst
      |        FROM dense a JOIN dense b
      |          ON abs(a.cl - b.cl) <= 1 AND abs(a.cn - b.cn) <= 1
      |         AND a.cid <> b.cid),
      |reach AS (
      |  SELECT cid AS id, cid AS lbl FROM dense
      |  UNION
      |  SELECT e.dst AS id, r.lbl FROM reach r JOIN adj e ON e.src = r.id),
      |lab AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
      |SELECT l.cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
      |       CAST(sum(d.n) AS BIGINT) AS n_points
      |FROM lab l JOIN dense d ON l.id = d.cid
      |GROUP BY l.cluster_id
      |ORDER BY l.cluster_id""") { (spark, dir) =>
    import spark.implicits._
    val key = $"c_custkey".cast("string")
    val pts = Tables.customer(spark, dir).select(
      $"c_custkey".as("id"),
      (lit(40) + (conv(substring(md5(key), 1, 8), 16, 10).cast("long") % 10000) / 1000.0).as("lat"),
      ((conv(substring(md5(key), 9, 8), 16, 10).cast("long") % 20000) / 1000.0).as("lon"))
    // ONE corpus-scale job: the map-side-combined cell census, collected.
    // The grid has ≤ 100 cells regardless of SF (asserted), so this is a
    // bounded-metadata collect, not a row-data collect; total row count is
    // the census sum (no second scan of pts).
    val cells = pts
      .groupBy(floor($"lat").cast("long").as("cl"),
        floor($"lon" / 2).cast("long").as("cn"))
      .agg(count(lit(1)).cast("long").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(cells.length <= 100,
      s"grid-pitch bound violated: ${cells.length} cells — the driver-local " +
        "closure is only valid while the census stays grid-bounded")
    val total = cells.map(_._3).sum
    val thr = math.floor((27 * total + 2499) / 2500.0).toLong
    val dense = cells.filter(_._3 >= thr)
      .map { case (cl, cn, n) => (cl, cn, n, cl * 1000 + cn) }
    // Driver-local union-find over the 8-neighborhood adjacency of the
    // ≤ 100 dense cells; component label = min reachable cid (the oracle's
    // recursive-CTE fixpoint).
    val idx = dense.iterator.map { case (cl, cn, _, cid) => (cl, cn) -> cid }.toMap
    val parent = scala.collection.mutable.Map(dense.map(d => d._4 -> d._4): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for {
      (cl, cn, _, cid) <- dense
      dl <- -1L to 1L; dn <- -1L to 1L if dl != 0 || dn != 0
      other <- idx.get((cl + dl, cn + dn))
    } {
      val (ra, rb) = (find(cid), find(other))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = dense
      .groupBy(d => find(d._4))
      .map { case (lbl, cs) => (lbl, cs.length.toLong, cs.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    out.toDF("cluster_id", "n_cells", "n_points")
  }

  def all: Seq[GraftQuery] = Seq(q229GeoNnGrid, q287GridDensityClusters)
}
