package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spatial-style block joins in exact integer micro-degrees: the
 * geohash-cell pattern every "points within radius" problem uses at
 * scale — partition space into grid cells, replicate one side to its
 * 3×3 neighborhood, equi-join on the cell key, verify the metric
 * predicate on the candidates. The corpus has no geographic columns, so
 * the declared query derives deterministic synthetic coordinates from
 * entity keys (the x31/x262 plant convention) — the JOIN SHAPE is the
 * thing under test, and it is exactly the shape a real lat/lon table
 * would use.
 *
 * All arithmetic is integer (micro-degrees, squared distances): no trig,
 * no floats, so both engines agree bit-for-bit and the planar-metric
 * approximation is explicit rather than hidden in a haversine ulp.
 */
object Geo {

  /** Deterministic synthetic points: key → (ulat, ulon) micro-degrees in
    * `[0, worldMicroDeg]`², via fixed LCG multipliers (48271 / 69621 —
    * Park-Miller and Marsaglia constants; any coprime multipliers work,
    * these are citable). */
  def syntheticPoints(df: DataFrame, keyCol: String,
      worldMicroDeg: Long): DataFrame =
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("id"),
        pmod(col(keyCol) * 48271L, lit(worldMicroDeg + 1)).as("ulat"),
        pmod(col(keyCol) * 69621L, lit(worldMicroDeg + 1)).as("ulon"))

  /**
   * Pairs within `radiusMicroDeg` (planar metric), found via the grid
   * block join, rolled up into squared-distance bands. Requires
   * `radius ≤ cell` so the 3×3 neighborhood provably covers every
   * qualifying pair (the pigeonhole bound — zero false negatives, the
   * x117 band-join argument applied to space).
   *
   * Scale shape: the left side keeps its own cell; the right side
   * replicates 9× map-side (a constant factor, not a join blowup); the
   * join is a hash equi-join on (cell_lat, cell_lon); each qualifying
   * pair is found EXACTLY once (in the left point's own cell), so no
   * dedup pass is needed. Output is a ≤(radius²/band + 1)-row rollup.
   */
  def blockNeighborPairs(points: DataFrame, cellMicroDeg: Long,
      radiusMicroDeg: Long): DataFrame = {
    require(radiusMicroDeg >= 1 && radiusMicroDeg <= cellMicroDeg,
      s"radius $radiusMicroDeg must be in [1, cell $cellMicroDeg] for 3x3 coverage")
    val r2 = radiusMicroDeg * radiusMicroDeg
    val bandWidth = math.max(1L, r2 / 25)
    val cells = points.select(col("id"), col("ulat"), col("ulon"),
      expr(s"ulat DIV $cellMicroDeg").as("cell_lat"),
      expr(s"ulon DIV $cellMicroDeg").as("cell_lon"))
    val replicated = cells
      .select(col("id").as("b_id"), col("ulat").as("b_ulat"),
        col("ulon").as("b_ulon"),
        explode(expr("sequence(-1L, 1L)")).as("__dy"),
        col("cell_lat"), col("cell_lon"))
      .select(col("b_id"), col("b_ulat"), col("b_ulon"),
        (col("cell_lat") + col("__dy")).as("cell_lat"),
        explode(expr("sequence(-1L, 1L)")).as("__dx"), col("cell_lon"))
      .select(col("b_id"), col("b_ulat"), col("b_ulon"), col("cell_lat"),
        (col("cell_lon") + col("__dx")).as("cell_lon"))
    cells.join(replicated, Seq("cell_lat", "cell_lon"))
      .filter(col("id") < col("b_id"))
      .withColumn("__d2",
        (col("ulat") - col("b_ulat")) * (col("ulat") - col("b_ulat"))
          + (col("ulon") - col("b_ulon")) * (col("ulon") - col("b_ulon")))
      .filter(col("__d2") <= r2)
      .groupBy(expr(s"__d2 DIV $bandWidth").as("dist_band"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("__d2")).as("min_d2"), max(col("__d2")).as("max_d2"))
      .orderBy("dist_band")
  }
}
