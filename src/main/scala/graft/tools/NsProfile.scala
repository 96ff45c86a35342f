package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{DocsTable, GeoFunctions, ProjFunctions, SpatialJoins}

/** Dev profile: stage-by-stage wall times of the north-star pipeline. */
object NsProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = "/tmp/graft_bench_docs"
    def time(label: String)(f: => Any): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"NSPROF $label ${runs.min}%.2f s")
    }
    def ck(df: org.apache.spark.sql.DataFrame): Long =
      df.select(count(lit(1)), sum(pmod(xxhash64(struct(df.columns.map(col): _*)), lit(1000000007L))))
        .head().getLong(0)
    val gdaPipe = "proj=pipeline ellps=GRS80 step proj=cart step proj=helmert " +
      "convention=coordinate_frame x=0.06155 rx=-0.0394924 y=-0.01087 " +
      "ry=-0.0327221 z=-0.04019 rz=-0.0328979 s=-0.009994 step proj=cart inv"
    val docs = DocsTable.withAnchor(spark.read.parquet(path)).where(col("lon").isNotNull)
    time("read+anchor only") { ck(docs.select("doc_id", "lon", "lat")) }
    time("+ utmNative") { ck(docs.withColumn("utm", ProjFunctions.utmNative(col("lon"), col("lat")))
      .select(col("doc_id"), col("utm.x"), col("utm.y"))) }
    time("+ gda datum pipeline") { ck(docs
      .withColumn("gda", ProjFunctions.projTrans2(col("lon"), col("lat"), gdaPipe))
      .select(col("doc_id"), col("gda.x"))) }
    time("+ webmerc + hex bin") { ck(docs
      .withColumn("wm", ProjFunctions.projTrans2(col("lon"), col("lat"),
        "proj=webmerc ellps=WGS84"))
      .withColumn("hex", GeoFunctions.hexBin(col("wm.x"), col("wm.y"), lit(50000.0)))
      .select(col("doc_id"), col("hex.q"), col("hex.r"))) }
    var enriched = docs
      .withColumn("utm", ProjFunctions.utmNative(col("lon"), col("lat")))
      .withColumn("gda", ProjFunctions.projTrans2(col("lon"), col("lat"), gdaPipe))
      .withColumn("cell", GeoFunctions.s2Cell(col("lon"), col("lat"), lit(12)))
      .withColumn("tile", GeoFunctions.tileKey(col("lon"), col("lat"), lit(12)))
      .withColumn("wm", ProjFunctions.projTrans2(col("lon"), col("lat"),
        "proj=webmerc ellps=WGS84"))
      .withColumn("hex", GeoFunctions.hexBin(col("wm.x"), col("wm.y"), lit(50000.0)))
    for (z <- 1 to 8)
      enriched = enriched.withColumn(s"utm_$z",
        ProjFunctions.projTrans2(col("lon"), col("lat"), s"proj=utm zone=${z * 7} ellps=WGS84").getField("x"))
    val checksum = (1 to 8).map(z => col(s"utm_$z")).reduce(_ + _) + col("utm.x") + col("utm.y")
    time("all transforms, no pip") { ck(enriched.withColumn("utm_ck", checksum)
      .select(col("doc_id"), col("utm_ck"), col("cell"), col("tile"), col("gda.x"))) }
    time("full northstar (with pip)") {
      val joined = SpatialJoins.pipJoin(enriched.withColumn("utm_ck", checksum),
        DocsTable.zones(spark), level = 10)
        .select(col("doc_id"), col("zone_id"), col("utm.zone").as("utm_zone"),
          col("cell"), col("tile"), col("hex.q").as("hex_q"),
          col("hex.r").as("hex_r"), col("gda.x").as("gda_x"), col("utm_ck"))
      ck(joined)
    }
    spark.stop()
  }
}
