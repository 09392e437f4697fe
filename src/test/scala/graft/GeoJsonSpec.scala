package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.geom.st
import graft.io.GeoJson

/** GeoJSON sink: the emitted FeatureCollection parses back through
  * Spark's JSON reader with intact attributes and coordinates. */
class GeoJsonSpec extends SparkSpec {
  import spark.implicits._

  test("feature collection roundtrips through spark.read.json") {
    val df = Seq((1L, "alpha", 0.0), (2L, "be\"ta", 3.0))
      .toDF("id", "label", "off")
      .select($"id", $"label",
        st.makeBox($"off", lit(0.0), $"off" + 2.0, lit(1.0)).as("geom"))
    val path = Files.createTempDirectory("geojson").resolve("layer.json").toString
    GeoJson.write(df, "geom", path)

    val parsed = spark.read.option("multiLine", true).json(path)
      .selectExpr("explode(features) AS f")
      .select($"f.properties.id", $"f.properties.label",
        $"f.geometry.type".as("gtype"),
        element_at(element_at(element_at($"f.geometry.coordinates", 1), 1), 1).as("x0"))
      .as[(Long, String, String, Double)].collect().sortBy(_._1)
    assert(parsed.length == 2)
    assert(parsed(0) == ((1L, "alpha", "Polygon", 0.0)))
    assert(parsed(1) == ((2L, "be\"ta", "Polygon", 3.0)))
  }
}
