package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Weather-enrichment scalar ops (SURVEY.md §2.6 F9-F11; reference
  * scripts/realtime_extractor.py:52-94). */
object WeatherOps {

  /** F9 — Kelvin to Celsius (realtime_extractor.py:67). */
  def kelvinToCelsius(k: Column): Column = k - lit(273.15)

  /** F10 — OpenWeatherMap condition-id bucketing
    * (realtime_extractor.py:69-84). The branch ORDER is semantic: 800 is
    * tested before the 800-899 range, so 800 → Clear, 801-899 → Clouds;
    * 4xx ids fall through to Unknown exactly as in the reference. */
  def weatherGroup(id: Column): Column =
    when(id >= 200 && id <= 299, "Thunderstorm")
      .when(id >= 300 && id <= 399, "Drizzle")
      .when(id >= 500 && id <= 599, "Rain")
      .when(id >= 600 && id <= 699, "Snow")
      .when(id >= 700 && id <= 799, "Atmosphere")
      .when(id === 800, "Clear")
      .when(id >= 800 && id <= 899, "Clouds")
      .otherwise("Unknown")

  /** Schema of the OpenWeatherMap current-weather JSON subset the reference
    * consumes (realtime_extractor.py:60-64). */
  val weatherJsonSchema: StructType = StructType(Seq(
    StructField("weather", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("main", StringType),
      StructField("description", StringType))))),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("humidity", DoubleType))))))

  /** F11 — parse the weather JSON payload into (weather_id,
    * weather_description, temperature_c) columns. */
  def parseWeatherJson(json: Column): Column = {
    val w = from_json(json, weatherJsonSchema)
    struct(
      w.getField("weather").getItem(0).getField("id").as("weather_id"),
      w.getField("weather").getItem(0).getField("description").as("weather_description"),
      kelvinToCelsius(w.getField("main").getField("temp")).as("temperature"))
  }
}
