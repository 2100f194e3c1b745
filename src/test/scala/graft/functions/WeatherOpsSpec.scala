package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F9/F10/F11 (SURVEY.md §5 item 2 — F10 boundary ids). */
class WeatherOpsSpec extends SparkSpec {

  test("F10: bucket boundaries, including 800-before-range order and 4xx gap") {
    import spark.implicits._
    val cases = Seq(
      199L -> "Unknown", 200L -> "Thunderstorm", 299L -> "Thunderstorm",
      300L -> "Drizzle", 399L -> "Drizzle", 400L -> "Unknown",
      499L -> "Unknown", 500L -> "Rain", 599L -> "Rain",
      600L -> "Snow", 699L -> "Snow", 700L -> "Atmosphere",
      799L -> "Atmosphere", 800L -> "Clear", 801L -> "Clouds",
      899L -> "Clouds", 900L -> "Unknown")
    val got = cases.map(_._1).toDF("id")
      .select(col("id"), WeatherOps.weatherGroup(col("id")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, want) => assert(got(id) === want, s"id=$id") }
  }

  test("F9: Kelvin to Celsius") {
    import spark.implicits._
    val c = Seq(273.15).toDF("k")
      .select(WeatherOps.kelvinToCelsius(col("k"))).head().getDouble(0)
    assert(c === 0.0)
  }

  test("F11: parseWeatherJson extracts id, description, Celsius temperature") {
    import spark.implicits._
    val json =
      """{"weather":[{"id":501,"main":"Rain","description":"moderate rain"}],
        |"main":{"temp":283.15,"humidity":87}}""".stripMargin.replace("\n", "")
    val r = Seq(json).toDF("j")
      .select(WeatherOps.parseWeatherJson(col("j")).as("w"))
      .select("w.weather_id", "w.weather_description", "w.temperature")
      .head()
    assert(r.getLong(0) === 501L)
    assert(r.getString(1) === "moderate rain")
    assert(math.abs(r.getDouble(2) - 10.0) < 1e-9)
  }

  test("F11: absent weather array yields NULLs, not an error") {
    import spark.implicits._
    val r = Seq("""{"main":{"temp":300.0}}""").toDF("j")
      .select(WeatherOps.parseWeatherJson(col("j")).as("w"))
      .select("w.weather_id", "w.temperature").head()
    assert(r.isNullAt(0))
    assert(!r.isNullAt(1))
  }
}
