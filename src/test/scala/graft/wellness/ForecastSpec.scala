package graft.wellness

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForecastSpec extends SparkSpec {

  test("OLS forecast reproduces polyfit semantics on a perfect line") {
    import spark.implicits._
    // 30-day spacing, exactly linear: slope = 2/30 per day, zero residuals
    val df = Seq(
      ("p1", "2023-01-01", 10.0),
      ("p1", "2023-01-31", 12.0),
      ("p1", "2023-03-02", 14.0),
      ("p2", "2023-01-01", 5.0)) // < 3 points -> excluded
      .toDF("patient", "date", "a1c")
    val out = Forecast.monthlyForecast(df, "patient", "date", "a1c")
      .orderBy("k").collect()
    assert(out.forall(_.getAs[String]("patient") == "p1"))
    assert(out.length == 12)
    val k1 = out.head
    assert(k1.getAs[java.sql.Date]("future_month").toString == "2023-04-01")
    // y at 2023-04-01 (30 days past last point): 14 + 2 = 16
    assert(math.abs(k1.getAs[Double]("y_future") - 16.0) < 1e-9)
    // sigma ~ 1e-6 (zero residuals clamped); ci_1 = sigma + (1/12)*0.15*12
    val ci1 = k1.getAs[Double]("upper") - k1.getAs[Double]("y_future")
    assert(math.abs(ci1 - (1e-6 + 0.15 * 12.0 / 12.0)) < 1e-9)
    // CI widens monotonically
    val cis = out.map(r => r.getAs[Double]("upper") - r.getAs[Double]("y_future"))
    assert(cis.sliding(2).forall(p => p(1) > p(0)))
  }

  test("monthly wellness series takes last row per month and rescores") {
    import spark.implicits._
    val df = Seq(
      ("p1", "2023-01-05", 90.0),  // superseded within January
      ("p1", "2023-01-20", 150.0), // LDL 150 -> penalty 2
      ("p1", "2023-02-10", 90.0))  // LDL 90 -> penalty 0
      .toDF("patient", "date", "LDL")
      .withColumn("date", to_date(col("date")))
    val allAnalytes = Wellness.Refs.keys.toSeq.sorted
    val wide = allAnalytes.filterNot(_ == "LDL").foldLeft(df)((acc, a) =>
      acc.withColumn(a, lit(null).cast("double")))
    val out = Forecast.monthlyWellness(wide, "patient", "date", identity)
      .orderBy("month").collect()
    assert(out.length == 2)
    val jan = out(0).getAs[Double]("wellness")
    val feb = out(1).getAs[Double]("wellness")
    assert(math.abs(jan - (100.0 - 2 * 0.4 * 100.0 / 3.0)) < 1e-9) // LDL=150
    assert(feb == 100.0) // LDL=90
  }
}
