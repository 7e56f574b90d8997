package graft.wellness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M9 + A6: OLS forecast with widening CI and the monthly wellness series
  * (mrp_website.py:660-698, 780-812), distributed flavor — grouped
  * closed-form regression instead of per-patient driver loops.
  */
object Forecast {

  /** Per-group OLS on (date-ordinal x, y) + a 12-step monthly projection.
    *
    * Reference semantics (mrp_website.py:672-685): slope/intercept =
    * polyfit(x, y, 1) with x = proleptic ordinal day; residual
    * sigma = std(y - ŷ) (population, ddof=0); CI_k = sigma +
    * (k/12)·0.15·mean(|y|) for k = 1..12; series needs >= 3 points.
    *
    * One aggregation pass (regr_* aggregates are map-side combinable);
    * the projection explodes 12 rows per group — no extra shuffle.
    */
  def monthlyForecast(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String, horizonMonths: Int = 12): DataFrame = {
    // proleptic-Gregorian ordinal day, matching pd.Timestamp.toordinal:
    // days since 0001-01-01 + 1 = days since 1970-01-01 + 719163
    val x = (datediff(to_date(col(dateCol)), lit("1970-01-01")) + 719163)
      .cast("double")
    val y = col(valueCol).cast("double")
    val fitted = df.filter(y.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        regr_slope(y, x).as("m"),
        regr_intercept(y, x).as("b"),
        // population std of residuals via E[r²]-E[r]² with r = y - (m·x+b)
        // computed from sufficient statistics of (x, y):
        avg(y).as("y_mean"), avg(x).as("x_mean"),
        avg(y * y).as("yy"), avg(x * x).as("xx"), avg(x * y).as("xy"),
        avg(abs(y)).as("abs_mean"),
        max(to_date(col(dateCol))).as("last_date"))
      .filter(col("n") >= 3)
      .withColumn("resid_var",
        col("yy") - col("y_mean") * col("y_mean")
          - col("m") * col("m") * (col("xx") - col("x_mean") * col("x_mean")))
      .withColumn("sigma", greatest(lit(1e-6),
        sqrt(greatest(col("resid_var"), lit(0.0)))))
      .withColumn("baseline", greatest(lit(1.0), col("abs_mean")))
    fitted.withColumn("k", explode(sequence(lit(1), lit(horizonMonths))))
      .withColumn("future_month",
        trunc(add_months(col("last_date"), col("k")), "month"))
      .withColumn("x_future",
        (datediff(col("future_month"), lit("1970-01-01")) + 719163).cast("double"))
      .withColumn("y_future", col("m") * col("x_future") + col("b"))
      .withColumn("ci", col("sigma") +
        (col("k").cast("double") / horizonMonths) * (lit(0.15) * col("baseline")))
      .select(col(groupCol), col("k"), col("future_month"),
        col("y_future"), (col("y_future") + col("ci")).as("upper"),
        (col("y_future") - col("ci")).as("lower"))
  }

  /** Monthly wellness series (mrp_website.py:787-798): last row per month
    * per patient, rescored — latest-per-month window + the Wellness column
    * arithmetic.
    */
  def monthlyWellness(wide: DataFrame, idCol: String, dateCol: String,
      colFor: String => String): DataFrame = {
    val w = Window.partitionBy(col(idCol), date_trunc("month", col(dateCol)))
      .orderBy(col(dateCol).desc)
    val lastPerMonth = wide
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
      .withColumn("month", date_trunc("month", col(dateCol)))
    Wellness.scoreWide(lastPerMonth, colFor)
      .select(col(idCol), col("month"), col("wellness"), col("confidence"))
      .filter(col("wellness").isNotNull)
  }
}
