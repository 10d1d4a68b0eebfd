package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group ordinary least squares (y = slope·x + intercept, plus R²):
  * the per-segment trend fit behind "is price still tracking quantity
  * in this segment" checks — thousands of independent small models in
  * one aggregation pass, which is exactly where a DataFrame engine
  * beats per-group driver loops.
  *
  * Numerics: the five moment sums (Σx, Σy, Σxy, Σx², Σy²) are
  * decimal-exact — callers pass decimal-cast x/y — so they are
  * independent of partitioning and summation order; the closed-form
  * slope/intercept/R² are then derived in double with ONE fixed
  * expression tree, mirrored token-for-token in the oracle SQL, so both
  * engines execute the identical sequence of correctly-rounded IEEE
  * ops. (Built-in regr_slope aggregates stream in doubles — their
  * result depends on row order, which is why they can't be
  * hash-compared across engines and aren't used here.)
  *
  * Shape at scale: one map-side-combined groupBy; no window, no second
  * pass. Degenerate groups (n < 2 or zero x-variance) yield null
  * slope/intercept/R² rather than dropping the group.
  */
object Regression {

  def ols(df: DataFrame, keys: Seq[String], x: Column, y: Column): DataFrame = {
    require(keys.nonEmpty, "ols requires at least one key column")
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
      sum(y * y).as("__syy"))
    val nd = col("n").cast(DoubleType)
    val sx = col("__sx").cast(DoubleType)
    val sy = col("__sy").cast(DoubleType)
    val sxx = col("__sxx").cast(DoubleType)
    val sxy = col("__sxy").cast(DoubleType)
    val syy = col("__syy").cast(DoubleType)
    // the same expression tree as the oracle SQL — do not refactor one
    // without the other; IEEE equality depends on the op sequence
    val covN = nd * sxy - sx * sy     // n·cov·n
    val varxN = nd * sxx - sx * sx    // n·var(x)·n
    val varyN = nd * syy - sy * sy
    val slope = when(varxN =!= 0.0, covN / varxN)
    val intercept = when(varxN =!= 0.0, (sy - (covN / varxN) * sx) / nd)
    val r2 = when(varxN =!= 0.0 && varyN =!= 0.0,
      (covN * covN) / (varxN * varyN))
    agg.select(keys.map(col) ++ Seq(col("n"), slope.as("slope"),
      intercept.as("intercept"), r2.as("r2")): _*)
  }
}
