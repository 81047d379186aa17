package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numeric aggregation.
  *
  * Plain `sum(double)` is order-dependent (IEEE-754 addition is not
  * associative), so Spark's partial/final hash aggregation and DuckDB's
  * single-threaded sum can disagree in the low bits — enough to break a
  * hash-compare. The fix used throughout this engine: cast each addend
  * to an exact decimal, sum exactly (associative), and cast the final
  * total back to double. Both engines then produce the identical IEEE
  * double, regardless of partitioning, at any scale.
  *
  * DuckDB equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  */
object Num {
  /** Exact, partition-order-independent sum of a double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean: exact decimal sum / count, divided in
    * double space (decimal division rounds differently across engines).
    * DuckDB: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)
}
