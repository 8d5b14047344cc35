package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-expression helpers shared across the engine.
  *
  * The money/decimal helpers exist for oracle-exact arithmetic: the
  * testdata money columns are 2-decimal doubles, so casting to
  * DECIMAL(18,2) before any sum/product makes the arithmetic exact and
  * engine-independent (Spark and DuckDB produce bit-identical results),
  * where raw double summation would differ in the low bits with
  * partition/evaluation order. At 100 TB the decimal aggregation path is
  * also overflow-safe (sum of DECIMAL(18,2) widens to DECIMAL(28,2)).
  */
object Exprs {

  /** 2-dp money column -> exact decimal. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum of a 2-dp money column, surfaced as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact average: decimal sum divided by count, in double space.
    * Both engines compute the identical double numerator and long
    * denominator, so the division is bit-identical.
    */
  def moneyAvg(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(lit(1))

  /** Normalize integer-typed results to long (DuckDB aggregates return
    * BIGINT/HUGEINT; pinning both sides to 64-bit avoids schema-width
    * mismatches in the driver's compare).
    */
  def asLong(c: Column): Column = c.cast(LongType)

  /** First 8 hex chars of md5 as a non-negative bigint — a deterministic
    * 32-bit hash expressible identically in DuckDB
    * (('0x' || substr(md5(x),1,8))::BIGINT), used by the dedup /
    * fingerprint / LSH operators so oracles can reproduce it.
    */
  def md5Int32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)
}
