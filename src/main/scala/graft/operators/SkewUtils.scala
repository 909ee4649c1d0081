package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins/aggregations — the 100 TB playbook
  * (SURVEY §4 design notes): AQE's skew-join handles storage-level skew
  * automatically, but value-level hot keys (one customer with 10⁹ rows)
  * still serialize a single reducer. Salting splits each hot key into
  * `saltFactor` sub-keys: the skewed side picks a random-but-deterministic
  * salt per row, the small side replicates each key across all salts.
  */
object SkewUtils {

  /** Deterministic per-row salt (hash of all columns, not rand() — keeps
    * results replayable, which Spark task retries require anyway). */
  private def salt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(saltFactor))

  /** Inner equi-join where `skewed`'s `key` column has hot values:
    * skewed side gets a salt column, `small` is exploded ×saltFactor so
    * every (key, salt) pair exists — the shuffle then spreads each hot
    * key over saltFactor reducers. `small` grows by the factor, so keep
    * it the dimension side. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt", salt(skewed, saltFactor))
    val replicatedRight = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop(replicatedRight(key))
      .drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. Works for any algebraic
    * aggregate expressed as (partial, merge) column pairs — here the
    * common count/sum case. */
  def saltedCountSum(df: DataFrame, key: String, sumCol: Column,
      saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", salt(df, saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(sumCol).as("__sum"))
      .groupBy(col(key))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("sum"))
}
