package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew mitigation by salting.
  *
  * A hash-partitioned join or aggregation sends every row of a hot key
  * to ONE task; at 100 TB one key holding 1% of the data stalls the
  * stage on a single straggler (AQE's skew-join split helps sort-merge
  * joins, but not aggregations, and only after the skewed shuffle files
  * exist). Salting re-keys the hot side by (key, salt) so a hot key
  * spreads over `salts` tasks:
  *
  *   - join: the big side gets a DETERMINISTIC salt from a hash of the
  *     whole row (no rand() — retries and replays must route a row the
  *     same way); the small side is replicated once per salt value.
  *     Output == the unsalted join, bit for bit.
  *   - aggregation: classic two-phase — partial aggregate on
  *     (key, salt), final aggregate on key. The partial shuffle carries
  *     at most `salts` rows per key.
  */
object Skew {

  /** Inner equi-join with the big side salted and the small side
    * replicated `salts` times. Same rows as `big.join(small, key)`.
    * Caveat: rows identical in EVERY column hash to one salt — exact
    * duplicates of a hot key still co-locate; dedup or pre-aggregate
    * them first (a deterministic function of row content cannot split
    * identical rows, and rand() would break task retries). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = pmod(hash(big.columns.map(c => col(s"`$c`")): _*),
      lit(salts))
    val b = big.withColumn("__salt", salt)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe count per key: two-phase groupBy via a deterministic
    * row-hash salt. Same result as `df.groupBy(key).count()`. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salt = pmod(hash(df.columns.map(c => col(s"`$c`")): _*),
      lit(salts))
    df.withColumn("__salt", salt)
      .groupBy(col(s"`$key`"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(s"`$key`"))
      .agg(sum(col("__partial")).as("count"))
  }
}
