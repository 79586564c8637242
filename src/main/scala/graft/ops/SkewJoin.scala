package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual cure for join-key skew when AQE's skew
  * split can't help (e.g. the skew is known and extreme, or the engine runs
  * with AQE off).
  *
  * A hot key sends all its rows to one reducer in a shuffle join; at 100 TB
  * one popular key can hold a whole stage hostage. Salting splits each left
  * key into `nSalts` synthetic sub-keys (deterministic: hash of a unique
  * column, never rand() — retries must be stable), and replicates the right
  * side once per salt so every sub-key still finds its match. Join output
  * is identical to the unsalted join (proven in SkewJoinSpec); cost is
  * right-side * nSalts, which is the right trade when right is small
  * relative to the hot key's row count but too big to broadcast.
  */
object SkewJoin {
  /** Inner equi-join of left and right on leftKey == rightKey with the left
    * side salted `nSalts` ways; `leftTieBreak` is any left column that
    * varies within a key (drives the deterministic salt). */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTieBreak: String,
      nSalts: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(xxhash64(col(leftTieBreak)), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("_salt", explode(array((0 until nSalts).map(lit): _*)))
    salted
      .join(replicated, salted(leftKey) === replicated(rightKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
