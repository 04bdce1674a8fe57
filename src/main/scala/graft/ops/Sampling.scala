package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training corpora.
  *
  * Splits must be a pure function of the record key — stable across runs,
  * executor counts, and partitionings, so train/val/test membership never
  * drifts between pipeline runs (`df.sample` is none of these). The hash
  * is a Knuth multiplicative hash over plain 64-bit integer arithmetic, so
  * any engine can replay membership with two SQL operators — the same
  * discipline that keeps the LSH operators oracle-checkable.
  *
  * Scale shape: a codegen'd scalar expression on the scan — no shuffle, no
  * state; a split assignment of 100 TB is exactly a filtered scan.
  */
object Sampling {

  /** Multiplier from Knuth's multiplicative method (2^32 / phi). */
  private val Mult = 2654435761L

  /** Keys are folded below 2^31 first so `(key + seed) * Mult` stays far
    * from Long overflow — Spark would wrap silently where another engine
    * errors, and the replayed arithmetic must agree everywhere.
    */
  private val KeyMod = 2147483647L

  /** Bucket granularity: fractions resolve to 1e-6. */
  val Buckets = 1000000L

  /** Deterministic bucket in [0, Buckets) for a key column; `seed` (keep
    * it under ~1e9) derives independent assignments for independent
    * sampling decisions.
    */
  def splitBucket(key: Column, seed: Long = 0L): Column = {
    require(seed >= 0 && seed <= 1000000000L, "seed must be in [0, 1e9]")
    pmod((pmod(key.cast("long"), lit(KeyMod)) + lit(seed)) * lit(Mult), lit(Buckets))
  }

  /** Assign each row a named split by cumulative fraction — e.g.
    * `Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)`. Fractions must
    * sum to 1 (every row belongs somewhere).
    */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = splitBucket(col(keyCol), seed)
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => math.round(f * Buckets))
    val assigned = splits.zip(thresholds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(acc.isNull && bucket < hi, name)
        .otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Keep a deterministic `fraction` of rows by key. */
  def sampleByKey(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.where(splitBucket(col(keyCol), seed) < math.round(fraction * Buckets))
  }

  /** Per-stratum deterministic fractions (e.g. downsample boilerplate-heavy
    * languages); strata absent from the map are dropped.
    */
  def stratifiedSampleByKey(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * Buckets)))
          .otherwise(acc)
      }
    df.where(splitBucket(col(keyCol), seed) < threshold)
  }
}
