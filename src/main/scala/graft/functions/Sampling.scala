package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand(seed)`-based sampling reproduces only within one engine (and only
  * for a fixed partitioning); hash-based sampling is the reproducibility
  * pattern real pipelines use: a row is kept iff a stable content hash of
  * its id falls under the fraction threshold. Same rows selected on any
  * engine, any partitioning, any day — and membership is a pure codegen'd
  * filter, so it pushes through scans like any predicate.
  *
  * Mechanics: the first 4 hex chars of md5(id) are compared against the
  * fraction rendered as a 4-hex-digit threshold (16-bit resolution,
  * ±1/65536 of the requested fraction). Lexicographic compare of hex
  * strings == numeric compare, and md5 is identical everywhere.
  */
object Sampling {

  /** 4-hex-digit threshold; None ⇒ keep everything. Both sides of the
    * compare must be the SAME length or lexicographic ≠ numeric.
    */
  private def threshold(fraction: Double): Option[String] = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    val n = math.round(fraction * 65536.0).toInt
    if (n >= 65536) None else Some(f"$n%04x")
  }

  /** Keep ≈fraction of rows, deterministically by id. */
  def hashSampleCond(idCol: Column, fraction: Double): Column =
    threshold(fraction) match {
      case None => lit(true)
      case Some(t) => substring(md5(idCol.cast("string")), 1, 4) < t
    }

  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashSampleCond(col(idCol), fraction))

  /** Stratified variant: per-stratum fractions (absent strata → 0).
    * The whole predicate stays one codegen'd CASE — no per-stratum scans.
    */
  def hashSampleBy(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val cond = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && hashSampleCond(col(idCol), f))
    }
    df.filter(cond)
  }

  /** Disjoint deterministic splits (train/val/test): row goes to the i-th
    * split whose cumulative fraction first exceeds its hash point.
    * Returns the split index column (-1 if fractions sum < 1 and the row
    * falls past the end).
    */
  def splitIndex(idCol: Column, fractions: Seq[Double]): Column = {
    require(fractions.sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val h = substring(md5(idCol.cast("string")), 1, 4)
    val cuts = fractions.scanLeft(0.0)(_ + _).tail
    cuts.zipWithIndex.foldRight(lit(-1)) { case ((cut, i), other) =>
      threshold(cut) match {
        case None => when(lit(true), lit(i)).otherwise(other)
        case Some(t) => when(h < t, lit(i)).otherwise(other)
      }
    }
  }
}
