package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions}

/** A7/E2 (SURVEY §2.4, §2.11): tonnage-weighted mean as a reusable typed
  * aggregate — the exact arithmetic behind the reference PDF's
  * "Measured+Indicated 14.34 g/t" rollup row (reference PDF p.9 Table 1-2:
  * (4.11·14.31 + 3.81·14.38) / 7.91 ≈ 14.34).
  *
  * Input: (value, weight). Buffer: (Σ v·w, Σ w) — associative and
  * commutative, so Spark computes it with map-side partial aggregation and
  * a single shuffle of 16-byte buffers: scales to any row count.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted_mean(value, weight). */
  def apply(value: Column, weight: Column): Column =
    functions.udaf(this).apply(value, weight)
}
