package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` seam a V1 streaming `Source` cannot avoid:
  * `getBatch` must return a DataFrame whose plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), and the only
  * constructor for that is `SparkSession.internalCreateDataFrame` —
  * which is what every built-in V1 source (FileStreamSource, Kafka)
  * calls, and what Delta reaches the same way this file does: a
  * one-function bridge compiled under `org.apache.spark.sql.*` (the
  * `private[sql]` boundary, a stable seam across Spark 3.x/4.x).
  * Nothing else in the engine lives outside the `graft` namespace. */
object StreamingShim {

  /** `rdd` as a STREAMING DataFrame (lazy — the rows compute when the
    * micro-batch executes, not here). */
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
