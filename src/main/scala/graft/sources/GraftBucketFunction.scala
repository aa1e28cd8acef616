package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** S38 — the engine's bucket transform as a catalog-loadable V2
  * function (the Iceberg `system.bucket` seam): what makes
  * STORAGE-PARTITIONED JOINS possible. A bucketed (S31) table's scan
  * reports `KeyGroupedPartitioning(bucket(n, key))`; Spark resolves
  * the `bucket` transform against the table's own catalog through
  * this function, and two scans whose bound functions share a
  * [[BoundFunction.canonicalName]] (same bucket count, same key type)
  * are co-partitioned — their equi-join on the key plans with ZERO
  * shuffle on either side.
  *
  * The implementation is BIT-IDENTICAL to the write side's bucket
  * routing (`pmod(hash(key), n)`, MergeInto's murmur3-seed-42 — the
  * same function Spark's `hash()` evaluates), so a reported partition
  * value is the dir the row actually lives in. */
object GraftBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) — graft's murmur3 bucket id, pmod(hash(col), n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, key); got $inputType")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count; got $inputType")
    GraftBucketFunction(inputType.fields(1).dataType)
  }

  /** The identifiers this function answers to on the graft catalog:
    * bare `bucket` (what `V2ExpressionUtils` resolves a scan-reported
    * transform through) and `system.bucket` (SQL convention). */
  def resolve(ident: Identifier): UnboundFunction =
    if (ident.name == "bucket" &&
        (ident.namespace.isEmpty || ident.namespace.sameElements(Array("system"))))
      GraftBucketUnbound
    else throw new NoSuchFunctionException(ident)
}

case class GraftBucketFunction(keyType: DataType)
    extends ScalarFunction[Integer]
    with org.apache.spark.sql.connector.catalog.functions
      .ReducibleFunction[Integer, Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // canonical identity carries the KEY TYPE: murmur3 of INT 2 and
  // BIGINT 2 differ, so co-partitioning across key types would be a
  // silent wrong-join — mismatched names make Spark shuffle instead
  override def canonicalName(): String =
    s"graft.bucket(${keyType.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = Murmur3HashFunction.hash(
      if (input.isNullAt(1)) null else input.get(1, keyType),
      keyType, 42L).toInt
    ((h % n) + n) % n
  }

  /** SPJ across MISMATCHED bucket counts (S38 depth): when this side's
    * modulus is a whole multiple of the other's, every fine bucket
    * folds into exactly one coarse bucket — `pmod(h, m) % n =
    * pmod(h, n)` whenever `n | m` — so Spark can join a 2n-bucket
    * table against an n-bucket table by GROUPING the fine side's
    * partitions instead of shuffling both
    * (`spark.sql.sources.v2.bucketing.allowCompatibleTransforms
    * .enabled`). Key types must match (murmur3 is type-sensitive);
    * anything else returns null and Spark falls back to a shuffle. */
  override def reducer(
      thisNumBuckets: Int,
      otherFunc: org.apache.spark.sql.connector.catalog.functions
        .ReducibleFunction[_, _],
      otherNumBuckets: Int)
      : org.apache.spark.sql.connector.catalog.functions
        .Reducer[Integer, Integer] =
    otherFunc match {
      case GraftBucketFunction(otherKeyType)
          if otherKeyType == keyType &&
            thisNumBuckets > otherNumBuckets &&
            otherNumBuckets > 0 &&
            thisNumBuckets % otherNumBuckets == 0 =>
        GraftBucketReducer(otherNumBuckets)
      case _ => null // incompatible (or already aligned) → no reduction
    }
}

/** Folds a fine bucket ordinal onto the coarse modulus. */
case class GraftBucketReducer(coarse: Int)
    extends org.apache.spark.sql.connector.catalog.functions
      .Reducer[Integer, Integer] {
  override def reduce(bucket: Integer): Integer =
    Integer.valueOf(bucket.intValue % coarse)
}
