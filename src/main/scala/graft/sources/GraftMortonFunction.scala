package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** S27/X16 — the engine's Morton (z-order) interleave as a
  * catalog-loadable V2 scalar function, so a CLUSTERED table's write
  * can declare `ordered by morton(a, lo_a, hi_a, b, lo_b, hi_b)` as
  * its required distribution and SPARK plans the z-curve range shuffle
  * itself — the seam that gives STREAMING epochs the same
  * multi-dimension pruning the batch `appendClustered`/compaction path
  * produces (every dim's per-dir range narrows, not just the leading
  * one).
  *
  * Unlike the batch kernel (which min-max-scales by the BATCH's own
  * bounds in a broadcast agg — impossible in a stateless function),
  * the function scales each dimension by the TABLE-DOMAIN bounds the
  * write bakes in as literal arguments, read from the head manifest's
  * stats at write build. Per-epoch values outside the baked domain
  * CLAMP to the edge ordinal — layout quality degrades at the moving
  * edge, never correctness (per-dir stats always record TRUE min/max,
  * and pruning is driven by those, not by the curve).
  *
  * Bit layout matches the batch kernel: each dimension min-max-scales
  * to 8 bits; bit j of dimension i lands at j*k+i. */
object GraftMortonUnbound extends UnboundFunction {
  override def name(): String = "morton"
  override def description(): String =
    "morton(c1, lo1, hi1, c2, lo2, hi2, ...) — z-order interleave of " +
      "each column min-max-scaled to 8 bits over [lo, hi]"

  /** Dimension types the function interleaves. Integral and date
    * ordinals are exact; timestamps ride their internal micros (bounds
    * parse from stats strings in the table's pinned stats zone); and
    * strings map to the big-endian value of their first 7 UTF-8 bytes
    * (zero-padded — left-aligned so the ordinal is monotone in binary
    * collation; 7 bytes keeps the unsigned value inside a signed
    * Long). Real 100-TB cluster keys — event time, host, URL — are
    * exactly these types; ties beyond 7 bytes cost layout sharpness
    * only (per-dir stats stay exact, so pruning is never wrong). */
  private[sources] def ordinalable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | StringType => true
    case _ => false
  }

  /** The 7-byte big-endian prefix ordinal of a string — shared by the
    * scalar kernel (runtime values) and the write-build bounds parser
    * (stats strings). */
  private[sources] def stringOrdinal(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
      i += 1
    }
    v
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 3 && inputType.fields.length % 3 == 0,
      s"morton takes (col, lo, hi) triples; got $inputType")
    // 8 dims × 8 bits = the 64 bits a Long holds; a 9th dimension's
    // shifts would wrap mod 64 and silently collide bit positions
    // across dimensions — fail loudly instead of degrading the curve
    require(inputType.fields.length / 3 <= 8,
      s"morton interleaves at most 8 dimensions (8 bits each in one " +
        s"64-bit code); got ${inputType.fields.length / 3}")
    val dims = inputType.fields.grouped(3).map { case Array(c, lo, hi) =>
      require(ordinalable(c.dataType),
        s"morton dimension '${c.name}' has unsupported type ${c.dataType.sql}")
      require(lo.dataType == LongType && hi.dataType == LongType,
        s"morton bounds must be BIGINT literals; got $inputType")
      c.dataType
    }.toArray
    GraftMortonFunction(dims)
  }
}

case class GraftMortonFunction(dims: Array[DataType])
    extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] =
    dims.flatMap(dt => Array(dt, LongType: DataType, LongType: DataType))
  override def resultType(): DataType = LongType
  override def name(): String = "morton"
  override def canonicalName(): String =
    s"graft.morton(${dims.map(_.catalogString).mkString(",")})"
  override def isResultNullable: Boolean = false

  private def ordinal(input: InternalRow, ord: Int, dt: DataType): Long =
    dt match {
      case ByteType => input.getByte(ord).toLong
      case ShortType => input.getShort(ord).toLong
      case IntegerType | DateType => input.getInt(ord).toLong
      case LongType | TimestampType => input.getLong(ord) // ts = micros
      case StringType =>
        GraftMortonUnbound.stringOrdinal(input.getUTF8String(ord).getBytes)
      case other => throw new IllegalStateException(
        s"unreachable morton dimension type $other")
    }

  override def produceResult(input: InternalRow): java.lang.Long = {
    val k = dims.length
    var z = 0L
    var i = 0
    while (i < k) {
      val base = i * 3
      val lo = input.getLong(base + 1)
      val hi = input.getLong(base + 2)
      // null dims sort with the domain floor, like the batch kernel's
      // coalesce-to-min
      val v = if (input.isNullAt(base)) lo else ordinal(input, base, dims(i))
      val span = math.max(hi - lo, 1L)
      // clamp BEFORE scaling; wide spans (string ordinals reach 2^56)
      // take the bucket-divide form — `delta * 255` would overflow and
      // silently wrap, collapsing out-of-domain values onto the floor
      val delta = math.min(math.max(v - lo, 0L), span)
      val scaled =
        if (span <= Long.MaxValue / 255L) delta * 255L / span
        else math.min(255L, delta / math.max(span / 255L, 1L))
      var j = 0
      while (j < 8) {
        z |= ((scaled >> j) & 1L) << (j * k + i)
        j += 1
      }
      i += 1
    }
    java.lang.Long.valueOf(z)
  }
}
