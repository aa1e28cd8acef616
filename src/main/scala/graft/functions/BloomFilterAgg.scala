package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions}
import org.apache.spark.util.sketch.BloomFilter

/** T33/E2 (SURVEY §2.4, §2.11): Bloom-filter aggregate over a string
  * column — the membership sketch that completes the one-pass sketch
  * family (A4 HyperLogLog for cardinality, T28 count-min for frequency,
  * this for membership). Spark ships `BloomFilterAggregate` but keeps it
  * internal (runtime join filters only, not SQL-callable), so this is
  * the public-API typed-Aggregator form over the same
  * `org.apache.spark.util.sketch.BloomFilter`.
  *
  * Buffer: the filter's bit array — merge is bitwise OR, so the
  * aggregation is associative, commutative AND order/partitioning
  * independent: the final bit pattern is a pure function of the input
  * SET, which is what makes sketch-dependent results reproducible
  * cross-run at any scale. Output: the serialized filter (~1.2 MB for
  * 1M items at 1% fpp — constant in corpus size, the whole point). */
class BloomFilterAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  override def reduce(b: BloomFilter, s: String): BloomFilter = {
    if (s != null) b.putString(s)
    b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)
  override def finish(b: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }
  // BloomFilterImpl is java.io.Serializable (custom write/readObject)
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomFilterAgg {
  /** Column form: bloom_agg(item) → serialized filter bytes. */
  def apply(item: Column, expectedItems: Long, fpp: Double): Column =
    functions.udaf(new BloomFilterAgg(expectedItems, fpp)).apply(item)

  /** Membership probe against serialized filter bytes: no false
    * negatives; false positives at ≤ the construction fpp. The probe
    * runs once per ROW and the join re-materializes the byte array per
    * row (so reference identity never repeats); deserialization is
    * memoized per JVM keyed by the FULL serialized content
    * (ByteBuffer.wrap gives content equals/hashCode) — the map only
    * ever holds the handful of distinct filters a JVM sees, so the
    * full-content key costs one array scan per row while ruling out
    * any sampled-key collision between same-sized filters. */
  // BOUNDED (r20 review find): a long-lived executor on a cluster
  // that rebuilds filters (nightly refresh, per-partition filters)
  // would otherwise accrete every distinct serialized filter forever
  // — ~1.2 MB each. Access-ordered LRU, plenty for the handful of
  // live filters any one stage probes.
  private val MaxParsed = 64
  private val parsed = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[java.nio.ByteBuffer, BloomFilter](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.nio.ByteBuffer, BloomFilter])
          : Boolean = size() > MaxParsed
    })
  private def parse(bytes: Array[Byte]): BloomFilter =
    parsed.computeIfAbsent(java.nio.ByteBuffer.wrap(bytes), k =>
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(k.array())))
  val mightContain: (Column, Column) => Column = {
    // Spark only auto-null-guards PRIMITIVE-typed UDF inputs — a null
    // byte array or probe string reaches the lambda (nullable probe
    // columns, outer-join filter sides) and used to NPE the task; the
    // SQL-consistent answer is null (r20 review find)
    val f = functions.udf((bytes: Array[Byte], s: String) =>
      if (bytes == null || s == null) null.asInstanceOf[java.lang.Boolean]
      else java.lang.Boolean.valueOf(parse(bytes).mightContainString(s)))
    (bf: Column, s: Column) => f(bf, s)
  }
}
