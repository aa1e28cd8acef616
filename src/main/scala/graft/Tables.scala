package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness parquet corpus loaders (TESTDATA.md: TPC-H-ish star schema +
  * events/documents/embeddings). One vectorized parquet scan per table;
  * column pruning + predicate pushdown are left to Catalyst (SURVEY §4.1).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects. With spark.sql.legacy.parquet.nanosAsLong=true (set
    * here at runtime — it is a dynamic SQL conf) the column arrives as
    * BIGINT nanos; convert to a proper TimestampType column so every
    * downstream operator sees a normal UTC timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    // Only the NANOS-encoded driver corpus arrives as long; integer `div`
    // truncates like DuckDB's ns→µs read (double division would round and
    // drift timestamps by 1µs). Micros-encoded sources pass through.
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Name-keyed loader that routes `events` through its NANOS-aware
    * reader — a bare `t(s, d, "events")` throws PARQUET_TYPE_ILLEGAL. */
  def load(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else t(s, d, name)
}
