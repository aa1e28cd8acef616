package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

/** S29 — the `CALL` procedure implementations behind
  * [[GraftCatalog.loadProcedure]]. Each binds a fixed parameter list,
  * runs the corresponding engine maintenance op, and returns a one-row
  * local scan so the caller sees what happened (`CALL` surfaces the
  * result as a query result). Side-effecting → `isDeterministic=false`,
  * which keeps Spark from caching or re-ordering the call. */
object GraftProcedures {

  private def oneRow(schema: StructType, values: Array[Any])
      : java.util.Iterator[Scan] =
    java.util.List.of[Scan](GraftLocalScanImpl(schema,
      Array(new GenericInternalRow(values): InternalRow))).iterator()

  /** `CALL cat.system.compact(table => 'ns.t', k => 4)` — rewrite the
    * live table as ≤k clustered dirs ([[ManifestTable.compactAppend]],
    * honoring the declared `clusterBy` spec). `statsCols` resolve from
    * the table's persisted property, else from the columns its live
    * stats already track. Returns (version, n_dirs). */
  class Compact(catalog: GraftCatalog) extends UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite a graft table's accreted commit dirs as k clustered dirs"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = "compact"
        override def description(): String = Compact.this.description()
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("k", IntegerType).defaultValue("4").build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = catalog.activeSpark
          val dir = catalog.dirOfTableArg(input.getUTF8String(0).toString)
          val k = if (input.isNullAt(1)) 4 else input.getInt(1)
          val fs = catalog.activeFs
          val head = ManifestTable.headVersion(spark, dir).get
          val meta = ManifestTable.metaOf(fs, dir, head)
          val statsCols = meta.get(GraftCatalog.PropPrefix + "statsCols")
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .filter(_.nonEmpty)
            .orElse {
              // path-sorted iteration keeps the fallback deterministic —
              // compactAppend range-sorts on statsCols.head when no
              // cluster spec is declared, so the order matters
              val tracked = ManifestTable.statsOf(fs, dir, head).toSeq
                .sortBy(_._1).flatMap(kv => ManifestTable.statColsIn(kv._2))
                .distinct
              Some(tracked).filter(_.nonEmpty)
            }
            .getOrElse(throw new IllegalArgumentException(
              s"compact needs stats columns: set the statsCols table " +
                s"property on $dir or ingest with stats"))
          val retain = meta.get(GraftCatalog.PropPrefix + "retainGenerations")
            .flatMap(_.toIntOption).getOrElse(2)
          val v = ManifestTable.compactAppend(spark, dir, statsCols, k, retain)
          val nDirs = ManifestTable.pathsOf(fs, dir, v).size
          oneRow(StructType(Seq(
            StructField("version", LongType, nullable = false),
            StructField("n_dirs", IntegerType, nullable = false))),
            Array[Any](v, nDirs))
        }
      }
  }

  /** `CALL cat.system.vacuum(table => 'ns.t')` — run the retention +
    * orphan sweep now ([[ManifestTable.vacuum]]): crashed-writer
    * leavings age out past the grace window, retention-retired dirs go
    * immediately. Returns how many entries were swept. */
  class Vacuum(catalog: GraftCatalog) extends UnboundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "sweep retention-retired dirs and aged orphans of a graft table"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = "vacuum"
        override def description(): String = Vacuum.this.description()
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = catalog.activeSpark
          val dir = catalog.dirOfTableArg(input.getUTF8String(0).toString)
          val fs = catalog.activeFs
          val head = ManifestTable.headVersion(spark, dir).get
          val retain = ManifestTable.metaOf(fs, dir, head)
            .get(GraftCatalog.PropPrefix + "retainGenerations")
            .flatMap(_.toIntOption).getOrElse(2)
          val swept = ManifestTable.vacuum(spark, dir, retain)
          oneRow(StructType(Seq(
            StructField("swept", LongType, nullable = false))),
            Array[Any](swept))
        }
      }
  }

  /** `CALL cat.system.restore(table => 'ns.t', version => n)` — make a
    * retained older version the live table again (history moves
    * FORWARD: one new manifest, nothing rewritten,
    * [[ManifestTable.restore]]). Returns the new head version. */
  class Restore(catalog: GraftCatalog) extends UnboundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "re-publish a retained older version as the live table"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = "restore"
        override def description(): String = Restore.this.description()
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", LongType).build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val spark = catalog.activeSpark
          val dir = catalog.dirOfTableArg(input.getUTF8String(0).toString)
          val fs = catalog.activeFs
          val head = ManifestTable.headVersion(spark, dir).get
          val retain = ManifestTable.metaOf(fs, dir, head)
            .get(GraftCatalog.PropPrefix + "retainGenerations")
            .flatMap(_.toIntOption).getOrElse(2)
          val v = ManifestTable.restore(spark, dir, input.getLong(1), retain)
          oneRow(StructType(Seq(
            StructField("version", LongType, nullable = false))),
            Array[Any](v))
        }
      }
  }
}
