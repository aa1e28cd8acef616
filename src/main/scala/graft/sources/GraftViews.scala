package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{View, ViewInfo}
import org.apache.spark.sql.types.StructType

/** S35 — persistent SQL views for the graft catalog (`ViewCatalog`):
  * `CREATE VIEW cat.ns.v AS SELECT ...` stores the view's SQL text +
  * resolution context + schema as ONE small metadata file under the
  * namespace's `_views/` dir (underscore-prefixed, so it can never
  * collide with a table dir — the same reserved-prefix rule the
  * engine's other metadata uses). Like the rest of the catalog there
  * is no external metastore: the file IS the view, creation races
  * settle by the store seam's put-if-absent, and every operation is
  * one metadata file touch — independent of any table's size.
  *
  * Serialization rides `java.util.Properties` (escaping handled for
  * free); array fields (`queryColumnNames`, `columnAliases`,
  * `columnComments` — whose ELEMENTS may be null) store as
  * `<key>.n` + `<key>.<i>` entries with an explicit null marker. */
private[sources] object GraftViews {

  private val NullMark = "\u0000null"

  private def setArray(p: Properties, key: String,
                       arr: Array[String]): Unit = {
    p.setProperty(s"$key.n", arr.length.toString)
    arr.zipWithIndex.foreach { case (v, i) =>
      p.setProperty(s"$key.$i", if (v == null) NullMark else v) }
  }

  private def getArray(p: Properties, key: String): Array[String] = {
    val n = Option(p.getProperty(s"$key.n")).map(_.toInt).getOrElse(0)
    (0 until n).map { i =>
      val v = p.getProperty(s"$key.$i")
      if (v == NullMark) null else v
    }.toArray
  }

  def serialize(info: ViewInfo): Array[Byte] = {
    val p = new Properties()
    p.setProperty("sql", info.sql)
    p.setProperty("currentCatalog", info.currentCatalog)
    setArray(p, "currentNamespace", info.currentNamespace)
    p.setProperty("schema", info.schema.json)
    setArray(p, "queryColumnNames", info.queryColumnNames)
    setArray(p, "columnAliases", info.columnAliases)
    setArray(p, "columnComments", info.columnComments)
    info.properties.asScala.foreach { case (k, v) =>
      p.setProperty(s"prop.$k", v) }
    val out = new ByteArrayOutputStream()
    p.store(out, "graft view")
    out.toByteArray
  }

  def deserialize(viewName: String, bytes: Array[Byte]): View = {
    val p = new Properties()
    p.load(new ByteArrayInputStream(bytes))
    new View {
      override val name: String = viewName
      override val query: String = p.getProperty("sql")
      override val currentCatalog: String = p.getProperty("currentCatalog")
      override val currentNamespace: Array[String] =
        getArray(p, "currentNamespace")
      override val schema: StructType =
        org.apache.spark.sql.types.DataType.fromJson(p.getProperty("schema"))
          .asInstanceOf[StructType]
      override val queryColumnNames: Array[String] =
        getArray(p, "queryColumnNames")
      override val columnAliases: Array[String] = getArray(p, "columnAliases")
      override val columnComments: Array[String] =
        getArray(p, "columnComments")
      override val properties: java.util.Map[String, String] =
        p.stringPropertyNames().asScala.toSeq
          .filter(_.startsWith("prop."))
          .map(k => k.stripPrefix("prop.") -> p.getProperty(k)).toMap.asJava
    }
  }

  def read(fs: FileSystem, file: Path): Option[Array[Byte]] = {
    // open-and-catch, never exists-then-open: a concurrent DROP VIEW
    // between the probe and the open must surface as None (→ the
    // caller's NoSuchViewException), not a raw FileNotFoundException
    val in =
      try fs.open(file)
      catch { case _: java.io.FileNotFoundException => return None }
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } finally in.close()
  }
}
