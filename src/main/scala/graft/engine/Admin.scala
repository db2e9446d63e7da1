package graft.engine

/** Partition-level store administration: retention sweeps and snapshots
  * (the rest of the Prometheus TSDB admin surface beside
  * [[Tombstones]]).
  *
  * Both are PURE FILE OPERATIONS on the date-partitioned layout — no
  * Spark job, no scan:
  *  - retention drops a `date=` directory only when EVERY sample in it
  *    is past the horizon (partition end ≤ now − retention), exactly
  *    Prometheus's block-granularity rule — at 100 TB a sweep is a
  *    directory listing plus a handful of recursive deletes, never a
  *    read of the data;
  *  - a snapshot HARDLINKS every data file into
  *    `<table>_snapshots/<name>/` (falling back to copy where the
  *    filesystem refuses links), Prometheus's snapshot trick: O(files)
  *    metadata writes, zero bytes copied, and immutable-once-written
  *    parquet makes the shared blocks safe (appends create NEW files;
  *    clean_tombstones rewrites into new files and unlinks, never
  *    mutates in place).
  */
object Admin {

  import java.nio.file.{Files, Path, Paths}

  case class Sweep(droppedDates: Long, keptDates: Long)

  private def dateDirs(tablePath: String): Seq[(java.time.LocalDate, Path)] = {
    val root = Paths.get(tablePath)
    if (!Files.isDirectory(root)) return Nil
    import scala.jdk.CollectionConverters._
    Files.list(root).iterator().asScala.toSeq
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("date="))
      .flatMap { p =>
        val v = p.getFileName.toString.stripPrefix("date=")
        try Some(java.time.LocalDate.parse(v) -> p)
        catch { case _: java.time.format.DateTimeParseException => None }
      }
  }

  /** Drop every date partition whose END (midnight after `date`) lies
    * at or before `nowSec − retentionSec`. Returns what happened. */
  def enforceRetention(tablePath: String, retentionSec: Long,
                       nowSec: Long): Sweep = {
    require(retentionSec > 0, "retention must be positive")
    val horizon = nowSec - retentionSec
    var dropped = 0L
    var kept = 0L
    dateDirs(tablePath).foreach { case (date, dir) =>
      val endSec = date.plusDays(1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
      if (endSec <= horizon) { rmTree(dir); dropped += 1 }
      else kept += 1
    }
    Sweep(dropped, kept)
  }

  /** Hardlink-snapshot the store into `<table>_snapshots/<name>`;
    * returns the number of files linked. Fails if the name exists
    * (snapshots are immutable). */
  def snapshot(tablePath: String, name: String): Long = {
    require(name.nonEmpty && !name.contains('/') && !name.contains(".."),
      s"bad snapshot name '$name'")
    val root = Paths.get(tablePath)
    require(Files.isDirectory(root), s"no store at $tablePath")
    val dest = Paths.get(tablePath + "_snapshots", name)
    require(!Files.exists(dest), s"snapshot '$name' already exists")
    Files.createDirectories(dest)
    import scala.jdk.CollectionConverters._
    var linked = 0L
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("."))
      .foreach { p =>
        val rel = root.relativize(p)
        val target = dest.resolve(rel)
        Files.createDirectories(target.getParent)
        try Files.createLink(target, p)
        catch { case _: UnsupportedOperationException |
                     _: java.nio.file.FileSystemException =>
          Files.copy(p, target) }
        linked += 1
      }
    linked
  }

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
