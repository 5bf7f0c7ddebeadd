package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Versioned snapshot tier: every write lands in a fresh `v=N`
 * directory and a tiny `_current` pointer file names the live
 * version — the minimal form of the snapshot isolation every lake
 * table format provides, built on two filesystem primitives:
 *
 *  - data is IMMUTABLE once written (a new version is a new
 *    directory; nothing rewrites in place), so a reader that
 *    resolved a version keeps a consistent view for the whole scan
 *    even while writers land newer versions;
 *  - the pointer swap is one rename (write `_current_tmp_*`, rename
 *    over `_current`) — readers see the old or the new version,
 *    never a torn state, and a crash before the rename leaves the
 *    previous version live with an orphan data dir that `expire`
 *    collects.
 *
 * Time travel is then just `read(root, Some(version))`, and rollback
 * is `setCurrent(root, olderVersion)` — no data movement in either.
 *
 * Scale posture: versions add metadata (one directory entry + one
 * small file per commit), never copies of unchanged data written by
 * OTHER versions — callers who want delta-sized commits compose this
 * with the merge/compact operators to produce each version's
 * content. `expire` bounds storage by retiring all but the last k
 * versions (the current one is never eligible).
 */
object Snapshots {

  private val VersionRx = "^v=(\\d+)$".r

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** All committed version numbers under `root`, ascending. */
  def versions(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case VersionRx(n) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted

  /** The live version from the `_current` pointer; None before the
    * first commit. A pointer naming a missing directory fails loudly
    * (manual surgery, not a state this tier produces). */
  def currentVersion(fs: FileSystem, root: Path): Option[Long] = {
    val ptr = new Path(root, "_current")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val v = try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
      require(fs.exists(new Path(root, s"v=$v")),
        s"snapshot pointer at $root names v=$v but that directory is missing — " +
          "restore the directory or point _current at an existing version")
      Some(v)
    }
  }

  private def setCurrent(fs: FileSystem, root: Path, v: Long): Unit = {
    val tmp = new Path(root, s"_current_tmp_${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    // rename-over is the atomic commit; local/HDFS rename replaces,
    // object stores need their conditional-put equivalent here
    if (fs.exists(new Path(root, "_current"))) fs.delete(new Path(root, "_current"), false)
    require(fs.rename(tmp, new Path(root, "_current")),
      s"snapshot commit failed: could not move pointer for v=$v at $root")
  }

  /** Commit `df` as the next version and move the pointer. Returns
    * the committed version number. */
  def write(df: DataFrame, root: String, format: String = "parquet"): Long = {
    val (fs, rootPath) = fsFor(df.sparkSession, root)
    val next = versions(fs, rootPath).lastOption.getOrElse(0L) + 1
    df.write.format(format).save(new Path(rootPath, s"v=$next").toString)
    setCurrent(fs, rootPath, next)
    next
  }

  /** Read the live version, or a pinned one (time travel). */
  def read(spark: SparkSession, root: String, version: Option[Long] = None,
           format: String = "parquet"): DataFrame = {
    val (fs, rootPath) = fsFor(spark, root)
    val v = version.orElse(currentVersion(fs, rootPath)).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $root"))
    val dir = new Path(rootPath, s"v=$v")
    require(fs.exists(dir), s"snapshot v=$v does not exist at $root " +
      s"(have: ${versions(fs, rootPath).mkString(", ")})")
    spark.read.format(format).load(dir.toString)
  }

  /** Roll back (or forward) the live pointer without touching data. */
  def rollback(spark: SparkSession, root: String, version: Long): Unit = {
    val (fs, rootPath) = fsFor(spark, root)
    require(fs.exists(new Path(rootPath, s"v=$version")),
      s"cannot roll back to missing v=$version at $root")
    setCurrent(fs, rootPath, version)
  }

  /** Retire all but the newest `keepLast` versions. The CURRENT
    * version is never deleted even if it is old (after a rollback,
    * the live version may not be the newest). Returns deleted
    * version numbers. */
  def expire(spark: SparkSession, root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val (fs, rootPath) = fsFor(spark, root)
    val all = versions(fs, rootPath)
    val cur = currentVersion(fs, rootPath)
    val victims = all.dropRight(keepLast).filterNot(cur.contains)
    victims.filter(v => fs.delete(new Path(rootPath, s"v=$v"), true))
  }
}
