package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The store family's shared marker-commit primitives — ONE copy of
  * the day-name discipline and the tmp + atomic OVERWRITE-rename
  * publish used by [[IvfStore]] and [[IvfIndex]]'s centroids marker.
  * [[DedupStore]]'s inline marker writes predate this extraction and
  * follow the identical shape (its day-name check now delegates
  * here); a future edit to the commit discipline must keep them in
  * step. */
private[operators] object MarkerProtocol {

  /** Reserved prefix for COMPACTION markers (the [[DedupStore]]
    * protocol, shared by [[IvfStore.compact]] since round 12): a
    * `merged-*` marker commits like a day marker but its CONTENT
    * lists the day names it replaces, so one atomic rename
    * simultaneously commits the merged partition and un-commits the
    * replaced days. */
  val MergedPrefix = "merged-"

  /** The newline-separated day names a marker's content lists. */
  def readMarker(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** (all marker names under `markerDir`, the subset replaced by
    * committed `merged-*` compaction markers). */
  def markerState(fs: org.apache.hadoop.fs.FileSystem,
      markerDir: Path): (Seq[String], Set[String]) =
    if (!fs.exists(markerDir)) (Nil, Set.empty)
    else {
      val names = fs.listStatus(markerDir).toSeq.map(_.getPath.getName)
        .filterNot(_.startsWith("."))
      val replaced = names.filter(_.startsWith(MergedPrefix))
        .flatMap(m => readMarker(fs, new Path(markerDir, m))).toSet
      (names, replaced)
    }

  /** Marker names double as literal `dt=<day>` partition paths and
    * delete targets, so the character set must round-trip untouched
    * through path encoding; dot-led names collide with the tmp
    * convention. */
  def requireDayName(day: String): Unit =
    require(day.nonEmpty && day.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.') && !day.startsWith("."),
      s"day must be [A-Za-z0-9._-]+ and not dot-led, got '$day'")

  /** Publish `dir/name` atomically: write `dir/.name.tmp`, then ONE
    * OVERWRITE rename — readers see the old marker or the new one,
    * never a torn write. Creates `dir` when absent. */
  def atomicMarker(conf: Configuration, dir: Path, name: String,
      content: String = ""): Unit = {
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try if (content.nonEmpty) out.write(content.getBytes("UTF-8"))
    finally out.close()
    FileContext.getFileContext(fs.getUri, conf)
      .rename(fs.makeQualified(tmp), fs.makeQualified(new Path(dir, name)),
        Options.Rename.OVERWRITE): Unit
  }
}
