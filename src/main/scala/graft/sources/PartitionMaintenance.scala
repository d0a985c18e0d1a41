package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** The other half of dynamic-partition-overwrite repack. Dynamic
  * overwrite can only REWRITE partitions present in the replacement
  * frame — a partition whose rows all died (a posting list emptied by
  * tombstones, a shard group fully dropped from a release) is silently
  * left on disk, and every later reader re-ingests the dead rows. The
  * reconcile step is an explicit directory drop keyed by the surviving
  * partition values; on an object store the same step is a manifest
  * entry removal. Kept separate from the write so the caller decides the
  * transaction order (drop-then-write leaves a gap a concurrent reader
  * could see; write-then-drop is the safe order used by q_ivf_maintain).
  */
object PartitionMaintenance {

  /** Delete `column=value` partition dirs under `dir` whose value is NOT
    * in `live`. Returns the dropped partition values (sorted) — the audit
    * trail a maintenance job logs. Non-partition files and unrelated
    * directories are untouched.
    */
  def dropDeadPartitions(dir: String, column: String,
                         live: Set[String]): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val prefix = column + "="
    val stream = Files.list(root)
    val dead =
      try stream.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(prefix) &&
          !live.contains(p.getFileName.toString.stripPrefix(prefix)))
        .toList
      finally stream.close()
    dead.foreach(rm)
    dead.map(_.getFileName.toString.stripPrefix(prefix)).sorted
  }

  /** VACUUM for a two-level copy-on-write layout
    * (`outer=v/inner=w/...files`): delete every inner leaf dir whose
    * (v, w) pair the snapshot manifest no longer references, then drop
    * outer dirs left empty. Returns the deleted leaf dirs as
    * `outer=v/inner=w` strings (sorted) — the audit trail. This is the
    * retention step of a snapshot table: epoch-N rewrites land as NEW
    * inner dirs next to epoch-N−1's (readers pinned to the old snapshot
    * keep working), and vacuum reclaims superseded epochs once the
    * retention window closes. On an object store the same step is a
    * manifest-driven batch delete.
    */
  def vacuumSuperseded(dir: String, outerCol: String, innerCol: String,
                       live: Set[(String, String)]): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val oPre = outerCol + "="
    val iPre = innerCol + "="
    def list(p: Path, pre: String): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(q => Files.isDirectory(q) && q.getFileName.toString.startsWith(pre))
        .toList
      finally s.close()
    }
    val dead = for {
      o <- list(root, oPre)
      i <- list(o, iPre)
      ov = o.getFileName.toString.stripPrefix(oPre)
      iv = i.getFileName.toString.stripPrefix(iPre)
      if !live.contains((ov, iv))
    } yield (i, s"$oPre$ov/$iPre$iv")
    dead.foreach { case (p, _) => rm(p) }
    // an outer dir whose inner epochs all died is itself dead — but only
    // when TRULY empty: a stray non-partition entry (a _SUCCESS marker, a
    // manifest, an operator's note) must survive the vacuum, never be
    // silently swept outside the audit trail (ADVICE r15)
    list(root, oPre).foreach { o =>
      if (isEmptyDir(o)) Files.delete(o)
    }
    dead.map(_._2).sorted
  }

  private def isEmptyDir(p: Path): Boolean = {
    val s = Files.list(p)
    try !s.iterator().hasNext finally s.close()
  }

  private def rm(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(rm) finally s.close()
    }
    Files.delete(p)
  }
}
