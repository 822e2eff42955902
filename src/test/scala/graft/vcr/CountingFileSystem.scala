package graft.vcr

import java.net.URI

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local filesystem that RECORDS every `listStatus` target — the
  * probe the R27 spec uses to prove a scoped manifest refresh's
  * listing cost is O(scope dirs), not O(archive). Registered under the
  * `counting:` scheme via `fs.counting.impl`; paths map 1:1 onto the
  * local disk, so fixtures can be laid down with plain java.nio and
  * read back through the counter.
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "counting"
  override def getUri: URI = URI.create("counting:///")
  override def listStatus(f: Path): Array[FileStatus] = {
    CountingFileSystem.listed.add(f.toUri.getPath)
    if (new java.io.File(f.toUri.getPath).isDirectory)
      CountingFileSystem.listedDirs.add(f.toUri.getPath)
    super.listStatus(f)
  }
}

object CountingFileSystem {
  val listed = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** DIRECTORY enumerations only — `listStatus` on a named file is a
    * stat (O(1), what Spark's file index does per explicit leaf file),
    * not a scan; the scoped-listing contracts care about scans.
    */
  val listedDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def reset(): Unit = { listed.clear(); listedDirs.clear() }

  /** The tape DAY directories (`.../dt=<d>`) listed since reset —
    * manifest-side listings (`_manifest/...`) and root walks are
    * excluded; only payload-partition LISTs count against the scoped
    * contract.
    */
  def dayDirsListed(tapeDir: String): Set[String] =
    listed.asScala.toSet
      .filter(p => p.startsWith(s"$tapeDir/${Tape.DtCol}=") &&
        !p.substring(tapeDir.length + 1).contains("/"))
      .map(_.substring(tapeDir.length + 1))
}
