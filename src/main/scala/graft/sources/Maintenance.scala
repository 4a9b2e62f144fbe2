package graft.sources

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Parquet-directory maintenance for long-lived tables: small-file
  * compaction. Streaming sinks and per-batch appends accumulate files
  * far below the ideal scan granularity; at cluster scale every file
  * costs a task plus footer/open overhead, so a 10k-file table of 1 MB
  * parts scans an order of magnitude slower than the same bytes in
  * 128 MB parts.
  *
  * `compact` rewrites a directory to ~`targetBytes` files by
  * re-reading and re-writing with a computed partition count, staging
  * into a sibling `<dir>.compact-tmp` and swapping via rename. The
  * local-FS rename is the test harness's atomicity stand-in — on an
  * object store the same flow writes a new prefix and flips a catalog
  * pointer (no in-place rename exists there), which is exactly how
  * table formats (Delta/Iceberg) commit compactions.
  */
object Maintenance {

  /** Returns (filesBefore, filesAfter). Self-healing on re-entry:
    * stale tmp/bak from a crashed prior run are recovered (a stranded
    * bak with no live dir is moved back) or cleared before starting.
    * The window between the two renames can still strand the live dir
    * at `<dir>.compact-bak` if the process dies exactly there — the
    * next call recovers it; readers in that window fail, which is the
    * local-FS approximation of a table-format commit (object stores
    * flip a catalog pointer instead and have no such window).
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = Paths.get(dir)
    val tmp = Paths.get(dir + ".compact-tmp")
    val bak = Paths.get(dir + ".compact-bak")
    // recover/clear leftovers from a crashed prior run
    if (Files.exists(bak)) {
      if (!Files.exists(path)) Files.move(bak, path, StandardCopyOption.ATOMIC_MOVE)
      else deleteRecursively(bak)
    }
    if (Files.exists(tmp)) deleteRecursively(tmp)

    val parts = listParquet(path)
    val totalBytes = parts.map(Files.size).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    // mergeSchema: append/streaming dirs are exactly where later batches
    // add columns — a single-file inferred schema would silently drop them
    spark.read.option("mergeSchema", "true").parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    Files.move(path, bak, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        Files.move(bak, path, StandardCopyOption.ATOMIC_MOVE) // roll back
        throw e
    }
    deleteRecursively(bak)
    (parts.length, listParquet(path).length)
  }

  private def withWalk[A](p: Path)(f: Iterator[Path] => A): A = {
    val stream = Files.walk(p)
    try f(stream.iterator().asScala) finally stream.close()
  }

  private def listParquet(p: Path): Seq[Path] =
    withWalk(p)(_.filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f)).toSeq)

  private def deleteRecursively(p: Path): Unit =
    withWalk(p)(_.toSeq).reverseIterator.foreach(Files.deleteIfExists(_))
}
