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

  /** Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = Paths.get(dir)
    val parts = listParquet(path)
    val totalBytes = parts.map(Files.size).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = Paths.get(dir + ".compact-tmp")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    val bak = Paths.get(dir + ".compact-bak")
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

  private def listParquet(p: Path): Seq[Path] =
    Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
      .toSeq

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).iterator().asScala.toSeq.reverseIterator
      .foreach(Files.deleteIfExists(_))
}
