package graft.nshm

import graft.nshm.Ingest.Solution
import org.apache.spark.sql.SparkSession

/** Branch-archive resolution shim completing the
  * `download_composite_solution` shape end-to-end
  * (≙ /root/reference/nshmdb/api.py:41-176,595-622) with the network
  * fetch swapped for pluggable local resolution. The HTTP/GraphQL client
  * itself is deliberately out of engine scope (SURVEY §2.1): fetching is
  * driver-side glue, not a distributed source — what the engine owns is
  * everything AFTER the bytes exist. A provider answers the one question
  * the API answers: for a model version, which weighted branch archives
  * make up each fault-system group?
  */
trait SolutionProvider {

  /** Grouped (weight, zip-path) branch lists keyed by branch-set short
    * name (≙ `_get_grouped_source_ids`, api.py:41-113: the GraphQL
    * logic-tree walk that yields `dict[short_name, list[(weight, id)]]`,
    * with inversion ids already resolved to local archive paths).
    * Duplicate archive paths within a group keep the first weight, as
    * the reference's `seen_ids` dedup does (api.py:100-110).
    */
  def groupedSources(version: SemVer): Map[String, Seq[(Double, String)]]
}

/** Manifest-file provider: one line per branch, `group,weight,zip-path`
  * (blank lines and `#` comments ignored; an optional header line is
  * detected by a non-numeric weight field). The manifest is the local
  * stand-in for the logic-tree API response.
  */
final class ManifestSolutionProvider(manifestPath: String) extends SolutionProvider {
  override def groupedSources(version: SemVer): Map[String, Seq[(Double, String)]] = {
    val src = scala.io.Source.fromFile(manifestPath)
    val lines =
      try src.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      finally src.close()
    val parsed = lines.flatMap { line =>
      line.split(",", 3) match {
        case Array(group, weight, path) if weight.trim.toDoubleOption.isDefined =>
          Some((group.trim, weight.trim.toDouble, path.trim))
        case _ => None // header or malformed line
      }
    }
    // first-seen weight wins per (group, path), reference's seen_ids dedup
    val grouped = parsed
      .groupBy(_._1)
      .view
      .mapValues { branches =>
        val seen = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        branches.foreach { case (_, w, p) => if (!seen.contains(p)) seen(p) = w }
        seen.toSeq.map { case (p, w) => (w, p) }
      }
      .toMap
    grouped
  }
}

object SolutionProvider {

  /** ≙ `download_composite_solution` (api.py:595-622) minus the fetch:
    * resolve the version's grouped branches, weighted-merge each
    * non-empty group (`Ingest.mergeSolutionZips` ≙ `_merge_branches`),
    * and return the per-system solutions ready for
    * `Ingest.loadComposite` (≙ `_stack_fault_systems` + the generator's
    * insert loop). Group order follows the manifest for deterministic
    * surrogate-id allocation.
    */
  def downloadCompositeSolution(
      spark: SparkSession,
      provider: SolutionProvider,
      version: SemVer): Seq[Solution] = {
    val grouped = provider.groupedSources(version)
    grouped.toSeq.sortBy(_._1).collect {
      case (_, branches) if branches.nonEmpty =>
        Ingest.mergeSolutionZips(spark, branches)
    }
  }
}
