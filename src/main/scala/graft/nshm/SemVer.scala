package graft.nshm

/** Semantic-version parse/compare (≙ the generator CLI's version check,
  * /root/reference/nshmdb/scripts/nshm_db_generator.py:21-46).
  */
final case class SemVer(major: Int, minor: Int, patch: Int) extends Ordered[SemVer] {
  override def compare(that: SemVer): Int =
    Ordering[(Int, Int, Int)].compare((major, minor, patch), (that.major, that.minor, that.patch))
  override def toString: String = s"$major.$minor.$patch"
}

object SemVer {
  def parse(s: String): SemVer = s.split('.') match {
    // "major.minor" is accepted with patch 0, exactly like the reference
    // generator's _parse_version (nshm_db_generator.py:41-46)
    case Array(a, b) if Seq(a, b).forall(p => p.nonEmpty && p.forall(_.isDigit)) =>
      SemVer(a.toInt, b.toInt, 0)
    case Array(a, b, c) if Seq(a, b, c).forall(p => p.nonEmpty && p.forall(_.isDigit)) =>
      SemVer(a.toInt, b.toInt, c.toInt)
    case _ => throw new IllegalArgumentException(s"Invalid version string: $s")
  }
}
