package graft

import graft.dsl._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the Pratt parser (SURVEY §5: the reference has
  * none — random well-formed expressions must round-trip). Generators are
  * driven directly with a fixed seed for reproducibility.
  */
class DslPropertySpec extends AnyFunSuite {

  private val genAtom: Gen[Expr] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)).map(Atom(_))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) genAtom
    else Gen.frequency(
      3 -> genAtom,
      2 -> Gen.lzy(for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield And(l, r)),
      2 -> Gen.lzy(for { l <- genExpr(depth - 1); r <- genExpr(depth - 1) } yield Or(l, r)),
      1 -> Gen.lzy(genExpr(depth - 1).map(Not(_))))

  private def samples(n: Int): Seq[Expr] = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val e = genExpr(4).pureApply(params, seed)
      seed = seed.next
      e
    }
  }

  /** Fully parenthesized rendering — parsing must reproduce the tree. */
  private def render(e: Expr): String = e match {
    case Atom(n) => n
    case Not(x) => s"!(${render(x)})"
    case And(l, r) => s"(${render(l)}) & (${render(r)})"
    case Or(l, r) => s"(${render(l)}) | (${render(r)})"
  }

  /** Minimally parenthesized precedence-aware rendering (! > & > |,
    * left-assoc) — parsing must still reproduce the tree.
    */
  private def renderMin(e: Expr, parentBp: Int = 0): String = {
    val (s, bp) = e match {
      case Atom(n) => (n, 10)
      case Not(x) => (s"!${renderMin(x, 5)}", 5)
      case And(l, r) => (s"${renderMin(l, 3)} & ${renderMin(r, 4)}", 3)
      case Or(l, r) => (s"${renderMin(l, 1)} | ${renderMin(r, 2)}", 1)
    }
    if (bp < parentBp) s"($s)" else s
  }

  test("parse inverts fully-parenthesized rendering (500 random trees)") {
    samples(500).foreach { e =>
      assert(Parser.parse(render(e)) === e, s"input: ${render(e)}")
    }
  }

  test("parse inverts precedence-aware minimal rendering (500 random trees)") {
    samples(500).foreach { e =>
      assert(Parser.parse(renderMin(e)) === e, s"input: ${renderMin(e)}")
    }
  }

  test("F1 ceilingWithClamp equals the linear-scan specification (1000 random cases)") {
    val params = Gen.Parameters.default
    var seed = Seed(7L)
    val genCase = for {
      n <- Gen.chooseNum(1, 20)
      xs <- Gen.listOfN(n, Gen.chooseNum(0, 1000).map(_ / 10.0))
      t <- Gen.chooseNum(-10, 1100).map(_ / 10.0)
    } yield (xs.distinct.sorted.toArray, t)
    (1 to 1000).foreach { _ =>
      val (sorted, target) = genCase.pureApply(params, seed)
      seed = seed.next
      val got = graft.nshm.NshmDb.ceilingWithClamp(sorted, target)
      val spec = sorted.find(_ >= target).getOrElse(sorted.last)
      assert(got === spec, s"sorted=${sorted.mkString(",")} target=$target")
    }
  }

  test("atom collection order equals left-to-right occurrence") {
    def walk(x: Expr): Seq[String] = x match {
      case Atom(n) => Seq(n)
      case Not(y) => walk(y)
      case And(l, r) => walk(l) ++ walk(r)
      case Or(l, r) => walk(l) ++ walk(r)
    }
    samples(200).foreach { e =>
      assert(BoolSetCompiler.atoms(e) === walk(e).distinct)
    }
  }
}
