package graft.dsl

import scala.collection.mutable.ArrayBuffer

/** Token stream for the query DSL.
  *
  * Mirrors `/root/reference/nshmdb/query.py:36-151` with correct labels:
  * the reference tags `&`/`|` as UNARY and `!` as INFIX (query.py:130-137)
  * but consumes the swapped labels consistently; we name them properly.
  */
sealed trait Token
case object LPar extends Token
case object RPar extends Token
case object AndTok extends Token
case object OrTok extends Token
case object NotTok extends Token
final case class AtomTok(name: String) extends Token

object Lexer {
  /** Atom charset from the reference (`query.py:146`): `[a-zA-Z0-9\-_: ]+`.
    * `extraAtomChars` widens it (e.g. "#" for part-brand atoms) — a
    * documented superset of the reference grammar.
    */
  def lex(expression: String, extraAtomChars: String = ""): Vector[Token] = {
    val tokens = ArrayBuffer.empty[Token]
    def isAtomChar(c: Char): Boolean =
      c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == ':' ||
        c == ' ' || extraAtomChars.indexOf(c.toInt) >= 0
    var i = 0
    while (i < expression.length) {
      expression.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '&' => tokens += AndTok; i += 1
        case '|' => tokens += OrTok; i += 1
        case '!' => tokens += NotTok; i += 1
        case '(' => tokens += LPar; i += 1
        case ')' => tokens += RPar; i += 1
        case c if isAtomChar(c) =>
          val start = i
          while (i < expression.length && isAtomChar(expression.charAt(i))) i += 1
          tokens += AtomTok(expression.substring(start, i).trim)
        case _ =>
          throw new QuerySyntaxException(s"Invalid search string $expression")
      }
    }
    tokens.toVector
  }
}
