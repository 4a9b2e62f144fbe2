package graft.dsl

/** AST for the boolean set-inclusion query DSL.
  *
  * Semantics match the reference expression language
  * (`/root/reference/nshmdb/query.py:12-31,154`): atoms name members of a
  * per-group set ("ruptures containing fault X"), combined with `&`, `|`,
  * prefix `!`, and parentheses. Unlike the reference (which crashes on
  * `!(a & b)` — query.py:267-270 — an `isinstance` on a parameterized
  * generic), NOT over any subexpression is supported here.
  */
sealed trait Expr
final case class Atom(name: String) extends Expr
final case class Not(e: Expr) extends Expr
final case class And(l: Expr, r: Expr) extends Expr
final case class Or(l: Expr, r: Expr) extends Expr

/** Raised on any lex or parse failure (≙ ValueError in the reference). */
final class QuerySyntaxException(msg: String) extends IllegalArgumentException(msg)
