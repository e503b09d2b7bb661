package graft.query

/** AST for the JEXL-subset query language the reference accepts
  * (`query/.../parser/QueryParser.java:468-654`): comparisons
  * `== != < <= > >= =~ !~`, boolean `and or not`, parentheses, function
  * calls `f:between(field, lo, hi)` / `f:abs(field)`, and unfielded bare
  * terms (rewritten by the planner, `AbstractQueryLogic.java:601-633`).
  */
sealed trait QExpr

object Op extends Enumeration {
  val EQ, NE, LT, LE, GT, GE, RE, NRE = Value

  /** Operators whose negation is the listed operator (JexlOperatorConstants.java:44-108). */
  def negate(op: Value): Value = op match {
    case EQ => NE; case NE => EQ
    case LT => GE; case GE => LT
    case LE => GT; case GT => LE
    case RE => NRE; case NRE => RE
  }
  def isNegative(op: Value): Boolean = op == NE || op == NRE

  /** LT/LE/GT/GE — range comparisons. Their negation is NOT expressible
    * as another single any-match op under multi-value semantics (see
    * `QExpr.normalize`), so they are shared by the normalizer and the
    * planner's range-fusion pass.
    */
  def isRange(op: Value): Boolean = op == LT || op == LE || op == GT || op == GE
}

/** A fielded comparison leaf, e.g. `TITLE == 'abacus'`. */
case class Term(field: String, op: Op.Value, literal: String) extends QExpr

/** An unfielded bare literal, e.g. `'abacus'` — the planner rewrites it
  * into an OR over the fields where the index finds it.
  */
case class BareTerm(literal: String) extends QExpr

/** `f:between(field, lo, hi)` / `f:abs(field) <op> x` — the reference's
  * JEXL function namespace (`query/.../function/QueryFunctions.java:26-66`).
  */
case class FnTerm(name: String, args: Seq[String]) extends QExpr

/** A function result compared to a literal, e.g. `f:abs(VAL) >= 2`. */
case class FnCmp(fn: FnTerm, op: Op.Value, literal: String) extends QExpr

case class And(children: Seq[QExpr]) extends QExpr
case class Or(children: Seq[QExpr])  extends QExpr
case class Not(child: QExpr)         extends QExpr

object QExpr {

  /** Push NOT down to the leaves (De Morgan), flatten nested AND/OR —
    * the algebra of `FieldIndexQueryReWriter.demorganSubTree:834-866` and
    * `QueryParser`'s negation tracking (`QueryParser.java:684-700`).
    *
    * After this pass, negation lives in the leaf operator (NE/NRE) for
    * equality and regex comparisons — those compile to absence (forall)
    * semantics, the exact negation of any-match. Range comparisons are
    * the exception: ¬any(v < x) is all(v ≥ x), NOT any(v ≥ x), so a
    * negated range keeps its `Not` wrapper (same for negated `FnCmp`)
    * and compiles to `!exists` downstream.
    */
  def normalize(e: QExpr): QExpr = {
    def go(e: QExpr, neg: Boolean): QExpr = e match {
      case Not(c)             => go(c, !neg)
      case t @ Term(f, op, l) =>
        if (!neg) t
        else if (Op.isRange(op)) Not(t)
        else Term(f, Op.negate(op), l)
      case b: BareTerm        => if (neg) Not(b) else b
      case f: FnTerm          => if (neg) Not(f) else f
      case c @ FnCmp(f, op, l) =>
        if (!neg) c
        else if (Op.isRange(op)) Not(c)
        else FnCmp(f, Op.negate(op), l)
      case And(cs) =>
        val mapped = cs.map(go(_, neg))
        if (neg) Or(flattenOr(mapped)) else And(flattenAnd(mapped))
      case Or(cs) =>
        val mapped = cs.map(go(_, neg))
        if (neg) And(flattenAnd(mapped)) else Or(flattenOr(mapped))
    }
    go(e, neg = false)
  }

  private def flattenAnd(cs: Seq[QExpr]): Seq[QExpr] =
    cs.flatMap { case And(inner) => inner; case other => Seq(other) }
  private def flattenOr(cs: Seq[QExpr]): Seq[QExpr] =
    cs.flatMap { case Or(inner) => inner; case other => Seq(other) }

  /** All fielded terms in the tree. */
  def terms(e: QExpr): Seq[Term] = e match {
    case t: Term   => Seq(t)
    case And(cs)   => cs.flatMap(terms)
    case Or(cs)    => cs.flatMap(terms)
    case Not(c)    => terms(c)
    case _         => Nil
  }

  /** True if any OR node exists (drives access-path choice, §4.1). */
  def hasOr(e: QExpr): Boolean = e match {
    case _: Or   => true
    case And(cs) => cs.exists(hasOr)
    case Not(c)  => hasOr(c)
    case _       => false
  }

  /** A query that is negations-only is invalid
    * (`FieldIndexQueryReWriter.removeNegationViolations:694+`).
    * A `Not`-wrapped RANGE comparison is not a negation in this sense —
    * it is a bounded assertion the engine can evaluate by full scan (the
    * reference accepts it by flipping the operator); only absence-style
    * negations (NE/NRE, negated equality trees) count.
    */
  def allNegated(e: QExpr): Boolean = e match {
    case Term(_, op, _)                            => Op.isNegative(op)
    case And(cs)                                   => cs.forall(allNegated)
    case Or(cs)                                    => cs.forall(allNegated)
    case Not(Term(_, op, _)) if Op.isRange(op)     => false
    case Not(FnCmp(_, op, _)) if Op.isRange(op)    => false
    case Not(_)                                    => true
    case _                                         => false
  }
}
