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
    * After this pass the tree contains no `Not` nodes: negation lives in
    * the leaf operator (NE / NRE).
    */
  private val rangeOps = Set(Op.LT, Op.LE, Op.GT, Op.GE)

  def normalize(e: QExpr): QExpr = {
    def go(e: QExpr, neg: Boolean): QExpr = e match {
      case Not(c)            => go(c, !neg)
      case t @ Term(f, op, l) =>
        // EQ/NE/RE/NRE flip safely: NE/NRE compile to absence (forall)
        // semantics, the exact negation of any-match EQ/RE. Range ops do
        // NOT flip under multi-value any-match — ¬any(v<x) is all(v≥x),
        // not any(v≥x) — so a negated range keeps its Not wrapper and
        // compiles to !exists (the correct forall).
        if (!neg) t
        else if (rangeOps.contains(op)) Not(t)
        else Term(f, Op.negate(op), l)
      case b: BareTerm       => if (neg) Not(b) else b
      case f: FnTerm         => if (neg) Not(f) else f
      case c @ FnCmp(f, op, l) =>
        if (!neg) c
        else if (rangeOps.contains(op)) Not(c) // same forall reasoning
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
    */
  def allNegated(e: QExpr): Boolean = e match {
    case Term(_, op, _) => Op.isNegative(op)
    case And(cs)        => cs.forall(allNegated)
    case Or(cs)         => cs.forall(allNegated)
    case Not(_)         => true
    case _              => false
  }
}
