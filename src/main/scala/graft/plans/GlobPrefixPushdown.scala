package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: glob filters compile to anchored regexes
  * (`key RLIKE '^data/year=2024/…'`) — and `RLike` never reaches the
  * parquet scan, so a glob query reads every row. But the compiled
  * regexes usually start with a LITERAL run, and `StartsWith` DOES push
  * down (`StringStartsWith` → parquet row-group min/max skipping).
  *
  * The rule conjoins a redundant-but-pushable prefix predicate:
  *   key RLIKE '^data/year=2024/.*'  ⇒
  *   StartsWith(key, 'data/year=2024/') AND key RLIKE …
  *
  * Semantics unchanged (the prefix is implied by the regex); scans over
  * materialized manifest tables skip row groups whose key range can't
  * contain the prefix — at a 10⁸-key listing that's the difference
  * between a full scan and touching a few files.
  *
  * Installed by [[GraftExtensions]] via `SparkSessionExtensions`
  * (`spark.sql.extensions=graft.plans.GraftExtensions` on any cluster).
  */
object GlobPrefixPushdown extends Rule[LogicalPlan] {

  /** longest literal prefix implied by an anchored Java/RE2 regex, or
    * None when the regex can't guarantee one (unanchored, top-level
    * alternation before any literal, leading metachar...).
    */
  private[graft] def literalPrefix(regex: String): Option[String] = {
    if (!regex.startsWith("^")) return None
    var body = regex.drop(1)
    // unwrap a single all-enclosing non-capturing group: ^(?:BODY)$
    if (body.startsWith("(?:") && body.endsWith(")$") && groupCloses(body.drop(3).dropRight(2)))
      body = body.drop(3).dropRight(2)
    else if (body.endsWith("$")) body = body.dropRight(1)
    if (topLevelAlternation(body)) return None
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        val n = body.charAt(i + 1)
        // escaped literal metachar is a literal; \d etc. is not
        if ("\\.^$+()|[]{}*?".indexOf(n) >= 0) { sb.append(n); i += 2 }
        else i = body.length
      } else if ("[](){}.*+?|^$".indexOf(c) >= 0) {
        // a quantifier after the last literal makes it optional — drop it
        if ((c == '*' || c == '?' || c == '{') && sb.nonEmpty) sb.setLength(sb.length - 1)
        i = body.length
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString).filter(_.nonEmpty)
  }

  /** does this group body close only at its very end (single group)? */
  private def groupCloses(inner: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < inner.length) {
      inner.charAt(i) match {
        case '\\' => i += 1
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth < 0) return false
        case _ =>
      }
      i += 1
    }
    depth == 0
  }

  private def topLevelAlternation(body: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '\\' => i += 1
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case '|' if depth == 0 => return true
        case _ =>
      }
      i += 1
    }
    false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      // fixpoint guard: remember prefixes already conjoined
      val existing = cond.collect {
        case StartsWith(a: Attribute, Literal(p: UTF8String, StringType)) =>
          (a.exprId, p.toString)
      }.toSet
      val newCond = cond.transformUp {
        case r @ RLike(attr: Attribute, Literal(re: UTF8String, StringType)) =>
          literalPrefix(re.toString) match {
            case Some(p) if p.length >= 2 && !existing.contains((attr.exprId, p)) =>
              And(StartsWith(attr, Literal(UTF8String.fromString(p), StringType)), r)
            case _ => r
          }
      }
      if (newCond fastEquals cond) f else f.copy(condition = newCond)
  }
}

/** `SparkSessionExtensions` installer — usable as
  * `spark.sql.extensions=graft.plans.GraftExtensions` on any cluster;
  * GraftSession wires it in for local sessions. Installs the optimizer
  * rule AND registers every `graft_*` kernel expression in the
  * session-independent function registry, so a SQL-only client (Thrift
  * / connect / `spark.sql` text) can call `graft_minhash(...)`,
  * `graft_cosine(...)` etc. without ever importing the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GlobPrefixPushdown)
    graft.expressions.GraftFunctions.injectable.foreach(ext.injectFunction)
  }
}
