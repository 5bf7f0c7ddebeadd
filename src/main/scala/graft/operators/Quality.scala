package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality rules over one scan — the reference's
 * VALIDATE_SOURCE step (CoreLibInterfaces.java step enum; row-count
 * check at JobRunner parity) grown into the rule engine an ingest
 * pipeline actually runs before loading: null-fraction ceilings,
 * uniqueness, value-range and regex-conformance floors, row-count
 * bounds. Public prior art: AWS Deequ's constraint model (metrics
 * computed as one Spark aggregation, verdicts from thresholds).
 *
 * Scale design: ALL rules compile into a single `agg(...)` pass —
 * one scan of the table however many rules are declared (counts,
 * conditional counts and exact distincts are Spark aggregates with
 * map-side partials). The verdict table is |rules| rows of metadata.
 * Fractions are ratios of exact integer counts (cross-engine
 * deterministic — the oracle recomputes them bit-identically).
 *
 * Output: (rule, col_name, metric, threshold, passed) — one row per
 * rule; `metric` is the measured value the threshold was applied to.
 */
object Quality {

  sealed trait Rule
  /** Fraction of NULL values must be <= maxNullFrac (0.0 = NOT NULL). */
  final case class NotNull(column: String, maxNullFrac: Double = 0.0) extends Rule
  /** Non-null values must be pairwise distinct (metric = nd/nn). */
  final case class Unique(column: String) extends Rule
  /** Fraction of non-null values inside [lo, hi] must be >= minFrac. */
  final case class InRange(column: String, lo: Double, hi: Double,
                           minFrac: Double = 1.0) extends Rule
  /** Fraction of non-null values matching `pattern` must be >= minFrac.
    * Keep patterns to the portable core (anchors, classes, +*?) — the
    * engine uses Java regex; an oracle engine may use RE2. */
  final case class MatchesRegex(column: String, pattern: String,
                                minFrac: Double = 1.0) extends Rule
  /** Total row count must lie in [lo, hi]. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Rule

  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = scala.collection.mutable.ArrayBuffer[Column](count(lit(1)).as("_n"))
    rules.zipWithIndex.foreach { case (r, i) =>
      r match {
        case NotNull(c, _) =>
          aggs += count(col(c)).as(s"_nn_$i")
        case Unique(c) =>
          aggs += countDistinct(col(c)).as(s"_nd_$i")
          aggs += count(col(c)).as(s"_nn_$i")
        case InRange(c, lo, hi, _) =>
          aggs += count(when(col(c).between(lo, hi), 1)).as(s"_ok_$i")
          aggs += count(col(c)).as(s"_nn_$i")
        case MatchesRegex(c, p, _) =>
          aggs += count(when(col(c).rlike(p), 1)).as(s"_ok_$i")
          aggs += count(col(c)).as(s"_nn_$i")
        case RowCountBetween(_, _) => () // _n suffices
      }
    }
    val one = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val rows: Seq[Column] = rules.zipWithIndex.map { case (r, i) =>
      def frac(num: Column, den: Column, emptyValue: Double): Column =
        when(den === 0, lit(emptyValue)).otherwise(num / den)
      val (name, colName, metric, threshold, passed) = r match {
        case NotNull(c, maxF) =>
          val m = frac(col("_n") - col(s"_nn_$i"), col("_n"), 0.0)
          ("not_null", c, m, lit(maxF), m <= maxF)
        case Unique(c) =>
          val m = frac(col(s"_nd_$i"), col(s"_nn_$i"), 1.0)
          ("unique", c, m, lit(1.0), col(s"_nd_$i") === col(s"_nn_$i"))
        case InRange(c, _, _, minF) =>
          val m = frac(col(s"_ok_$i"), col(s"_nn_$i"), 1.0)
          ("in_range", c, m, lit(minF), m >= minF)
        case MatchesRegex(c, _, minF) =>
          val m = frac(col(s"_ok_$i"), col(s"_nn_$i"), 1.0)
          ("regex", c, m, lit(minF), m >= minF)
        case RowCountBetween(lo, hi) =>
          ("row_count", "*", col("_n").cast("double"), lit(hi.toDouble),
            col("_n") >= lo && col("_n") <= hi)
      }
      struct(lit(name).as("rule"), lit(colName).as("col_name"),
        metric.cast("double").as("metric"), threshold.cast("double").as("threshold"),
        passed.as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** True iff every rule passed — the gate a LOAD step calls before
    * writing (FAIL_JOB semantics belong to the caller's policy). */
  def allPass(df: DataFrame, rules: Seq[Rule]): Boolean =
    check(df, rules).filter(!col("passed")).isEmpty

  /**
   * Conservative recognizer for the PORTABLE regex core promised by
   * [[MatchesRegex]]'s contract — the constructs with identical
   * semantics in Java regex (this engine's `rlike`) and RE2-family
   * engines (the oracle engines a rule's metric may be recomputed
   * on): literal characters, escaped metacharacters, class shorthands
   * `\d \D \w \W \s \S`, `.`, anchors `^ $`, character classes
   * (ranges, negation, shorthands — NO unescaped `[` inside a class
   * at all: Java reads `[a[b]c]` as a nested class union, RE2 as a
   * literal, and `[a&&[b]]` / `[[:alpha:]]` are each single-engine),
   * groups (capturing or `(?:…)`), alternation, and greedy/lazy quantifiers
   * `* + ? {m} {m,} {m,n}`. Rejected because they differ or don't
   * exist across engines: possessive quantifiers (`*+`),
   * backreferences (`\1`), lookaround (`(?= (?! (?<= (?<!`), atomic
   * groups (`(?>`), inline flags (`(?i)`), `\b \B` word boundaries
   * and `\p{…}` property classes (unicode behavior diverges).
   * Lenient about plain INVALIDITY — `Pattern.compile` owns that;
   * this answers only "will every engine read it the same way".
   *
   * Known residual edge (accepted, documented): on inputs containing
   * line terminators, Java's `$` matches before a FINAL `\n` where
   * RE2's matches only end-of-text, and Java's `.` excludes
   * `\r`, `\u0085`, `\u2028`, `\u2029` where RE2's excludes only `\n`.
   * Rejecting `$`/`.` outright would gut the recognizer; rules over
   * corpora with embedded line terminators should anchor on classes
   * (`[^\n]`, explicit terminators) instead.
   */
  def portablePattern(p: String): Boolean = {
    val escapable = "dDwWsS\\^$.|?*+()[]{}/-"
    var i = 0
    var depth = 0
    var ok = true
    while (i < p.length && ok) {
      p(i) match {
        case '\\' =>
          if (i + 1 >= p.length || !escapable.contains(p(i + 1))) ok = false
          else i += 1
        case '(' =>
          depth += 1
          if (i + 1 < p.length && p(i + 1) == '?') {
            if (i + 2 < p.length && p(i + 2) == ':') i += 2 else ok = false
          }
        case ')' =>
          depth -= 1
          if (depth < 0) ok = false
        case '[' =>
          var j = i + 1
          if (j < p.length && p(j) == '^') j += 1
          if (j < p.length && p(j) == ']') j += 1 // leading ] is literal
          var closed = false
          while (j < p.length && !closed && ok) {
            p(j) match {
              case '\\' =>
                if (j + 1 >= p.length || !escapable.contains(p(j + 1))) ok = false
                else j += 2
              case ']' => closed = true
              // an unescaped '[' inside a class is a nested class
              // union in Java ([a[b]c] = {a,b,c}) but a literal in
              // RE2 — and [:alpha:] is RE2-only POSIX. Both diverge;
              // reject any unescaped '[' in a class.
              case '[' => ok = false
              case '&' => // [a&&[b]] intersection — Java-only
                if (j + 1 < p.length && p(j + 1) == '&') ok = false else j += 1
              case _ => j += 1
            }
          }
          if (closed) i = j else ok = false
        case '{' =>
          val close = p.indexOf('}', i)
          if (close < 0 || !p.substring(i + 1, close).matches("\\d+(,\\d*)?"))
            ok = false
          else {
            i = close
            // lazy / possessive modifier after {m,n}
            if (i + 1 < p.length && p(i + 1) == '+') ok = false
            else if (i + 1 < p.length && p(i + 1) == '?') i += 1
          }
        case '*' | '+' | '?' =>
          if (i + 1 < p.length && p(i + 1) == '+') ok = false // possessive
          else if (i + 1 < p.length && p(i + 1) == '?') i += 1 // lazy
        case _ => ()
      }
      i += 1
    }
    ok && depth == 0
  }

  /**
   * Compact config DSL for job-config rule declarations
   * (`transformation.parameters.qualityRules`), `;`-separated:
   *
   *   not_null:col[,maxNullFrac] | unique:col |
   *   in_range:col,lo,hi[,minFrac] | regex:col,minFrac,pattern |
   *   row_count:lo,hi
   *
   * The regex pattern is the greedy remainder (commas allowed inside;
   * `;` is not — declare such patterns via the Scala API).
   */
  def parseRules(spec: String): Seq[Rule] =
    spec.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
      val (kind, args) = s.split(":", 2) match {
        case Array(k, a) => (k.trim.toLowerCase, a.trim)
        case _ => throw new IllegalArgumentException(s"quality rule needs kind:args — got '$s'")
      }
      kind match {
        case "not_null" => args.split(",") match {
          case Array(c)    => NotNull(c.trim)
          case Array(c, f) => NotNull(c.trim, f.trim.toDouble)
          case _ => throw new IllegalArgumentException(s"not_null:col[,maxNullFrac] — got '$args'")
        }
        case "unique" => Unique(args)
        case "in_range" => args.split(",") match {
          case Array(c, lo, hi)    => InRange(c.trim, lo.trim.toDouble, hi.trim.toDouble)
          case Array(c, lo, hi, f) => InRange(c.trim, lo.trim.toDouble, hi.trim.toDouble, f.trim.toDouble)
          case _ => throw new IllegalArgumentException(s"in_range:col,lo,hi[,minFrac] — got '$args'")
        }
        case "regex" => args.split(",", 3) match {
          // every other field is trimmed; full-trimming the pattern
          // would corrupt patterns with significant edge whitespace,
          // so strip only ONE cosmetic space after the comma —
          // 'regex:col, 0.9, ^[A-Z]+$' and the unspaced form parse
          // identically, and '  foo' keeps its remaining spaces
          case Array(c, f, p) =>
            val pattern = p.stripPrefix(" ")
            // DSL-declared rules are the config-driven path whose
            // metrics get recomputed on other engines — surface (but
            // don't reject: Java-only use is legitimate when the
            // caller owns both sides) a pattern outside the portable
            // Java∩RE2 core
            if (!portablePattern(pattern))
              System.err.println(s"[graft-quality] WARNING: regex rule pattern " +
                s"'$pattern' uses constructs outside the portable Java/RE2 core — " +
                "cross-engine metric recomputation may diverge")
            MatchesRegex(c.trim, pattern, f.trim.toDouble)
          case _ => throw new IllegalArgumentException(s"regex:col,minFrac,pattern — got '$args'")
        }
        case "row_count" => args.split(",") match {
          case Array(lo, hi) => RowCountBetween(lo.trim.toLong, hi.trim.toLong)
          case _ => throw new IllegalArgumentException(s"row_count:lo,hi — got '$args'")
        }
        case other => throw new IllegalArgumentException(s"unknown quality rule kind: $other")
      }
    }
}
