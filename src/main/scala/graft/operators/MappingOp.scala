package graft.operators

import graft.model.FieldMapping
import graft.types.CastEngine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The "processor" stage: projection + rename + cast + default values +
 * named scalar transformation rules, expressed as one declarative
 * `select` so Catalyst prunes/pushes everything into the scan.
 *
 * Reference semantics re-expressed Spark-first:
 *  - only mapped source columns are read, deduped
 *    (ETLCoreJdbcReader.java:140-143 — here Catalyst's ColumnPruning
 *    does it once the select is declared);
 *  - each mapping emits the value under the destination name
 *    (ETLCoreMappingProcessor.java:60-81);
 *  - order of output columns = mapping order
 *    (ItemWriterFactory.java:119-136);
 *  - `defaultValue` fills nulls (etlModel.java:98-99 — declared
 *    metadata the reference never applied; applied here);
 *  - `transformationRule` applies a named scalar rule
 *    (etlModel.java:100-101: UPPERCASE, TRIM; registry is extensible).
 */
object MappingOp {

  /** Named scalar transformation rules (reference: etlModel.java:100-101).
    * Extensible: callers may pass extra rules. */
  val builtinRules: Map[String, Column => Column] = Map(
    "UPPERCASE"    -> (c => upper(c)),
    "LOWERCASE"    -> (c => lower(c)),
    "TRIM"         -> (c => trim(c)),
    "LTRIM"        -> (c => ltrim(c)),
    "RTRIM"        -> (c => rtrim(c)),
    "CAPITALIZE"   -> (c => initcap(c)),
    "NORMALIZE_WS" -> (c => regexp_replace(trim(c), "\\s+", " "))
  )

  /** Build the destination-typed column for one mapping. */
  def columnFor(m: FieldMapping, extraRules: Map[String, Column => Column] = Map.empty): Column = {
    val rules = builtinRules ++ extraRules
    val src = col(m.sourceFieldName)
    val transformed = m.transformationRule.map(_.trim.toUpperCase) match {
      case Some(r) if r.nonEmpty && r != "NONE" =>
        rules.get(r) match {
          case Some(fn) => fn(src)
          case None =>
            // engine convention for unknown names: pass through WITH a
            // warning (same as unknown cast types and unknown plugins)
            System.err.println(s"[graft] unknown transformationRule '$r' on " +
              s"${m.sourceFieldName}: passing value through")
            src
        }
      case _ => src
    }
    val casted = CastEngine.castTo(transformed, m.destFieldType, m.formatPattern)
    val withDefault = m.defaultValue match {
      case Some(d) =>
        // default fills SOURCE nulls only: a non-null value whose cast
        // failed must STAY null so ErrorPolicy sees it (the reference
        // routes cast failures to the error path, never to defaults)
        when(transformed.isNull,
          CastEngine.castTo(lit(d), m.destFieldType, m.formatPattern)).otherwise(casted)
      case None => casted
    }
    withDefault.as(m.destinationFieldName)
  }

  /** Apply all mappings: one declarative projection, plus an optional
    * pushed-down SQL predicate string applied BEFORE the rename
    * (the reference's `filter` runs at the source — F1,
    * ETLCoreJdbcReader.java:153-156). */
  def apply(df: DataFrame, mappings: Seq[FieldMapping],
            sourceFilter: Option[String] = None,
            extraRules: Map[String, Column => Column] = Map.empty): DataFrame = {
    val filtered = sourceFilter.filter(_.trim.nonEmpty) match {
      case Some(f) => df.filter(expr(f))
      case None    => df
    }
    if (mappings.isEmpty) filtered
    else filtered.select(mappings.map(columnFor(_, extraRules)): _*)
  }
}
