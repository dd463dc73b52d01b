package graft.sources.readstat

import org.apache.spark.sql.types._

/** Informative nulls (SURVEY.md §2.2 P7; reference `src/lib.rs:62-115`):
  * user-defined missing codes (SAS `.A`–`.Z`/`._`, Stata `.a`–`.z`, SPSS
  * discrete/range missings) surface as a string indicator next to the null.
  *
  * Modes: `separate` adds a `<col><suffix>` String column after each
  * tracked column; `struct` replaces the column with
  * Struct{value, null_indicator}; `merged` replaces it with
  * coalesce(value-as-string, indicator). System missing stays a plain
  * null with no indicator in every mode.
  */
object InformativeNulls {

  sealed trait Mode
  case object Separate extends Mode
  case object Struct extends Mode
  case object Merged extends Mode

  def parseMode(s: String): Mode = s.toLowerCase match {
    case "separate" => Separate
    case "struct" => Struct
    case "merged" => Merged
    case other => throw new IllegalArgumentException(
      s"informativeNulls must be separate|struct|merged, got '$other'")
  }

  /** How one source column materializes in the output schema. */
  sealed trait Role
  /** plain value (possibly with a sibling indicator column) */
  case object RValue extends Role
  /** the `<col><suffix>` indicator column of a tracked column */
  case object RIndicator extends Role
  /** Struct{value, null_indicator} */
  case object RStruct extends Role
  /** merged string */
  case object RMerged extends Role

  def structTypeFor(valueType: DataType): StructType =
    StructType(Seq(
      StructField("value", valueType, nullable = true),
      StructField("null_indicator", StringType, nullable = true)))

  /** Expand one eligible source field per the mode. Returns (field, role)
    * pairs in output order.
    */
  def expand(
      field: StructField,
      eligible: Boolean,
      mode: Option[Mode],
      suffix: String): Seq[(StructField, Role)] = mode match {
    case None => Seq((field, RValue))
    case Some(_) if !eligible => Seq((field, RValue))
    case Some(Separate) => Seq(
      (field, RValue),
      (StructField(field.name + suffix, StringType, nullable = true), RIndicator))
    case Some(Struct) => Seq(
      (field.copy(dataType = structTypeFor(field.dataType)), RStruct))
    case Some(Merged) => Seq(
      (field.copy(dataType = StringType), RMerged))
  }
}
