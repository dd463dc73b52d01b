package graft.sources.readstat.sas

import java.io.PrintWriter
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** SAS "sink" (SURVEY.md §2.1 S10): CSV + a generated `.sas` load script —
  * the reference's SAS writer does exactly this, it does NOT write sas7bdat
  * (`src/sas/writer.rs:30-106`). PROC FORMAT value labels and LABEL
  * statements included.
  */
object SasScriptWriter {

  def write(
      df: DataFrame,
      csvPath: String,
      sasPath: String,
      datasetName: String = "graft_out",
      valueLabels: Map[String, Map[Int, String]] = Map.empty,
      variableLabels: Map[String, String] = Map.empty): Unit = {
    // CSV via the driver (single-file contract like the other sinks)
    val pw = new PrintWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(csvPath), StandardCharsets.UTF_8))
    try {
      pw.println(df.columns.mkString(","))
      import scala.jdk.CollectionConverters._
      df.toLocalIterator().asScala.foreach { row =>
        pw.println(df.columns.indices.map { i =>
          if (row.isNullAt(i)) ""
          else {
            val s = row.get(i).toString
            if (s.contains(",") || s.contains("\"") || s.contains("\n"))
              "\"" + s.replace("\"", "\"\"") + "\""
            else s
          }
        }.mkString(","))
      }
    } finally pw.close()

    val sw = new PrintWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(sasPath), StandardCharsets.UTF_8))
    try {
      if (valueLabels.nonEmpty) {
        sw.println("proc format;")
        valueLabels.foreach { case (colName, mapping) =>
          sw.println(s"  value ${fmtName(colName)}")
          mapping.toSeq.sortBy(_._1).foreach { case (v, label) =>
            sw.println(s"    $v = \"${esc(label)}\"")
          }
          sw.println("  ;")
        }
        sw.println("run;")
        sw.println()
      }
      sw.println(s"data $datasetName;")
      sw.println(s"  infile \"${esc(csvPath)}\" dsd firstobs=2 truncover encoding=\"utf-8\";")
      val inputs = df.schema.fields.map { f =>
        f.dataType match {
          case StringType => s"${f.name} :$$256."
          case DateType => s"${f.name} :yymmdd10."
          case TimestampNTZType | TimestampType => s"${f.name} :anydtdtm."
          case _ => f.name
        }
      }
      sw.println(s"  input ${inputs.mkString(" ")};")
      df.schema.fields.foreach { f =>
        f.dataType match {
          case DateType => sw.println(s"  format ${f.name} date9.;")
          case TimestampNTZType | TimestampType => sw.println(s"  format ${f.name} datetime20.;")
          case _ =>
        }
      }
      valueLabels.keys.foreach(c => sw.println(s"  format $c ${fmtName(c)}.;"))
      if (variableLabels.nonEmpty) {
        sw.println("  label")
        variableLabels.foreach { case (c, l) => sw.println(s"    $c = \"${esc(l)}\"") }
        sw.println("  ;")
      }
      sw.println("run;")
    } finally sw.close()
  }

  private def fmtName(col: String): String = {
    val base = col.replaceAll("[^A-Za-z0-9_]", "_").take(24)
    val named = if (base.nonEmpty && base.head.isDigit) "f" + base else base
    named + "_f"
  }
  private def esc(s: String): String = s.replace("\"", "\"\"")
}
