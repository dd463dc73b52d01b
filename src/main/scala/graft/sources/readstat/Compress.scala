package graft.sources.readstat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Post-read type narrowing ("compress", SURVEY.md §2.4 A1/A2 + §2.8 F9;
  * reference `compress_df` `src/stata/compress.rs:82-142`).
  *
  * One distributed aggregation computes min/max/integer-ness/midnight-ness
  * for every candidate column (partial aggregation map-side — a single
  * narrow pass over the data), then a single projection applies the casts.
  * This is a library function over DataFrames, not engine work: Catalyst
  * already fuses the stats pass and the cast pass each into one stage.
  */
object Compress {

  final case class CompressOptions(
      cols: Option[Seq[String]] = None,
      numeric: Boolean = true,
      datetimeToDate: Boolean = true,
      stringToNumeric: Boolean = false,
      /** Reserve Stata missing sentinels (±0x64/0x7fe4/0x7fffffe4) instead
        * of full two's-complement bounds (`src/stata/compress.rs:6-19`).
        */
      stataBounds: Boolean = true)

  private case class Bounds(i8Max: Long, i16Max: Long, i32Max: Long)

  def compressDf(df: DataFrame, opts: CompressOptions = CompressOptions()): DataFrame = {
    val wanted: Set[String] = opts.cols.map(_.toSet).getOrElse(df.columns.toSet)
    val b =
      if (opts.stataBounds) Bounds(0x64, 0x7fe4, 0x7fffffe4)
      else Bounds(Byte.MaxValue, Short.MaxValue, Int.MaxValue)

    val numCols = df.schema.fields.filter(f =>
      wanted(f.name) && opts.numeric &&
        (f.dataType == DoubleType || f.dataType == FloatType || f.dataType == LongType))
    val tsCols = df.schema.fields.filter(f =>
      wanted(f.name) && opts.datetimeToDate &&
        (f.dataType == TimestampNTZType || f.dataType == TimestampType))
    val strCols = df.schema.fields.filter(f =>
      wanted(f.name) && opts.stringToNumeric && f.dataType == StringType)

    if (numCols.isEmpty && tsCols.isEmpty && strCols.isEmpty) return df

    // single stats pass
    val aggs = scala.collection.mutable.ArrayBuffer[Column]()
    numCols.foreach { f =>
      val c = col(f.name).cast(DoubleType)
      aggs += min(c).as(s"${f.name}!min")
      aggs += max(c).as(s"${f.name}!max")
      aggs += max(when(c =!= floor(c) || c.isNaN, 1).otherwise(0)).as(s"${f.name}!frac")
    }
    tsCols.foreach { f =>
      // all-midnight check (A2): any timestamp with intra-day remainder?
      aggs += max(when(
        expr(s"CAST(${f.name} AS TIMESTAMP_NTZ) != date_trunc('DAY', CAST(${f.name} AS TIMESTAMP_NTZ))"),
        1).otherwise(0)).as(s"${f.name}!nonmid")
    }
    strCols.foreach { f =>
      // all-or-nothing string→numeric: any non-null value that fails to parse?
      aggs += max(when(
        col(f.name).isNotNull && length(trim(col(f.name))) > 0 &&
          col(f.name).cast(DoubleType).isNull, 1).otherwise(0)).as(s"${f.name}!bad")
      aggs += max(when(col(f.name).isNotNull, 1).otherwise(0)).as(s"${f.name}!any")
    }
    val stats = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    def stat(name: String): Option[Any] = {
      val i = stats.schema.fieldIndex(name)
      if (stats.isNullAt(i)) None else Some(stats.get(i))
    }

    val projections: Seq[Column] = df.schema.fields.map { f =>
      val c = col(f.name)
      if (numCols.contains(f)) {
        (stat(s"${f.name}!min"), stat(s"${f.name}!max"), stat(s"${f.name}!frac")) match {
          case (Some(mn: Double), Some(mx: Double), frac) if !frac.contains(1) =>
            if (mn >= 0 && mx <= 1) c.cast(BooleanType).as(f.name)
            else if (mn >= -b.i8Max && mx <= b.i8Max) c.cast(ByteType).as(f.name)
            else if (mn >= -b.i16Max && mx <= b.i16Max) c.cast(ShortType).as(f.name)
            else if (mn >= -b.i32Max && mx <= b.i32Max) c.cast(IntegerType).as(f.name)
            else c
          case _ => c
        }
      } else if (tsCols.contains(f) && !stat(s"${f.name}!nonmid").contains(1)) {
        c.cast(DateType).as(f.name)
      } else if (strCols.contains(f) &&
          !stat(s"${f.name}!bad").contains(1) && stat(s"${f.name}!any").contains(1)) {
        c.cast(DoubleType).as(f.name)
      } else c
    }.toIndexedSeq
    df.select(projections: _*)
  }
}
