package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

sealed trait TimeGranularity { def interval: String }
object TimeGranularity {
  case object Hourly extends TimeGranularity { val interval = "INTERVAL 1 HOUR" }
  case object Daily extends TimeGranularity { val interval = "INTERVAL 1 DAY" }
  case object Monthly extends TimeGranularity { val interval = "INTERVAL 1 MONTH" }
  case object Yearly extends TimeGranularity { val interval = "INTERVAL 1 YEAR" }
}

/** Config twin of the reference's TimePartitionConfig
  * (src/index.ts:1809): granularity, optional hour/minute components,
  * hive (`year=YYYY`) vs plain (`YYYY`) formatting, prefix. Reference
  * coercions preserved: hourly forces includeHour; includeMinute forces
  * includeHour.
  */
case class TimePartitionConfig(
  granularity: TimeGranularity,
  includeHour: Boolean = false,
  includeMinute: Boolean = false,
  format: String = "hive", // "hive" | "path"
  prefix: String = "")

/** Twin of the reference's `TimePartitionGenerator` (src/index.ts:1827):
  * `generatePath` is a Column expression (usable on a billion-row ts
  * column); `generatePathsForRange` is a distributed sequence+explode —
  * a year of hourly paths is 8760 rows, not a driver loop.
  */
class TimePartitionGenerator(config0: TimePartitionConfig) {
  import TimeGranularity._

  val config: TimePartitionConfig = {
    var c = config0
    if (c.includeMinute && c.granularity != Hourly) c = c.copy(includeHour = true)
    if (c.granularity == Hourly) c = c.copy(includeHour = true)
    c
  }

  private def segments(ts: Column): Seq[Column] = {
    val hive = config.format == "hive"
    def seg(key: String, fmt: String): Column =
      if (hive) concat(lit(s"$key="), date_format(ts, fmt)) else date_format(ts, fmt)
    val base = Seq(seg("year", "yyyy")) ++
      (if (config.granularity != Yearly) Seq(seg("month", "MM")) else Nil) ++
      (config.granularity match {
        case Daily | Hourly => Seq(seg("day", "dd"))
        case _ => Nil
      }) ++
      (if (config.includeHour) Seq(seg("hour", "HH")) else Nil) ++
      (if (config.includeMinute) Seq(seg("minute", "mm")) else Nil)
    if (config.prefix.nonEmpty) lit(config.prefix) +: base else base
  }

  /** partition path for a timestamp column (reference generatePath). */
  def generatePath(ts: Column): Column = concat_ws("/", segments(ts): _*)

  /** partition path for "now" (reference generateCurrentPath,
    * src/index.ts:1977). Column form — stamp a whole DataFrame with the
    * ingest partition; `current_timestamp()` is query-constant.
    */
  def generateCurrentPath(): Column = generatePath(current_timestamp())

  /** String form of generateCurrentPath for driver-side callers
    * (manifest prefixes, sink paths). Injectable clock so tests pin the
    * instant; same segment logic as the Column twin, UTC like the
    * session timezone.
    */
  def generateCurrentPath(clock: java.time.Clock): String = {
    val t = java.time.ZonedDateTime.now(clock.withZone(java.time.ZoneOffset.UTC))
    val hive = config.format == "hive"
    def seg(key: String, v: String): String = if (hive) s"$key=$v" else v
    val base = Seq(seg("year", f"${t.getYear}%04d")) ++
      (if (config.granularity != Yearly) Seq(seg("month", f"${t.getMonthValue}%02d")) else Nil) ++
      (config.granularity match {
        case Daily | Hourly => Seq(seg("day", f"${t.getDayOfMonth}%02d"))
        case _ => Nil
      }) ++
      (if (config.includeHour) Seq(seg("hour", f"${t.getHour}%02d")) else Nil) ++
      (if (config.includeMinute) Seq(seg("minute", f"${t.getMinute}%02d")) else Nil)
    val all = if (config.prefix.nonEmpty) config.prefix +: base else base
    all.mkString("/")
  }

  /** one row per period in [start, end] (reference
    * generatePathsForRange) — distributed via sequence + explode.
    */
  def generatePathsForRange(spark: SparkSession, start: String, end: String): DataFrame = {
    val step = config.granularity.interval
    spark.sql(
      s"SELECT explode(sequence(TIMESTAMP'$start', TIMESTAMP'$end', $step)) AS ts")
      .select(generatePath(col("ts")).as("path"))
  }
}
