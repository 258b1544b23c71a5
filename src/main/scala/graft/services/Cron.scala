package graft.services

import java.time.{ZonedDateTime, ZoneId}
import java.time.temporal.ChronoUnit

/** Five-field cron (`minute hour day-of-month month day-of-week`) with an
  * optional trailing timezone — the reference's task schedule syntax
  * (`USING CRON 0 2 * * * America/Los_Angeles`,
  * `scripts/33_schema_sync_task.sql:134-139`). Supports `*`, lists, ranges
  * and `*&#47;n` steps; day-of-month vs day-of-week combine with Vixie-cron
  * OR semantics when both are restricted.
  */
final case class CronSchedule(
    minutes: Set[Int], hours: Set[Int], dom: Set[Int], months: Set[Int],
    dow: Set[Int], domStar: Boolean, dowStar: Boolean, zone: ZoneId) {

  private def dayMatches(t: ZonedDateTime): Boolean = {
    val d = dom.contains(t.getDayOfMonth)
    val w = dow.contains(t.getDayOfWeek.getValue % 7) // cron: 0=Sunday
    if (domStar && dowStar) true
    else if (domStar) w
    else if (dowStar) d
    else d || w // both restricted → Vixie OR
  }

  def matches(t0: ZonedDateTime): Boolean = {
    val t = t0.withZoneSameInstant(zone)
    minutes.contains(t.getMinute) && hours.contains(t.getHour) &&
      months.contains(t.getMonthValue) && dayMatches(t)
  }

  /** First fire time strictly after `from` (minute resolution). Walks days,
    * then picks the first matching (hour, minute) — bounded by the 4-year
    * leap cycle, after which a valid spec must have fired. */
  def next(from: ZonedDateTime): ZonedDateTime = {
    val start = from.withZoneSameInstant(zone).truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    var day = start.truncatedTo(ChronoUnit.DAYS)
    val limit = day.plusYears(4)
    val hs = hours.toSeq.sorted
    val ms = minutes.toSeq.sorted
    while (day.isBefore(limit)) {
      if (months.contains(day.getMonthValue) && dayMatches(day)) {
        for (h <- hs; m <- ms) {
          val cand = day.withHour(h).withMinute(m)
          if (!cand.isBefore(start)) return cand
        }
      }
      day = day.plusDays(1)
    }
    throw new IllegalArgumentException(s"cron never fires: $this")
  }

  def nextDelayMs(nowMs: Long): Long =
    next(java.time.Instant.ofEpochMilli(nowMs).atZone(zone)).toInstant.toEpochMilli - nowMs
}

object CronSchedule {

  /** Parse `m h dom mon dow [zone]`. */
  def parse(expr: String): CronSchedule = {
    val parts = expr.trim.split("\\s+")
    require(parts.length == 5 || parts.length == 6, s"bad cron '$expr': need 5 fields [+ zone]")
    val zone = if (parts.length == 6) ZoneId.of(parts(5)) else ZoneId.of("UTC")
    CronSchedule(
      field(parts(0), 0, 59), field(parts(1), 0, 23), field(parts(2), 1, 31),
      field(parts(3), 1, 12), field(parts(4), 0, 7).map(_ % 7), // 7 = Sunday = 0
      domStar = parts(2) == "*", dowStar = parts(4) == "*", zone)
  }

  /** One field: `*`, `*&#47;n`, `a`, `a-b`, `a-b/n`, comma lists thereof. */
  private def field(s: String, lo: Int, hi: Int): Set[Int] =
    s.split(',').toSet.flatMap { (part: String) =>
      val (rangePart, step) = part.split('/') match {
        case Array(r) => (r, 1)
        case Array(r, n) => (r, n.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
      }
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains('-') =>
          val Array(x, y) = r.split('-'); (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, v)
      }
      require(a >= lo && b <= hi && a <= b, s"cron field '$part' out of [$lo,$hi]")
      (a to b by step).toSet
    }
}
