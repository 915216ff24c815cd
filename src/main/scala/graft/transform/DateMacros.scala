package graft.transform

import java.time.{ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** T12 date-macro string templating (reference `utils/date_time.py:7-40`):
  * substitutes `{yesterday} {today} {hour} {min}` into conf strings on an
  * IST clock. Driver-side config interpolation — plain Scala, no Spark. */
object DateMacros {
  val IST: ZoneId = ZoneId.of("Asia/Kolkata")
  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  def substitute(template: String,
                 now: ZonedDateTime = ZonedDateTime.now(IST)): String = {
    val ist = now.withZoneSameInstant(IST)
    template
      .replace("{yesterday}", ist.minusDays(1).format(dateFmt))
      .replace("{today}", ist.format(dateFmt))
      .replace("{hour}", f"${ist.getHour}%02d")
      .replace("{min}", f"${ist.getMinute}%02d")
  }
}
