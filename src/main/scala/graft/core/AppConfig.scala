package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Job-config loading (reference `tasks/base.py:75-80`): the reference
  * reads its JSON conf file through a Spark text job (a driver→executor
  * round trip just to read a file); here it is plain JVM file IO + JSON
  * (R16). Values pass through date-macro substitution (T12). */
object AppConfig {
  def load(path: String): Map[String, String] = {
    val raw = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    parse(raw)
  }

  def parse(json: String): Map[String, String] = {
    val root = new ObjectMapper().readTree(json)
    root.properties().asScala.map { e =>
      val v = e.getValue
      val s = if (v.isTextual) v.asText() else v.toString
      e.getKey -> graft.transform.DateMacros.substitute(s)
    }.toMap
  }
}
