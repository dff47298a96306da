package graft

import java.io.{File, FileInputStream}
import java.util.Properties

import scala.jdk.CollectionConverters._

/** Engine configuration (SURVEY §2 I4).
  *
  * The reference loads Typesafe-HOCON from `args(0)` falling back to a
  * classpath `flink.conf` (EnrichmentApp.java:38-43). The HOCON library
  * isn't on this classpath, so the same precedence is implemented over
  * `java.util.Properties` (`key = value` lines — a syntactic subset of
  * HOCON covering everything flink.conf uses). Key names are kept 1:1 with
  * flink.conf so a reference deployment's config translates line-for-line.
  */
final class GraftConfig private (props: Map[String, String]) {

  // flink.conf quotes scalars ('url = "jdbc:..."'); Properties keeps the
  // quotes, so EVERY getter unquotes — a quoted JDBC url reaching
  // DriverManager verbatim fails with "No suitable driver"
  private def unquote(raw: String): String =
    raw.trim.stripPrefix("\"").stripSuffix("\"")

  def get(key: String, default: => String): String =
    props.get(key).map(unquote).getOrElse(default)

  def getLong(key: String, default: => Long): Long =
    props.get(key).map(unquote(_).toLong).getOrElse(default)

  def getInt(key: String, default: => Int): Int =
    props.get(key).map(unquote(_).toInt).getOrElse(default)

  def getDouble(key: String, default: => Double): Double =
    props.get(key).map(unquote(_).toDouble).getOrElse(default)

  /** HOCON-style duration → ms (subset the reference uses: "60s", plus
    * "ms"/"m"/"h" and bare millis) — flink.conf writes
    * `expire-after-write = "60s"`. */
  def getDurationMs(key: String, default: => Long): Long =
    props.get(key).map { raw =>
      val v = unquote(raw)
      if (v.endsWith("ms")) v.dropRight(2).trim.toLong
      else if (v.endsWith("s")) v.dropRight(1).trim.toLong * 1000L
      else if (v.endsWith("m")) v.dropRight(1).trim.toLong * 60000L
      else if (v.endsWith("h")) v.dropRight(1).trim.toLong * 3600000L
      else v.toLong
    }.getOrElse(default)

  // unquoted like every other getter — kafkaClientOptions builds the
  // SASL/Kerberos pass-through from this map, and a quoted "GSSAPI"
  // reaching the Kafka client verbatim fails the handshake
  def entries: Map[String, String] = props.map { case (k, v) => k -> unquote(v) }
}

object GraftConfig {

  val empty = new GraftConfig(Map.empty)

  /** args-path first, classpath `graft.conf` fallback — reference precedence. */
  def load(args: Array[String]): GraftConfig =
    args.headOption.map(p => fromFile(new File(p))).getOrElse(fromClasspath("graft.conf"))

  def fromFile(f: File): GraftConfig = {
    val p = new Properties()
    val in = new FileInputStream(f)
    try p.load(in) finally in.close()
    fromProperties(p)
  }

  def fromClasspath(name: String): GraftConfig = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    if (in == null) empty
    else {
      val p = new Properties()
      try p.load(in) finally in.close()
      fromProperties(p)
    }
  }

  def fromProperties(p: Properties): GraftConfig =
    new GraftConfig(p.asScala.toMap)

  def fromMap(m: Map[String, String]): GraftConfig = new GraftConfig(m)
}
