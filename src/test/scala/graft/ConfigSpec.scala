package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference-config fidelity: the exact value forms flink.conf uses must
  * parse (quoted HOCON durations like "60s"), with sane fallbacks. */
class ConfigSpec extends AnyFunSuite {

  test("getDurationMs parses the HOCON duration subset flink.conf uses") {
    val c = GraftConfig.fromMap(Map(
      "ttl_s" -> "60s", "ttl_q" -> "\"60s\"", "ttl_ms" -> "500ms",
      "ttl_m" -> "5m", "ttl_h" -> "1h", "ttl_raw" -> "1234"))
    assert(c.getDurationMs("ttl_s", 0L) == 60000L)
    assert(c.getDurationMs("ttl_q", 0L) == 60000L) // quoted, as in flink.conf
    assert(c.getDurationMs("ttl_ms", 0L) == 500L)
    assert(c.getDurationMs("ttl_m", 0L) == 300000L)
    assert(c.getDurationMs("ttl_h", 0L) == 3600000L)
    assert(c.getDurationMs("ttl_raw", 0L) == 1234L)
    assert(c.getDurationMs("absent", 42L) == 42L)
  }
}
