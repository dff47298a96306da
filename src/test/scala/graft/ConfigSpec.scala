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

  test("Kerberos/SASL kafka.properties.* pass through to Spark kafka.* options") {
    // the reference's GSSAPI cluster block (EnrichmentAppWithoutExplode.java
    // :174-175, Generator.java:58-59) written as config lines
    val c = GraftConfig.fromMap(Map(
      "kafka.properties.security.protocol" -> "\"SASL_PLAINTEXT\"", // flink.conf quoted style
      "kafka.properties.sasl.kerberos.service.name" -> "kafka",
      "kafka.properties.sasl.mechanism" -> "GSSAPI",
      "kafka.properties.sasl.jaas.config" ->
        "com.sun.security.auth.module.Krb5LoginModule required useKeyTab=true;",
      "kafka.group_id" -> "graft-prod",
      "kafka.topic" -> "cdr")) // non-properties keys must NOT leak through
    val client = graft.apps.EnrichmentJob.kafkaClientOptions(c)
    assert(client == Map(
      "kafka.security.protocol" -> "SASL_PLAINTEXT",
      "kafka.sasl.kerberos.service.name" -> "kafka",
      "kafka.sasl.mechanism" -> "GSSAPI",
      "kafka.sasl.jaas.config" ->
        "com.sun.security.auth.module.Krb5LoginModule required useKeyTab=true;"))
    val src = graft.apps.EnrichmentJob.kafkaSourceOptions(c)
    assert(src("kafka.group.id") == "graft-prod")
    assert(src("failOnDataLoss") == "false")
    assert(src("kafka.security.protocol") == "SASL_PLAINTEXT")
  }

  test("startup-mode value domain maps Flink values to Spark startingOffsets") {
    def so(v: String) = graft.apps.EnrichmentJob.startingOffsets(
      GraftConfig.fromMap(Map("kafka.scan.startup.mode" -> v)))
    assert(so("latest-offset") == "latest")
    assert(so("earliest-offset") == "earliest")
    assert(so("earliest") == "earliest") // Spark-native values pass through
    assert(graft.apps.EnrichmentJob.startingOffsets(GraftConfig.empty) == "latest")
  }
}
