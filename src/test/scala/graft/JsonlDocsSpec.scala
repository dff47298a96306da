package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.sources.JsonlDocs
import org.apache.spark.sql.functions._

/** JSONL corpus source: explicit-schema read, write/read roundtrip, and the
  * PERMISSIVE quarantine path for malformed lines. */
class JsonlDocsSpec extends SparkSpec {

  test("JSONL roundtrip: write then read reproduces the documents table") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.table(spark, sf, "documents")
    JsonlDocs.write(docs, dir)
    val back = JsonlDocs.good(JsonlDocs.read(spark, dir))
      .select(docs.columns.map(col).toIndexedSeq: _*)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    assert(back.count() == docs.count())
  }

  test("JSONL quarantine: malformed lines route to the dead-letter frame, good rows survive") {
    val dir = Files.createTempDirectory("graft-jsonl-bad").toString
    val docs = Tables.table(spark, sf, "documents").limit(10)
    JsonlDocs.write(docs, dir)
    // inject into one extra part file: a truncated JSON line, a wrong-TYPE
    // doc_id (PERMISSIVE parses the other fields but still flags the line
    // as corrupt), and blank/whitespace-only separator lines (which are
    // NOT records: they must reach neither good() nor quarantine())
    Files.write(Paths.get(dir, "part-corrupt.json"),
      ("{\"doc_id\": 999999, \"text\": \"trunca\n" +
        "\n" +
        "{\"doc_id\": \"notanint\", \"text\": \"typed\"}\n" +
        "   \n").getBytes,
      StandardOpenOption.CREATE)
    val read = JsonlDocs.read(spark, dir)
    assert(JsonlDocs.good(read).count() == 10,
      "blank lines must not surface as all-null good rows")
    val q = JsonlDocs.quarantine(read).select("_corrupt_record")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()
    assert(q.length == 2, s"got ${q.toSeq}")
    assert(q.exists(_.contains("trunca")) && q.exists(_.contains("notanint")))
  }
}
