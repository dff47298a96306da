package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json, length, trim}
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) document source/sink — the de-facto
  * interchange format for LLM training corpora.
  *
  * Contract, sized for a 100 TB ingest:
  *  - The schema is EXPLICIT, never inferred: schema inference is a full
  *    extra pass over the input before the real scan — a silent 2× read at
  *    corpus scale (and nondeterministic under corpus growth).
  *  - Parsing is PERMISSIVE with a `_corrupt_record` quarantine column: a
  *    malformed line routes to [[quarantine]] instead of failing the job —
  *    the same tolerance contract as the CDR CSV decode
  *    (`streaming/CsvCodec.scala`), because at corpus scale corrupt lines
  *    are a certainty, not an edge case.
  *  - The line-oriented format splits on newlines, so a JSONL file is
  *    byte-range splittable and scan parallelism follows
  *    `spark.sql.files.maxPartitionBytes` exactly like parquet — no
  *    whole-file tasks (multiline JSON would lose this).
  *  - Transport and decode are SEPARATE stages (the CsvCodec architecture):
  *    the scan is a plain splittable `text` read and the parse is a
  *    `from_json` expression. The native json source forbids any query
  *    that column-prunes down to the corrupt-record column alone (e.g.
  *    `quarantine(df).count()` after pruning), because it would have to
  *    re-parse; with the decode as an ordinary expression the quarantine
  *    frame is queryable like any other.
  */
object JsonlDocs {

  /** The documents-table schema plus the quarantine column. `n_chars` is
    * LongType to match the canonical parquet documents table (BIGINT) —
    * an INT here would silently type-skew any union/append with it. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** The decode contract, shared verbatim by the batch reader and the
    * streaming twin ([[graft.streaming.CorpusIngest.jsonlStream]]) — one
    * definition, so the two paths cannot drift. Input: a frame with a
    * `value` string column (a text scan, batch or streaming). */
  def decode(lines: DataFrame): DataFrame =
    lines
      // blank/whitespace-only lines are separators, not records (a
      // trailing newline or hand-concatenated files produce them): parsed,
      // they'd become all-NULL rows that pass good() AND dodge
      // quarantine() — a silent third bucket. Drop them at the scan.
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
      .select(col("j.*"))

  def read(spark: SparkSession, path: String): DataFrame =
    decode(spark.read.text(path))

  /** Well-formed rows, quarantine column dropped. */
  def good(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  /** Every malformed line (full row — raw text in `_corrupt_record`, any
    * fields that did parse alongside), for the dead-letter sink. The
    * projection deliberately keeps more than the corrupt column: Spark
    * disallows queries over a raw JSON scan that reference ONLY the
    * internal corrupt-record column (it would require a second parse). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNotNull)

  /** Write a documents frame as JSONL (one object per line, splittable). */
  def write(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
