package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV line codec for the CDR wire format (S1/K3).
  *
  * The reference consumes CSV-encoded CDRs from Kafka with
  * `'value.csv.null-literal' = ''` (empty string decodes to SQL NULL) and
  * `'value.csv.ignore-parse-errors' = 'true'` (malformed lines dropped) —
  * /root/reference/src/main/java/org/example/EnrichmentApp.java:160-181 —
  * and its generator encodes with a plain comma-join of the six fields
  * (generator/CsvData.java:33-40).
  *
  * Decode uses `from_csv` (a codegen'd Catalyst expression — stays inside
  * whole-stage codegen, no UDF): PERMISSIVE mode nulls unparsable *fields*
  * and keeps the row — Flink's ignore-parse-errors contract — while a line
  * where nothing parses (all six fields NULL) is dropped as garbage. A row
  * with a legitimately empty field (e.g. `,probeX,...` = NULL start_time
  * under null-literal='') is therefore KEPT, not conflated with a parse
  * error. Encode coalesces every field through '' so a NULL can never
  * swallow its comma and shift the remaining columns (concat_ws skips
  * NULLs). Both directions are pure column expressions, so the same codec
  * serves batch oracle queries and the streaming Kafka path unchanged.
  */
object CsvCodec {

  /** Wire schema of a CDR line (EnrichmentApp.java:163-170). */
  val schema: StructType = StructType(Seq(
    StructField("start_time", TimestampType),
    StructField("measuring_probe_name", StringType),
    StructField("imsi", LongType),
    StructField("msisdn", LongType),
    StructField("ms_ip_address", StringType),
    StructField("unique_cdr_id", LongType)))

  private val tsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private val opts = Map(
    "nullValue" -> "",            // '' ↔ NULL, both directions
    "timestampFormat" -> tsFormat,
    "mode" -> "PERMISSIVE")

  /** Row → CSV line column (generator contract, CsvData.java:33-40).
    * Every field passes through coalesce(..., ''): concat_ws silently SKIPS
    * null arguments, so an unprotected NULL field would drop its comma and
    * shift every later column on decode. */
  def encode(df: DataFrame): Column =
    concat_ws(",",
      coalesce(date_format(col("start_time"), tsFormat), lit("")),
      coalesce(col("measuring_probe_name"), lit("")),
      coalesce(col("imsi").cast("string"), lit("")),
      coalesce(col("msisdn").cast("string"), lit("")),
      coalesce(col("ms_ip_address"), lit("")),
      coalesce(col("unique_cdr_id").cast("string"), lit("")))

  /** CSV `value` column → typed CDR columns. Field-level parse errors null
    * the field and keep the row (ignore-parse-errors parity); only lines
    * where nothing parsed (all fields NULL) are dropped as garbage. */
  def decode(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .select(from_csv(col(valueCol).cast("string"), schema, opts).as("r"))
      .select(col("r.*"))
      .filter(schema.fieldNames.map(col(_).isNotNull).reduce(_ || _))
}
