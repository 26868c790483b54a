package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record ingestion — the wire format every web-scale
  * corpus starts from (Common Crawl ships WARC; the crawl→text funnel's
  * first step is splitting records and pulling response payloads out of
  * their header envelopes). Engine extension over the reference's
  * CSV-only ingest (crn-meta-validate app.py reads spreadsheets); same
  * two-tier design as [[CsvIngest]]: a FILE splitter that turns raw
  * WARC bytes into one row per record, and a pure-projection header
  * PARSER over the record string so the parse itself is a codegen'd
  * scan stage any SQL engine can replay.
  *
  * Parsing is RE2-safe regex on the header block only (never the
  * payload): WARC headers are `Name: value` lines, CRLF-terminated,
  * separated from the payload by a blank CRLF line. A record missing a
  * header yields NULL for that field — classification, not validation;
  * the validator tier decides what is fatal.
  */
object WarcIngest {

  /** One row per WARC record from files under `path`. WARC files are
    * concatenations of records each beginning `WARC/<version>`, so the
    * splitter reads with the record magic as the line separator — the
    * same trick every distributed WARC reader uses (split the stream
    * on the magic, never buffer a whole file), here expressed with
    * Spark's own `lineSep` text option (splittable scan, no custom
    * InputFormat). The magic is restored so each row is a complete
    * record string; the empty fragment before the first magic drops. */
  def readRecords(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", "WARC/1.0\r\n").text(path)
      .where(length(trim(col("value"))) > 0)
      .select(concat(lit("WARC/1.0\r\n"), col("value")).as("record"))

  /** Header fields + payload of one WARC record string, as a struct
    * (warc_type, target_uri, content_type, content_length, payload,
    * payload_len). Pure codegen'd projection — zero shuffle, zero UDF;
    * all patterns RE2-safe so a SQL oracle replays the identical
    * chain. `content_length` is the DECLARED header value (try-cast:
    * a garbled header NULLs instead of failing the job under ANSI);
    * `payload_len` is the ACTUAL length after the header blank line —
    * the validator tier compares the two. A record with no blank-line
    * separator has a NULL payload and payload_len 0. */
  def parseRecord(record: Column): Column = {
    def header(name: String): Column = {
      val h = regexp_extract(record, s"(?m)^$name: ([^\r\n]+)", 1)
      when(h === "", lit(null)).otherwise(h)
    }
    val sep = instr(record, "\r\n\r\n")
    val payload = when(sep > 0, substring(record, sep + 4, lit(1073741823)))
    struct(
      header("WARC-Type").as("warc_type"),
      header("WARC-Target-URI").as("target_uri"),
      header("Content-Type").as("content_type"),
      header("Content-Length").try_cast("long").as("content_length"),
      payload.as("payload"),
      coalesce(length(payload), lit(0)).cast("long").as("payload_len"))
  }
}
