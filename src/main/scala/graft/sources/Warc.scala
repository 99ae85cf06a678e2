package graft.sources

import java.io.{ByteArrayInputStream, EOFException, IOException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * WARC (Web ARChive, ISO 28500) reader — the ingestion path for
 * Common-Crawl-style page dumps, feeding the engine's canonical pages
 * schema (url, warc_ts, html, text, lang). Pure-JVM parser, no
 * dependencies: WARC/1.0-1.1 header blocks, Content-Length-framed
 * payloads, per-record or whole-file gzip (GZIPInputStream reads
 * concatenated members, which is exactly Common Crawl's layout), and
 * HTTP-response payload splitting (status line + headers + body).
 *
 * Scale shape (a 100 TB crawl dump): the unit of parallelism is the
 * WARC FILE — Common Crawl ships ~64k ~1 GB files per crawl, so a file
 * per task saturates thousands of executors with zero shuffle; the
 * parser is a STREAMING record iterator over an InputStream (memory =
 * one record, not one file), so the same code serves the simple
 * `binaryFile` integration here and a custom streaming FileFormat on a
 * real cluster. Everything downstream (canonicalize → dedup →
 * politeness → extract) is the engine's existing pipeline.
 *
 * Out of scope, documented: HTTP chunked-transfer decoding (Common
 * Crawl stores payloads already de-chunked) and revisit/conversion
 * record payload semantics (they parse as records; `pages` filters to
 * `response`).
 */
object Warc {

  /** One parsed WARC record. `httpStatus`/`httpContentType` are -1/null
   *  for non-HTTP payloads; `body` is the HTTP response body for
   *  response records, the raw payload otherwise. */
  final case class Record(
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      httpStatus: Int,
      httpContentType: String,
      body: Array[Byte])

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = false),
    StructField("http_content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true)))

  private val Gzip0 = 0x1f.toByte
  private val Gzip1 = 0x8b.toByte

  /** Streaming record iterator over a (possibly gzipped) WARC stream.
   *  Malformed tail data ends iteration instead of throwing — a
   *  truncated dump yields its complete prefix records (dead-letter
   *  counting happens a level up if needed). */
  def parseStream(in0: InputStream): Iterator[Record] = new Iterator[Record] {
    private val in = new java.io.BufferedInputStream(in0, 1 << 16)
    private var nextRec: Record = _
    private var done = false

    private def readLine(): String = {
      // header lines are ASCII per spec; ISO-8859-1 keeps stray bytes
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      if (c < 0) throw new EOFException
      while (c >= 0 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }

    private def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new EOFException
        off += r
      }
      buf
    }

    private def advance(): Unit = {
      nextRec = null
      try {
        // skip inter-record blank lines to the next version line
        var line = readLine()
        while (line.isEmpty) line = readLine()
        if (!line.startsWith("WARC/")) { done = true; return }
        var warcType: String = null
        var recordId: String = null
        var uri: String = null
        var date: String = null
        var contentLength = -1L
        var payloadIsHttp = false
        var h = readLine()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) {
            val k = h.substring(0, i).trim.toLowerCase
            val v = h.substring(i + 1).trim
            k match {
              case "warc-type" => warcType = v
              case "warc-record-id" => recordId = v
              case "warc-target-uri" =>
                // some writers angle-bracket the URI; strip per spec errata
                uri = v.stripPrefix("<").stripSuffix(">")
              case "warc-date" => date = v
              case "content-length" =>
                contentLength = try v.toLong catch { case _: NumberFormatException => -1L }
              case "content-type" =>
                payloadIsHttp = v.toLowerCase.startsWith("application/http")
              case _ =>
            }
          }
          h = readLine()
        }
        if (contentLength < 0 || contentLength > Int.MaxValue) { done = true; return }
        val payload = readFully(contentLength.toInt)
        val (status, mime, body) =
          if (payloadIsHttp) splitHttpResponse(payload)
          else (-1, null: String, payload)
        nextRec = Record(warcType, recordId, uri, date, status, mime, body)
      } catch {
        // EOFException: clean truncation mid-record. Any other IOException
        // (ZipException from a bit-flipped gzip member, stream corruption)
        // must ALSO end iteration, not fail the Spark task — the contract
        // is "the complete prefix of records, malformed tail dropped".
        case _: IOException => done = true
      }
    }

    override def hasNext: Boolean = {
      if (!done && nextRec == null) advance()
      !done && nextRec != null
    }
    override def next(): Record = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  /** Parse one WARC file's bytes (gzip-sniffed). */
  def parseBytes(bytes: Array[Byte]): Iterator[Record] = {
    if (bytes == null || bytes.isEmpty) return Iterator.empty
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && bytes(0) == Gzip0 && bytes(1) == Gzip1)
        new GZIPInputStream(raw, 1 << 16) // multi-member: one member per record (CC layout)
      else raw
    parseStream(in)
  }

  /** Split an application/http response payload into (status, mime, body).
   *  Tolerates LF-only headers; a payload without an HTTP status line
   *  comes back whole with status -1. */
  private[sources] def splitHttpResponse(p: Array[Byte]): (Int, String, Array[Byte]) = {
    // find header/body boundary: CRLFCRLF or LFLF
    var bodyStart = -1
    var i = 0
    while (bodyStart < 0 && i < p.length - 1) {
      if (p(i) == '\n') {
        if (p(i + 1) == '\n') bodyStart = i + 2
        else if (i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n') bodyStart = i + 3
      }
      i += 1
    }
    if (bodyStart < 0) return (-1, null, p)
    val head = new String(p, 0, bodyStart, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    val statusLine = lines.headOption.getOrElse("")
    if (!statusLine.startsWith("HTTP/")) return (-1, null, p)
    val parts = statusLine.split(" ")
    val status = if (parts.length >= 2) {
      try parts(1).toInt catch { case _: NumberFormatException => -1 }
    } else -1
    val mime = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") => l.substring(13).trim
    }.orNull
    (status, mime, java.util.Arrays.copyOfRange(p, bodyStart, p.length))
  }

  /** All records of every WARC file under `path` (glob ok; .warc and
   *  .warc.gz). One task per file — the Common-Crawl parallelism unit;
   *  executors stream records off the file bytes on the InternalRow
   *  bridge (no external-Row boxing). */
  def records(spark: SparkSession, path: String): DataFrame =
    recordsFromBinary(spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")))

  /** Same, over an already-loaded (path string, content binary) frame —
   *  the seam for in-memory fixtures and alternative file listings. */
  def recordsFromBinary(bin0: DataFrame): DataFrame = {
    val spark = bin0.sparkSession
    val bin = bin0.select(col(bin0.columns(0)).cast("string"), col(bin0.columns(1)))
    val rdd = bin.queryExecution.toRdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val file = r.getUTF8String(0).clone()
        val bytes = if (r.isNullAt(1)) null else r.getBinary(1)
        parseBytes(bytes).map { rec =>
          val out = new GenericInternalRow(8)
          out.update(0, file)
          out.update(1, UTF8String.fromString(rec.warcType))
          out.update(2, UTF8String.fromString(rec.recordId))
          out.update(3, UTF8String.fromString(rec.targetUri))
          out.update(4, UTF8String.fromString(rec.warcDate))
          out.update(5, rec.httpStatus)
          out.update(6, if (rec.httpContentType == null) null
                        else UTF8String.fromString(rec.httpContentType))
          out.update(7, rec.body)
          out: InternalRow
        }
      }
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.internalCreateDataFrame(
      spark, rdd, recordSchema)
  }

  /** The engine's canonical pages table (the BASELINE input shape:
   *  url, warc_ts, html, text, lang) from parsed records: HTTP 200
   *  `response` records, WARC-Date → timestamp, body → html binary,
   *  extracted text via the golden X1/X2 surface, language via the
   *  X3-sniffing extractor + langId. */
  def pages(records: DataFrame): DataFrame = {
    val extractUdf = udf((html: Array[Byte], url: String) =>
      graft.functions.Extract.extractText(html, url))
    records
      .filter(col("warc_type") === "response" && col("http_status") === 200 &&
        col("url").isNotNull)
      .select(col("url"),
        to_timestamp(col("warc_date")).as("warc_ts"),
        col("body").as("html"))
      .withColumn("text", extractUdf(col("html"), col("url")))
      .withColumn("lang", graft.functions.TextStats.langId(col("text")))
  }

  // ---- WET egress (the reader's inverse) ----

  /** One serialized WET record: a WARC/1.0 `conversion` record with a
   *  text/plain payload, Content-Length framing, and the spec's blank
   *  line + record separator. The record id is a DETERMINISTIC digest
   *  urn (no RNG — same input, same bytes, so shards are reproducible
   *  and diffable across runs; the uuid form CC uses is one config away
   *  for callers who need global uniqueness). */
  private def wetRecordBytes(url: String, dateIso: String,
      body: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(body)
    md.update(url.getBytes("UTF-8"))
    val hex = md.digest().map("%02x".format(_)).mkString
    val header =
      "WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"WARC-Date: $dateIso\r\n" +
        s"WARC-Record-ID: <urn:graft:$hex>\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
    val h = header.getBytes("UTF-8")
    val sep = "\r\n\r\n".getBytes("UTF-8")
    val out = new Array[Byte](h.length + body.length + sep.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    System.arraycopy(sep, 0, out, h.length + body.length, sep.length)
    out
  }

  /** WET shard egress — the Common-Crawl `*.warc.wet.gz` artifact from
   *  the engine's pages/results: one shard per input partition, each a
   *  concatenation of per-record gzip members (exactly the layout
   *  [[parseStream]] ingests — the round trip is spec-pinned). Output:
   *  (wet_file, n_records, content) for the caller to sink; rows with a
   *  null url or text are skipped, empty partitions emit no shard.
   *
   *  Scale: the shard builder is one partition-local streaming pass on
   *  the InternalRow bridge (no external-Row boxing, no shuffle);
   *  upstream `repartitionByRange` on the url picks the CC-style
   *  sorted-shard layout, plain `repartition(n)` picks shard count. A
   *  shard materializes in memory before emit — size partitions to the
   *  intended ~1 GB CC shard, not to the whole corpus. */
  def wetShards(pages: DataFrame, urlCol: String, tsCol: String,
      textCol: String, gzipMembers: Boolean = true,
      shardPrefix: String = "graft-wet"): DataFrame = {
    val spark = pages.sparkSession
    val prepared = pages.select(
      col(urlCol).cast("string"),
      date_format(col(tsCol).cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
      col(textCol).cast("string"))
    val schema = StructType(Seq(
      StructField("wet_file", StringType, nullable = false),
      StructField("n_records", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val suffix = if (gzipMembers) ".warc.wet.gz" else ".warc.wet"
    val rdd = prepared.queryExecution.toRdd.mapPartitionsWithIndex { (p, it) =>
      val buf = new java.io.ByteArrayOutputStream()
      var n = 0L
      it.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(2)) {
          val url = r.getUTF8String(0).toString
          val date =
            if (r.isNullAt(1)) "1970-01-01T00:00:00Z"
            else r.getUTF8String(1).toString
          val rec = wetRecordBytes(url, date, r.getUTF8String(2).getBytes)
          if (gzipMembers) {
            val g = new java.util.zip.GZIPOutputStream(buf)
            g.write(rec)
            // close(), not finish(): releases the native Deflater
            // deterministically (finish alone leaks it to the GC
            // finalizer — one Deflater per record adds up at 10^9
            // records); closing the wrapper is safe, the underlying
            // ByteArrayOutputStream's close is a no-op
            g.close()
          } else buf.write(rec)
          n += 1
        }
      }
      if (n == 0) Iterator.empty
      else {
        val row = new GenericInternalRow(3)
        row.update(0, UTF8String.fromString(f"$shardPrefix-$p%05d$suffix"))
        row.update(1, n)
        row.update(2, buf.toByteArray)
        Iterator.single(row: InternalRow)
      }
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.internalCreateDataFrame(
      spark, rdd, schema)
  }
}
