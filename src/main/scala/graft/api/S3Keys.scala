package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Twin of the reference's `encodeS3Key`/`decodeS3Key`
  * (src/index.ts:315-339): percent-encode every path segment with JS
  * `encodeURIComponent` semantics, keeping `/` separators intact.
  *
  * `encodeURIComponent` leaves `A-Za-z0-9 - _ . ! ~ * ' ( )` bare and
  * percent-encodes (uppercase hex) everything else, including space as
  * `%20`. Spark's `url_encode` is form-encoding (space → `+`, and it
  * escapes `! ' ( ) ~`), so the Column version is `url_encode` plus a
  * constant-folded fix-up chain — still pure codegen'd string ops, no
  * UDF. Decode pre-escapes `+` (form decoding would turn a literal `+`
  * into a space; `decodeURIComponent` leaves it alone).
  */
object S3Keys {

  /** Per-segment encodeURIComponent over a key Column. */
  def encodeS3Key(key: Column): Column =
    array_join(
      transform(split(key, "/", -1), seg => fixupEncoded(url_encode(seg))),
      "/")

  /** Per-segment decodeURIComponent over a key Column. */
  def decodeS3Key(encodedKey: Column): Column =
    array_join(
      transform(split(encodedKey, "/", -1), seg =>
        url_decode(regexp_replace(seg, "\\+", "%2B"))),
      "/")

  /** form-encoding → encodeURIComponent: space and the six chars the
    * two schemes disagree on.
    */
  private def fixupEncoded(c: Column): Column = {
    val steps = Seq("\\+" -> "%20", "%21" -> "!", "%27" -> "'",
      "%28" -> "(", "%29" -> ")", "%7E" -> "~")
    steps.foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }
  }

  /** Twin of the reference's `isValidBucketName` (src/index.ts:35):
    * AWS bucket-name rules — length 3-63, lowercase/digit/dot/hyphen,
    * starts+ends alphanumeric, no adjacent dots, not IP-formatted, no
    * `xn--` prefix, no `-s3alias` suffix. Pure codegen'd predicate.
    */
  def isValidBucketName(bucket: Column): Column =
    length(bucket).between(3, 63) &&
      bucket.rlike("^[a-z0-9][a-z0-9.-]*[a-z0-9]$") &&
      !bucket.contains("..") &&
      !bucket.rlike("^\\d+\\.\\d+\\.\\d+\\.\\d+$") &&
      !bucket.startsWith("xn--") &&
      !bucket.endsWith("-s3alias")

  // ---- driver-side String twins (same output, for non-Spark callers
  // and spec vectors) --------------------------------------------------

  def encodeS3Key(key: String): String =
    key.split("/", -1).map(encodeSegment).mkString("/")

  def decodeS3Key(encodedKey: String): String =
    encodedKey.split("/", -1).map(decodeSegment).mkString("/")

  private def encodeSegment(seg: String): String =
    java.net.URLEncoder.encode(seg, "UTF-8")
      .replace("+", "%20").replace("%21", "!").replace("%27", "'")
      .replace("%28", "(").replace("%29", ")").replace("%7E", "~")

  private def decodeSegment(seg: String): String =
    java.net.URLDecoder.decode(seg.replace("+", "%2B"), "UTF-8")
}
