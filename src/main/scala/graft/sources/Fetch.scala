package graft.sources

import java.io.{FileOutputStream, InputStream}
import java.net.{URI, URLConnection}

/** Corpus fetch with multi-URL fallback — the analogue of the reference's
  * Gutenberg downloader (`cluster/shared/download_gutenberg_corpus.sh`
  * tries each mirror URL in order until one serves the document). URLs are
  * tried in sequence; the first stream that opens and copies fully wins;
  * every failure is recorded. Works over any URL scheme the JVM resolves
  * (file:, http:, https:), which keeps it fully testable offline with
  * file:// fixtures.
  */
object Fetch {

  /** Outcome of one fetch: the winning URL and bytes copied, plus the
    * error text per URL that was tried and failed before it.
    */
  final case class Result(url: String, bytes: Long, failures: Seq[(String, String)])

  /** Download the first reachable URL to `dest`, trying `urls` in order.
    * Returns Left(failures) if every URL failed; partial writes from a
    * mid-stream failure are deleted so a retry never sees a torn file.
    */
  def firstAvailable(urls: Seq[String], dest: java.io.File,
      timeoutMs: Int = 10000): Either[Seq[(String, String)], Result] = {
    val failures = Seq.newBuilder[(String, String)]
    for (url <- urls) {
      var in: InputStream = null
      var out: FileOutputStream = null
      try {
        val conn: URLConnection = new URI(url).toURL.openConnection()
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        in = conn.getInputStream
        out = new FileOutputStream(dest)
        val bytes = in.transferTo(out)
        out.close(); out = null
        // the download is complete once the bytes are on disk — a failure
        // tearing down the INPUT stream must not delete a valid file or
        // mark the winning mirror as failed
        try in.close() catch { case _: Exception => }
        in = null
        return Right(Result(url, bytes, failures.result()))
      } catch {
        case e: Exception =>
          failures += (url -> s"${e.getClass.getSimpleName}: ${e.getMessage}")
          if (out != null) { try out.close() catch { case _: Exception => } }
          if (in != null) { try in.close() catch { case _: Exception => } }
          dest.delete()
      }
    }
    Left(failures.result())
  }
}
