package graft.sources

import java.io.{ByteArrayOutputStream, IOException}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** S6 — the live HTTP transport under the [[Download]] control logic:
  * a real-socket implementation of the reference's download session
  * (`/root/reference/code/imagery_store.py:92-163`, `:276-292`) using
  * only `java.net` —
  *
  *   - token mint: form-encoded POST (client_id/username/password/
  *     grant_type=password) to the identity endpoint, `access_token`
  *     extracted from the JSON body (`imagery_store.py:276-292`);
  *     lifecycle (mint once, re-mint after 600 s) is
  *     [[Download.TokenClock]] — the header re-reads the clock on
  *     EVERY request, so a long partition picks up refreshed tokens
  *     mid-stream exactly like the reference's `get_session`;
  *   - per-request `Authorization: Bearer <token>` with automatic
  *     redirect following DISABLED; 301/302/303/307 surface as
  *     `Left(Location)` into [[Download.followRedirects]]'s bounded
  *     loop (`imagery_store.py:99-101`, `:139-141`);
  *   - the body is read in 8 KiB chunks (`iter_content(chunk_size=
  *     8192)`, `:144-147`);
  *   - partition fan-out with the 4-connection provider quota and
  *     log-and-continue per-item failures is [[Download.fetchPartition]].
  *
  * On a cluster this runs inside `foreachPartition`: one TokenClock
  * per executor, `maxConcurrent` capping each task's sockets so
  * `tasks × maxConcurrent` stays inside the provider quota.
  */
object HttpTransport {

  /** Mint an access token: form-encoded POST, token regexed out of
    * the JSON reply (the one field the reference reads; a JSON
    * library would be dead weight for this).
    */
  def mintToken(tokenUrl: String, user: String, password: String,
      clientId: String = "cdse-public"): String = {
    val form = Seq(
      "client_id" -> clientId, "username" -> user,
      "password" -> password, "grant_type" -> "password")
      .map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" +
          java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
    val conn = connect(tokenUrl)
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type",
        "application/x-www-form-urlencoded")
      conn.getOutputStream.write(form.getBytes(StandardCharsets.UTF_8))
      val code = conn.getResponseCode
      if (code >= 400) throw new IOException(s"token mint failed: HTTP $code")
      val body = new String(readChunked(conn.getInputStream),
        StandardCharsets.UTF_8)
      """"access_token"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(body)
        .map(_.group(1))
        .getOrElse(throw new IOException(s"no access_token in: $body"))
    } finally conn.disconnect()
  }

  /** One authenticated GET with redirects NOT followed — the step
    * function [[Download.followRedirects]] drives: `Left(location)`
    * for 301/302/303/307, `Right(body)` on 200, IOException on 4xx/5xx
    * (caught and logged by [[Download.fetchPartition]]).
    */
  def getStep(auth: () => String, timeoutMs: Int = 30000)(url: String)
      : Either[String, Array[Byte]] = step(Some(auth), timeoutMs)(url)

  /** Plain unauthenticated GET through the redirect loop — the
    * catalog-search transport (the reference's bare `requests.get`
    * of the OData query, `imagery_store.py:188`; only downloads
    * carry the Bearer token there too).
    */
  def get(url: String, timeoutMs: Int = 30000): Array[Byte] =
    Download.followRedirects(url, step(None, timeoutMs))

  private def step(auth: Option[() => String], timeoutMs: Int)(url: String)
      : Either[String, Array[Byte]] = {
    val conn = connect(url, timeoutMs)
    try {
      conn.setInstanceFollowRedirects(false)
      auth.foreach(a =>
        conn.setRequestProperty("Authorization", s"Bearer ${a()}"))
      conn.getResponseCode match {
        case c if c == 301 || c == 302 || c == 303 || c == 307 =>
          Left(Option(conn.getHeaderField("Location"))
            .getOrElse(throw new IOException(s"HTTP $c without Location")))
        case c if c >= 400 => throw new IOException(s"HTTP $c for $url")
        case _ => Right(readChunked(conn.getInputStream))
      }
    } finally conn.disconnect()
  }

  /** Download one URL through the redirect loop and write it to
    * `dest`; returns the byte count.
    */
  def downloadTo(url: String, dest: Path, auth: () => String): Long = {
    val bytes = Download.followRedirects(url, getStep(auth))
    Files.write(dest, bytes)
    bytes.length.toLong
  }

  /** Fetch a partition's URLs over real sockets: quota-capped,
    * token-refreshing, redirect-following, failure-skipping.
    */
  def fetchPartition(urls: Seq[String], clock: Download.TokenClock,
      maxConcurrent: Int = 4): Seq[(String, Array[Byte])] =
    Download.fetchPartition(urls,
      u => Download.followRedirects(u, getStep(() => clock.get())),
      maxConcurrent)

  private def connect(url: String, timeoutMs: Int = 30000): HttpURLConnection = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn
  }

  /** Read a body in 8 KiB chunks — the reference's
    * `iter_content(chunk_size=8192)` stream shape.
    */
  private def readChunked(in: java.io.InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }
}
