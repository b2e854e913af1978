package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Reference [[WarehouseFs.ManifestCommitGuard]] adapters for object
  * stores — the production seam the default guard's loud refusal of
  * `s3://`/`gs://`/`abfs://` points at.
  *
  * An object-store warehouse cannot commit through rename (S3A
  * "renames" by client-side copy behind a non-atomic existence check),
  * but every major store exposes a CONDITIONAL CREATE the store itself
  * arbitrates — the strongest possible commit primitive, no tmp object
  * and no window at all:
  *
  *   - S3:  `PutObject` with `If-None-Match: *` → 200 created,
  *          `412 PreconditionFailed` = already exists (CAS loss)
  *   - GCS: insert with `ifGenerationMatch=0` → 412 on existence
  *   - ABFS/Azure Blob: `Put Blob` with `If-None-Match: *` → 409/412
  *
  * [[httpIfNoneMatchGuard]] wires that exact HTTP shape through
  * `java.net.http` for any store (or proxy) speaking it directly; an
  * SDK-based deployment instead passes its own `putIfAbsent` into
  * [[WarehouseFs.ConditionalPutCommitGuard]] — e.g. the AWS SDK v2
  * shape (not compiled here; this container is offline):
  *
  * {{{
  * WarehouseFs.commitGuard = new WarehouseFs.ConditionalPutCommitGuard(
  *   (uri, body) => try {
  *     val u = java.net.URI.create(uri)
  *     s3.putObject(PutObjectRequest.builder()
  *         .bucket(u.getHost).key(u.getPath.stripPrefix("/"))
  *         .ifNoneMatch("*").build(),
  *       RequestBody.fromBytes(body))
  *     true
  *   } catch { case _: S3Exception => false } // 412 = CAS loss
  * )
  * }}}
  *
  * Install once per JVM before the first commit:
  * `WarehouseFs.commitGuard = ObjectStoreCommit.httpIfNoneMatchGuard(endpoint)`. */
object ObjectStoreCommit {

  /** A [[WarehouseFs.ManifestCommitGuard]] over HTTP conditional
    * create: `PUT <endpoint>/<path-of-dest>` with `If-None-Match: *`.
    * 2xx = this writer created the object (CAS win); 409/412 = the name
    * is taken (CAS loss); anything else throws — a commit primitive
    * must never translate an outage into a silent loss OR a silent win.
    * The manifest path (table dir + `_versions/NNNNNNNN`) maps onto the
    * endpoint URI path verbatim, so one endpoint serves a whole
    * warehouse. */
  def httpIfNoneMatchGuard(endpoint: String,
                           client: HttpClient = HttpClient.newHttpClient())
      : WarehouseFs.ManifestCommitGuard =
    new WarehouseFs.ConditionalPutCommitGuard((destUri, body) => {
      val path = URI.create(destUri).getPath
      val req = HttpRequest.newBuilder(
          URI.create(endpoint.stripSuffix("/") + path))
        .header("If-None-Match", "*")
        .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.discarding())
      resp.statusCode() match {
        case ok if ok >= 200 && ok < 300 => true
        case 409 | 412 => false
        case other => throw new java.io.IOException(
          s"conditional PUT of $destUri returned HTTP $other — refusing " +
            "to guess whether the commit landed")
      }
    })
}
