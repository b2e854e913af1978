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
    * warehouse.
    *
    * CAPABILITY SELF-CHECK: before this guard's FIRST real commit it
    * probes the endpoint — PUT a hidden sentinel name twice under the
    * manifest's own parent dir, requiring the first to create (2xx) and
    * the second to be REFUSED (409/412). A store that ignores
    * `If-None-Match` answers 2xx to both, and against such a store BOTH
    * racers of a real commit would think they won — the exact silent
    * lost-update the guard exists to prevent — so the guard refuses
    * loudly at the probe and never trusts the endpoint with a manifest.
    * The sentinel is deleted best-effort (dot-prefixed, so a leftover
    * is invisible to manifest listings either way); the probe runs once
    * per guard instance. */
  def httpIfNoneMatchGuard(endpoint: String,
                           client: HttpClient = HttpClient.newHttpClient())
      : WarehouseFs.ManifestCommitGuard = {
    def putConditional(path: String, body: Array[Byte]): Int = {
      val req = HttpRequest.newBuilder(
          URI.create(endpoint.stripSuffix("/") + path))
        .header("If-None-Match", "*")
        .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
        .build()
      client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
    }
    val probed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def probeOnce(destPath: String): Unit = {
      if (probed.get()) return
      val parent = destPath.take(math.max(0, destPath.lastIndexOf('/')))
      val sentinel =
        s"$parent/.graft-cas-probe-${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val payload = "graft conditional-create capability probe".getBytes("UTF-8")
      val first = putConditional(sentinel, payload)
      if (!(first >= 200 && first < 300)) throw new java.io.IOException(
        s"conditional-create capability probe: first PUT of $sentinel " +
          s"returned HTTP $first — endpoint unusable as a commit store")
      val second = putConditional(sentinel, payload)
      if (!(second == 409 || second == 412)) throw new IllegalStateException(
        s"endpoint $endpoint IGNORES If-None-Match: a second PUT of the " +
          s"same name returned HTTP $second (expected 409/412). Such a " +
          "store cannot arbitrate commits — both racers of a manifest " +
          "CAS would believe they won. Refusing the guard; front the " +
          "store with a conditional-create-honoring proxy or pass an " +
          "SDK putIfAbsent to ConditionalPutCommitGuard instead")
      // best-effort cleanup; a store without DELETE keeps the hidden
      // sentinel, which no listing surfaces
      try client.send(HttpRequest.newBuilder(
          URI.create(endpoint.stripSuffix("/") + sentinel)).DELETE().build(),
        HttpResponse.BodyHandlers.discarding())
      catch { case _: Exception => () }
      probed.set(true)
    }
    new WarehouseFs.ConditionalPutCommitGuard((destUri, body) => {
      val path = URI.create(destUri).getPath
      probeOnce(path)
      putConditional(path, body) match {
        case ok if ok >= 200 && ok < 300 => true
        case 409 | 412 => false
        case other => throw new java.io.IOException(
          s"conditional PUT of $destUri returned HTTP $other — refusing " +
            "to guess whether the commit landed")
      }
    })
  }
}
