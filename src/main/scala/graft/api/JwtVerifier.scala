package graft.api

import java.nio.charset.StandardCharsets.US_ASCII
import java.security.spec.RSAPublicKeySpec
import java.security.{KeyFactory, Signature}
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Signature-validating JWT [[Auth.TokenVerifier]] — the reference's
  * Okta `AccessTokenVerifier` seam (`auth.py:29-43`) made real, minus
  * the network: trusted keys are injected (e.g. parsed from a static
  * JWKS document via [[JwtVerifier.fromJwks]]) and the clock is
  * injected for testability. Verifies compact-serialization JWS
  * (`header.payload.signature`, base64url), supports HS256
  * (shared-secret HMAC) and RS256 (RSA PKCS#1 v1.5 / SHA-256 — the alg
  * Okta issues), enforces `exp` (REQUIRED — a token without a numeric
  * exp rejects, it does not live forever) and `nbf` (optional, but
  * malformed rejects), pins `iss`/`aud` when configured (the
  * reference's Okta verifier checks both), and surfaces the `groups`
  * claim the role gate consumes.
  *
  * Every failure mode — malformed token, unknown `kid`, alg/key
  * mismatch (incl. the classic alg-substitution attack: an HS256 token
  * pointing at an RSA key never verifies, because the key TYPE is
  * checked, not the attacker-controlled header), bad signature, expired
  * or not-yet-valid — collapses to None, which [[Auth.RoleChecker]]
  * maps to the reference's "expired or unrecognized schema" 403
  * (`auth.py:35-38`). Nothing here touches Spark: it is request-plane
  * identity, executed driver-side per API call.
  */
final class JwtVerifier(keys: Map[String, JwtVerifier.Key],
                        nowEpochSeconds: () => Long = () => System.currentTimeMillis() / 1000L,
                        expectedIssuer: Option[String] = None,
                        expectedAudience: Option[String] = None)
    extends Auth.TokenVerifier {
  import JwtVerifier._

  def groups(token: String): Option[Seq[String]] =
    try {
      val parts = token.split('.')
      if (parts.length != 3) return None
      val header = mapper.readTree(b64(parts(0)))
      val alg = text(header, "alg").getOrElse(return None)
      val key = text(header, "kid").flatMap(keys.get).getOrElse(return None)
      val signedBytes = s"${parts(0)}.${parts(1)}".getBytes(US_ASCII)
      val sig = b64(parts(2))
      val ok = (alg, key) match {
        case ("HS256", HmacKey(secret)) =>
          val mac = Mac.getInstance("HmacSHA256")
          mac.init(new SecretKeySpec(secret, "HmacSHA256"))
          java.security.MessageDigest.isEqual(mac.doFinal(signedBytes), sig)
        case ("RS256", RsaKey(n, e)) =>
          val pub = KeyFactory.getInstance("RSA")
            .generatePublic(new RSAPublicKeySpec(n, e))
          val v = Signature.getInstance("SHA256withRSA")
          v.initVerify(pub)
          v.update(signedBytes)
          v.verify(sig)
        case _ => false // alg/key-type mismatch (alg-substitution guard)
      }
      if (!ok) return None
      val claims = mapper.readTree(b64(parts(1)))
      val now = nowEpochSeconds()
      // exp is REQUIRED and must be numeric (r10 review: `exists` let a
      // token with a missing or string-typed exp — the classic issuer
      // misconfig — validate FOREVER; a leaked token became permanently
      // valid). nbf stays optional per RFC 7519, but a present
      // non-numeric nbf is malformed and rejects.
      num(claims, "exp") match {
        case Some(exp) if exp > now => ()
        case _ => return None
      }
      if (Option(claims.get("nbf")).exists(n => !n.isNumber)) return None
      if (num(claims, "nbf").exists(_ > now)) return None
      // issuer/audience pinning when configured (r10 review: the
      // reference's Okta AccessTokenVerifier checks both — without
      // them, any token signed by a shared org key for an UNRELATED
      // service passes the role gate here). `aud` may be a string or
      // an array per RFC 7519.
      expectedIssuer.foreach { iss =>
        if (!text(claims, "iss").contains(iss)) return None
      }
      expectedAudience.foreach { aud =>
        val auds = Option(claims.get("aud")).toSeq.flatMap { n =>
          if (n.isTextual) Seq(n.asText)
          else if (n.isArray) (0 until n.size).map(n.get(_).asText)
          else Seq.empty
        }
        if (!auds.contains(aud)) return None
      }
      Some(strings(claims, "groups"))
    } catch { case _: Exception => None } // malformed base64/JSON/keys
}

/** JWKS DISCOVERY verifier — the live half of the reference's Okta
  * `AccessTokenVerifier` (`auth.py:29-43`, which resolves keys from the
  * issuer's jwks_uri at runtime): fetches the JWKS document over HTTP,
  * caches kid→key, and re-fetches ONCE when a token presents an
  * unknown `kid` (key rotation), rate-limited by `minRefreshSeconds`
  * so a stream of garbage kids cannot stampede the issuer. All
  * validation (signature, exp/nbf, iss/aud pinning, groups) delegates
  * to [[JwtVerifier]] over the cached keys — this class owns ONLY key
  * lifecycle. A failed fetch leaves the previous cache in place (an
  * issuer blip must not un-authenticate every valid holder) and logs;
  * with no successful fetch ever, every token rejects (403), which is
  * the fail-closed direction. `fetchJwks` is injectable; the default
  * is a timeout-bounded HTTP GET, and the spec drives the real one
  * against an in-process HttpServer (the MQBroker convention). */
final class JwksDiscoveryVerifier(
    jwksUrl: String,
    nowEpochSeconds: () => Long = () => System.currentTimeMillis() / 1000L,
    expectedIssuer: Option[String] = None,
    expectedAudience: Option[String] = None,
    minRefreshSeconds: Long = 300L,
    // failed fetches rate-limit on their own (shorter) window so an
    // issuer OUTAGE at service startup degrades to fast local 403s
    // instead of a blocking GET per request (r13 ADVICE #1: the old
    // `fetchedOnce &&` guard rate-limited only post-success refreshes —
    // before the first success every groups() call did a 10 s-connect /
    // 30 s-read GET on the auth path, stalling every request AND
    // hammering jwks_uri). Short so recovery is prompt once the issuer
    // returns; successes keep the full minRefreshSeconds window.
    failedRefreshSeconds: Long = 15L,
    fetchJwks: String => String = JwksDiscoveryVerifier.httpGet)
    extends Auth.TokenVerifier {
  import JwtVerifier._

  @volatile private var cached: Map[String, Key] = Map.empty
  @volatile private var lastFetchAt: Long = Long.MinValue
  @volatile private var fetchedOnce = false
  @volatile private var lastFailed = false
  // true while the claiming thread is inside the (unmonitored) fetch
  private var fetchInFlight = false
  // how long a HEALTHY-path non-claimer waits for the in-flight fetch
  // before proceeding with whatever is cached (bounded: a hung issuer
  // must not park request threads for the GET's full 40 s timeout)
  private val healthyWaitNanos = 10L * 1000 * 1000 * 1000

  /** Rate-limit EVERY attempt, with the window keyed on how the LAST
    * attempt ended (r14 review: keying on fetchedOnce — ever
    * succeeded — made a rotation-time issuer blip back off at the
    * full minRefreshSeconds, 403ing new-kid tokens for minutes after
    * the issuer recovered): after a success the window is
    * minRefreshSeconds (rotation stampede guard), after ANY failure
    * it is failedRefreshSeconds so recovery is prompt — only the
    * very first call (lastFetchAt unset) fetches unconditionally.
    *
    * LOCKING (r14 ADVICE): the monitor guards only the window check
    * and the single-flight claim — never the blocking GET (10 s
    * connect + 30 s read). The claiming thread fetches on its own
    * clock; concurrent callers inside an OUTAGE window return
    * immediately and reject from local state (the "fast local 403s"
    * contract now holds however slowly the probe fails), while
    * callers racing a HEALTHY-path fetch (startup, key rotation) wait
    * bounded for the result — 403ing a valid token because another
    * request won the first-fetch race would be the worse trade. */
  private def refresh(): Unit = {
    val now = nowEpochSeconds()
    val claimed = synchronized {
      val window = if (lastFailed) failedRefreshSeconds else minRefreshSeconds
      val due = lastFetchAt == Long.MinValue || now - lastFetchAt >= window
      if (fetchInFlight) {
        if (!lastFailed) {
          val deadline = System.nanoTime() + healthyWaitNanos
          while (fetchInFlight && System.nanoTime() < deadline) {
            val ms = (deadline - System.nanoTime()) / 1000000L
            if (ms > 0) wait(ms)
          }
        }
        false // in-flight result (or outage state) answers this caller
      } else if (!due) false
      else { fetchInFlight = true; lastFetchAt = now; true }
    }
    if (!claimed) return
    val fetched =
      try Some(fromJwks(fetchJwks(jwksUrl))) // blocking I/O, monitor NOT held
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[auth] JWKS fetch from $jwksUrl failed: ${e.getMessage} - " +
            (if (cached.nonEmpty) "keeping previously cached keys" else "no keys cached, all tokens reject"))
          None
      }
    synchronized {
      fetched match {
        case Some(keys) => cached = keys; fetchedOnce = true; lastFailed = false
        case None       => lastFailed = true
      }
      fetchInFlight = false
      notifyAll()
    }
  }

  def groups(token: String): Option[Seq[String]] = {
    if (!fetchedOnce) refresh()
    val kid = kidOf(token)
    if (kid.exists(k => !cached.contains(k))) refresh() // rotation path
    new JwtVerifier(cached, nowEpochSeconds, expectedIssuer, expectedAudience)
      .groups(token)
  }
}

object JwksDiscoveryVerifier {
  private[api] def httpGet(url: String): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    val res = client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(res.statusCode() == 200, s"jwks_uri $url returned ${res.statusCode()}")
    res.body()
  }
}

object JwtVerifier {

  sealed trait Key
  /** HS256 shared secret (e.g. from secret storage). */
  final case class HmacKey(secret: Array[Byte]) extends Key
  /** RS256 public key as the JWKS (n, e) pair. */
  final case class RsaKey(n: java.math.BigInteger, e: java.math.BigInteger) extends Key

  private val mapper = new ObjectMapper()

  /** The `kid` a compact JWS points at — the only header field the
    * discovery verifier needs before delegating. None on malformed. */
  private[api] def kidOf(token: String): Option[String] =
    try {
      val parts = token.split('.')
      if (parts.length != 3) None
      else text(mapper.readTree(b64(parts(0))), "kid")
    } catch { case _: Exception => None }

  private def b64(s: String): Array[Byte] = Base64.getUrlDecoder.decode(s)
  private def text(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filter(_.isTextual).map(_.asText)
  private def num(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filter(_.isNumber).map(_.asLong)
  private def strings(n: JsonNode, f: String): Seq[String] =
    Option(n.get(f)).filter(_.isArray).toSeq
      .flatMap(a => (0 until a.size).map(a.get(_).asText))

  /** Parse the `keys` of a JWKS document (RFC 7517) into kid→key —
    * RSA entries only (`kty: RSA`, base64url `n`/`e`), which is what an
    * OIDC issuer's jwks_uri serves; HMAC secrets don't travel in JWKS
    * and are injected directly. */
  def fromJwks(jwksJson: String): Map[String, Key] = {
    val root = mapper.readTree(jwksJson)
    val arr = Option(root.get("keys")).filter(_.isArray).toSeq
      .flatMap(a => (0 until a.size).map(a.get))
    arr.flatMap { k =>
      for {
        kid <- text(k, "kid")
        kty <- text(k, "kty") if kty == "RSA"
        n <- text(k, "n")
        e <- text(k, "e")
      } yield kid -> (RsaKey(
        new java.math.BigInteger(1, b64(n)),
        new java.math.BigInteger(1, b64(e))): Key)
    }.toMap
  }
}
