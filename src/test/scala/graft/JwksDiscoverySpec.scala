package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.security.interfaces.{RSAPrivateKey, RSAPublicKey}
import java.security.{KeyPairGenerator, Signature}
import java.util.Base64
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.api.JwksDiscoveryVerifier

/** The live half of the reference's Okta verifier (`auth.py:29-43`):
  * JWKS discovery over a REAL loopback socket — fetch-on-first-use,
  * kid→key caching (no per-token fetch), ONE rate-limited re-fetch on
  * an unknown kid (key rotation), fail-closed when the issuer never
  * answered, and keep-the-cache when it answered once and then broke. */
class JwksDiscoverySpec extends AnyFunSuite {

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def rsaPair() = {
    val g = KeyPairGenerator.getInstance("RSA"); g.initialize(2048)
    val kp = g.generateKeyPair()
    (kp.getPublic.asInstanceOf[RSAPublicKey], kp.getPrivate.asInstanceOf[RSAPrivateKey])
  }

  private def jwksDoc(entries: (String, RSAPublicKey)*): String =
    entries.map { case (kid, pub) =>
      s"""{"kty":"RSA","kid":"$kid","alg":"RS256","use":"sig",
          "n":"${b64url(pub.getModulus.toByteArray.dropWhile(_ == 0))}",
          "e":"${b64url(pub.getPublicExponent.toByteArray)}"}"""
    }.mkString("""{"keys":[""", ",", "]}")

  private def rs256(kid: String, priv: RSAPrivateKey, claims: String): String = {
    val h = b64url(s"""{"alg":"RS256","kid":"$kid"}""".getBytes(UTF_8))
    val p = b64url(claims.getBytes(UTF_8))
    val s = Signature.getInstance("SHA256withRSA")
    s.initSign(priv); s.update(s"$h.$p".getBytes(US_ASCII))
    s"$h.$p.${b64url(s.sign())}"
  }

  private def withServer(body: (String, AtomicInteger, java.util.concurrent.atomic.AtomicReference[String]) => Unit): Unit = {
    val doc = new java.util.concurrent.atomic.AtomicReference[String]("")
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/keys", ex => {
      hits.incrementAndGet()
      val bytes = doc.get().getBytes(UTF_8)
      if (bytes.isEmpty) ex.sendResponseHeaders(500, -1)
      else { ex.sendResponseHeaders(200, bytes.length.toLong); ex.getResponseBody.write(bytes) }
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/keys", hits, doc)
    finally server.stop(0)
  }

  private val exp = System.currentTimeMillis() / 1000L + 3600
  private def claims(groups: String = """["Data-Admin"]"""): String =
    s"""{"iss":"https://issuer.test","aud":"graft","exp":$exp,"groups":$groups}"""

  test("discovers keys over the socket once, validates RS256, caches across tokens") {
    val (pub, priv) = rsaPair()
    withServer { (url, hits, doc) =>
      doc.set(jwksDoc("k1" -> pub))
      val v = new JwksDiscoveryVerifier(url,
        expectedIssuer = Some("https://issuer.test"), expectedAudience = Some("graft"))
      assert(v.groups(rs256("k1", priv, claims())).contains(Seq("Data-Admin")))
      assert(v.groups(rs256("k1", priv, claims("""["Data-Engineers"]""")))
        .contains(Seq("Data-Engineers")))
      assert(hits.get() == 1, s"known-kid tokens must reuse the cached JWKS, fetched ${hits.get()}x")
      // pinning still enforced through the discovery path
      val wrongAud = s"""{"iss":"https://issuer.test","aud":"other","exp":$exp,"groups":["Data-Admin"]}"""
      assert(v.groups(rs256("k1", priv, wrongAud)).isEmpty)
    }
  }

  test("key rotation: an unknown kid triggers ONE rate-limited re-fetch") {
    val (pub1, priv1) = rsaPair()
    val (pub2, priv2) = rsaPair()
    withServer { (url, hits, doc) =>
      doc.set(jwksDoc("k1" -> pub1))
      var now = 1000000L
      val v = new JwksDiscoveryVerifier(url, nowEpochSeconds = () => now,
        minRefreshSeconds = 60L)
      assert(v.groups(rs256("k1", priv1, claims())).contains(Seq("Data-Admin")))
      // issuer rotates to k2; next token presents the new kid
      doc.set(jwksDoc("k1" -> pub1, "k2" -> pub2))
      now += 61
      assert(v.groups(rs256("k2", priv2, claims())).contains(Seq("Data-Admin")),
        "a rotated kid must validate after the re-fetch")
      assert(hits.get() == 2)
      // a garbage kid inside the refresh window must NOT re-fetch (stampede guard)
      assert(v.groups(rs256("k9", priv2, claims())).isEmpty)
      assert(hits.get() == 2, "unknown-kid fetches must be rate-limited")
    }
  }

  test("issuer outage at startup: failed fetches rate-limit on their own window (r13 ADVICE #1)") {
    val (pub, priv) = rsaPair()
    withServer { (url, hits, doc) =>
      var now = 1000000L
      val v = new JwksDiscoveryVerifier(url, nowEpochSeconds = () => now,
        minRefreshSeconds = 300L, failedRefreshSeconds = 15L)
      // 50 auth attempts inside the failure window: exactly ONE
      // upstream GET — the old `fetchedOnce &&` guard did 50 blocking
      // GETs here, stalling the whole auth path on issuer timeouts
      (1 to 50).foreach(_ => assert(v.groups(rs256("k1", priv, claims())).isEmpty))
      assert(hits.get() == 1, s"startup outage must not hammer jwks_uri: ${hits.get()} GETs")
      // the failure window is SHORTER than the success window: one
      // retry per elapsed window, so recovery is prompt once the
      // issuer returns
      now += 16
      assert(v.groups(rs256("k1", priv, claims())).isEmpty)
      assert(hits.get() == 2, "one retry per elapsed failure window")
      doc.set(jwksDoc("k1" -> pub))
      now += 16
      assert(v.groups(rs256("k1", priv, claims())).contains(Seq("Data-Admin")),
        "recovery at the first post-outage window")
      assert(hits.get() == 3)
    }
  }

  test("rotation-time blip AFTER a success backs off at the failure window, not the success window (r14 review)") {
    val (pub1, priv1) = rsaPair()
    val (pub2, priv2) = rsaPair()
    withServer { (url, hits, doc) =>
      var now = 1000000L
      val v = new JwksDiscoveryVerifier(url, nowEpochSeconds = () => now,
        minRefreshSeconds = 300L, failedRefreshSeconds = 15L)
      doc.set(jwksDoc("k1" -> pub1))
      assert(v.groups(rs256("k1", priv1, claims())).contains(Seq("Data-Admin")))
      assert(hits.get() == 1)
      // issuer rotates to k2 but blips 500 exactly when the first
      // new-kid token arrives — the old fetchedOnce-keyed window made
      // this back off 300 s, 403ing every k2 holder after a 30 s blip
      doc.set("")
      now += 301
      assert(v.groups(rs256("k2", priv2, claims())).isEmpty, "blip: k2 rejects for now")
      assert(hits.get() == 2)
      // issuer recovers within the FAILURE window; the next k2 token
      // past failedRefreshSeconds must re-fetch and validate
      doc.set(jwksDoc("k1" -> pub1, "k2" -> pub2))
      now += 16
      assert(v.groups(rs256("k2", priv2, claims())).contains(Seq("Data-Admin")),
        "recovery must be prompt after a post-success failure")
      assert(hits.get() == 3)
      // and once healthy again, unknown kids are back on the 300 s guard
      assert(v.groups(rs256("k9", priv2, claims())).isEmpty)
      assert(hits.get() == 3, "healthy-issuer stampede guard must hold")
    }
  }

  test("outage probe never parks concurrent auth on the monitor (r14 ADVICE)") {
    // a HUNG (not fast-failing) issuer: the probing fetch blocks on a
    // latch. The old code held `synchronized` across the GET, so every
    // groups() call in the window queued up to 40 s behind the probe —
    // "fast local 403s" only held when the fetch failed quickly.
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val (_, priv) = rsaPair()
    val secondEntered = new CountDownLatch(1)
    val secondGate = new CountDownLatch(1)
    val calls = new AtomicInteger(0)
    var now = 1000000L
    val v = new JwksDiscoveryVerifier("latched://jwks", nowEpochSeconds = () => now,
      minRefreshSeconds = 300L, failedRefreshSeconds = 15L,
      fetchJwks = _ =>
        if (calls.incrementAndGet() == 1) sys.error("issuer down") // arms the outage state
        else {
          secondEntered.countDown()
          secondGate.await() // the hung probe
          sys.error("issuer down")
        })
    assert(v.groups(rs256("k1", priv, claims())).isEmpty)
    assert(calls.get() == 1)
    // next failure window: the probe HANGS instead of failing fast
    now += 16
    val prober = new Thread(() => { v.groups(rs256("k1", priv, claims())); () })
    prober.start()
    // wait until the prober is INSIDE the fetch — this is the exact
    // moment the old code held the monitor across the GET
    assert(secondEntered.await(5, TimeUnit.SECONDS), "prober never reached fetch")
    val t0 = System.nanoTime()
    assert(v.groups(rs256("k1", priv, claims())).isEmpty,
      "concurrent auth during the hung probe must reject locally")
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs < 2000, s"auth parked ${elapsedMs}ms behind the hung probe")
    assert(calls.get() == 2, "the concurrent call must not launch a second fetch")
    secondGate.countDown()
    prober.join(5000)
    assert(!prober.isAlive, "prober never finished")
  }

  test("fail-closed with no successful fetch; issuer blip keeps the cache") {
    val (pub, priv) = rsaPair()
    withServer { (url, hits, doc) =>
      var now = 1000000L
      val v = new JwksDiscoveryVerifier(url, nowEpochSeconds = () => now,
        minRefreshSeconds = 60L)
      // server responds 500 (doc empty): every token rejects, nothing throws
      assert(v.groups(rs256("k1", priv, claims())).isEmpty)
      // issuer comes up; past the refresh window the verifier recovers
      doc.set(jwksDoc("k1" -> pub))
      now += 61
      assert(v.groups(rs256("k1", priv, claims())).contains(Seq("Data-Admin")))
      // issuer breaks again AND rotates away: cached keys keep serving k1
      doc.set("")
      now += 61
      assert(v.groups(rs256("k1", priv, claims())).contains(Seq("Data-Admin")),
        "a fetch failure must keep the previously cached keys")
    }
  }
}
