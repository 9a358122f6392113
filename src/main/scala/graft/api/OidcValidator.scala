package graft.api

import java.math.BigInteger
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.KeyFactory
import java.security.interfaces.RSAPublicKey
import java.security.spec.RSAPublicKeySpec
import java.time.Duration
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

/** OIDC bearer-token validation — the reference's third auth path
  * beside the static deployment token and managed API keys (ref
  * internal/oidc/client.go:198-243 ParseIDToken, issuer/audience
  * checks; internal/api/services/oidc.go drives the same validation
  * from its configured provider). The engine side is VALIDATION only:
  * the interactive login dance (authorize redirect, code exchange,
  * user provisioning) is control-plane UI plumbing the SURVEY scopes
  * out; what the API needs is to accept a JWT minted by a trusted
  * issuer and refuse everything else.
  *
  * Wire shapes are the public standards the reference's client speaks:
  * OIDC discovery (`/.well-known/openid-configuration` → `jwks_uri`),
  * JWKS (RFC 7517 RSA keys, base64url `n`/`e`), JWS compact
  * serialization with RS256 (RFC 7515), and the registered JWT claims
  * (RFC 7519).
  *
  * Validation refuses, in order: malformed compact form, any `alg`
  * other than RS256 (an `alg=none` or HS256 token must never reach
  * key lookup — the classic algorithm-confusion downgrade), unknown
  * `kid`, bad signature, wrong `iss`, an `aud` (string or array —
  * ref client.go:70-83) not containing the expected audience,
  * expired `exp`, and a future `nbf`. A small clock skew allowance
  * covers issuer/validator drift.
  *
  * The JWKS is fetched lazily and cached; an UNKNOWN kid triggers one
  * re-fetch (key rotation publishes the new key before tokens carry
  * it), rate-limited so a spray of garbage kids cannot turn the
  * validator into a request amplifier against the issuer. */
final class OidcValidator(issuerUrl: String, audience: String,
                          clock: () => Long = () => System.currentTimeMillis(),
                          skewMs: Long = 30000L,
                          refreshMinIntervalMs: Long = 60000L)
  extends AutoCloseable {

  private val issuer = issuerUrl.stripSuffix("/")
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5)).build()

  /** Verified token identity: subject plus the raw claims object. */
  final case class Claims(subject: String, claims: JObject)

  @volatile private var keys: Map[String, RSAPublicKey] = Map.empty
  // None = never fetched (subtracting a Long.MinValue sentinel from
  // the clock would overflow and disable the first fetch)
  @volatile private var fetchedAtMs: Option[Long] = None

  private def b64url(s: String): Array[Byte] =
    Base64.getUrlDecoder.decode(s)

  private def getJson(url: String): JValue = {
    val res = http.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(Duration.ofSeconds(5)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() != 200)
      throw new IllegalStateException(s"OIDC fetch $url: HTTP ${res.statusCode()}")
    JsonMethods.parse(res.body())
  }

  /** Discovery → JWKS fetch; RSA signing keys only, keyed by kid. */
  private def fetchKeys(): Map[String, RSAPublicKey] = {
    // the ONE discovery implementation (shared with the /test probe)
    val jwksUri = OidcValidator.discover(issuer, http) match {
      case Right(u)  => u
      case Left(err) => throw new IllegalStateException(
        s"OIDC discovery at $issuer failed: $err")
    }
    val kf = KeyFactory.getInstance("RSA")
    def sigUse(k: JValue): Boolean = k \ "use" match {
      case JString(u) => u == "sig"
      case _          => true // absent `use` = general-purpose key
    }
    (getJson(jwksUri) \ "keys" match {
      case JArray(ks) => ks
      case _          => Nil
    }).flatMap { k =>
      (k \ "kty", k \ "kid", k \ "n", k \ "e") match {
        case (JString("RSA"), JString(kid), JString(n), JString(e))
          if sigUse(k) =>
          val spec = new RSAPublicKeySpec(
            new BigInteger(1, b64url(n)), new BigInteger(1, b64url(e)))
          Some(kid -> kf.generatePublic(spec).asInstanceOf[RSAPublicKey])
        case _ => None
      }
    }.toMap
  }

  /** Cached kids resolve off the volatile map WITHOUT the monitor —
    * an in-flight fetch for an unknown kid must never stall requests
    * whose key is already at hand. The fetch itself runs single-flight
    * under the monitor, and the attempt time is recorded BEFORE the
    * fetch so a failing/unreachable issuer is rate-limited exactly
    * like a succeeding one (otherwise a garbage-kid spray during an
    * issuer outage becomes a request amplifier). */
  private def keyFor(kid: String): Option[RSAPublicKey] =
    keys.get(kid).orElse(synchronized {
      keys.get(kid).orElse {
        val now = clock()
        if (fetchedAtMs.forall(t => now - t >= refreshMinIntervalMs)) {
          fetchedAtMs = Some(now)
          keys = fetchKeys()
        }
        keys.get(kid)
      }
    })

  /** Validate a compact JWS; `Left` carries the refusal reason (logged
    * by callers, never echoed into responses beyond a 401). */
  def validate(token: String): Either[String, Claims] = {
    val parts = token.split('.')
    if (parts.length != 3) return Left("malformed token")
    val (h64, p64, s64) = (parts(0), parts(1), parts(2))
    val (header, payload) =
      try (JsonMethods.parse(new String(b64url(h64), UTF_8)),
        JsonMethods.parse(new String(b64url(p64), UTF_8)))
      catch { case _: Exception => return Left("undecodable token") }
    header \ "alg" match {
      case JString("RS256") => ()
      case JString(other)   => return Left(s"refused alg $other")
      case _                => return Left("missing alg")
    }
    val kid = header \ "kid" match {
      case JString(k) => k
      case _          => return Left("missing kid")
    }
    val key = try keyFor(kid) catch {
      case e: Exception => return Left(s"jwks fetch failed: ${e.getMessage}")
    }
    key match {
      case None => Left(s"unknown kid $kid")
      case Some(pub) =>
        val sig = java.security.Signature.getInstance("SHA256withRSA")
        sig.initVerify(pub)
        sig.update(s"$h64.$p64".getBytes(UTF_8))
        val ok = try sig.verify(b64url(s64))
        catch { case _: Exception => false }
        if (!ok) return Left("bad signature")
        checkClaims(payload)
    }
  }

  private def numClaim(payload: JValue, name: String): Option[Long] =
    payload \ name match {
      case JInt(n)     => Some(n.toLong)
      case JLong(n)    => Some(n)
      case JDouble(n)  => Some(n.toLong)
      case JDecimal(n) => Some(n.toLong)
      case _           => None
    }

  private def checkClaims(payload: JValue): Either[String, Claims] = {
    payload \ "iss" match {
      case JString(i) if i.stripSuffix("/") == issuer => ()
      case other => return Left(s"wrong issuer $other")
    }
    val auds = payload \ "aud" match {
      case JString(a)  => Seq(a)
      case JArray(as)  => as.collect { case JString(a) => a }
      case _           => Nil
    }
    if (!auds.contains(audience)) return Left(s"audience $auds lacks $audience")
    val now = clock()
    numClaim(payload, "exp") match {
      case None => return Left("missing exp")
      case Some(exp) if exp * 1000L + skewMs <= now => return Left("expired")
      case _ => ()
    }
    numClaim(payload, "nbf").foreach { nbf =>
      if (nbf * 1000L - skewMs > now) return Left("not yet valid")
    }
    val sub = payload \ "sub" match {
      case JString(s) => s
      case _          => return Left("missing sub")
    }
    Right(Claims(sub, payload match {
      case o: JObject => o
      case _          => JObject()
    }))
  }

  override def close(): Unit = ()
}

object OidcValidator {
  /** Reachability probe for a provider configuration (the reference's
    * TestProvider → client.Discover): fetch the discovery document
    * and confirm it names a jwks_uri. Returns the jwks_uri or the
    * failure reason. The SAME implementation backs the validator's
    * own JWKS resolution, so the probe and the live path cannot
    * drift. */
  def discover(issuerUrl: String): Either[String, String] =
    discover(issuerUrl, HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(5)).build())

  private[api] def discover(issuerUrl: String,
                            http: HttpClient): Either[String, String] =
    try {
      val res = http.send(HttpRequest.newBuilder(URI.create(
        issuerUrl.stripSuffix("/") + "/.well-known/openid-configuration"))
        .GET().timeout(Duration.ofSeconds(5)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (res.statusCode() != 200) Left(s"discovery HTTP ${res.statusCode()}")
      else JsonMethods.parse(res.body()) \ "jwks_uri" match {
        case JString(u) => Right(u)
        case _          => Left("discovery document has no jwks_uri")
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(String.valueOf(e.getMessage))
    }
}
