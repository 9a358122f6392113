package graft

import java.net.InetSocketAddress
import java.security.KeyPairGenerator
import java.util.Base64

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** THE shared fake OIDC issuer for tests — a real local HTTP server
  * publishing a discovery document and a JWKS over a fresh RSA
  * keypair, plus an RS256 compact-JWS signer over its private key.
  * For the interactive-login suites it is a full fake IdP: the
  * discovery document names authorization/token/userinfo endpoints,
  * and [[onToken]] / [[onUserInfo]] let a spec script the back
  * channel (both default to refusals, so validation-only suites are
  * unaffected). One implementation of the security-sensitive
  * JWKS/JWT encoding; every suite that needs issuer-signed tokens
  * uses this (the correctness GATE in SqlSurface necessarily carries
  * its own copy — main source cannot depend on test scope). */
final class FakeOidcIssuer(kid: String = "k1") {

  import FakeOidcIssuer._

  private val kpg = KeyPairGenerator.getInstance("RSA")
  kpg.initialize(2048)
  private val kp = kpg.generateKeyPair()
  private val pub =
    kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]

  private val srv =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  val base = s"http://127.0.0.1:${srv.getAddress.getPort}"

  /** Scripted token endpoint: receives the parsed form params, returns
    * (status, JSON body). The last request's params stay readable for
    * PKCE/secret assertions. */
  @volatile var onToken: Map[String, String] => (Int, String) =
    _ => (400, """{"error":"unsupported_grant_type"}""")
  @volatile var lastTokenParams: Map[String, String] = Map.empty

  /** Scripted userinfo endpoint: receives the bearer token (if any). */
  @volatile var onUserInfo: Option[String] => (Int, String) =
    _ => (404, "{}")

  srv.createContext("/", (ex: HttpExchange) => {
    val (status, body) = ex.getRequestURI.getPath match {
      case "/.well-known/openid-configuration" =>
        (200,
          s"""{"issuer":"$base","jwks_uri":"$base/jwks",
             |"authorization_endpoint":"$base/authorize",
             |"token_endpoint":"$base/token",
             |"userinfo_endpoint":"$base/userinfo"}""".stripMargin)
      case "/jwks" =>
        (200,
          s"""{"keys":[{"kty":"RSA","kid":"$kid","use":"sig","alg":"RS256",
             |"n":"${b64urlBig(pub.getModulus)}",
             |"e":"${b64urlBig(pub.getPublicExponent)}"}]}""".stripMargin)
      case "/token" =>
        val form = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val params = form.split('&').toSeq.flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) =>
              Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
            case _ => None
          }
        }.toMap
        lastTokenParams = params
        onToken(params)
      case "/userinfo" =>
        val bearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
        onUserInfo(bearer)
      case _ => (200, "{}")
    }
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes); ex.close()
  })
  srv.start()

  /** Sign a compact JWS over this issuer's key; `alg`/`kid` knobs
    * exist so refusal paths (alg confusion, unknown kid) can mint
    * their probes through the same signer. */
  def jwt(payload: String, alg: String = "RS256",
          kidOverride: String = null): String = {
    val k = if (kidOverride == null) kid else kidOverride
    val h = b64url(s"""{"alg":"$alg","kid":"$k"}""".getBytes("UTF-8"))
    val p = b64url(payload.getBytes("UTF-8"))
    val sig = java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(kp.getPrivate); sig.update(s"$h.$p".getBytes("UTF-8"))
    s"$h.$p.${b64url(sig.sign())}"
  }

  def stop(): Unit = srv.stop(0)
}

object FakeOidcIssuer {
  def b64url(bytes: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  /** base64url of a BigInteger's UNSIGNED big-endian bytes (RFC 7518
    * `n`/`e` encoding — the sign byte must be stripped). */
  def b64urlBig(b: java.math.BigInteger): String = {
    val a = b.toByteArray
    b64url(if (a(0) == 0) a.drop(1) else a)
  }
}
