package graft.api

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.Duration
import java.util.Base64

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The relying-party side of the interactive OIDC login dance (ref
  * internal/oidc/client.go — discovery, AuthorizationURL, Exchange,
  * GetUserInfo; PKCE per internal/installer/oauth/providers.go:
  * 95-111). [[OidcValidator]] owns token VALIDATION; this object owns
  * the three outbound wire calls the authorize/callback routes make
  * and the pure URL/PKCE encoding between them.
  *
  * Wire shapes are the public standards the reference's client
  * speaks: OIDC discovery (RFC 8414 layout), the authorization-code
  * grant with PKCE (RFC 6749 §4.1 + RFC 7636 S256), form-encoded
  * token exchange, and the bearer userinfo call.
  *
  * One deliberate fidelity IMPROVEMENT over the reference: its
  * ParseIDToken skips signature verification (client.go:196-197 "In
  * production, you should verify the signature using JWKS"); the
  * callback route here runs the ID token through [[OidcValidator]]
  * (RS256 signature against the issuer's JWKS, alg pinning, iss/aud/
  * exp/nbf) before the nonce check.
  */
object OidcLogin {

  /** The discovery-document fields the flow consumes (ref client.go:
    * 29-37 DiscoveryConfig). */
  final case class Discovery(issuer: String, authorizationEndpoint: String,
                             tokenEndpoint: String,
                             userinfoEndpoint: Option[String],
                             jwksUri: String)

  /** Token-endpoint response (ref client.go:39-47). */
  final case class Tokens(accessToken: String, idToken: String)

  /** ONE shared client: the authorize/callback routes are hot and a
    * per-call client would rebuild a connection pool per login. */
  private lazy val sharedHttp: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()
  private def newHttp(): HttpClient = sharedHttp

  /** Successful discovery documents cache per issuer with a TTL —
    * authorize is an UNAUTHENTICATED route, and an uncached discovery
    * per request is both request amplification against the IdP and a
    * login-latency tax (two round-trips per dance otherwise).
    * Failures are never cached (an IdP outage must heal immediately). */
  private val DiscoveryTtlMs = 10L * 60 * 1000
  private val discoveryCache =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Discovery)]

  private def getStr(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _                        => None
  }

  /** Fetch the FULL discovery document — the login flow needs the
    * authorization and token endpoints, not just the jwks_uri the
    * validator resolves. Cached per issuer (TTL) on success. */
  def discover(issuerUrl: String,
               http: HttpClient = newHttp()): Either[String, Discovery] = {
    val key = issuerUrl.stripSuffix("/")
    val now = System.currentTimeMillis()
    discoveryCache.get(key).filter(now - _._1 < DiscoveryTtlMs) match {
      case Some((_, d)) => Right(d)
      case None =>
        val fetched = fetchDiscovery(issuerUrl, http)
        fetched.foreach(d => discoveryCache.put(key, (now, d)))
        fetched
    }
  }

  private def fetchDiscovery(issuerUrl: String,
                             http: HttpClient): Either[String, Discovery] =
    try {
      val res = http.send(HttpRequest.newBuilder(URI.create(
        issuerUrl.stripSuffix("/") + "/.well-known/openid-configuration"))
        .GET().timeout(Duration.ofSeconds(5)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (res.statusCode() != 200)
        Left(s"discovery HTTP ${res.statusCode()}")
      else {
        val doc = JsonMethods.parse(res.body())
        (getStr(doc \ "authorization_endpoint"),
          getStr(doc \ "token_endpoint"), getStr(doc \ "jwks_uri")) match {
          case (Some(authz), Some(token), Some(jwks)) =>
            Right(Discovery(
              getStr(doc \ "issuer").getOrElse(issuerUrl.stripSuffix("/")),
              authz, token, getStr(doc \ "userinfo_endpoint"), jwks))
          case _ => Left("discovery document lacks authorization_endpoint," +
            " token_endpoint or jwks_uri")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(String.valueOf(e.getMessage))
    }

  /** PKCE S256 challenge (RFC 7636 §4.2): base64url(SHA-256(verifier)). */
  def codeChallenge(verifier: String): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(
      MessageDigest.getInstance("SHA-256").digest(verifier.getBytes(UTF_8)))

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** The front-channel redirect target (ref client.go:127-145
    * AuthorizationURL): authorization-code + PKCE S256 + nonce. */
  def authorizationUrl(d: Discovery, clientId: String, scopes: Seq[String],
                       state: String, nonce: String, challenge: String,
                       callbackUrl: String): String = {
    val params = Seq(
      "client_id" -> clientId,
      "response_type" -> "code",
      "scope" -> scopes.mkString(" "),
      "redirect_uri" -> callbackUrl,
      "state" -> state,
      "nonce" -> nonce,
      "code_challenge" -> challenge,
      "code_challenge_method" -> "S256")
    val sep = if (d.authorizationEndpoint.contains('?')) "&" else "?"
    d.authorizationEndpoint + sep +
      params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  /** Back-channel code exchange (ref client.go:148-194 Exchange):
    * form-encoded POST carrying the PKCE verifier; the client secret
    * rides along only when the provider has one (public clients
    * authenticate by PKCE alone). */
  def exchange(d: Discovery, code: String, codeVerifier: String,
               callbackUrl: String, clientId: String, clientSecret: String,
               http: HttpClient = newHttp()): Either[String, Tokens] =
    try {
      val form = (Seq(
        "grant_type" -> "authorization_code",
        "code" -> code,
        "redirect_uri" -> callbackUrl,
        "client_id" -> clientId,
        "code_verifier" -> codeVerifier) ++
        (if (clientSecret.nonEmpty) Seq("client_secret" -> clientSecret)
         else Nil))
        .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
      val res = http.send(HttpRequest.newBuilder(URI.create(d.tokenEndpoint))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .header("Accept", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(form))
        .timeout(Duration.ofSeconds(10)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (res.statusCode() != 200)
        Left(s"token endpoint HTTP ${res.statusCode()}")
      else {
        val doc = JsonMethods.parse(res.body())
        getStr(doc \ "id_token") match {
          case Some(id) =>
            Right(Tokens(getStr(doc \ "access_token").getOrElse(""), id))
          case None => Left("token response has no id_token")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(String.valueOf(e.getMessage))
    }

  /** Optional enrichment (ref client.go:246-280 GetUserInfo +
    * services/oidc.go:230-242): claims absent from the ID token may
    * live at the userinfo endpoint. Failures are SOFT — the ID token
    * already authenticated the user. */
  def userInfo(d: Discovery, accessToken: String,
               http: HttpClient = newHttp()): Option[JValue] =
    d.userinfoEndpoint.flatMap { ep =>
      try {
        val res = http.send(HttpRequest.newBuilder(URI.create(ep))
          .header("Authorization", s"Bearer $accessToken")
          .header("Accept", "application/json")
          .GET().timeout(Duration.ofSeconds(5)).build(),
          HttpResponse.BodyHandlers.ofString())
        if (res.statusCode() == 200) Some(JsonMethods.parse(res.body()))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Claims → the provisioning view (ref client.go:283-294
    * ClaimsToUserInfo + the userinfo merge in services/oidc.go:
    * 230-242): ID-token claims win; userinfo fills only gaps. */
  def toUserInfo(claims: JValue, groupsClaim: String,
                 extra: Option[JValue]): ControlPlane.OidcUserInfo = {
    def s(v: JValue): String = v match {
      case JString(x) => x
      case _          => ""
    }
    def strs(v: JValue): Seq[String] = v match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case _          => Nil
    }
    def merged(name: String): String = s(claims \ name) match {
      case "" => extra.map(e => s(e \ name)).getOrElse("")
      case x  => x
    }
    val gc = if (groupsClaim.isEmpty) "groups" else groupsClaim
    val groups = strs(claims \ gc) match {
      case Nil => extra.map(e => strs(e \ gc)).getOrElse(Nil)
      case gs  => gs
    }
    // the verified flag travels WITH whichever source supplied the
    // email — a userinfo-sourced email must not inherit an ID-token
    // claim about a different (absent) value, and vice versa
    val emailVerified =
      if (s(claims \ "email").nonEmpty)
        (claims \ "email_verified") == JBool(true)
      else extra.exists(e => (e \ "email_verified") == JBool(true))
    ControlPlane.OidcUserInfo(
      subject = s(claims \ "sub"),
      email = merged("email"),
      emailVerified = emailVerified,
      name = merged("name"),
      givenName = merged("given_name"),
      familyName = merged("family_name"),
      groups = groups)
  }

  /** ref services/oidc.go:512-538 validateRedirectURI: http(s) with a
    * host; the reference ultimately allows any such URL (its final
    * arm returns nil), so the scheme/host shape IS the contract. */
  def validRedirectUri(uri: String): Boolean =
    try {
      val u = URI.create(uri)
      (u.getScheme == "http" || u.getScheme == "https") &&
        Option(u.getHost).exists(_.nonEmpty)
    } catch { case _: IllegalArgumentException => false }
}
