package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Credentials at rest: the AES-256-GCM kernel and the control-plane
  * store behavior (encrypt when keyed, legacy plaintext migration,
  * loud refusal on a missing or wrong key). */
class CredentialCryptoSpec extends AnyFunSuite {

  private val key = CredentialCrypto.keyFromBase64(
    CredentialCrypto.generateKeyBase64())

  test("encrypt/decrypt round-trips; nonces are fresh per value") {
    val a = CredentialCrypto.encrypt(key, "s3cret")
    val b = CredentialCrypto.encrypt(key, "s3cret")
    assert(a !== b) // fresh nonce every time — GCM forbids reuse
    assert(a.startsWith(CredentialCrypto.Prefix))
    assert(CredentialCrypto.decrypt(key, a) === "s3cret")
    assert(CredentialCrypto.decrypt(key, b) === "s3cret")
    assert(CredentialCrypto.decrypt(key, "") === "")
    // legacy plaintext passes through untouched
    assert(CredentialCrypto.decrypt(key, "plain-old-pw") === "plain-old-pw")
  }

  test("wrong key and tampering fail loudly, never return garbage") {
    val stored = CredentialCrypto.encrypt(key, "s3cret")
    val other = CredentialCrypto.keyFromBase64(
      CredentialCrypto.generateKeyBase64())
    intercept[IllegalStateException] { CredentialCrypto.decrypt(other, stored) }
    val tampered = stored.dropRight(8) +
      (if (stored.endsWith("A")) "BBBBBBBB" else "AAAAAAAA")
    intercept[IllegalStateException] { CredentialCrypto.decrypt(key, tampered) }
    intercept[IllegalArgumentException] {
      CredentialCrypto.keyFromBase64("dG9vLXNob3J0") // 9 bytes
    }
    intercept[IllegalArgumentException] {
      CredentialCrypto.keyFromBase64("%%% not base64 %%%")
    }
  }

  test("keyed store encrypts at rest; reopen round-trips; keyless reopen refuses") {
    val meta = Files.createTempDirectory("graft-cred").toString
    val cp = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key))
    val src = cp.createSource("pg", "postgresql", "db", 5432, "app",
      "rep", "pw-super-secret", "prefer", "", "")
    val raw = new String(
      Files.readAllBytes(Paths.get(meta, "sources.json")), UTF_8)
    assert(!raw.contains("pw-super-secret"), "password leaked to disk")
    assert(raw.contains(CredentialCrypto.Prefix))
    // reopen with the key: the credential round-trips for the runner
    val reopened = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key))
    assert(reopened.getSource(src.id).password === "pw-super-secret")
    // reopen WITHOUT the key: loud refusal, never ciphertext-as-password
    val e = intercept[IllegalStateException] {
      new ControlPlane(meta, connTest = _ => Right(1L), credentialKey = None)
    }
    assert(e.getMessage.contains("GRAFT_ENCRYPTION_KEY"))
    // reopen with a WRONG key: loud
    val wrong = CredentialCrypto.keyFromBase64(
      CredentialCrypto.generateKeyBase64())
    intercept[IllegalStateException] {
      new ControlPlane(meta, connTest = _ => Right(1L),
        credentialKey = Some(wrong))
    }
  }

  test("in-flight OIDC nonce and PKCE verifier are encrypted at rest") {
    val meta = Files.createTempDirectory("graft-oidcst").toString
    val cp = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key))
    val p = cp.createOidcProvider("corp", "Corp", "generic",
      "http://localhost:1", "cid")
    val st = cp.createOidcState(p.id, "http://localhost:3000/done")
    val raw = new String(
      Files.readAllBytes(Paths.get(meta, "oidc_states.json")), UTF_8)
    // the redeeming secrets never touch disk in the clear; the state
    // (the public front-channel handle) stays plain for lookup
    assert(!raw.contains(st.nonce), "nonce leaked to disk")
    assert(!raw.contains(st.codeVerifier), "code_verifier leaked to disk")
    assert(raw.contains(st.state))
    // a restart redeems the login with the original secrets intact
    val reopened = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key))
    val got = reopened.consumeOidcState(st.state)
    assert(got.map(_.nonce) === Some(st.nonce))
    assert(got.map(_.codeVerifier) === Some(st.codeVerifier))
  }

  test("undecryptable or expired OIDC states are dropped on load, not fatal") {
    // Unlike source passwords (long-lived credentials — keyless reopen
    // over encrypted values must refuse loudly, covered above), pending
    // OIDC login states are 10-minute ephemera: losing the key only
    // costs the user a login retry, so a restart without the key must
    // come up clean instead of bricking the whole control-plane load.
    val meta = Files.createTempDirectory("graft-oidcst-drop").toString
    val cp = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key))
    val p = cp.createOidcProvider("corp", "Corp", "generic",
      "http://localhost:1", "cid")
    cp.createOidcState(p.id, "http://localhost:3000/done")
    // keyless reopen: the sealed nonce/verifier can't be resolved — the
    // state is discarded, nothing throws, and new logins work
    val keyless = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = None)
    assert(keyless.listOidcStates.isEmpty)
    // expired-at-load states are dropped too (clock injected past TTL)
    var now = 1_000_000L
    val cp2 = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key), clock = () => now)
    val st = cp2.createOidcState(p.id, "http://localhost:3000/done")
    now += ControlPlane.OidcStateTtlMs + 1
    val reopened = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key), clock = () => now)
    assert(!reopened.listOidcStates.exists(_.state == st.state))
  }

  test("a keyless password colliding with a format marker round-trips (escaped)") {
    val meta = Files.createTempDirectory("graft-cred-collide").toString
    val cp = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = None)
    val s1 = cp.createSource("pg", "postgresql", "db", 5432, "app",
      "rep", "enc:v1:not-actually-encrypted", "prefer", "", "")
    val s2 = cp.createSource("pg2", "postgresql", "db", 5432, "app",
      "rep", ControlPlane.PlainMarker + "also-a-real-password", "prefer", "", "")
    // reopen KEYLESS: neither value misclassifies as ciphertext
    val reopened = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = None)
    assert(reopened.getSource(s1.id).password === "enc:v1:not-actually-encrypted")
    assert(reopened.getSource(s2.id).password ===
      ControlPlane.PlainMarker + "also-a-real-password")
  }

  test("a truncated ciphertext reports corruption, never 'wrong key'") {
    import java.util.Base64
    // nonce intact, tag partially lost: 20 raw bytes (12 < 20 < 28)
    val truncated = CredentialCrypto.Prefix +
      Base64.getEncoder.encodeToString(Array.fill[Byte](20)(7))
    val e = intercept[IllegalStateException] {
      CredentialCrypto.decrypt(key, truncated)
    }
    assert(e.getMessage.contains("truncated"))
    assert(!e.getMessage.contains("wrong"))
  }

  test("a legacy plaintext store migrates to encrypted on the next persist") {
    val meta = Files.createTempDirectory("graft-cred-legacy").toString
    val legacy = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = None)
    legacy.createSource("pg", "postgresql", "db", 5432, "app",
      "rep", "pw-legacy", "prefer", "", "")
    assert(new String(Files.readAllBytes(Paths.get(meta, "sources.json")),
      UTF_8).contains("pw-legacy")) // plaintext era
    // enabling the key: old entries still readable...
    val keyed = new ControlPlane(meta, connTest = _ => Right(1L),
      credentialKey = Some(key))
    assert(keyed.listSources().head.password === "pw-legacy")
    // ...and the next persist re-encrypts the WHOLE store
    keyed.createSource("pg2", "postgresql", "db2", 5432, "app",
      "rep", "pw-second", "prefer", "", "")
    val raw = new String(
      Files.readAllBytes(Paths.get(meta, "sources.json")), UTF_8)
    assert(!raw.contains("pw-legacy") && !raw.contains("pw-second"))
  }
}
