package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.security.SecureRandom
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Credential encryption at rest for the control-plane store —
  * AES-256-GCM with a random 96-bit nonce per value, the same
  * construction the reference's crypto module applies to its stored
  * secrets (ref internal/crypto/encryption.go:29-127: 32-byte key,
  * GCM, nonce prepended to the ciphertext, base64 over the wire).
  *
  * Stored form: `enc:v1:` + base64(nonce ++ ciphertext ++ tag). The
  * prefix makes legacy plaintext stores self-identifying, so enabling
  * encryption on an existing deployment re-encrypts on the next
  * persist without a migration step — and a store that IS encrypted
  * refuses to open without the key instead of serving ciphertext as
  * a password. */
object CredentialCrypto {

  val Prefix = "enc:v1:"
  private val NonceBytes = 12
  private val TagBits = 128
  private val rng = new SecureRandom()

  def isEncrypted(stored: String): Boolean = stored.startsWith(Prefix)

  /** A fresh random 32-byte key, base64 (the deployment generates one
    * and sets `GRAFT_ENCRYPTION_KEY`). */
  def generateKeyBase64(): String = {
    val key = new Array[Byte](32)
    rng.nextBytes(key)
    Base64.getEncoder.encodeToString(key)
  }

  def keyFromBase64(b64: String): Array[Byte] = {
    val key = try Base64.getDecoder.decode(b64.trim) catch {
      case _: IllegalArgumentException => throw new IllegalArgumentException(
        "GRAFT_ENCRYPTION_KEY is not valid base64")
    }
    require(key.length == 32,
      s"encryption key must be 32 bytes for AES-256, got ${key.length}")
    key
  }

  def encrypt(key: Array[Byte], plaintext: String): String = {
    val nonce = new Array[Byte](NonceBytes)
    rng.nextBytes(nonce)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagBits, nonce))
    val ct = cipher.doFinal(plaintext.getBytes(UTF_8))
    Prefix + Base64.getEncoder.encodeToString(nonce ++ ct)
  }

  /** Decrypt a stored value; legacy PLAINTEXT (no prefix) passes
    * through unchanged. A wrong key or tampered ciphertext fails
    * loudly — GCM authenticates, it never returns garbage. */
  def decrypt(key: Array[Byte], stored: String): String = {
    if (!isEncrypted(stored)) return stored
    val raw = try Base64.getDecoder.decode(stored.substring(Prefix.length))
    catch {
      case _: IllegalArgumentException => throw new IllegalStateException(
        "stored credential is corrupted (not base64)")
    }
    // a well-formed value carries nonce + AT LEAST the 16-byte tag:
    // anything shorter is truncation (partial-write corruption), which
    // must never masquerade as "wrong key"
    if (raw.length < NonceBytes + TagBits / 8) throw new IllegalStateException(
      "stored credential is corrupted (truncated)")
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(TagBits, raw, 0, NonceBytes))
    try new String(
      cipher.doFinal(raw, NonceBytes, raw.length - NonceBytes), UTF_8)
    catch {
      case _: javax.crypto.AEADBadTagException => throw new IllegalStateException(
        "credential decryption failed — wrong GRAFT_ENCRYPTION_KEY or " +
          "tampered store")
      case e: java.security.GeneralSecurityException =>
        // non-SunJCE providers may signal differently — still loud,
        // still never garbage
        throw new IllegalStateException(
          s"credential decryption failed: ${e.getMessage}")
    }
  }
}
